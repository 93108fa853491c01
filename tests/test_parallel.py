"""Multi-chip tile-split tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytrace_tpu.ops.denoise import denoise_chain
from raytrace_tpu.ops.finalize import finalize_frame
from raytrace_tpu.ops.trace_jax import fuse_volume, render_gbuffers
from raytrace_tpu.parallel.tiles import make_tile_mesh, render_frame_tiled
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


def _uniforms():
    cam = Camera(origin=[-20.0, -50.0, 40.0])
    cam.pitch = -0.35
    fwd, up, right = cam.scaled_basis()
    return dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(0.6),
        seed=jnp.int32(7),
        lr=jnp.zeros(3, jnp.float32),
    )


def test_eight_virtual_devices():
    assert len(jax.devices()) >= 8


@pytest.mark.slow
def test_tiled_frame_matches_single_device(world_volume):
    """The sharded pipeline (band split + ppermute halo exchange) must equal
    the single-device pipeline exactly — the halo exchange is not an
    approximation."""
    mats, mf = world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 64, 64
    steps = 256

    gb = render_gbuffers(fused, bn, uni, W, H, steps)
    denoised = denoise_chain(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:8])
    got = np.asarray(render_frame_tiled(fused, bn, uni, W, H, mesh, steps))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = np.asarray(fn(*args))
    assert out.shape == (128, 128, 3)
    assert np.isfinite(out).all()

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_tiled_frame_hf_tracer_matches_single_device():
    """The Pallas heightfield path under shard_map (band split) must equal
    the same tracer run single-device: the compaction cascade and the
    banded blue-noise slice are shard-local and exact."""
    from raytrace_tpu.ops.denoise import denoise_chain
    from raytrace_tpu.ops.trace_pallas import build_hf_tables, render_gbuffers_hf

    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 64, 64
    steps = 512
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)

    gb = render_gbuffers_hf(tables, bn, uni, W, H, steps)
    denoised = denoise_chain(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:8])
    got = np.asarray(
        render_frame_tiled(tables, bn, uni, W, H, mesh, steps, tracer="hf")
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_tiled_frame_volume_fast_matches_single_device(world_volume):
    """The brick-pyramid general-volume tracer under shard_map (band split)
    must equal the same tracer run single-device — the tables tuple
    replicates like the hf tables and the resolve is shard-local."""
    from raytrace_tpu.ops.trace_vol_pallas import (
        build_vol_tables,
        render_gbuffers_vol,
    )

    mats, mf = world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    tables = build_vol_tables(fused)
    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 64, 64
    steps = 256

    gb = render_gbuffers_vol(fused, tables, bn, uni, W, H, steps)
    denoised = denoise_chain(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:8])
    got = np.asarray(
        render_frame_tiled(
            (fused, tables), bn, uni, W, H, mesh, steps, tracer="volume_fast"
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_tiled_pallas_denoise_matches_single_device(world_volume):
    """Bands >= 2*ROW_HALO rows take the per-device VMEM Pallas denoise
    chain after ONE 256-row halo exchange; the result must equal the
    single-device Pallas chain exactly (the halo exceeds the chain's
    117-row influence radius — same argument as the column strips)."""
    from raytrace_tpu.ops.denoise_pallas import denoise_chain_pallas
    from raytrace_tpu.parallel import tiles

    mats, mf = world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 32, 1024  # 4 devices -> 256-row bands == 2*ROW_HALO exactly
    steps = 64

    gb = render_gbuffers(fused, bn, uni, W, H, steps)
    denoised = denoise_chain_pallas(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:4])
    band = H // 4
    assert band >= 2 * tiles.ROW_HALO  # the test must exercise the new path
    got = np.asarray(render_frame_tiled(fused, bn, uni, W, H, mesh, steps))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_tiled_production_shape_fused_matches_single_device():
    """Production-configuration proof for the fused tracer: 512x2048 over
    the FULL 8-device mesh with the real MAX_TRACE_STEPS budget, so each
    256-row band is exactly 2*ROW_HALO and the per-band Pallas denoise
    chain (one ppermute halo exchange) is the path exercised — the same
    plan a 4K frame takes on an 8-chip mesh (270-row bands).  The 64^2
    tests prove the math at toy shapes; this pins the production shape."""
    from raytrace_tpu.constants import MAX_TRACE_STEPS
    from raytrace_tpu.ops.denoise_pallas import denoise_chain_pallas
    from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
    from raytrace_tpu.ops.trace_pallas import build_hf_tables
    from raytrace_tpu.parallel import tiles

    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 512, 2048
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)

    gb = render_gbuffers_fused(tables, bn, uni, W, H, MAX_TRACE_STEPS)
    denoised = denoise_chain_pallas(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:8])
    assert H // 8 >= 2 * tiles.ROW_HALO  # the per-band Pallas plan engages
    got = np.asarray(
        render_frame_tiled(tables, bn, uni, W, H, mesh, MAX_TRACE_STEPS, tracer="fused")
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_tiled_production_shape_volume_fast_matches_single_device(world_volume):
    """Production-configuration proof for the arbitrary-content tracer:
    512x2048, 8 devices, real MAX_TRACE_STEPS, per-band Pallas denoise
    engaged (256-row bands == 2*ROW_HALO)."""
    from raytrace_tpu.constants import MAX_TRACE_STEPS
    from raytrace_tpu.ops.denoise_pallas import denoise_chain_pallas
    from raytrace_tpu.ops.path_vol import render_gbuffers_path
    from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables
    from raytrace_tpu.parallel import tiles

    mats, mf = world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    tables = build_vol_tables(fused)
    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 512, 2048

    gb = render_gbuffers_path(fused, tables, bn, uni, W, H, MAX_TRACE_STEPS)
    denoised = denoise_chain_pallas(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:8])
    assert H // 8 >= 2 * tiles.ROW_HALO
    got = np.asarray(
        render_frame_tiled(
            (fused, tables), bn, uni, W, H, mesh, MAX_TRACE_STEPS, tracer="volume_fast"
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_tiled_frame_fused_tracer_matches_single_device():
    """The fused whole-path kernel under shard_map (band split) must equal
    the same tracer run single-device — banded camera rays, banded
    blue-noise roll, and the shard-local compaction cascade are exact."""
    from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
    from raytrace_tpu.ops.trace_pallas import build_hf_tables

    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms()
    W, H = 64, 64
    steps = 512
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)

    gb = render_gbuffers_fused(tables, bn, uni, W, H, steps)
    denoised = denoise_chain(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], denoised, gb["depth"], bn)
    )

    mesh = make_tile_mesh(jax.devices()[:8])
    got = np.asarray(
        render_frame_tiled(tables, bn, uni, W, H, mesh, steps, tracer="fused")
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
