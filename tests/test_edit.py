"""World-edit API (world/edit.py): exact fused-volume writes + minefield
repair, end to end through both volume tracers and the pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.materials import PACKED_MATERIALS
from raytrace_tpu.ops.trace_jax import (
    MATERIAL_MASK,
    STEP_SHIFT,
    fuse_volume,
    trace_rays,
)
from raytrace_tpu.world.chunk import minefield_from_solid
from raytrace_tpu.world.edit import edit_fused_volume

CENTER = (0, 0, 0)  # window [-128, 128): every 64-chunk fully resident


def _world(solid, mats=None):
    if mats is None:
        mats = np.where(solid, np.uint32(PACKED_MATERIALS[5]), np.uint32(0))
    return fuse_volume(jnp.asarray(mats), minefield_from_solid(jnp.asarray(solid)))


def _slab_world():
    solid = np.zeros((256, 256, 256), bool)
    solid[:100] = True  # world z < -28
    return solid


def test_solid_edit_matches_from_scratch_rebuild():
    """Editing a box must equal building the edited world from scratch —
    materials, solidity AND every minefield step bit-exactly (the repair
    uses the same minefield_from_solid generation uses)."""
    solid = _slab_world()
    fused = _world(solid)
    # world (x, y, z) = (-20, 10, 12), size (24, 6, 10) -> floats in air
    got = edit_fused_volume(fused, CENTER, (-20, 10, 12), (24, 6, 10), 3)

    solid2 = solid.copy()
    mats2 = np.where(solid, np.uint32(PACKED_MATERIALS[5]), np.uint32(0))
    zt, yt, xt = (
        slice(12 + 128, 22 + 128),
        slice(10 + 128, 16 + 128),
        slice(-20 + 128, 4 + 128),
    )
    solid2[zt, yt, xt] = True
    mats2[zt, yt, xt] = np.uint32(PACKED_MATERIALS[3])
    want = _world(solid2, mats2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_air_edit_matches_from_scratch_rebuild():
    """Carving air re-opens LOD claims exactly (per-chunk recompute can
    only be verified against the from-scratch build)."""
    solid = _slab_world()
    fused = _world(solid)
    got = edit_fused_volume(fused, CENTER, (-8, -8, -80), (16, 16, 30), None)

    solid2 = solid.copy()
    mats2 = np.where(solid, np.uint32(PACKED_MATERIALS[5]), np.uint32(0))
    zt, yt, xt = (
        slice(-80 + 128, -50 + 128),
        slice(-8 + 128, 8 + 128),
        slice(-8 + 128, 8 + 128),
    )
    solid2[zt, yt, xt] = False
    mats2[zt, yt, xt] = 0
    want = _world(solid2, mats2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_edited_content_traces_exactly():
    """Both tracers agree on edited content: the fast brick-pyramid path
    vs the reference-DDA oracle over the SAME edited volume."""
    from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol

    fused = _world(_slab_world())
    fused = edit_fused_volume(fused, CENTER, (-10, -10, 0), (20, 20, 20), 2)
    tables = build_vol_tables(fused)

    # Rays from above aimed at and around the new box.
    n = 12
    xs = np.linspace(-30, 30, n, dtype=np.float32)
    o = np.stack(
        [xs, np.full(n, 0.5, np.float32), np.full(n, 90.0, np.float32)], -1
    )
    d = np.tile(np.asarray([[0.05, 0.0, -1.0]], np.float32), (n, 1))
    want = {
        k: np.asarray(v)
        for k, v in trace_rays(
            fused, jnp.asarray(o), jnp.asarray(d), jnp.zeros(3, jnp.float32), 512
        ).items()
    }
    got = {
        k: np.asarray(v)
        for k, v in trace_rays_vol(
            tables, fused, jnp.asarray(o), jnp.asarray(d),
            jnp.zeros(3, jnp.int32), interpret=True,
        ).items()
    }
    assert (~want["air"]).sum() >= n - 2  # box or slab under every ray
    np.testing.assert_array_equal(got["air"], want["air"])
    hit = ~want["air"]
    np.testing.assert_array_equal(got["normal"][hit], want["normal"][hit])
    np.testing.assert_allclose(got["albedo"][hit], want["albedo"][hit], atol=1e-5)
    assert np.abs(got["position"] - want["position"]).max(-1)[hit].max() < 1e-3


def test_straddling_chunk_conservative_clamp():
    """A chunk only partially inside the window cannot be recomputed
    exactly; its steps are clamped to <= 1 (always-correct) while the
    edit's own solidity stays exact."""
    solid = _slab_world()
    fused = _world(solid)
    window = (16, 0, 0)  # x window [-112, 144): chunk x [-128, -64) straddles
    got = np.asarray(
        edit_fused_volume(fused, window, (-100, 0, 120), (8, 8, 4), 1)
    ).reshape(256, 256, 256)

    # Edited voxels: exact word (material 1, step 0).
    zt = slice(120 + 128 - 256, 124 + 128 - 256)  # wraps: texel 248..252
    box = got[
        np.ix_(
            (np.arange(120, 124) + 128) % 256,
            (np.arange(0, 8) + 128) % 256,
            (np.arange(-100, -92) + 128) % 256,
        )
    ]
    assert (box == np.uint32(PACKED_MATERIALS[1])).all()

    # Air steps inside the straddling chunk are clamped to 1.
    cix = np.ix_(
        (np.arange(64, 128) + 128) % 256,   # chunk z [64, 128)
        (np.arange(0, 64) + 128) % 256,     # chunk y [0, 64)
        (np.arange(-128, -64) + 128) % 256,  # chunk x [-128, -64)
    )
    steps = (got[cix] >> STEP_SHIFT).astype(np.int32)
    assert steps.max() <= 1

    # Outside the affected chunks the volume is untouched.
    ref = np.asarray(fused).reshape(256, 256, 256)
    far = np.ix_(np.arange(0, 64), np.arange(128, 192), np.arange(128, 192))
    np.testing.assert_array_equal(got[far], ref[far])


def test_edit_validation():
    fused = _world(_slab_world())
    with pytest.raises(ValueError, match="outside the resident window"):
        edit_fused_volume(fused, CENTER, (120, 0, 0), (16, 4, 4), 1)
    with pytest.raises(ValueError, match="unknown material"):
        edit_fused_volume(fused, CENTER, (0, 0, 0), (4, 4, 4), 99)
    with pytest.raises(ValueError, match="empty edit box"):
        edit_fused_volume(fused, CENTER, (0, 0, 0), (0, 4, 4), 1)


@pytest.mark.slow  # real worldgen slab application on CPU
def test_edit_survives_unrelated_streaming():
    """Edits are overlays on the resident volume: a streamed slab on a
    different region leaves them intact (only overlapping slabs may
    regenerate over them — documented in world/edit.py)."""
    from raytrace_tpu.render.streaming import TerrainStreamer

    s = TerrainStreamer(seed=0)
    s.initialize()
    s.edit_box((-4, -4, 20), (8, 8, 8), 2)
    word = np.uint32(PACKED_MATERIALS[2])
    ix = np.ix_(
        (np.arange(20, 28) + 128) % 256,
        (np.arange(-4, 4) + 128) % 256,
        (np.arange(-4, 4) + 128) % 256,
    )
    vol = np.asarray(s.volume).reshape(256, 256, 256)
    assert (vol[ix] == word).all()

    # Stream one slice along +x: regenerates a 16-voxel slab at the far
    # window edge, nowhere near the edit.
    s.request_increase(0)
    assert s.setup_next_request()
    vol2 = np.asarray(s.volume).reshape(256, 256, 256)
    assert (vol2[ix] == word).all()
    # The slab-log invalidation from the edit persists until drained: the
    # next consumer must do a full table rebuild, never a stale
    # incremental update.
    assert s.drain_slab_log() is None


@pytest.mark.slow  # full pipeline construction (256^3 worldgen) on CPU
def test_pipeline_edit_end_to_end():
    """Pipeline.edit_box: the edit is visible in the next volume_fast
    frame (tables rebuild via volume identity), and heightfield-tracer
    pipelines refuse (their tables derive from worldgen, not the
    volume)."""
    from raytrace_tpu.render.camera import Camera
    from raytrace_tpu.render.pipeline import Pipeline

    p = Pipeline(width=48, height=48, max_steps=512, tracer="volume_fast",
                 bounces=1)
    cam = Camera(origin=[0.0, -60.0, 40.0])
    cam.pitch = -0.4
    before = np.asarray(p.draw_frame(cam, 0.6))
    p.edit_box((-12, -30, 30), (24, 20, 16), 3)  # big box in front
    after = np.asarray(p.draw_frame(cam, 0.6))
    assert not np.array_equal(before, after)

    p_hf = Pipeline(width=16, height=16, max_steps=64, tracer="fused")
    with pytest.raises(ValueError, match="cannot display volume edits"):
        p_hf.edit_box((0, 0, 0), (4, 4, 4), 1)
