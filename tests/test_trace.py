"""Tracer golden tests: JAX on-device tracer vs the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.ops.trace_jax import (
    camera_rays,
    fuse_volume,
    render_gbuffers,
    trace_rays,
)
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.testing.reference_tracer import render_gbuffers_np, trace_rays_np
from raytrace_tpu.utils.blue_noise import get_blue_noise, get_blue_noise_f32

LR = (0.0, 0.0, 0.0)


def _uniforms(cam, sun_angle=0.6, seed=7):
    fwd, up, right = cam.scaled_basis()
    return dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(sun_angle),
        seed=jnp.int32(seed),
        lr=jnp.asarray(LR, jnp.float32),
    )


@pytest.fixture(scope="module")
def fused(world_volume):
    mats, mf = world_volume
    return fuse_volume(jnp.asarray(mats), jnp.asarray(mf))


def test_primary_rays_match_oracle(world_volume, fused):
    mats, mf = world_volume
    cam = Camera(origin=[-20.0, -50.0, 40.0])
    cam.pitch = -0.4
    uni = _uniforms(cam)
    o, d = camera_rays(uni, 64, 64)
    got = trace_rays(fused, o, d, uni["lr"], 512)
    want = trace_rays_np(mats, mf, np.asarray(o), np.asarray(d), np.array(LR), 512)

    assert (np.asarray(got["normal"]) == want["normal"]).mean() > 0.995
    assert (np.asarray(got["air"]) == want["air"]).mean() > 0.995
    d_pos = np.abs(np.asarray(got["position"]) - want["position"]).max(-1)
    assert (d_pos < 1e-2).mean() > 0.995
    # Some rays must have hit terrain for the test to be meaningful.
    assert (~want["air"]).mean() > 0.3


def test_rays_outside_region_are_sky(fused):
    o = jnp.array([[300.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    got = trace_rays(fused, o, d, jnp.asarray(LR, jnp.float32), 64)
    assert bool(got["air"][0])


def test_solid_start_hits_immediately(world_volume, fused):
    """Camera inside a solid voxel: defined behavior here is an immediate
    epsilon-distance hit (the reference's mod-by-zero at raytrace.comp:119
    is UB observed as 'high lag when sticking my head in a block'; we define
    mod(x, 0) = 0, which resolves to a hit on the containing voxel)."""
    mats, mf = world_volume
    zs, ys, xs = np.nonzero(mf == 0)
    # Pick a solid voxel; convert texel -> world (w = texel - 128).
    z, y, x = zs[0], ys[0], xs[0]
    o = jnp.array([[x - 128 + 0.5, y - 128 + 0.5, z - 128 + 0.5]], jnp.float32)
    d = jnp.array([[0.0, 0.0, 1.0]])
    got = trace_rays(fused, o, d, jnp.asarray(LR, jnp.float32), 32)
    assert not bool(got["exhausted"][0])
    assert not bool(got["air"][0])
    assert float(got["distance"][0]) < 1e-2


def test_full_gbuffers_match_oracle(world_volume, fused):
    mats, mf = world_volume
    bn = get_blue_noise()
    cam = Camera(origin=[-20.0, -50.0, 40.0])
    cam.pitch = -0.35
    uni = _uniforms(cam)
    W = H = 48
    got = {
        k: np.asarray(v)
        for k, v in render_gbuffers(
            fused, jnp.asarray(get_blue_noise_f32()), uni, W, H, 512
        ).items()
    }
    fwd, up, right = cam.scaled_basis()
    want = render_gbuffers_np(
        mats,
        mf,
        origin=cam.origin,
        forward=fwd,
        up=up,
        right=right,
        sun_angle=0.6,
        seed=7,
        blue_noise=bn,
        lr=LR,
        width=W,
        height=H,
        max_steps=512,
    )
    assert (got["normal"] == want["normal"]).all()
    assert (got["depth"] == want["depth"]).mean() > 0.995
    # Deterministic channels must agree tightly everywhere.
    for key in ("albedo", "fog"):
        err = np.abs(got[key] - want[key])
        assert err.max() < 1e-3, (key, err.max())
    # Lighting is chaotic: an ulp difference in a trig function can flip a
    # bounce direction, so isolated pixels may diverge entirely; require a
    # tiny bad-pixel fraction and small mean error instead.
    from raytrace_tpu.testing.golden import compare_images

    stats = compare_images(
        got["lighting"], want["lighting"], tol=1e-2, max_bad_frac=0.01, max_mean_err=2e-3
    )
    assert stats["ok"], stats


def test_depth_encoding(world_volume, fused):
    mats, mf = world_volume
    bn = jnp.asarray(get_blue_noise_f32())
    cam = Camera(origin=[0.0, 0.0, 50.0])
    cam.pitch = -1.5  # straight down
    uni = _uniforms(cam)
    gb = render_gbuffers(fused, bn, uni, 8, 8, 512)
    depth = np.asarray(gb["depth"])
    normal = np.asarray(gb["normal"])
    hit = normal != 16
    assert hit.any()
    # depth = distance * 32; looking straight down from z=50 onto terrain
    # below z=50 -> distance tens of units.
    assert (depth[hit] > 32).all() and (depth[hit] < 0xFFFF).all()
    assert (depth[~hit] == 0xFFFF).all() if (~hit).any() else True
