"""Pallas heightfield tracer tests (interpret mode on CPU).

Validates the hot-path kernel (ops/trace_pallas.py) against the worldgen
ground truth and the general volume tracer.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.ops.trace_pallas import build_hf_tables, trace_rays_hf
from raytrace_tpu.world.heightmap import height_at

LR = jnp.zeros(3, jnp.int32)


@pytest.fixture(scope="module")
def tables():
    return build_hf_tables(LR, seed=0)


def _trace(tables, o, d, max_steps=256):
    return {
        k: np.asarray(v)
        for k, v in trace_rays_hf(
            tables,
            jnp.asarray(o, jnp.float32),
            jnp.asarray(d, jnp.float32),
            LR,
            max_steps=max_steps,
            seed=0,
            interpret=True,
        ).items()
    }


@pytest.mark.slow
def test_straight_down_hits_terrain_top(tables):
    xs, ys = np.meshgrid(
        np.arange(-60, 60, 11, dtype=np.float32) + 0.5,
        np.arange(-60, 60, 11, dtype=np.float32) + 0.5,
    )
    o = np.stack([xs, ys, np.full_like(xs, 120.0)], -1).reshape(-1, 3)
    d = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (o.shape[0], 1))
    res = _trace(tables, o, d)
    assert not res["air"].any()
    assert (res["normal"] == 4).all()  # top face
    hs = np.maximum(
        np.asarray(
            height_at(
                jnp.asarray(np.floor(xs.ravel()).astype(np.int32)),
                jnp.asarray(np.floor(ys.ravel()).astype(np.int32)),
                0,
            )
        ),
        0,
    )
    # Hit position = surface + 0.001 nudge along +z.
    np.testing.assert_allclose(res["position"][:, 2], hs + 0.001, atol=5e-3)
    # Materials follow the band function (all < 20 -> grass possible etc.).
    assert (res["albedo"] > 0).any()


def test_upward_rays_reach_sky(tables):
    o = np.array([[0.5, 0.5, 150.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32)
    res = _trace(tables, o, d)
    assert res["air"].all()


def test_bounds_exit_is_sky(tables):
    o = np.array([[0.5, 0.5, 125.0]], np.float32)  # in-region, above terrain
    d = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = _trace(tables, o, d, max_steps=64)
    assert res["air"].all()
    assert abs(res["position"][0, 0]) >= 127.0


def test_matches_volume_tracer_primary(tables, full_world_volume):
    """Golden: the Pallas HF tracer equals the general volume tracer on a
    full generated region (primary camera rays)."""
    from raytrace_tpu.ops.trace_jax import camera_rays, fuse_volume, trace_rays
    from raytrace_tpu.render.camera import Camera

    mats, mf = full_world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    fwd, up, right = cam.scaled_basis()
    uni = dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
    )
    o, d = camera_rays(uni, 32, 32)
    want = {
        k: np.asarray(v)
        for k, v in trace_rays(fused, o, d, jnp.zeros(3, jnp.float32), 512).items()
    }
    got = _trace(tables, np.asarray(o), np.asarray(d), max_steps=512)

    assert (got["air"] == want["air"]).mean() > 0.99
    hit = ~want["air"] & ~got["air"]
    assert (got["normal"][hit] == want["normal"][hit]).mean() > 0.98
    dp = np.abs(got["position"] - want["position"]).max(-1)
    assert (dp[hit] < 0.05).mean() > 0.98
    # Materials must be identical where positions agree.
    close = hit & (dp < 0.01)
    assert close.sum() > hit.sum() * 0.5
    np.testing.assert_allclose(
        got["albedo"][close], want["albedo"][close], atol=1e-5
    )
