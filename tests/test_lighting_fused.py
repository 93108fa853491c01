"""Fused single-launch lighting kernel vs the staged per-leg pipeline.

The fused kernel (ops/lighting_pallas.py) walks the whole 5-ray light path
(raytrace.comp:317-350) inside one Pallas launch; the staged path
(ops/trace_pallas.render_gbuffers_hf) dispatches one kernel per bounce leg.
Both must produce the same G-buffers when no ray exhausts its step budget
(the only semantic difference: the fused kernel shares one budget across
the path, the staged path budgets per leg).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
from raytrace_tpu.ops.trace_pallas import build_hf_tables, render_gbuffers_hf
from raytrace_tpu.render.pipeline import FrameUniforms
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


@pytest.fixture(scope="module")
def frame_pair():
    W = H = 64
    bn = get_blue_noise_f32()
    pitch = -0.3
    u = FrameUniforms(
        origin=(-30.0, -100.0, 60.0),
        sun_angle=0.6,
        forward=(0.0, np.cos(pitch), np.sin(pitch)),
        up=(0.0, -0.4 * np.sin(pitch), 0.4 * np.cos(pitch)),
        right=(0.4, 0.0, 0.0),
    ).as_device_dict()
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    staged = render_gbuffers_hf(
        tables, bn, u, W, H, max_steps=2048, seed=0, interpret=True
    )
    fused = render_gbuffers_fused(
        tables, bn, u, W, H, max_steps=2048, seed=0, interpret=True
    )
    return (
        {k: np.asarray(v) for k, v in staged.items()},
        {k: np.asarray(v) for k, v in fused.items()},
    )


def test_lighting_matches(frame_pair):
    staged, fused = frame_pair
    np.testing.assert_allclose(
        staged["lighting"], fused["lighting"], atol=1e-5, rtol=1e-5
    )


def test_primary_gbuffers_match(frame_pair):
    staged, fused = frame_pair
    np.testing.assert_array_equal(staged["normal"], fused["normal"])
    np.testing.assert_array_equal(staged["albedo"], fused["albedo"])
    # Depth quantizes a distance computed with different arithmetic order;
    # allow one quantum (1/32 voxel).
    d = np.abs(
        staged["depth"].astype(np.int64) - fused["depth"].astype(np.int64)
    )
    assert d.max() <= 1
    np.testing.assert_allclose(staged["fog"], fused["fog"], atol=1e-6)


@pytest.mark.slow
def test_unroll_invariance(frame_pair):
    """unroll=2 must produce bit-identical G-buffers (masked no-op bodies)."""
    W = H = 64
    bn = get_blue_noise_f32()
    pitch = -0.3
    u = FrameUniforms(
        origin=(-30.0, -100.0, 60.0),
        sun_angle=0.6,
        forward=(0.0, np.cos(pitch), np.sin(pitch)),
        up=(0.0, -0.4 * np.sin(pitch), 0.4 * np.cos(pitch)),
        right=(0.4, 0.0, 0.0),
    ).as_device_dict()
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    _, fused = frame_pair
    rolled = render_gbuffers_fused(
        tables, bn, u, W, H, max_steps=2048, seed=0, interpret=True, unroll=2
    )
    for k in ("lighting", "depth", "normal", "albedo", "fog"):
        np.testing.assert_array_equal(np.asarray(rolled[k]), fused[k])


@pytest.mark.slow
@pytest.mark.parametrize("bounces", [0, 1])
def test_reduced_bounce_matches_staged(bounces):
    """legs-capped fused paths == the staged tracer at the same bounce count."""
    W = H = 64
    bn = get_blue_noise_f32()
    pitch = -0.3
    u = FrameUniforms(
        origin=(-30.0, -100.0, 60.0),
        sun_angle=0.6,
        forward=(0.0, np.cos(pitch), np.sin(pitch)),
        up=(0.0, -0.4 * np.sin(pitch), 0.4 * np.cos(pitch)),
        right=(0.4, 0.0, 0.0),
    ).as_device_dict()
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    staged = render_gbuffers_hf(
        tables, bn, u, W, H, max_steps=2048, seed=0, interpret=True,
        bounces=bounces,
    )
    fused = render_gbuffers_fused(
        tables, bn, u, W, H, max_steps=2048, seed=0, interpret=True,
        bounces=bounces,
    )
    np.testing.assert_allclose(
        np.asarray(staged["lighting"]), np.asarray(fused["lighting"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(staged["normal"]), np.asarray(fused["normal"])
    )


@pytest.mark.slow
def test_sort_seg_bit_identical(frame_pair):
    """Segmented cascade sorts (SORT_SEG) must be bit-identical to the
    global sort: rays are independent and the unsort restores pixel order
    (lighting_pallas.rsort)."""
    from raytrace_tpu.ops import lighting_pallas as LP

    W = H = 64
    bn = get_blue_noise_f32()
    pitch = -0.3
    u = FrameUniforms(
        origin=(-30.0, -100.0, 60.0),
        sun_angle=0.6,
        forward=(0.0, np.cos(pitch), np.sin(pitch)),
        up=(0.0, -0.4 * np.sin(pitch), 0.4 * np.cos(pitch)),
        right=(0.4, 0.0, 0.0),
    ).as_device_dict()
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    _, fused = frame_pair
    old = LP.SORT_SEG
    try:
        LP.SORT_SEG = 8
        seg = render_gbuffers_fused(
            tables, bn, u, W, H, max_steps=2048, seed=0, interpret=True
        )
    finally:
        LP.SORT_SEG = old
    for k in ("lighting", "depth", "normal", "albedo", "fog"):
        np.testing.assert_array_equal(np.asarray(seg[k]), fused[k])
