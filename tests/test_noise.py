"""Noise stack tests: determinism, ranges, fractal structure."""

import numpy as np
import jax.numpy as jnp

from raytrace_tpu.world.noise import (
    basic_multi,
    hash3_u32,
    mountain_noise,
    mountain_noise2,
    perlin2,
    worley2,
)


def _grid(n=64, scale=0.13, off=0.0):
    x = (np.arange(n) * scale + off)[None, :].astype(np.float32)
    y = (np.arange(n) * scale + off)[:, None].astype(np.float32)
    return jnp.broadcast_to(x, (n, n)), jnp.broadcast_to(y, (n, n))


def test_perlin_range_and_determinism():
    x, y = _grid()
    a = np.asarray(perlin2(x, y, seed=3))
    b = np.asarray(perlin2(x, y, seed=3))
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -1.31 and a.max() <= 1.31
    assert a.std() > 0.1  # non-degenerate
    c = np.asarray(perlin2(x, y, seed=4))
    assert np.abs(a - c).max() > 0.1  # seed changes the field


def test_perlin_zero_at_lattice():
    # Gradient noise vanishes on integer lattice points.
    xi = jnp.arange(8, dtype=jnp.float32)[None, :]
    yi = jnp.arange(8, dtype=jnp.float32)[:, None]
    v = np.asarray(perlin2(jnp.broadcast_to(xi, (8, 8)), jnp.broadcast_to(yi, (8, 8))))
    np.testing.assert_allclose(v, 0.0, atol=1e-6)


def test_basic_multi_adds_detail():
    x, y = _grid(scale=0.05)
    one = np.asarray(basic_multi(x, y, octaves=1))  # single octave baseline
    six = np.asarray(basic_multi(x, y, octaves=6))
    # More octaves -> more high-frequency energy (gradient magnitude).
    def hf(a):
        return np.abs(np.diff(a, axis=0)).mean()

    assert hf(six) > hf(one) * 1.05


def test_worley_range():
    x, y = _grid(scale=0.31)
    v = np.asarray(worley2(x, y))
    # F1 - 1: nearest feature distance in [0, ~1.5) minus 1.
    assert v.min() >= -1.0
    assert v.max() < 0.6
    assert v.std() > 0.05


def test_mountain_noise_variants():
    x, y = _grid(scale=0.02)
    v1 = np.asarray(mountain_noise(x, y))
    v2 = np.asarray(mountain_noise2(x, y))
    for v in (v1, v2):
        assert v.min() >= 0.0
        assert np.isfinite(v).all()
        assert v.std() > 0.01
    assert v2.max() < 3.0


def test_hash3_uniformity():
    n = 64
    xi = jnp.arange(n, dtype=jnp.int32)
    g = jnp.meshgrid(xi, xi, xi, indexing="ij")
    bits = np.asarray(hash3_u32(g[0], g[1], g[2], 1)).ravel()
    # Low bits roughly uniform.
    frac = (bits % 2 == 0).mean()
    assert 0.48 < frac < 0.52
    r60 = bits % 60
    hist = np.bincount(r60, minlength=60) / len(bits)
    assert np.abs(hist - 1 / 60).max() < 0.005
