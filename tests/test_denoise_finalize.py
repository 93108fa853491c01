"""Denoiser and finalize tests against NumPy oracles + behavior properties."""

import numpy as np
import pytest
import jax.numpy as jnp

from raytrace_tpu.ops.denoise import (
    bilateral_denoise,
    bilateral_denoise_np,
    denoise_chain,
)
from raytrace_tpu.ops.finalize import finalize_frame, finalize_frame_np
from raytrace_tpu.ops.shading import filmic_curve


def _fake_gbuffers(h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    lighting = rng.random((h, w, 3), np.float32)
    depth = (rng.random((h, w)) * 4000).astype(np.uint16)
    normal = rng.integers(0, 6, (h, w)).astype(np.uint8)
    normal[:4] = 16  # a sky band
    depth[:4] = 0xFFFF
    return lighting, depth, normal


def test_single_pass_matches_oracle():
    lighting, depth, normal = _fake_gbuffers()
    for size in (1, 2, 16):
        got = np.asarray(bilateral_denoise(jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal), size))
        want = bilateral_denoise_np(lighting, depth, normal, size)
        np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_sky_passthrough():
    lighting, depth, normal = _fake_gbuffers()
    out = np.asarray(denoise_chain(jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal)))
    np.testing.assert_array_equal(out[:4], lighting[:4])


@pytest.mark.slow
def test_denoise_smooths_uniform_depth():
    """On a flat surface the 6-pass chain must reduce noise variance a lot."""
    rng = np.random.default_rng(1)
    lighting = (0.5 + 0.3 * rng.standard_normal((64, 64, 3))).astype(np.float32)
    depth = np.full((64, 64), 1000, np.uint16)
    normal = np.full((64, 64), 4, np.uint8)
    out = np.asarray(denoise_chain(jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal)))
    assert out.std() < lighting.std() * 0.3
    # Energy approximately preserved (weights normalize).
    assert abs(out.mean() - lighting.mean()) < 0.02


def test_edge_preservation():
    """A depth edge must not bleed lighting across it."""
    lighting = np.zeros((32, 32, 3), np.float32)
    lighting[:, 16:] = 1.0
    depth = np.zeros((32, 32), np.uint16)
    depth[:, 16:] = 20000
    normal = np.full((32, 32), 4, np.uint8)
    out = np.asarray(denoise_chain(jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal)))
    assert out[:, :12].mean() < 0.12
    assert out[:, 20:].mean() > 0.88


def test_filmic_curve_shape():
    x = np.linspace(0, 3, 100, dtype=np.float32)
    y = filmic_curve(np, x)
    assert y[0] == 0.0
    assert (np.diff(y) >= -1e-6).all()  # monotone
    assert y[-1] == 1.0
    # segment values (finalize.comp:21-31)
    np.testing.assert_allclose(filmic_curve(np, np.float32(0.2)), 0.04, atol=1e-6)
    np.testing.assert_allclose(filmic_curve(np, np.float32(1.0)), 0.51, atol=1e-6)


def test_finalize_matches_oracle():
    rng = np.random.default_rng(2)
    h = w = 32
    albedo = rng.random((h, w, 3), np.float32)
    emission = np.zeros((h, w, 3), np.float32)
    fog = rng.random((h, w, 3), np.float32) * 0.3
    lighting = rng.random((h, w, 3), np.float32) * 0.2
    depth = (rng.random((h, w)) * 65535).astype(np.uint16)
    bn = rng.random((512, 512, 4)).astype(np.float32)
    got = np.asarray(
        finalize_frame(*map(jnp.asarray, (albedo, emission, fog, lighting, depth, bn)))
    )
    want = finalize_frame_np(albedo, emission, fog, lighting, depth, bn)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_finalize_flips_vertically():
    h = w = 16
    albedo = np.zeros((h, w, 3), np.float32)
    albedo[0] = 1.0  # top row in world orientation
    lighting = np.full((h, w, 3), 1.0 / 16.0, np.float32)
    z = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), 0xFFFF, np.uint16)
    bn = np.zeros((512, 512, 4), np.float32)
    out = np.asarray(
        finalize_frame(*map(jnp.asarray, (albedo, z, z, lighting, depth, bn)))
    )
    assert out[-1].mean() > out[0].mean()  # ends up at the bottom


@pytest.mark.slow
def test_pallas_chain_matches_xla_chain():
    """The VMEM-resident Pallas 6-pass chain == the XLA chain (interpret)."""
    from raytrace_tpu.ops.denoise_pallas import denoise_chain_pallas

    lighting, depth, normal = _fake_gbuffers(h=48, w=40, seed=3)
    want = np.asarray(
        denoise_chain(jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal))
    )
    got = np.asarray(
        denoise_chain_pallas(
            jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal)
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.slow
def test_pallas_denoise_finalize_matches_staged():
    """Fused last-pass finalize == denoise_chain + finalize_frame exactly."""
    from raytrace_tpu.ops.denoise_pallas import denoise_finalize_pallas
    from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

    rng = np.random.default_rng(5)
    h, w = 40, 48
    gb = dict(
        lighting=jnp.asarray(rng.random((h, w, 3), np.float32)),
        depth=jnp.asarray((rng.random((h, w)) * 65000).astype(np.uint16)),
        normal=jnp.asarray(rng.integers(0, 6, (h, w)).astype(np.uint8)),
        albedo=jnp.asarray(rng.random((h, w, 3), np.float32)),
        emission=jnp.asarray(rng.random((h, w, 3), np.float32) * 0.1),
        fog=jnp.asarray(rng.random((h, w, 3), np.float32)),
    )
    bn = jnp.asarray(get_blue_noise_f32())
    den = denoise_chain(gb["lighting"], gb["depth"], gb["normal"])
    want = np.asarray(
        finalize_frame(gb["albedo"], gb["emission"], gb["fog"], den, gb["depth"], bn)
    )
    got = np.asarray(denoise_finalize_pallas(gb, bn))
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.slow
def test_striped_chain_matches_unstriped(monkeypatch):
    """Column-strip mode (frames beyond the VMEM pixel budget) must equal
    the unstriped Pallas chain bit-for-bit on the center AND edge columns.
    Forced by shrinking the budget so a small frame strips 3 ways."""
    from raytrace_tpu.ops import denoise_pallas as dnp

    h, w = 32, 512
    lighting, depth, normal = _fake_gbuffers(h, w, seed=3)
    args = (jnp.asarray(lighting), jnp.asarray(depth), jnp.asarray(normal))
    want = np.asarray(dnp.denoise_chain_pallas(*args, interpret=True))
    # Budget forces sw = 128-col strips (the budget is in PADDED-plane
    # pixels: height rounded to BAND plus 2*PAD, width plus halos and PAD).
    monkeypatch.setattr(
        dnp,
        "MAX_VMEM_PIXELS",
        (h + 2 * dnp.PAD) * (128 + 2 * dnp.STRIP_HALO + 2 * dnp.PAD),
    )
    assert dnp._strip_plan(h, w) == [(0, 128), (128, 256), (256, 384), (384, 512)]
    # __wrapped__ bypasses the jit cache, which would otherwise replay the
    # unstriped trace recorded for this shape before the monkeypatch.
    got = np.asarray(dnp.denoise_chain_pallas.__wrapped__(*args, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_striped_finalize_matches_unstriped(monkeypatch):
    """Strip mode through denoise_finalize_pallas (the production entry)."""
    from raytrace_tpu.ops import denoise_pallas as dnp
    from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

    h, w = 32, 512
    lighting, depth, normal = _fake_gbuffers(h, w, seed=4)
    rng = np.random.default_rng(5)
    gb = {
        "lighting": jnp.asarray(lighting),
        "depth": jnp.asarray(depth),
        "normal": jnp.asarray(normal),
        "albedo": jnp.asarray(rng.random((h, w, 3), np.float32)),
        "emission": jnp.zeros((h, w, 3), jnp.float32),
        "fog": jnp.asarray(rng.random((h, w, 3), np.float32) * 0.5),
    }
    bn = jnp.asarray(get_blue_noise_f32())
    want = np.asarray(dnp.denoise_finalize_pallas.__wrapped__(gb, bn, interpret=True))
    monkeypatch.setattr(
        dnp,
        "MAX_VMEM_PIXELS",
        (h + 2 * dnp.PAD) * (128 + 2 * dnp.STRIP_HALO + 2 * dnp.PAD),
    )
    assert len(dnp._strip_plan(h, w)) == 4  # the patched budget really strips
    got = np.asarray(dnp.denoise_finalize_pallas.__wrapped__(gb, bn, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_scoped_vmem_options_boundaries():
    """The compiler-option helper fires for every padded plane beyond the
    proven 1024² default-limit footprint — striped or not.  Hardware
    calibration (probes/out/r5_denoise_vmem.log): 1088², 1152² and
    1536×896 are inside the strip-plan pixel budget yet FAIL to compile
    at the default scoped limit; returning options only for striped
    plans (the round-3/4 behavior) left them hard compile failures."""
    from raytrace_tpu.ops.denoise_pallas import (
        MAX_VMEM_PIXELS,
        _strip_plan,
        scoped_vmem_options,
    )

    # 1024² fits unstriped: the hot path must keep default options.
    assert _strip_plan(1024, 1024) is None
    assert scoped_vmem_options(1024, 1024) is None
    # The round-4 crash class: unstriped but beyond the 1024² footprint.
    for h, w in ((1088, 1088), (1152, 1152), (896, 1536)):
        assert _strip_plan(h, w) is None
        opts = scoped_vmem_options(h, w)
        assert opts and "xla_tpu_scoped_vmem_limit_kib" in opts, (h, w)
    # 1080p strips: the option must be present and name the XLA flag.
    assert isinstance(_strip_plan(1080, 1920), list)
    opts = scoped_vmem_options(1080, 1920)
    assert opts and "xla_tpu_scoped_vmem_limit_kib" in opts
    # 4K single-device band also strips.
    assert scoped_vmem_options(2160, 3840)
    # The budget is in padded-plane pixels; 1080p's padded plane exceeds it.
    from raytrace_tpu.ops.denoise_pallas import BAND, PAD

    hp = -(-1080 // BAND) * BAND + 2 * PAD
    assert hp * (1920 + 2 * PAD) > MAX_VMEM_PIXELS
