"""Whole-path volume renderer tests (ops/path_vol.py).

The defining contract: render_gbuffers_path produces the SAME frames as
the staged pipeline (trace_vol_pallas.render_gbuffers_vol -> trace_jax
integrate_gbuffers) — the marches are memoryless in (position,
direction), the leg sequencing matches integrate_gbuffers leg-for-leg,
and the final planar shade pass uses the same formulas on the same
planar noise — so every pixel whose path terminates within budget is
bit-identical.  Interpret mode on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.materials import PACKED_MATERIALS
from raytrace_tpu.ops.trace_jax import fuse_volume
from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import (
    build_vol_tables,
    render_gbuffers_vol,
)
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32
from raytrace_tpu.world.chunk import minefield_from_solid

LR = jnp.zeros(3, jnp.int32)


def _fuse(solid, material_id=5):
    mats = np.where(
        solid, np.uint32(PACKED_MATERIALS[material_id]), np.uint32(0)
    )
    mf = np.asarray(minefield_from_solid(jnp.asarray(solid)))
    return fuse_volume(jnp.asarray(mats), jnp.asarray(mf))


@pytest.fixture(scope="module")
def weird_world():
    """Content impossible for the heightfield tracer: slab + floating box +
    a cave tunnel under the surface (same scene as test_trace_vol)."""
    solid = np.zeros((256, 256, 256), bool)
    solid[:100] = True
    solid[140:150, 120:140, 120:140] = True
    solid[90:100, 128:132, 128:132] = False
    fused = _fuse(solid)
    return fused, build_vol_tables(fused)


def _uniforms(origin, pitch, sun=0.6, seed=7):
    cam = Camera(origin=list(origin))
    cam.pitch = pitch
    fwd, up, right = cam.scaled_basis()
    return dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(sun),
        seed=jnp.int32(seed),
        lr=jnp.asarray(LR, jnp.float32),
    )


# Budget for exact comparisons: big enough that NO ray exhausts in either
# pipeline (grazing diffuse rays along the flat slab top park at every
# surface brick — up to ~32 rounds; the staged per-leg budget is
# ceil(max_steps / 96)).  With exhaustion out of the picture the two
# pipelines trace identical marches.
_STEPS = 4096


def _frames(fused, tables, uni, size, bounces, **kw):
    bn = jnp.asarray(get_blue_noise_f32())
    staged = render_gbuffers_vol(
        fused, tables, bn, uni, size, size, _STEPS, bounces=bounces
    )
    got = render_gbuffers_path(
        fused, tables, bn, uni, size, size, _STEPS, bounces=bounces, **kw
    )
    return (
        {k: np.asarray(v) for k, v in staged.items()},
        {k: np.asarray(v) for k, v in got.items()},
    )


def _assert_frames_equal(staged, got):
    """Discrete G-buffers (depth, normal) bit-equal; radiometric buffers
    to float32-ulp tolerance — the two pipelines are different jitted
    programs, so XLA may contract the shared sky/sun formulas with
    different fma groupings (measured: 1-ulp differences on ~0.2% of
    pixels, everything else bit-equal)."""
    for k in ("depth", "normal"):
        np.testing.assert_array_equal(got[k], staged[k], err_msg=k)
    for k in ("lighting", "albedo", "emission", "fog"):
        np.testing.assert_allclose(
            got[k], staged[k], rtol=1e-5, atol=1e-6, err_msg=k
        )


@pytest.mark.parametrize("bounces", [0, 1, 2])
def test_matches_staged_pipeline(weird_world, bounces):
    fused, tables = weird_world
    uni = _uniforms((0.0, -80.0, 40.0), -0.4)
    staged, got = _frames(fused, tables, uni, 32, bounces)
    exhausted = staged["depth"] == 256 * 254
    assert not exhausted.any()
    # Scene sanity: both sky and terrain visible.
    assert (staged["depth"] == 0xFFFF).any()
    assert (staged["depth"] != 0xFFFF).any()
    _assert_frames_equal(staged, got)


def test_matches_staged_from_inside_cave(weird_world):
    """Camera inside the cave tunnel: all-hit frame, bounce-heavy."""
    fused, tables = weird_world
    uni = _uniforms((1.0, 1.0, -33.0), -0.1)
    staged, got = _frames(fused, tables, uni, 24, 2)
    _assert_frames_equal(staged, got)


def test_slotted_levels_identical(weird_world):
    """Narrow slotted views (R up to the grid size) must not change any
    pixel: collisions only delay rays, never reorder results.  A delayed
    ray sees fewer rounds, so the budget must be generous enough that no
    path exhausts in either variant (the documented contract: slotting
    can exhaust a ray EARLIER than the plain loop, never later — at a
    tight budget exactly one grazing pixel in this scene does)."""
    fused, tables = weird_world
    uni = _uniforms((0.0, -80.0, 40.0), -0.4)
    bn = jnp.asarray(get_blue_noise_f32())
    # 64x64 = 4096 rays = 2 tiles -> grid 2 admits R=2.
    base = {
        k: np.asarray(v)
        for k, v in render_gbuffers_path(
            fused, tables, bn, uni, 64, 64, _STEPS, bounces=2,
            levels=((1, None),),
        ).items()
    }
    slotted = {
        k: np.asarray(v)
        for k, v in render_gbuffers_path(
            fused, tables, bn, uni, 64, 64, _STEPS, bounces=2,
            levels=((1, 2), (2, None)),
        ).items()
    }
    assert not (base["depth"] == 256 * 254).any()
    assert not (slotted["depth"] == 256 * 254).any()
    for k in base:
        np.testing.assert_array_equal(slotted[k], base[k], err_msg=k)


def test_exhaustion_reports_pink(weird_world):
    """A tiny round budget cuts primary legs mid-flight: the REPORT_ERROR
    analog (pink fog, near-max depth) must fire and the frame stay
    finite.  safety=0 pins the raw schedule (production's safety drain
    exists precisely to rescue these rays)."""
    fused, tables = weird_world
    uni = _uniforms((0.0, -80.0, 12.0), -0.02)  # grazing the slab surface
    bn = jnp.asarray(get_blue_noise_f32())
    gb = render_gbuffers_path(
        fused, tables, bn, uni, 24, 24, 512, bounces=2, rounds=1,
        safety=0,
    )
    depth = np.asarray(gb["depth"])
    fog = np.asarray(gb["fog"])
    assert (depth == 256 * 254).any()
    pink = depth == 256 * 254
    np.testing.assert_array_equal(
        fog[pink], np.tile([1.0, 0.0, 1.0], (pink.sum(), 1))
    )
    for k, v in gb.items():
        assert np.isfinite(np.asarray(v, np.float32)).all(), k


def test_row_band_matches_full_frame(weird_world):
    """row0/rows band rendering (the multi-chip tile split contract) must
    reproduce the corresponding rows of the full frame bit-for-bit."""
    fused, tables = weird_world
    uni = _uniforms((0.0, -80.0, 40.0), -0.4)
    bn = jnp.asarray(get_blue_noise_f32())
    full = {
        k: np.asarray(v)
        for k, v in render_gbuffers_path(
            fused, tables, bn, uni, 32, 32, 512, bounces=1
        ).items()
    }
    band = {
        k: np.asarray(v)
        for k, v in render_gbuffers_path(
            fused, tables, bn, uni, 32, 32, 512, bounces=1, row0=8, rows=16
        ).items()
    }
    for k in full:
        np.testing.assert_array_equal(band[k], full[k][8:24], err_msg=k)


def test_exhaustion_contract_at_budget_boundary(weird_world):
    """Pin the one-sided exhaustion contract (module docstring) AT the
    budget boundary, not just away from it:

      1. at matched budgets (path rounds = legs * ceil(steps / cap), each
         round granting up to ``cap`` kernel steps) the plain path loop
         never exhausts a primary the staged path completes: the shared
         budget lets a ray redistribute rounds between legs, so any ray
         that fits every staged per-leg cap fits the shared budget too
         (here the staged path cuts >1000 grazing primaries at steps=64
         while the path loop completes every one);
      2. under an explicit tiny ``rounds=`` budget, slotted narrowing only
         ADDS casualties relative to the plain loop (collisions delay
         rays, shrinking the rounds a ray actually sees) — never removes
         any;
      3. every exhausted primary reports the REPORT_ERROR pink-pixel
         analog (raytrace.comp:5-7,387-400) and the frame stays finite;
      4. primaries that survive the harshest slotting at the tiny budget
         produce bit-identical discrete G-buffers to the staged pipeline
         (depth/normal/albedo are pure functions of the primary march,
         which is memoryless in position/direction).

    All renders pass safety=0: the contract governs the raw schedule; the
    production safety drain sits on top and only ever removes casualties.
    """
    fused, tables = weird_world
    # Grazing the slab surface: wide spread of per-ray round counts.
    uni = _uniforms((0.0, -80.0, 12.2), -0.02)
    bn = jnp.asarray(get_blue_noise_f32())
    steps = 64
    PINK = 256 * 254

    def exhausted(gb):
        return np.asarray(gb["depth"]) == PINK

    # --- clause 1: matched budgets -------------------------------------
    staged = render_gbuffers_vol(
        fused, tables, bn, uni, 64, 64, steps, bounces=2
    )
    plain = render_gbuffers_path(
        fused, tables, bn, uni, 64, 64, steps, bounces=2,
        levels=((1, None),), safety=0,
    )
    ex_staged = exhausted(staged)
    ex_plain = exhausted(plain)
    assert ex_staged.any()  # the boundary actually bites the staged path
    assert not (ex_plain & ~ex_staged).any()

    # --- clauses 2-4: explicit tiny budget, harshest feasible slotting
    # (one full round, then R=2 slots: every collision halves a ray's
    # rounds; a 64x64 frame is 2 tiles, so grid 2 admits R=2).
    rounds = 3
    plain_t = render_gbuffers_path(
        fused, tables, bn, uni, 64, 64, steps, bounces=2,
        levels=((1, None),), rounds=rounds, safety=0,
    )
    slotted_t = render_gbuffers_path(
        fused, tables, bn, uni, 64, 64, steps, bounces=2,
        levels=((1, 1), (2, None)), rounds=rounds, safety=0,
    )
    ex_plain_t = exhausted(plain_t)
    ex_slot_t = exhausted(slotted_t)
    # Preconditions: both exhaust, and slotting adds real casualties.
    assert ex_plain_t.any()
    assert (ex_slot_t & ~ex_plain_t).any()
    # 2. slotting never rescues a ray the plain loop cuts.
    assert not (ex_plain_t & ~ex_slot_t).any()

    # 3. pink fog on every exhausted primary; frames finite.
    for gb, ex in ((plain_t, ex_plain_t), (slotted_t, ex_slot_t)):
        fog = np.asarray(gb["fog"])
        np.testing.assert_array_equal(
            fog[ex], np.tile([1.0, 0.0, 1.0], (ex.sum(), 1))
        )
        assert np.isfinite(np.asarray(gb["lighting"])).all()

    # 4. survivors bit-identical to the staged pipeline on the discrete
    # buffers (where both completed).
    ok = ~ex_slot_t & ~ex_staged
    assert ok.any()
    for k in ("depth", "normal"):
        np.testing.assert_array_equal(
            np.asarray(slotted_t[k])[ok], np.asarray(staged[k])[ok],
            err_msg=k,
        )
    np.testing.assert_array_equal(
        np.asarray(slotted_t["albedo"])[ok], np.asarray(staged["albedo"])[ok]
    )


def test_per_level_caps_match_uniform_cap(weird_world):
    """(R, budget, cap) 3-tuples: a schedule that splits the step budget
    across levels with per-level caps must reproduce the uniform-cap
    frame exactly when every ray terminates within budget — the kernel
    march is memoryless in position/direction, so WHERE the cap
    boundaries fall cannot change any hit."""
    fused, tables = weird_world
    uni = _uniforms((0.0, -80.0, 40.0), -0.4)
    bn = jnp.asarray(get_blue_noise_f32())
    base = {
        k: np.asarray(v)
        for k, v in render_gbuffers_path(
            fused, tables, bn, uni, 64, 64, _STEPS, bounces=1,
            levels=((1, None),), cap=256,
        ).items()
    }
    split = {
        k: np.asarray(v)
        for k, v in render_gbuffers_path(
            fused, tables, bn, uni, 64, 64, _STEPS, bounces=1,
            levels=((1, 3, 64), (1, None, 256)), cap=256,
        ).items()
    }
    assert not (base["depth"] == 256 * 254).any()
    assert not (split["depth"] == 256 * 254).any()
    for k in base:
        np.testing.assert_array_equal(split[k], base[k], err_msg=k)


def test_per_legs_default_schedule(weird_world):
    """levels=None / cap=None resolve to the bounce preset's tuned
    schedule: bounces=0 gets PATH_LEVELS_B0/DEFAULT_CAP_B0, deeper
    presets keep PATH_LEVELS/DEFAULT_CAP (probes/out/r5_session1.log:
    the 5-leg schedule is ~1.7x slower on single-leg frames)."""
    from raytrace_tpu.ops.path_vol import (
        DEFAULT_CAP_B0,
        PATH_LEVELS_B0,
    )

    fused, tables = weird_world
    uni = _uniforms((0.0, -80.0, 40.0), -0.4)
    bn = jnp.asarray(get_blue_noise_f32())
    implicit = render_gbuffers_path(
        fused, tables, bn, uni, 32, 32, _STEPS, bounces=0
    )
    explicit = render_gbuffers_path(
        fused, tables, bn, uni, 32, 32, _STEPS, bounces=0,
        levels=PATH_LEVELS_B0, cap=DEFAULT_CAP_B0,
    )
    for k in implicit:
        np.testing.assert_array_equal(
            np.asarray(explicit[k]), np.asarray(implicit[k]), err_msg=k
        )


@pytest.fixture(scope="module")
def single_chunk_world():
    """The apps/benchmark config-1 scene: one generated 64^3 chunk floating
    in an otherwise maximally-empty volume (minefield 6 everywhere else)."""
    from raytrace_tpu.world.generate import generate_chunk

    mats, mf = generate_chunk((0, 0, 0), seed=0)
    vol_m = jnp.zeros((256, 256, 256), jnp.uint32)
    vol_f = jnp.full((256, 256, 256), 6, jnp.uint8)
    vol_m = vol_m.at[128:192, 128:192, 128:192].set(mats)
    vol_f = vol_f.at[128:192, 128:192, 128:192].set(mf)
    fused = fuse_volume(vol_m, vol_f)
    return fused, build_vol_tables(fused)


def test_b0_default_schedule_cuts_no_rays(single_chunk_world):
    """The PRODUCTION bounces=0 defaults must not exhaust rays that a flat
    schedule converges within the same max_steps.

    Regression pin for the round-5 session-3 tuning mistake: a b0 schedule
    chosen on timing alone exhausted 31% of primaries on this very scene
    (magenta frame) because its grazing view keeps ~58% of rays live past
    the first round (one mixed-brick crossing per round along the terrain
    surface) and the narrowed levels' slot capacity was far below that
    live curve.  128^2 is the smallest frame where the narrow levels are
    feasible at all (smaller grids drop them from the schedule), i.e. the
    smallest frame that can regress this way.
    """
    fused, tables = single_chunk_world
    bn = jnp.asarray(get_blue_noise_f32())
    uni = _uniforms((32.0, -40.0, 60.0), -0.5)
    got = render_gbuffers_path(
        fused, tables, bn, uni, 128, 128, 1024, bounces=0
    )
    ref = render_gbuffers_path(
        fused, tables, bn, uni, 128, 128, 1024, bounces=0,
        levels=((1, None),), cap=224, rounds=8,
    )
    ref = {k: np.asarray(v) for k, v in ref.items()}
    got = {k: np.asarray(v) for k, v in got.items()}
    assert int((ref["depth"] == 65024).sum()) == 0, "reference not converged"
    assert int((got["depth"] == 65024).sum()) == 0, (
        "production b0 defaults exhaust rays the flat schedule converges"
    )
    _assert_frames_equal(ref, got)
