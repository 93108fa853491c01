"""Pallas TPU path-trace kernel (the hot tracer).

Replaces the XLA gather-based DDA (ops/trace_jax.py) for procedurally
generated worlds.  The reference's per-voxel minefield walk
(raytrace.comp:82-183) is memory-bound random access — the worst workload
for a TPU, where arbitrary per-lane gathers have no fast primitive.  This
kernel keeps the exact hit semantics while touching no volume memory at all:

  * Coarse skips use a 2-D "column-height pyramid": hmax_k[by, bx] is the
    maximum solid height over a 2^k x 2^k block of columns (+1 safety
    margin).  A 2^k-aligned cube is empty iff its bottom z >= hmax_k — the
    same invariant as the reference minefield, derived from the heightfield
    structure of the world (solid iff z < max(H(x,y), 0), see
    world/generate.py).  The pyramid levels are tiny (64/256/1024 entries)
    and live in VMEM; per-lane lookups are composed from 128-wide
    `dynamic_gather` lane shuffles (Mosaic's native gather form).
  * The fine phase marches columns: one analytic height evaluation (the
    worldgen noise, pure VPU arithmetic) per column entered, with exact
    crossing of the z = H surface or the column's x/y walls.  Per-voxel DDA
    inside a column is equivalent to this closed form because a column's
    occupancy is a single interval [0_or_below, H).
  * Hit materials are the worldgen band function (generate.py) evaluated at
    the hit voxel — bit-identical to the packed volume contents.

Toroidal streaming, bounds (|pos - lr| >= 128 -> sky), normals, the 1e-4
boundary epsilon, and the 0.001 hit nudge all match raytrace.comp; golden
tests compare against both the NumPy oracle and the volume tracer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_TRACE_STEPS, ROOT_BLOCK_SIZE
from ..world.heightmap import (
    LATTICE_SPACING,
    dequant_lattice,
    height_from_lattice,
    heightmap_grid,
    lattice_fields_q,
)

_HALF = ROOT_BLOCK_SIZE // 2  # 128
LANES = 128

# Pyramid levels (block sizes 8, 16, 32 columns).
LEVELS = (3, 4, 5)


# ---------------------------------------------------------------------------
# Table construction (plain JAX; runs once per streaming move)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("seed",))
def build_hf_tables(lr, seed: int = 0):
    """Column-height pyramid + lattice-field tables for the region at lr.

    Returns dict with flattened i32 tables, one word per 8-column block
    (32x32 blocks -> (8, 128) each):
      'h3'   — packed 8/16/32-level column-height maxima (+1 margin, which
               makes the pyramid conservative against any last-ulp
               disagreement between this builder and the in-kernel height);
      'hsub' — per-quadrant 4-block hmax deltas;
      'cA'..'cD' — the block's four terrain-lattice corner values
               (r16 | e16 << 16, see world/heightmap.lattice_fields_q), from
               which the kernel reconstructs exact column heights with one
               bilinear + one analytic octave;
    plus the region origin 'r0' (2,) i32.  r0 = lr - 128 must be a multiple
    of LATTICE_SPACING so block corners land on the global lattice — the
    streaming layer guarantees it (region offsets move on the 16-voxel
    slice grid, render/streaming.py).
    """
    lr = jnp.asarray(lr, jnp.int32)
    r0 = lr[:2] - _HALF
    h = heightmap_grid(r0[0], r0[1], (ROOT_BLOCK_SIZE, ROOT_BLOCK_SIZE), seed=seed)
    hs = jnp.maximum(h, 0) + 1  # solid ceiling + safety margin

    def pool(x, k):
        n = ROOT_BLOCK_SIZE >> k
        return x.reshape(n, 1 << k, n, 1 << k).max((1, 3))

    h2 = pool(hs, 2)  # (64, 64) hmax over 4-blocks
    h3v = pool(hs, 3)  # (32, 32) hmax over 8-blocks
    h4v = pool(hs, 4)  # (16, 16) hmax over 16-blocks
    h5v = pool(hs, 5)  # (8, 8) hmax over 32-blocks

    # One packed word per 8-block carries the whole pyramid: bits 0-8 the
    # 8-block hmax, 9-17 the containing 16-block's, 18-26 the containing
    # 32-block's (heights < 512; see WORLDGEN_HEIGHT_MUL).  classify() then
    # costs a single 1024-entry lookup (8 lane-shuffle rounds) instead of
    # three lookups over separate per-level tables (11 rounds).
    h16at8 = jnp.repeat(jnp.repeat(h4v, 2, 0), 2, 1)
    h32at8 = jnp.repeat(jnp.repeat(h5v, 4, 0), 4, 1)
    h3 = (h3v | (h16at8 << 9) | (h32at8 << 18)).astype(jnp.int32).reshape(8, 128)

    # Sub-block deltas: each 8-block packs its four 4-block hmax values as
    # (hmax8 - hmax4) clamped to u8, one per byte.  The kernel's fine phase
    # recovers hmax4 from the single 1024-entry h3 lookup instead of a
    # 4096-entry table (8 shuffle rounds instead of 32).  Clamping only
    # under-reports the delta -> conservative (never skips real terrain).
    delta = jnp.clip(h3v[:, :, None, None] - h2.reshape(32, 2, 32, 2).transpose(0, 2, 1, 3), 0, 255)
    q = (delta[..., 0, 0]
         | (delta[..., 0, 1] << 8)
         | (delta[..., 1, 0] << 16)
         | (delta[..., 1, 1] << 24))
    hsub = q.astype(jnp.int32).reshape(8, 128)

    # Terrain-lattice corner tables: the 33x33 global lattice points covering
    # the region, packed one word per point, gathered per block corner.
    nl = ROOT_BLOCK_SIZE // LATTICE_SPACING  # 32 blocks per side
    lx = r0[0] + jnp.arange(nl + 1, dtype=jnp.int32)[None, :] * LATTICE_SPACING
    ly = r0[1] + jnp.arange(nl + 1, dtype=jnp.int32)[:, None] * LATTICE_SPACING
    r16, e16 = lattice_fields_q(
        jnp.broadcast_to(lx, (nl + 1, nl + 1)),
        jnp.broadcast_to(ly, (nl + 1, nl + 1)),
        seed,
    )
    w = (r16 | (e16 << 16)).astype(jnp.int32)
    corners = {
        "cA": w[:nl, :nl],  # (y0, x0)
        "cB": w[:nl, 1:],   # (y0, x1)
        "cC": w[1:, :nl],   # (y1, x0)
        "cD": w[1:, 1:],    # (y1, x1)
    }
    tables = {k: v.reshape(8, 128) for k, v in corners.items()}
    tables.update({"hsub": hsub, "h3": h3, "r0": r0})
    return tables


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------


def _lut(table, idx):
    """Per-lane lookup of a small table from (W, 128)-shaped VMEM.

    idx: (S, 128) int32 in [0, W*128).  Composed from Mosaic's native
    within-row `dynamic_gather` (take_along_axis axis=1 at 128 lanes) plus
    row selects — W rounds total.
    """
    return _lut_many((table,), idx)[0]


def _lut_many(tables, idx):
    """Per-lane lookup of several same-shape (W, 128) tables at one index.

    The row-select masks (`hi == w`) are computed once and shared across all
    tables, so N tables cost W * (1 compare + N gathers + N selects) instead
    of N full lookups.
    """
    rows = tables[0].shape[0]
    s = idx.shape[0]
    hi = idx >> 7
    lo = idx & 127
    outs = [jnp.zeros(idx.shape, t.dtype) for t in tables]
    for w in range(rows):
        m = hi == w
        for k, t in enumerate(tables):
            row = jnp.broadcast_to(t[w][None, :], (s, LANES))
            g = jnp.take_along_axis(row, lo, axis=1)
            outs[k] = jnp.where(m, g, outs[k])
    return outs


def _height_from_corners(ca, cb, cc, cd, xi, yi, seed):
    """Exact column height from the block's packed lattice-corner words.

    Bilinear interpolation of the quantized lattice fields (the world-v2
    definition, world/heightmap.py) + the analytic top octave — the same
    jnp program XLA runs in heightmap_grid, so builder and kernel agree to
    the last ulp modulo instruction-fusion differences (absorbed by the +1
    pyramid margin and tolerance-based goldens).
    """
    tx = (xi & 7).astype(jnp.float32) * jnp.float32(1.0 / LATTICE_SPACING)
    ty = (yi & 7).astype(jnp.float32) * jnp.float32(1.0 / LATTICE_SPACING)

    def dq(word):
        return dequant_lattice(word & 0xFFFF, (word >> 16) & 0xFFFF)

    (r00, e00), (r10, e10), (r01, e01), (r11, e11) = dq(ca), dq(cb), dq(cc), dq(cd)

    def bil(v00, v10, v01, v11):
        top = v00 + tx * (v10 - v00)
        bot = v01 + tx * (v11 - v01)
        return top + ty * (bot - top)

    r = bil(r00, r10, r01, r11)
    e = bil(e00, e10, e01, e11)
    from ..constants import WORLDGEN_SCALE

    fx = xi.astype(jnp.float32) / WORLDGEN_SCALE
    fy = yi.astype(jnp.float32) / WORLDGEN_SCALE
    return height_from_lattice(r, e, fx, fy, seed)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(tile_rows: int, max_steps: int, seed: int, unified: bool = False):
    S = tile_rows

    def kernel(
        scalars_ref,  # SMEM (8,) int32: r0x, r0y, lrx, lry, lrz
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (S,128) f32
        n0_ref,  # (S,128) i32 initial normal (0 for fresh rays; resume state)
        hsub_ref, h3_ref,  # pyramid tables (packed; see build_hf_tables)
        ca_ref, cb_ref, cc_ref, cd_ref,  # lattice corner tables
        px_ref, py_ref, pz_ref, normal_ref, air_ref, packed_ref, done_ref,
    ):
        r0x = scalars_ref[0]
        r0y = scalars_ref[1]
        lrx = scalars_ref[2]
        lry = scalars_ref[3]
        lrz = scalars_ref[4]
        lrf = (
            jnp.float32(lrx),
            jnp.float32(lry),
            jnp.float32(lrz),
        )

        dxv, dyv, dzv = dx_ref[:], dy_ref[:], dz_ref[:]
        # Normalize (callers may pass unnormalized directions).
        inv_len = jax.lax.rsqrt(jnp.maximum(dxv * dxv + dyv * dyv + dzv * dzv, 1e-20))
        dxv, dyv, dzv = dxv * inv_len, dyv * inv_len, dzv * inv_len

        lpx = jnp.float32(1.0) / jnp.abs(dxv)
        lpy = jnp.float32(1.0) / jnp.abs(dyv)
        lpz = jnp.float32(1.0) / jnp.abs(dzv)
        mulx = jnp.where(dxv > 0, jnp.float32(-1.0), jnp.float32(1.0))
        muly = jnp.where(dyv > 0, jnp.float32(-1.0), jnp.float32(1.0))
        mulz = jnp.where(dzv > 0, jnp.float32(-1.0), jnp.float32(1.0))
        nx_id = jnp.where(dxv > 0, jnp.int32(1), jnp.int32(0))
        ny_id = jnp.where(dyv > 0, jnp.int32(3), jnp.int32(2))
        nz_id = jnp.where(dzv > 0, jnp.int32(5), jnp.int32(4))

        hsub = hsub_ref[:]
        h3 = h3_ref[:]
        cA, cB, cC, cD = ca_ref[:], cb_ref[:], cc_ref[:], cd_ref[:]

        eps = jnp.float32(1e-4)

        def boundary_dist(p, mul, lp, step_f):
            """Distance along the ray to the next step-aligned boundary."""
            m = jnp.mod((p + jnp.float32(_HALF)) * mul, step_f)
            return (eps + m) * lp

        def classify(px, py, pz):
            """Safe coarse step size from the pyramid (phase C)."""
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
            ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
            # Block empty iff its aligned z-bottom >= hmax over its columns.
            # One packed lookup carries hmax for the 8/16/32 levels.
            i3 = (ry >> 3) * 32 + (rx >> 3)
            w = _lut(h3, i3)
            h8 = w & 511
            # Rising-ray rule (see body_f).  classify and body_f MUST agree
            # on step sizes: the phase hysteresis parks C-lanes when
            # step < 8 and F-lanes when step >= 8, so a rule applied in only
            # one of them ping-pongs a lane between phases without moving
            # until the step budget exhausts.
            up = dzv >= 0
            z32 = jnp.where(up, zi, (zi >> 5) << 5)
            z16 = jnp.where(up, zi, (zi >> 4) << 4)
            z8 = jnp.where(up, zi, (zi >> 3) << 3)
            e32 = z32 >= ((w >> 18) & 511)
            e16 = z16 >= ((w >> 9) & 511)
            e8 = z8 >= h8
            return jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))

        def advance(s, lx, ly, lz, move, hit_now, hcol):
            """Shared move + bounds/hit bookkeeping for both loop phases."""
            use_x = (lx < ly) & (lx < lz)
            use_y = ~(lx < ly) & (ly < lz)
            lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
            nrm = jnp.where(use_x, nx_id, jnp.where(use_y, ny_id, nz_id))

            npx = jnp.where(move, s["px"] + dxv * lmin, s["px"])
            npy = jnp.where(move, s["py"] + dyv * lmin, s["py"])
            npz = jnp.where(move, s["pz"] + dzv * lmin, s["pz"])
            nnormal = jnp.where(move, nrm, s["normal"])

            oob = (
                (jnp.abs(npx - lrf[0]) >= jnp.float32(_HALF))
                | (jnp.abs(npy - lrf[1]) >= jnp.float32(_HALF))
                | (jnp.abs(npz - lrf[2]) >= jnp.float32(_HALF))
            )
            new_air = move & oob
            done = s["done"] | new_air.astype(jnp.int32) | hit_now.astype(jnp.int32)
            return dict(
                i=s["i"] + 1,
                px=npx,
                py=npy,
                pz=npz,
                normal=nnormal,
                air=s["air"] | new_air.astype(jnp.int32),
                done=done,
                hit_h=jnp.where(hit_now, hcol, s["hit_h"]),
                parked=s["parked"],
            )

        state = dict(
            i=jnp.int32(0),
            px=ox_ref[:],
            py=oy_ref[:],
            pz=oz_ref[:],
            normal=n0_ref[:],
            air=jnp.zeros((S, LANES), jnp.int32),
            done=jnp.zeros((S, LANES), jnp.int32),
            hit_h=jnp.zeros((S, LANES), jnp.int32),  # height of hit column
            parked=jnp.zeros((S, LANES), jnp.int32),
        )

        # The traversal alternates two masked loop phases (Mosaic has no
        # usable lax.cond, so conditional work is skipped by phase, not by
        # branch):
        #   Phase C (coarse): pyramid steps only, no height evaluations;
        #     lanes entering a non-empty 8-block park.
        #   Phase F (fine): per-column march with one analytic height eval
        #     per iteration; lanes escaping to an empty 8-block park.
        # An outer loop alternates until every lane is done, so a bounce ray
        # pays the expensive evaluations only while it is actually near
        # terrain.

        def cond_c(s):
            live = (s["done"] == 0) & (s["parked"] == 0)
            return (s["i"] < max_steps) & (jnp.sum(live.astype(jnp.int32)) > 0)

        def body_c(s):
            act = (s["done"] == 0) & (s["parked"] == 0)
            step = classify(s["px"], s["py"], s["pz"])
            # Hysteresis: C hands over anything below an 8-step; F keeps
            # lanes until they reach an 8-step.  Without the band, lanes at
            # the terrain fringe thrash between phases every iteration.
            near = step < 8
            parked = s["parked"] | (act & near).astype(jnp.int32)
            step_f = jnp.maximum(step, 1).astype(jnp.float32)
            lx = boundary_dist(s["px"], mulx, lpx, step_f)
            ly = boundary_dist(s["py"], muly, lpy, step_f)
            lz = boundary_dist(s["pz"], mulz, lpz, step_f)
            move = act & ~near
            s = dict(s, parked=parked)
            return advance(
                s, lx, ly, lz, move, jnp.zeros((S, LANES), bool), s["hit_h"]
            )

        def cond_f(s):
            live = (s["done"] == 0) & (s["parked"] == 0)
            return (s["i"] < max_steps) & (jnp.sum(live.astype(jnp.int32)) > 0)

        def body_f(s):
            act = (s["done"] == 0) & (s["parked"] == 0)
            px, py, pz = s["px"], s["py"], s["pz"]
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
            ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
            i3 = (ry >> 3) * 32 + (rx >> 3)
            # One shared-mask gather round serves all six per-block tables:
            # the pyramid word, the 4-block deltas, and the four terrain-
            # lattice corners the exact column height interpolates from.
            w, word, ca, cb, cc, cd = _lut_many((h3, hsub, cA, cB, cC, cD), i3)
            h8 = w & 511
            # Rising rays (dz >= 0) compare their CURRENT voxel z against the
            # block max heights instead of the 2^k slab floor: z never drops
            # below zi again, so a climbing ray coarse-steps the whole way
            # out.  Must mirror lighting_pallas.body_u exactly — the fused
            # and staged tracers keep bit-identical step sequences (the
            # fused-vs-staged goldens assert exact normal/albedo equality).
            up = dzv >= 0
            z32 = jnp.where(up, zi, (zi >> 5) << 5)
            z16 = jnp.where(up, zi, (zi >> 4) << 4)
            z8 = jnp.where(up, zi, (zi >> 3) << 3)
            z4 = jnp.where(up, zi, (zi >> 2) << 2)
            e32 = z32 >= ((w >> 18) & 511)
            e16 = z16 >= ((w >> 9) & 511)
            e8 = z8 >= h8
            step = jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))
            # Refine with the 4-block level: grazing rays in the terrain
            # fringe advance 4 voxels per iteration instead of marching
            # single columns (the dominant secondary-ray cost).  The 4-block
            # hmax is reconstructed from the 8-block value and a packed
            # per-quadrant byte delta.
            quad = (((ry >> 2) & 1) << 1) | ((rx >> 2) & 1)
            delta = (word >> (quad << 3)) & 255
            e4 = z4 >= (h8 - delta)
            step = jnp.where(step == 0, jnp.where(e4, 4, 0), step)
            fine = step == 0
            if unified:
                parked = s["parked"]
            else:
                # Hysteresis: lanes reaching a >=8 step park for phase C;
                # step-4 lanes keep moving here with coarse steps.
                parked = s["parked"] | (act & (step >= 8)).astype(jnp.int32)
                act = act & (step < 8)

            hcol = jnp.maximum(
                _height_from_corners(ca, cb, cc, cd, xi, yi, seed), 0
            )
            # Entered a solid voxel (z < column height): hit now, with the
            # normal set by the previous move (reference samples after the
            # move, raytrace.comp:137-159).
            hit_now = act & fine & (zi < hcol)

            # Fine move: next column wall (step 1 in x/y) or the z = hcol
            # top surface for descending rays above the terrain; step-8
            # lanes take the 8-aligned coarse move instead.
            step_f = jnp.maximum(step, 1).astype(jnp.float32)
            lxc = boundary_dist(px, mulx, lpx, step_f)
            lyc = boundary_dist(py, muly, lpy, step_f)
            lzc = boundary_dist(pz, mulz, lpz, step_f)
            lxf = boundary_dist(px, mulx, lpx, jnp.float32(1.0))
            lyf = boundary_dist(py, muly, lpy, jnp.float32(1.0))
            ztop = hcol.astype(jnp.float32)
            lzf = jnp.where(
                (dzv < 0) & (pz >= ztop),
                (eps + (pz - ztop)) * lpz,
                jnp.float32(jnp.inf),
            )
            lx = jnp.where(fine, lxf, lxc)
            ly = jnp.where(fine, lyf, lyc)
            lz = jnp.where(fine, lzf, lzc)

            move = act & ~hit_now
            s = dict(s, parked=parked)
            return advance(s, lx, ly, lz, move, hit_now, hcol)

        def outer_cond(s):
            return (s["i"] < max_steps) & (jnp.sum(s["done"]) < S * LANES)

        def outer_body(s):
            s = dict(s, parked=jnp.zeros((S, LANES), jnp.int32))
            s = jax.lax.while_loop(cond_c, body_c, s)
            s = dict(s, parked=s["done"])  # only undone lanes run fine
            s = jax.lax.while_loop(cond_f, body_f, s)
            return s

        if unified:
            # Single-loop variant: every iteration runs the full fine-phase
            # body (the lattice-table height made it cheap enough), so lanes
            # in coarse space and lanes marching columns progress TOGETHER —
            # no phase parking, no idle lanes waiting for the other phase.
            # body_f with parked pinned to done handles every step size.
            s = jax.lax.while_loop(cond_f, body_f, dict(state, parked=state["done"]))
        else:
            s = jax.lax.while_loop(outer_cond, outer_body, state)

        px_ref[:] = s["px"]
        py_ref[:] = s["py"]
        pz_ref[:] = s["pz"]
        normal_ref[:] = s["normal"]
        air_ref[:] = s["air"]
        done_ref[:] = s["done"]

        # Hit material: the worldgen band at the hit voxel (generate.py).
        hitm = (s["done"] == 1) & (s["air"] == 0)
        xi = jnp.floor(s["px"]).astype(jnp.int32)
        yi = jnp.floor(s["py"]).astype(jnp.int32)
        zi = jnp.floor(s["pz"]).astype(jnp.int32)
        packed = _packed_material(xi, yi, zi, seed)
        packed_ref[:] = jnp.where(hitm, packed, jnp.uint32(0)).astype(jnp.uint32)

    return kernel


def _packed_material(xi, yi, zi, seed):
    """Packed u32 material of a solid voxel (world/generate.py semantics)."""
    from ..materials import PACKED_MATERIALS
    from ..world.generate import material_band
    from ..world.noise import hash3_u32

    bits = hash3_u32(xi, yi, zi, seed + 1)
    band = material_band(zi, bits)
    grass = jnp.uint32(int(PACKED_MATERIALS[2]))
    rock = jnp.uint32(int(PACKED_MATERIALS[5]))
    snow = jnp.uint32(int(PACKED_MATERIALS[6]))
    return jnp.where(band == 2, grass, jnp.where(band == 5, rock, snow))


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


# Iteration-cap cascade for straggler compaction.  Per-tile cost is the max
# over the tile's 2048 rays, and a handful of terrain-grazing rays (p99 of
# per-ray steps ~50, max ~350) hold every tile hostage: the measured mean
# per-ray step count is ~17 but the mean tile max is ~120.  Each level runs
# every not-yet-finished ray for up to cap iterations; survivors are then
# sorted (stably, so spatial coherence survives) to the front and resumed at
# the next level, where the all-done suffix tiles exit at zero iterations.
# The final level always runs to max_steps.
COMPACT_CAPS = (16, 48, 160)


@functools.partial(
    jax.jit,
    static_argnames=("max_steps", "seed", "tile_rows", "interpret", "caps", "unified"),
)
def trace_rays_hf(
    tables: dict,
    origin: jax.Array,
    direction: jax.Array,
    lr: jax.Array,
    max_steps: int = MAX_TRACE_STEPS,
    seed: int = 0,
    tile_rows: int = 16,
    interpret: bool | None = None,
    caps: tuple = COMPACT_CAPS,
    active: jax.Array | None = None,
    unified: bool | None = None,
) -> dict[str, jax.Array]:
    """Heightfield-accelerated trace; drop-in for trace_jax.trace_rays.

    origin/direction: (..., 3) float32.  `tables` from build_hf_tables —
    must correspond to the same lr.  Returns the same dict as trace_rays.
    interpret=None auto-selects interpreter mode off-TPU (CPU tests).
    caps: iteration caps of the compaction cascade (empty disables it; the
    DDA is memoryless in (position, direction), so a resumed ray retraces
    exactly).
    active: optional (...,) bool — rays with active=False are never traced
    (their outputs are arbitrary 'done' values the caller must mask, as the
    reference skips bounce legs for sky pixels, raytrace.comp:320-341).
    They are partitioned to the back before the first pass, so whole
    inactive tiles cost zero traversal iterations.
    """
    from ..ops import shading

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if unified is None:
        # Coherent primary batches (no active mask) profit from the unified
        # single-loop body; bounce legs with long open-sky travel profit
        # from the phased design's cheap coarse loop (no height evals).
        # Measured at 1080p bounces=1: phased-everywhere 242 ms,
        # unified-everywhere 277 ms.
        unified = active is None

    shape = origin.shape[:-1]
    n = 1
    for dim in shape:
        n *= dim
    per_tile = tile_rows * LANES
    n_pad = -(-n // per_tile) * per_tile
    grid = n_pad // per_tile

    def flat(x, pad_value=0.0):
        # Tail padding must form rays that terminate immediately: a zero
        # direction turns the first move into NaN (0 * inf) and the NaN
        # never passes the bounds test, spinning its tile for max_steps.
        f = x.reshape(n)
        f = jnp.pad(f, (0, n_pad - n), constant_values=pad_value)
        return f.reshape(grid * tile_rows, LANES)

    o = origin.reshape(n, 3)
    d = direction.reshape(n, 3)
    comps = [flat(o[:, 0]), flat(o[:, 1]), flat(o[:, 2], 1e9),
             flat(d[:, 0]), flat(d[:, 1]), flat(d[:, 2], 1.0)]
    zero_i = jnp.zeros((grid * tile_rows, LANES), jnp.int32)

    lri = jnp.asarray(lr, jnp.int32)
    scalars = jnp.stack(
        [tables["r0"][0], tables["r0"][1], lri[0], lri[1], lri[2],
         jnp.int32(0), jnp.int32(0), jnp.int32(0)]
    )

    ray_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = lambda t: pl.BlockSpec(
        t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.float32)
    out_i32 = jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.int32)
    out_u32 = jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.uint32)

    table_keys = ("hsub", "h3", "cA", "cB", "cC", "cD")

    def run_pass(steps, ox, oy, oz, dxx, dyy, dzz, n0):
        kernel = _make_kernel(tile_rows, steps, seed, unified)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [ray_spec] * 7
            + [table_spec(tables[k]) for k in table_keys],
            out_specs=[ray_spec] * 7,
            out_shape=[out_shape, out_shape, out_shape, out_i32, out_i32,
                       out_u32, out_i32],
            interpret=interpret,
        )(scalars, ox, oy, oz, dxx, dyy, dzz, n0,
          *(tables[k] for k in table_keys))

    levels = [c for c in caps if 0 < c < max_steps]
    if not levels and active is None:
        px, py, pz, normal, air, packed, _ = run_pass(max_steps, *comps, zero_i)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (grid * tile_rows, LANES), 0)
        iota = iota * LANES + jax.lax.broadcasted_iota(
            jnp.int32, (grid * tile_rows, LANES), 1
        )

        def rsort(key, ops):
            out = jax.lax.sort(
                (key.reshape(n_pad),) + tuple(x.reshape(n_pad) for x in ops),
                num_keys=1,
            )
            return tuple(x.reshape(grid * tile_rows, LANES) for x in out[1:])

        # Current-order state: ray resume data + accumulated results +
        # the map back to original ray order (cidx).  normal (3b), air (1b),
        # done (1b) and the hit material (21b, see materials.py packing)
        # travel in ONE i32 'meta' word so every re-partition sorts 8
        # payload operands instead of 11.
        cx, cy, cz = comps[0], comps[1], comps[2]
        cdx, cdy, cdz = comps[3], comps[4], comps[5]
        cmeta = zero_i
        cidx = iota
        if active is not None:
            # Born-done rays (the caller will mask their outputs).  The
            # level-0 sort below packs them into all-done suffix tiles.
            cmeta = flat(
                jnp.logical_not(active).reshape(n).astype(jnp.float32), 1.0
            ).astype(jnp.int32)

        for li, cap in enumerate(levels + [max_steps]):
            cdone = cmeta & 1
            if li > 0 or active is not None:
                # Stable partition: unfinished rays first, current order
                # preserved within each group (spatially coherent stragglers
                # stay together).  Single i32 key: done * n_pad + position
                # (n_pad * 2 < 2^31 for any realistic frame).
                key = cdone * jnp.int32(n_pad) + iota
                cx, cy, cz, cdx, cdy, cdz, cmeta, cidx = rsort(
                    key, (cx, cy, cz, cdx, cdy, cdz, cmeta, cidx)
                )
                cdone = cmeta & 1
            # Finished rays become insta-exit rays (far above the region):
            # all-done suffix tiles run zero traversal iterations.
            fin = cdone == 1
            iz = jnp.where(fin, jnp.float32(1e9), cz)
            idz = jnp.where(fin, jnp.float32(1.0), cdz)
            px, py, pz, nrm, air, pk, dn = run_pass(
                cap, cx, cy, iz, cdx, cdy, idz, (cmeta >> 2) & 7
            )
            # Merge: already-finished rays keep their carried results; the
            # rest take this pass's output (hit/air result, or resume state
            # for rays that are still live at the next level).
            meta_new = (
                pk.astype(jnp.int32) << 5 | (nrm & 7) << 2 | air << 1 | dn
            )
            cx = jnp.where(fin, cx, px)
            cy = jnp.where(fin, cy, py)
            cz = jnp.where(fin, cz, pz)
            cmeta = jnp.where(fin, cmeta, meta_new)

        # Back to original ray order: one more sort, keyed by the original
        # index (a 1M-element multi-operand sort is ~1 ms on TPU, where the
        # equivalent 6x scatter is tens of ms).
        cx, cy, cz, cmeta = rsort(cidx, (cx, cy, cz, cmeta))
        px, py, pz = cx, cy, cz
        normal = (cmeta >> 2) & 7
        air = (cmeta >> 1) & 1
        packed = (cmeta >> 5).astype(jnp.uint32)

    def unflat(x, dtype=None):
        f = x.reshape(n_pad)[:n].reshape(shape)
        return f if dtype is None else f.astype(dtype)

    pos = jnp.stack([unflat(px), unflat(py), unflat(pz)], axis=-1)
    normal = unflat(normal)
    air = unflat(air).astype(bool)
    packed = unflat(packed)

    distance = jnp.linalg.norm(origin - pos, axis=-1)
    nxv, nyv, nzv = shading.face_normal_vector(jnp, normal)
    pos = pos + jnp.float32(0.001) * jnp.stack([nxv, nyv, nzv], axis=-1)
    albedo = jnp.stack(
        [
            ((packed >> 14) & 0x7F).astype(jnp.float32) / 127.0,
            ((packed >> 7) & 0x7F).astype(jnp.float32) / 127.0,
            (packed & 0x7F).astype(jnp.float32) / 127.0,
        ],
        axis=-1,
    )
    hit = ~air & (packed != 0)
    return {
        "position": pos,
        "normal": normal,
        "air": air,
        "albedo": albedo,
        "distance": distance,
        "exhausted": ~air & ~hit,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_steps", "seed", "rows", "interpret", "bounces",
        "caps",
    ),
)
def render_gbuffers_hf(
    tables: dict,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    max_steps: int = MAX_TRACE_STEPS,
    seed: int = 0,
    row0=0,
    rows: int | None = None,
    interpret: bool | None = None,
    bounces: int = 2,
    caps: tuple = COMPACT_CAPS,
) -> dict[str, jax.Array]:
    """G-buffers via the Pallas heightfield tracer (hot path).

    Same lighting integration as the volume path (trace_jax.render_gbuffers)
    with the kernel swapped in; `tables` from build_hf_tables for the same
    region as uniforms['lr'].
    """
    from .trace_jax import integrate_gbuffers

    lr_i = uniforms["lr"].astype(jnp.int32)

    def trace(o, d, active=None):
        # Camera rays are tile-coherent (neighbors share step counts), so
        # the sort-based cascade only adds sort passes there — measured 3x
        # slower than a straight run.  Bounce legs (active is not None) have
        # born-done sky rays and heavy per-ray variance: the cascade wins.
        use_caps = () if active is None else caps
        return trace_rays_hf(
            tables, o, d, lr_i, max_steps=max_steps, seed=seed,
            interpret=interpret, caps=use_caps, active=active,
        )

    return integrate_gbuffers(
        trace, blue_noise, uniforms, width, height, row0, rows, bounces
    )
