"""Fast general-volume tracer: Pallas brick pyramid + XLA brick resolve.

Renders ARBITRARY 256^3 volume content (loaded worlds, user edits,
``preloaded_volume``) at speed — the capability the reference's minefield
DDA has on GPU (shaders/glsl/raytrace.comp:82-183) — without the
per-voxel-gather-per-step pattern that limits ops/trace_jax.py to
~1 Mray/s on TPU (see docs/DESIGN.md "Measured primitive costs").

Architecture (TPU-first, not a port):

  * ``build_vol_tables`` derives a 3-D occupancy pyramid from the volume's
    solidity bits: per 8^3 brick an ``any``/``all`` bit pair, plus ``any``
    bits at the 16/32/64-voxel levels.  The brick tables are tiny
    (1024/128/16/2 packed i32 words) and live in VMEM; per-lane lookups
    compose Mosaic's native 128-lane shuffle with row selects exactly like
    the heightfield pyramid (trace_pallas._lut_many).
  * The Pallas kernel runs a unified masked loop (no lax.cond — Mosaic):
    classify the current voxel's bricks, skip 8/16/32/64 through provably
    empty space, hit immediately inside all-solid bricks, and PARK when
    entering a *mixed* brick (partially solid) — the only case that needs
    per-voxel data.  Rays that clear the occupancy AABB moving away from
    it complete as air immediately (_occupancy_world_bounds — the
    general-content analog of the heightfield kernel's sky-escape and
    rising-ray rules).
  * Parked rays are resolved OUTSIDE the kernel by plain XLA: one row
    gather pulls each parked ray's 512-bit brick mask (16 i32 words from a
    (32768, 16) HBM table — row gathers run at ~81 GB/s where per-element
    gathers crawl), then a vectorized single-voxel DDA marches the ray
    through the brick in registers (<= 22 crossings).  Rays that exit
    unhit resume the kernel; ``trace_rays_vol`` alternates kernel passes
    and resolves inside a lax.while_loop that exits as soon as no ray is
    live, and a straggler cascade (2 full-width rounds, then live-first
    partitions shrinking the batch to 1/2 -> 1/4 -> 1/8 width,
    trace_pallas.COMPACT_CAPS style) keeps grazing rays from billing
    every round at full width.

Hit semantics (positions, face normals, the 1e-4 boundary epsilon, the
0.001 nudge on HIT positions, out-of-bounds => sky, toroidal texel =
(world + 128) mod 256 addressing) match ops/trace_jax.trace_rays /
raytrace.comp.  One deliberate divergence: the reference (and the sibling
tracers) nudge AIR results too, via the last-crossed normal
(raytrace.comp:166-180); here air and exhausted rays return their RAW
resume position, because consumers chaining exhausted resume points need
un-nudged positions to make progress (see the comment at the nudge site)
and no consumer reads air positions (secondary launches are hit-gated,
air depth is the 0xFFFF sentinel).  Golden tests compare the two tracers
on generated worlds AND on non-heightfield content (floating boxes,
caves) that the heightfield fast path cannot represent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_TRACE_STEPS, ROOT_BLOCK_SIZE
from .trace_jax import MATERIAL_MASK, STEP_SHIFT
from .trace_pallas import _lut, _lut_many

_HALF = ROOT_BLOCK_SIZE // 2  # 128
_N = ROOT_BLOCK_SIZE  # 256
LANES = 128

NB = _N // 8  # 32 bricks per side
NUM_BRICKS = NB * NB * NB  # 32768
DETAIL_WORDS = 512 // 32  # 16 i32 words of voxel bits per brick
# Detail rows are occupancy bits ONLY.  A round-2 experiment rode 4-bit
# material palette codes on the same rows (64 extra words) on the theory
# that row gathers are row-count bound; measured on hardware it was a
# 3.5x config-1 regression — every round's full-batch resolve paid the
# 5x-wider gather plus a 64-way strided word-select chain, ~+10 ms per
# round at 512² (probes/out/r3_cfg1_decomp.log: flat 14.3 ms/round vs
# ~4 pre-palette).  The hit material now comes from ONE end-of-trace
# element gather over the fused volume (~3 ms at 512², paid once, not
# per round).

# Kernel statuses carried per lane (also the meta-word bit layout of the
# wrapper: done | air<<1 | normal<<2 (3 bits) | parked<<5).
_DONE, _AIR, _PARKED = 1, 2, 32


def _pack_bits32(bits_flat):
    """Flat bool (32*k,) -> packed i32 (k,), bit i of word i >> 5."""
    b = bits_flat.reshape(-1, 32).astype(jnp.uint32)
    w = jnp.sum(b << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1)
    return w.astype(jnp.int32)


def _pack_pyramid(any8b, all8b):
    """(32,32,32) per-brick any/all bools -> packed any8/all8/any_hi."""
    t_any8 = _pack_bits32(any8b.reshape(-1)).reshape(8, 128)
    t_all8 = _pack_bits32(all8b.reshape(-1)).reshape(8, 128)
    any16 = any8b.reshape(16, 2, 16, 2, 16, 2).any((1, 3, 5))
    any32 = any16.reshape(8, 2, 8, 2, 8, 2).any((1, 3, 5))
    any64 = any32.reshape(4, 2, 4, 2, 4, 2).any((1, 3, 5))
    hi = jnp.zeros((2, 128), jnp.int32)
    hi = hi.at[0].set(_pack_bits32(any16.reshape(-1)))
    hi = hi.at[1, :16].set(_pack_bits32(any32.reshape(-1)))
    hi = hi.at[1, 64:66].set(_pack_bits32(any64.reshape(-1)))
    return t_any8, t_all8, hi


def _brick_major(x3):
    """(Z,Y,X) with dims multiples of 8 -> (n_bricks, 512) voxel-major rows
    ordered (bz, by, bx) with v = (lz<<6)|(ly<<3)|lx inside each brick."""
    z, y, x = x3.shape
    return (
        x3.reshape(z // 8, 8, y // 8, 8, x // 8, 8)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(-1, 512)
    )


def _detail_rows(solid3):
    """Per-brick detail rows (occupancy bits, 16 i32 words per brick)."""
    return _pack_bits32(_brick_major(solid3).reshape(-1)).reshape(
        -1, DETAIL_WORDS
    )


@jax.jit
def build_vol_tables(fused_flat: jax.Array) -> dict[str, jax.Array]:
    """Occupancy pyramid for an arbitrary fused volume (trace_jax layout).

    Returns dict:
      'any8', 'all8' — (8, 128) i32; bit (b & 31) of word (b >> 5) is the
          any/all-solid flag of brick b = ((tz>>3)*32 + (ty>>3))*32 + (tx>>3)
          in texel space;
      'any_hi' — (2, 128) i32; row 0 packs the 4096 16-level any bits
          (128 words); row 1 packs the 512 32-level bits (16 words, lanes
          0-15) and the 64 64-level bits (2 words, lanes 64-65);
      'detail' — (32768, 16) i32 per-brick voxel-solidity rows (bit
          v & 31 of word v >> 5 with v = (lz<<6)|(ly<<3)|lx); stays in
          HBM and is row-gathered once per resolve by the XLA resolve
          step.

    Rebuild whenever the whole volume changes; after a streamed 16-voxel
    slab write, prefer update_vol_tables (recomputes only the touched
    bricks).  'any8b'/'all8b' — (32,32,32) per-brick bools — are the
    incremental path's working state, and trace_rays_vol reads 'any8b' on
    every call to derive the occupancy-bounds escape box
    (_occupancy_world_bounds).  Solidity = minefield step == 0, matching
    trace_jax's hit test.
    """
    step = (fused_flat.reshape(_N, _N, _N) >> STEP_SHIFT).astype(jnp.int32)
    solid = step == 0  # (z, y, x) texel space

    any8b = solid.reshape(NB, 8, NB, 8, NB, 8).any((1, 3, 5))
    all8b = solid.reshape(NB, 8, NB, 8, NB, 8).all((1, 3, 5))
    t_any8, t_all8, hi = _pack_pyramid(any8b, all8b)

    detail = _detail_rows(solid)
    return {
        "any8": t_any8, "all8": t_all8, "any_hi": hi, "detail": detail,
        "any8b": any8b, "all8b": all8b,
    }


@functools.partial(jax.jit, static_argnames=("arr_axis",))
def update_vol_tables(
    tables: dict, fused_flat: jax.Array, t, arr_axis: int
) -> dict[str, jax.Array]:
    """Incremental table refresh after one streamed slab write.

    The streamer writes a SLICE_SIZE(16)-voxel-thick slab at texel start
    ``t`` along array axis ``arr_axis`` of the (z, y, x) volume
    (streaming._store_slab); only the two touched brick planes change, so
    recomputing them (1M voxels) beats the full 16.7M-voxel rebuild ~16x.
    Matches build_vol_tables(new volume) bit-exactly on every table.
    """
    vol3 = fused_flat.reshape(_N, _N, _N)
    t = jnp.asarray(t, jnp.int32)
    starts = [jnp.int32(0)] * 3
    starts[arr_axis] = t
    sizes = [_N] * 3
    sizes[arr_axis] = 16
    slab = jax.lax.dynamic_slice(vol3, starts, tuple(sizes))
    solid = ((slab >> STEP_SHIFT).astype(jnp.int32)) == 0

    bdims = tuple(s // 8 for s in sizes)
    pooled = solid.reshape(
        bdims[0], 8, bdims[1], 8, bdims[2], 8
    )
    sa = pooled.any((1, 3, 5))
    sf = pooled.all((1, 3, 5))
    bstarts = [jnp.int32(0)] * 3
    bstarts[arr_axis] = t >> 3
    any8b = jax.lax.dynamic_update_slice(tables["any8b"], sa, bstarts)
    all8b = jax.lax.dynamic_update_slice(tables["all8b"], sf, bstarts)
    t_any8, t_all8, hi = _pack_pyramid(any8b, all8b)

    rows = _detail_rows(solid)
    det4 = tables["detail"].reshape(NB, NB, NB, DETAIL_WORDS)
    det4 = jax.lax.dynamic_update_slice(
        det4,
        rows.reshape(bdims + (DETAIL_WORDS,)),
        bstarts + [jnp.int32(0)],
    )
    return {
        "any8": t_any8, "all8": t_all8, "any_hi": hi,
        "detail": det4.reshape(NUM_BRICKS, DETAIL_WORDS),
        "any8b": any8b, "all8b": all8b,
    }


def _occupancy_world_bounds(any8b: jax.Array, lr: jax.Array) -> jax.Array:
    """Per-axis world-space bounds of all occupied bricks: (6,) i32
    ``[xmin, xmax, ymin, ymax, zmin, zmax]`` with min inclusive and max
    exclusive, in world voxel coordinates inside the active window
    ``[lr - 128, lr + 128)``.

    The volume is toroidal (texel = (world + 128) mod 256), so a texel
    brick's world coordinate depends on ``lr``: slot ``bt`` starts at world
    ``lr - 128 + ((8*bt - lr) mod 256)``.  Exact for ANY integer lr — when
    the window isn't brick-aligned, the one slot straddling the wrap
    contributes both of its world pieces.  An empty volume yields an
    inverted box (min > max), which the kernel's escape test reads as
    "every ray is sky".

    This is the general-content analog of the heightfield kernel's
    sky-escape / rising-ray rules (ops/lighting_pallas.py): a ray at or
    beyond a bound and not moving back toward the box can never hit and
    completes as air without touching the tables.
    """
    occ = [any8b.any((0, 1)), any8b.any((0, 2)), any8b.any((1, 2))]  # x y z
    starts = jnp.arange(NB, dtype=jnp.int32) * 8
    big = jnp.int32(1) << 30
    out = []
    for axis in range(3):
        lr_a = lr[axis]
        lo_w = lr_a - _HALF
        w0 = jnp.mod(starts - lr_a, _N) + lo_w  # slot world start
        end = jnp.minimum(w0 + 8, lo_w + _N)
        rem = w0 + 8 - (lo_w + _N)  # > 0: slot wraps past the window end
        ob = occ[axis]
        mn = jnp.min(jnp.where(ob, w0, big))
        mx = jnp.max(jnp.where(ob, end, -big))
        wrapped = ob & (rem > 0)
        mn = jnp.where(jnp.any(wrapped), jnp.minimum(mn, lo_w), mn)
        mx = jnp.maximum(mx, jnp.max(jnp.where(wrapped, lo_w + rem, -big)))
        out += [mn, mx]
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# The Pallas coarse kernel
# ---------------------------------------------------------------------------


def _make_vol_kernel(tile_rows: int, max_steps: int, unroll: int = 2):
    S = tile_rows

    def kernel(
        iscal_ref,  # SMEM (10,) i32: lr (3), escape bounds (6), pad
        px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref, n0_ref,  # (S,128)
        any8_ref, all8_ref, hi_ref,  # pyramid tables
        opx_ref, opy_ref, opz_ref, onormal_ref, ostatus_ref,
    ):
        lrf = (
            jnp.float32(iscal_ref[0]),
            jnp.float32(iscal_ref[1]),
            jnp.float32(iscal_ref[2]),
        )
        # Occupancy world bounds (_occupancy_world_bounds): min inclusive,
        # max exclusive per axis.  Everything outside is provably air, so a
        # ray at/beyond a bound and not moving back toward the box escapes
        # to sky immediately.
        bxmin, bxmax = jnp.float32(iscal_ref[3]), jnp.float32(iscal_ref[4])
        bymin, bymax = jnp.float32(iscal_ref[5]), jnp.float32(iscal_ref[6])
        bzmin, bzmax = jnp.float32(iscal_ref[7]), jnp.float32(iscal_ref[8])

        dxv, dyv, dzv = dx_ref[:], dy_ref[:], dz_ref[:]
        inv_len = jax.lax.rsqrt(
            jnp.maximum(dxv * dxv + dyv * dyv + dzv * dzv, 1e-20)
        )
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

        any8 = any8_ref[:]
        all8 = all8_ref[:]
        hi = hi_ref[:]
        hi16 = hi[0:1]
        hi_hi = hi[1:2]

        eps = jnp.float32(1e-4)

        def boundary_dist(p, mul, lp, step_f):
            m = jnp.mod((p + jnp.float32(_HALF)) * mul, step_f)
            return (eps + m) * lp

        def oob_of(px, py, pz):
            return (
                (jnp.abs(px - lrf[0]) >= jnp.float32(_HALF))
                | (jnp.abs(py - lrf[1]) >= jnp.float32(_HALF))
                | (jnp.abs(pz - lrf[2]) >= jnp.float32(_HALF))
            )

        def iteration(s):
            px, py, pz = s["px"], s["py"], s["pz"]
            act = s["status"] == 0

            # Born-out-of-bounds rays (insta-exit padding, degenerate
            # resumes) flag air before any voxel logic can mis-hit on the
            # toroidally wrapped texel.
            born_oob = act & oob_of(px, py, pz)
            status = jnp.where(born_oob, jnp.int32(_DONE | _AIR), s["status"])
            act = act & ~born_oob

            # Occupancy-bounds escape: at/beyond a bound and not moving
            # back toward the box on that axis => no occupied voxel is
            # ever reachable (in-window positions never alias toroidally).
            # Catches sky rays the moment they clear the content AABB
            # instead of marching them to the window edge — the
            # general-content analog of lighting_pallas's sky-escape +
            # rising-ray completions.
            esc = (
                ((dxv >= 0) & (px >= bxmax))
                | ((dxv <= 0) & (px < bxmin))
                | ((dyv >= 0) & (py >= bymax))
                | ((dyv <= 0) & (py < bymin))
                | ((dzv >= 0) & (pz >= bzmax))
                | ((dzv <= 0) & (pz < bzmin))
            )
            escaped = act & esc
            status = jnp.where(escaped, jnp.int32(_DONE | _AIR), status)
            act = act & ~escaped

            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            tx = (xi + _HALF) & (_N - 1)
            ty = (yi + _HALF) & (_N - 1)
            tz = (zi + _HALF) & (_N - 1)

            b = ((tz >> 3) * NB + (ty >> 3)) * NB + (tx >> 3)
            wa, wf = _lut_many((any8, all8), b >> 5)
            bbit = b & 31
            a8 = (wa >> bbit) & 1
            f8 = (wf >> bbit) & 1

            i16 = ((tz >> 4) * 16 + (ty >> 4)) * 16 + (tx >> 4)
            w16 = _lut(hi16, i16 >> 5)
            a16 = (w16 >> (i16 & 31)) & 1
            i32v = ((tz >> 5) * 8 + (ty >> 5)) * 8 + (tx >> 5)
            i64v = ((tz >> 6) * 4 + (ty >> 6)) * 4 + (tx >> 6)
            # 32- and 64-level words share row 1 of the packed hi table
            # (lanes 0-15 and 64-65); one extra lookup round covers both.
            w32 = _lut(hi_hi, i32v >> 5)
            w64 = _lut(hi_hi, 64 + (i64v >> 5))
            a32 = (w32 >> (i32v & 31)) & 1
            a64 = (w64 >> (i64v & 31)) & 1

            step = jnp.where(
                a64 == 0,
                64,
                jnp.where(a32 == 0, 32, jnp.where(a16 == 0, 16, 8)),
            )
            hit_now = act & (f8 == 1)
            mixed = act & (a8 == 1) & (f8 == 0)
            status = jnp.where(hit_now, jnp.int32(_DONE), status)
            status = jnp.where(mixed, jnp.int32(_PARKED), status)

            move = act & ~hit_now & ~mixed
            step_f = step.astype(jnp.float32)
            lx = boundary_dist(px, mulx, lpx, step_f)
            ly = boundary_dist(py, muly, lpy, step_f)
            lz = boundary_dist(pz, mulz, lpz, step_f)
            use_x = (lx < ly) & (lx < lz)
            use_y = ~(lx < ly) & (ly < lz)
            lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
            nrm = jnp.where(use_x, nx_id, jnp.where(use_y, ny_id, nz_id))

            npx = jnp.where(move, px + dxv * lmin, px)
            npy = jnp.where(move, py + dyv * lmin, py)
            npz = jnp.where(move, pz + dzv * lmin, pz)
            nnormal = jnp.where(move, nrm, s["normal"])
            new_air = move & oob_of(npx, npy, npz)
            status = jnp.where(new_air, jnp.int32(_DONE | _AIR), status)

            return dict(
                i=s["i"] + 1,
                px=npx,
                py=npy,
                pz=npz,
                normal=nnormal,
                status=status,
            )

        def cond(s):
            live = s["status"] == 0
            return (s["i"] < max_steps) & (
                jnp.sum(live.astype(jnp.int32)) > 0
            )

        def body(s):
            for _ in range(unroll):
                s = iteration(s)
            return s

        state = dict(
            i=jnp.int32(0),
            px=px_ref[:],
            py=py_ref[:],
            pz=pz_ref[:],
            normal=n0_ref[:],
            status=jnp.zeros((S, LANES), jnp.int32),
        )
        s = jax.lax.while_loop(cond, body, state)

        opx_ref[:] = s["px"]
        opy_ref[:] = s["py"]
        opz_ref[:] = s["pz"]
        onormal_ref[:] = s["normal"]
        ostatus_ref[:] = s["status"]

    return kernel


# ---------------------------------------------------------------------------
# XLA-side mixed-brick resolve
# ---------------------------------------------------------------------------


def resolve_mixed(detail, px, py, pz, dx, dy, dz, normal, meta, lr):
    """March parked rays through their mixed brick's voxel bits.

    One row gather pulls each parked ray's 16-word brick mask; a fixed-trip
    vectorized DDA (while_loop with all-resolved early exit, <= 23 voxel
    crossings fit in an 8^3 brick) then tests the CURRENT voxel and steps
    single-voxel boundaries — identical epsilon/normal conventions to the
    kernel.  Returns updated (px, py, pz, normal, meta): a hit sets done,
    an out-of-bounds exit sets done|air, and an unhit brick exit leaves the
    ray live at the eps-past-the-wall resume point for the next kernel
    round.

    (A ``sub_bricks`` variant that continued through K consecutive bricks
    per resolve — fresh row gather each — was measured on hardware as a
    2-3x config-1 loss and removed; probes/out/r4_decomp.log.)
    """
    parked = (meta & _PARKED) != 0
    lrf = lr.astype(jnp.float32)

    def brick_of(pxv, pyv, pzv):
        xi = jnp.floor(pxv).astype(jnp.int32)
        yi = jnp.floor(pyv).astype(jnp.int32)
        zi = jnp.floor(pzv).astype(jnp.int32)
        tx = (xi + _HALF) & (_N - 1)
        ty = (yi + _HALF) & (_N - 1)
        tz = (zi + _HALF) & (_N - 1)
        return ((tz >> 3) * NB + (ty >> 3)) * NB + (tx >> 3), tx, ty, tz

    inv_len = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20))
    dxv, dyv, dzv = dx * inv_len, dy * inv_len, dz * inv_len
    lpx = jnp.float32(1.0) / jnp.abs(dxv)
    lpy = jnp.float32(1.0) / jnp.abs(dyv)
    lpz = jnp.float32(1.0) / jnp.abs(dzv)
    mulx = jnp.where(dxv > 0, jnp.float32(-1.0), jnp.float32(1.0))
    muly = jnp.where(dyv > 0, jnp.float32(-1.0), jnp.float32(1.0))
    mulz = jnp.where(dzv > 0, jnp.float32(-1.0), jnp.float32(1.0))
    nx_id = jnp.where(dxv > 0, jnp.int32(1), jnp.int32(0))
    ny_id = jnp.where(dyv > 0, jnp.int32(3), jnp.int32(2))
    nz_id = jnp.where(dzv > 0, jnp.int32(5), jnp.int32(4))
    eps = jnp.float32(1e-4)

    def oob_of(pxv, pyv, pzv):
        return (
            (jnp.abs(pxv - lrf[0]) >= jnp.float32(_HALF))
            | (jnp.abs(pyv - lrf[1]) >= jnp.float32(_HALF))
            | (jnp.abs(pzv - lrf[2]) >= jnp.float32(_HALF))
        )

    # status: 0 live-in-brick, 1 hit, 2 exited brick, 3 exited out of bounds
    s = dict(
        px=px,
        py=py,
        pz=pz,
        normal=normal,
        status=jnp.where(parked, jnp.int32(0), jnp.int32(2)),
    )

    need = parked & (s["status"] == 0)
    b0, _, _, _ = brick_of(s["px"], s["py"], s["pz"])
    b0 = jnp.where(need, b0, 0)
    # (n, 16) row gather — the only volume memory touch.
    words = detail[b0]
    # The march keeps a CONSTANT 1.0 modulus (a parked ray's own brick is
    # mixed by definition, so every march step is a single-voxel step): a
    # per-lane vector modulus makes jnp.mod lower to a real divide per
    # axis per march iteration instead of a folded fract, which alone
    # measured config 1 at half speed (19.61 -> 9.67 Mrays/s, the
    # 9833a11 regression).
    step_f = jnp.float32(1.0)

    state = dict(i=jnp.int32(0), **s)

    def cond(st):
        return (st["i"] < 23) & jnp.any(parked & (st["status"] == 0))

    def body(st):
        act = need & (st["status"] == 0)
        b_now, tx, ty, tz = brick_of(st["px"], st["py"], st["pz"])
        oob = oob_of(st["px"], st["py"], st["pz"])
        inside = (b_now == b0) & ~oob
        status = jnp.where(act & oob, jnp.int32(3), st["status"])
        status = jnp.where(act & ~inside & ~oob, jnp.int32(2), status)
        act = act & inside

        v = ((tz & 7) << 6) | ((ty & 7) << 3) | (tx & 7)
        wsel = v >> 5  # occupancy word index 0..15
        word = jnp.zeros_like(v)
        for w in range(DETAIL_WORDS):
            word = jnp.where(wsel == w, words[:, w], word)
        solid = ((word >> (v & 31)) & 1) == 1
        hit = act & solid
        status = jnp.where(hit, jnp.int32(1), status)
        move = act & ~hit

        lx = (eps + jnp.mod(
            (st["px"] + jnp.float32(_HALF)) * mulx, step_f)) * lpx
        ly = (eps + jnp.mod(
            (st["py"] + jnp.float32(_HALF)) * muly, step_f)) * lpy
        lz = (eps + jnp.mod(
            (st["pz"] + jnp.float32(_HALF)) * mulz, step_f)) * lpz
        use_x = (lx < ly) & (lx < lz)
        use_y = ~(lx < ly) & (ly < lz)
        lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
        nrm = jnp.where(use_x, nx_id, jnp.where(use_y, ny_id, nz_id))

        return dict(
            i=st["i"] + 1,
            px=jnp.where(move, st["px"] + dxv * lmin, st["px"]),
            py=jnp.where(move, st["py"] + dyv * lmin, st["py"]),
            pz=jnp.where(move, st["pz"] + dzv * lmin, st["pz"]),
            normal=jnp.where(move, nrm, st["normal"]),
            status=status,
        )

    out = jax.lax.while_loop(cond, body, state)
    s = {key: out[key] for key in ("px", "py", "pz", "normal", "status")}

    # Fold resolve results back into the meta word.  Rays still status-0
    # after 23 crossings cannot exist geometrically; treat as exited (the
    # kernel re-classifies them next round at their current position).
    hit = parked & (s["status"] == 1)
    air = parked & (s["status"] == 3)

    new_meta = jnp.where(
        parked,
        jnp.where(
            hit,
            jnp.int32(_DONE) | (s["normal"] << 2),
            jnp.where(
                air,
                jnp.int32(_DONE | _AIR) | (s["normal"] << 2),
                s["normal"] << 2,  # live again: parked bit cleared
            ),
        ),
        meta,
    )
    return (
        jnp.where(parked, s["px"], px),
        jnp.where(parked, s["py"], py),
        jnp.where(parked, s["pz"], pz),
        jnp.where(parked, s["normal"], normal),
        new_meta,
    )


def resolve_mixed_parallel(detail, px, py, pz, dx, dy, dz, normal, meta, lr):
    """One-pass mixed-brick resolve: no march loop, no serial dependency.

    The serial ``resolve_mixed`` march is a <= 23-trip ``while_loop``; at
    1M rays each trip streams the whole ~40 MB ray state through HBM, so
    the march costs ~7 ms regardless of how few crossings most rays need
    (probes/out/r4_decomp.log: resolve 11.4 ms = 4.4 gather + ~7 march).
    This version evaluates every possible crossing as an INDEPENDENT
    candidate in one fused elementwise pass — the state is read once and
    written once:

      * a ray inside an 8^3 brick can enter a new voxel only at one of the
        21 interior axis planes (7 per axis); each candidate's entry time
        ``t = (plane - p) / d``, sample point, voxel bit, and validity are
        data-parallel,
      * the first solid voxel along the ray is the valid-solid candidate
        with MINIMAL entry time (voxels are visited in increasing entry
        time) — a running strict-< min scanned x,y,z, so the EARLIER
        axis wins an exact entry-time tie (x>y>z priority).  The serial
        march's use_x/use_y selects give the LATER axis tie priority
        (z>y>x), so the two modes can pick different normals/voxels at
        exact fp corner crossings — within the documented corner
        tolerance.  Seeded by the parked voxel itself at t = 0,
      * a miss exits at the nearest brick/window plane ahead, computed
        directly from the same plane arithmetic.

    Geometry note: the world brick box is axis-aligned at multiples of 8
    and never straddles the toroidal wrap — texel = (world + 128) mod 256
    and both 128 and 256 are multiples of 8, so one detail row always
    covers one contiguous world box.  The active window's edge (lr +- 128)
    CAN cut through a brick; window planes join the exit-plane set and
    candidates past them are invalid (out-of-window is air by definition,
    and the texels beyond belong to the far side of the volume).

    Semantics match resolve_mixed to float32 noise: hit/exit positions are
    the same eps-past-the-plane points (the serial march re-snaps to each
    boundary, so its per-step eps nudges don't accumulate), normals use
    the same axis ids, and statuses fold into meta identically.  Exact
    bit-parity is impossible (different fp op order), and a ray passing
    within ~1e-5 of a voxel corner may legitimately pick the other side;
    tests pin both resolvers against the oracle at the shared tolerances.
    """
    parked = (meta & _PARKED) != 0
    lrf = lr.astype(jnp.float32)
    eps = jnp.float32(1e-4)
    big = jnp.float32(3.0e38)

    inv_len = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-20))
    dv = (dx * inv_len, dy * inv_len, dz * inv_len)
    pv = (px, py, pz)
    nrm_ids = (
        jnp.where(dv[0] > 0, jnp.int32(1), jnp.int32(0)),
        jnp.where(dv[1] > 0, jnp.int32(3), jnp.int32(2)),
        jnp.where(dv[2] > 0, jnp.int32(5), jnp.int32(4)),
    )

    def oob_of(pxv, pyv, pzv):
        return (
            (jnp.abs(pxv - lrf[0]) >= jnp.float32(_HALF))
            | (jnp.abs(pyv - lrf[1]) >= jnp.float32(_HALF))
            | (jnp.abs(pzv - lrf[2]) >= jnp.float32(_HALF))
        )

    xi = jnp.floor(px).astype(jnp.int32)
    yi = jnp.floor(py).astype(jnp.int32)
    zi = jnp.floor(pz).astype(jnp.int32)
    tx = (xi + _HALF) & (_N - 1)
    ty = (yi + _HALF) & (_N - 1)
    tz = (zi + _HALF) & (_N - 1)
    b0 = ((tz >> 3) * NB + (ty >> 3)) * NB + (tx >> 3)
    words = detail[jnp.where(parked, b0, 0)]  # (n, 16) row gather

    # World brick box min per axis (multiples of 8; see geometry note).
    bmin = (xi - (xi & 7), yi - (yi & 7), zi - (zi & 7))
    bminf = tuple(b.astype(jnp.float32) for b in bmin)

    # Per-axis reciprocals; zero-direction axes never produce candidates.
    usable = tuple(jnp.abs(d) > jnp.float32(1e-20) for d in dv)
    inv_d = tuple(
        jnp.where(u, jnp.float32(1.0) / jnp.where(u, d, jnp.float32(1.0)), big)
        for d, u in zip(dv, usable)
    )
    lp = tuple(jnp.abs(i) for i in inv_d)

    def bit_of(v):
        wsel = v >> 5
        word = jnp.zeros_like(v)
        for w in range(DETAIL_WORDS):
            word = jnp.where(wsel == w, words[:, w], word)
        return ((word >> (v & 31)) & 1) == 1

    # Seed: the parked voxel itself (the serial march tests it before any
    # step; a solid park keeps its position and incoming normal).
    v0 = ((tz & 7) << 6) | ((ty & 7) << 3) | (tx & 7)
    solid0 = bit_of(v0)
    t_best = jnp.where(solid0, jnp.float32(0.0), big)
    tp_best = jnp.zeros_like(px)  # position time incl. the eps nudge
    nrm_best = normal

    for axis in range(3):
        oa, ob = (1, 2) if axis == 0 else ((0, 2) if axis == 1 else (0, 1))
        for k in range(1, 8):
            t = (bminf[axis] + jnp.float32(k) - pv[axis]) * inv_d[axis]
            t = jnp.where(usable[axis], t, big)
            tp = t + eps * lp[axis]
            # Crossing-axis local coordinate is known exactly; the other
            # two come from the eps-past-the-plane sample point.
            la = jnp.where(dv[axis] > 0, jnp.int32(k), jnp.int32(k - 1))
            sa = pv[oa] + dv[oa] * tp
            sb = pv[ob] + dv[ob] * tp
            loa = jnp.floor(sa).astype(jnp.int32) - bmin[oa]
            lob = jnp.floor(sb).astype(jnp.int32) - bmin[ob]
            in_brick = (
                (loa >= 0) & (loa < 8) & (lob >= 0) & (lob < 8)
            )
            locs = [None, None, None]
            locs[axis], locs[oa], locs[ob] = la, loa, lob
            v = (locs[2] << 6) | (locs[1] << 3) | locs[0]
            v = jnp.clip(v, 0, 511)  # out-of-brick candidates are masked
            # In-window test at the sample point (the window edge may cut
            # through the brick; beyond it is air, not this brick's bits).
            sx = pv[0] + dv[0] * tp
            sy = pv[1] + dv[1] * tp
            sz = pv[2] + dv[2] * tp
            ok = (
                (t > 0)
                & (t < t_best)
                & in_brick
                & ~oob_of(sx, sy, sz)
                & bit_of(v)
            )
            t_best = jnp.where(ok, t, t_best)
            tp_best = jnp.where(ok, tp, tp_best)
            nrm_best = jnp.where(ok, nrm_ids[axis], nrm_best)

    # Exit: nearest brick or window plane ahead.  Strict-< scanned x,y,z
    # gives the earlier axis tie priority (the serial march's selects give
    # the later axis priority on ties; fp-corner tolerance covers it).
    t_exit = jnp.full_like(px, big)
    tp_exit = jnp.full_like(px, big)
    nrm_exit = normal
    for axis in range(3):
        brick_plane = bminf[axis] + jnp.where(
            dv[axis] > 0, jnp.float32(8.0), jnp.float32(0.0)
        )
        win_plane = lrf[axis] + jnp.where(
            dv[axis] > 0, jnp.float32(_HALF), jnp.float32(-_HALF)
        )
        plane = jnp.where(
            dv[axis] > 0,
            jnp.minimum(brick_plane, win_plane),
            jnp.maximum(brick_plane, win_plane),
        )
        t = (plane - pv[axis]) * inv_d[axis]
        t = jnp.where(usable[axis], t, big)
        ok = t < t_exit
        t_exit = jnp.where(ok, t, t_exit)
        tp_exit = jnp.where(ok, t + eps * lp[axis], tp_exit)
        nrm_exit = jnp.where(ok, nrm_ids[axis], nrm_exit)

    # Candidate validity (in-brick, in-window) already bounds t_best by
    # the exit; comparing against t_exit again would re-reject borderline
    # fp cases the serial march accepts.
    hit = parked & (t_best < big)
    tp_out = jnp.where(hit, tp_best, tp_exit)
    nx = px + dv[0] * tp_out
    ny = py + dv[1] * tp_out
    nz = pz + dv[2] * tp_out
    nrm = jnp.where(hit, nrm_best, nrm_exit)
    air = parked & ~hit & oob_of(nx, ny, nz)

    new_meta = jnp.where(
        parked,
        jnp.where(
            hit,
            jnp.int32(_DONE) | (nrm << 2),
            jnp.where(
                air,
                jnp.int32(_DONE | _AIR) | (nrm << 2),
                nrm << 2,  # exited the brick unhit: live again
            ),
        ),
        meta,
    )
    return (
        jnp.where(parked, nx, px),
        jnp.where(parked, ny, py),
        jnp.where(parked, nz, pz),
        jnp.where(parked, nrm, normal),
        new_meta,
    )


_RESOLVERS = {"serial": resolve_mixed, "parallel": resolve_mixed_parallel}
# Hardware A/B (probes/out/r4_resolve_ab.log, TPU v5e, 2026-08-19): serial
# wins everywhere measured — bench shape LV_D cap=224 92.46 ms vs 120.00,
# 1M random legs 73.95 ms vs 116.61, config 1 15.52 ms vs 22.86+.  The
# one-pass resolve reads 16 detail words x 21 candidates worth of selects
# per ray regardless of need; the serial march's while_loop exits early for
# the common 1-3-crossing case and its HBM streaming cost only bites at
# full width (where the kernel pass dominates anyway).  Tests pin both
# modes; "parallel" stays available via resolve=.
DEFAULT_RESOLVE = "serial"


# ---------------------------------------------------------------------------
# Host-side wrapper: kernel/resolve rounds with compaction
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "tile_rows", "interpret", "rounds", "cap", "cascade",
        "resolve",
    ),
)
def trace_rays_vol(
    tables: dict,
    fused_flat: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    lr: jax.Array,
    max_steps: int = MAX_TRACE_STEPS,
    tile_rows: int = 16,
    interpret: bool | None = None,
    rounds: int | None = None,
    cap: int = 96,
    active: jax.Array | None = None,
    escape: bool = True,
    resolve: str | None = None,
    cascade: bool | None = None,
) -> dict[str, jax.Array]:
    """General-volume trace; drop-in for trace_jax.trace_rays.

    ``tables`` from build_vol_tables for the same fused_flat.  A round =
    one Pallas coarse pass (up to ``cap`` brick-level steps) + one resolve
    of every ray parked in a mixed brick (row gather + in-register voxel
    march).  Rounds run inside a lax.while_loop that exits as soon as no
    ray is live, so ``rounds`` is a worst-case bound, not a fixed cost:
    world-like scenes pay for 2-3 iterations (measured: per-round cost is
    dominated by the full-batch row gather, so early exit is the whole
    ballgame), and content where a grazing ray skims many mixed bricks
    still terminates.  Rays live after the round budget report
    ``exhausted`` (the REPORT_ERROR pink-pixel analog, raytrace.comp:5-7).

    ``cascade`` (None = auto: on when rounds >= 12 and the batch spans
    >= 16 tiles) enables the straggler cascade: 2 full-width rounds,
    then stable live-first partitions shrinking the live batch to 1/2
    (3 rounds), 1/4 (4 rounds), and 1/8 width (remaining budget), a
    full-width safety loop (zero rounds unless a level's live fraction
    exceeded its width), and a final sort restoring ray order.  The
    level widths hold the measured diffuse-leg live curve (58/29/17/9%
    after rounds 1/2/3/5) with ~2x slack.  Grazing rays park at every
    surface brick they skim — ~1 round per brick — and without the
    cascade every such round costs full width (measured 248 ms for a
    1M-ray diffuse leg vs 44 ms primary).  Each level is debited the
    rounds consumed ahead of it and the final level / safety loop get
    exactly the remainder, so no ray marches more than ``rounds``
    rounds total.  Results are bit-identical to the plain loop for
    every ray that terminates within budget (marches are memoryless in
    position/direction); among exhausted rays, only those that
    momentarily overflowed a level's width can report a different
    (earlier) resume position — they pause during that level and may
    see fewer total rounds, never more.

    ``max_steps`` bounds the total march budget like the reference's
    2048-step limit (raytrace.comp:109): when ``rounds`` is not given it is
    derived as ceil(max_steps / cap), so the worst case is >= max_steps
    brick-level steps (each brick step covers >=1 voxel, so the voxel-step
    budget is at least as generous as the reference's).  Passing ``rounds``
    explicitly overrides the derivation (tests use small values to force
    the ``exhausted`` path).

    ``active`` marks rays to trace at all (born-done otherwise), matching
    trace_rays_hf's contract for skipped bounce legs.

    ``escape`` (default True) completes rays as air the moment they clear
    the occupancy AABB moving away from it (_occupancy_world_bounds) —
    sky rays stop in one or two kernel iterations instead of marching to
    the window edge.  Hit results are identical; escaped AIR rays report
    their escape position rather than the window-exit position, which no
    consumer reads (integrate_gbuffers masks every air field).  The flag
    is traced, not static: False selects never-true infinite bounds in
    the SAME compiled program, so an on-hardware A/B costs no recompile.

    (Three tuning knobs were A/B'd on hardware and removed,
    probes/out/r4_decomp.log: ``approach_jump`` measured flat — the
    escape bounds already complete the rays it would help; ``sub_bricks``
    was a 2-3x config-1 loss; ``compact_cap`` segmented resolves measured
    as a round-3 net loss.)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if rounds is None:
        rounds = max(1, -(-max_steps // cap))
    resolve_fn = _RESOLVERS[resolve or DEFAULT_RESOLVE]

    shape = origin.shape[:-1]
    n = 1
    for dim in shape:
        n *= dim
    per_tile = tile_rows * LANES
    n_pad = -(-n // per_tile) * per_tile
    grid = n_pad // per_tile
    rows = grid * tile_rows

    def flat(x, pad_value=0.0):
        f = x.reshape(n)
        f = jnp.pad(f, (0, n_pad - n), constant_values=pad_value)
        return f.reshape(rows, LANES)

    o = origin.reshape(n, 3).astype(jnp.float32)
    d = direction.reshape(n, 3).astype(jnp.float32)
    cx, cy = flat(o[:, 0]), flat(o[:, 1])
    cz = flat(o[:, 2], 1e9)  # pad rays insta-exit (born OOB)
    cdx, cdy = flat(d[:, 0]), flat(d[:, 1])
    cdz = flat(d[:, 2], 1.0)
    cmeta = jnp.zeros((rows, LANES), jnp.int32)
    if active is not None:
        cmeta = flat(
            jnp.logical_not(active).reshape(n).astype(jnp.float32), 1.0
        ).astype(jnp.int32)

    lri = jnp.asarray(lr, jnp.int32)
    # escape is TRACED (jnp.where on the bound values, not a program
    # variant): A/B-ing it on hardware reuses one compiled program, and
    # False degrades the kernel test to never-true infinite bounds.
    big = jnp.int32(1) << 30
    inf_bounds = jnp.stack([-big, big, -big, big, -big, big])
    occ_bounds = _occupancy_world_bounds(tables["any8b"], lri)
    esc_bounds = jnp.where(jnp.asarray(escape, bool), occ_bounds, inf_bounds)
    iscal = jnp.concatenate([lri, esc_bounds, jnp.zeros(1, jnp.int32)])

    ray_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    table_spec = lambda t: pl.BlockSpec(
        t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    detail = tables["detail"]

    def run_rounds(bx, by, bz, bdx, bdy, bdz, bmeta, budget):
        """The kernel/resolve round loop over (rows_l, LANES) views.

        Width-generic so the straggler cascade below can run late rounds
        on a sliced prefix: every full-batch cost inside (kernel grid,
        row gather, resolve march) scales with rows_l.
        """
        rows_l = bx.shape[0]
        grid_l = rows_l // tile_rows
        n_l = rows_l * LANES
        outf = jax.ShapeDtypeStruct((rows_l, LANES), jnp.float32)
        outi = jax.ShapeDtypeStruct((rows_l, LANES), jnp.int32)

        def run_pass(ox, oy, oz, dxx, dyy, dzz, n0):
            kernel = _make_vol_kernel(tile_rows, cap)
            return pl.pallas_call(
                kernel,
                grid=(grid_l,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + [ray_spec] * 7
                + [
                    table_spec(tables["any8"]),
                    table_spec(tables["all8"]),
                    table_spec(tables["any_hi"]),
                ],
                out_specs=[ray_spec] * 5,
                out_shape=[outf, outf, outf, outi, outi],
                interpret=interpret,
            )(
                iscal, ox, oy, oz, dxx, dyy, dzz, n0,
                tables["any8"], tables["all8"], tables["any_hi"],
            )

        def round_cond(s):
            return (s["r"] < budget) & jnp.any((s["meta"] & 1) == 0)

        def round_body(s):
            cx, cy, cz, cmeta = s["x"], s["y"], s["z"], s["meta"]
            fin = (cmeta & 1) == 1
            iz = jnp.where(fin, jnp.float32(1e9), cz)
            idz = jnp.where(fin, jnp.float32(1.0), bdz)
            px, py, pz, nrm, status = run_pass(
                cx, cy, iz, bdx, bdy, idz, (cmeta >> 2) & 7
            )
            meta_new = jnp.where(
                status == 0,
                # Kernel step budget exhausted mid-flight: stay live with
                # the current resume state (counts against the budget).
                (nrm & 7) << 2,
                ((nrm & 7) << 2) | status,
            )
            cx = jnp.where(fin, cx, px)
            cy = jnp.where(fin, cy, py)
            cz = jnp.where(fin, cz, pz)
            cmeta = jnp.where(fin, cmeta, meta_new)

            # Resolve this round's mixed-brick parks (flat views).
            fx, fy, fz, _, fmeta = resolve_fn(
                detail,
                cx.reshape(n_l),
                cy.reshape(n_l),
                cz.reshape(n_l),
                bdx.reshape(n_l),
                bdy.reshape(n_l),
                bdz.reshape(n_l),
                (cmeta.reshape(n_l) >> 2) & 7,
                cmeta.reshape(n_l),
                lri,
            )
            return dict(
                r=s["r"] + 1,
                x=fx.reshape(rows_l, LANES),
                y=fy.reshape(rows_l, LANES),
                z=fz.reshape(rows_l, LANES),
                meta=fmeta.reshape(rows_l, LANES),
            )

        s = jax.lax.while_loop(
            round_cond,
            round_body,
            dict(r=jnp.int32(0), x=bx, y=by, z=bz, meta=bmeta),
        )
        return s["x"], s["y"], s["z"], s["meta"]

    if cascade is None:
        # Stragglers matter when the budget allows many rounds and the
        # batch is big enough that full-width rounds dwarf the two sorts.
        # Measured (probes/out/r3_cascade.log): 1M-ray sun leg 107 -> 44 ms;
        # config 1 (rounds=11, exits by round ~4) 22.2 -> 19.9 — hence the
        # >= 12 gate keeps short-budget traces on the plain loop.
        cascade = rounds >= 12 and grid >= 16
    if cascade:
        # Straggler cascade (the vol-path analog of trace_pallas
        # COMPACT_CAPS).  Measured live fractions on a 1M-ray diffuse
        # bounce leg (generated world; brick-walk simulation matching
        # probes/r3_live_curve.py): 58% after round 1, 28.6% after 2,
        # 16.8% after 3, ~9% after 5, ~2.6% after 12 — a fat, slowly
        # decaying tail, and every round bills the FULL batch (248 ms
        # converged vs 44 ms for the primary leg).  So: run 2 rounds at
        # full width, then repeatedly stable-partition live rays to the
        # front (single i32 key, done last; later sorts touch only the
        # current prefix) and continue at 1/2, then 1/4, then 1/8 width —
        # each level's width chosen to hold the measured live fraction
        # with ~2x slack.  A final full-width safety loop covers any rays
        # left beyond a prefix (live fraction above a level's width); it
        # executes zero rounds otherwise and shares the full-width kernel
        # binary.  One more sort restores ray order; results are
        # bit-identical to the plain loop for every terminating ray
        # (marches are memoryless in position/direction, only batch
        # layout changes), and the budget debiting below keeps the total
        # round count of every partition path at exactly ``rounds``.
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (rows, LANES), 0
        ) * LANES + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

        cidx = iota
        sdx, sdy, sdz = cdx, cdy, cdz
        warm = min(2, rounds)
        cx, cy, cz, cmeta = run_rounds(
            cx, cy, cz, sdx, sdy, sdz, cmeta, warm
        )

        # Budget accounting: each level is debited the rounds already
        # consumed ahead of it, and the final level (and the suffix safety
        # loop, whose rays only saw the warm-up) gets exactly the
        # remainder — so no ray can ever march more than ``rounds``
        # rounds total, preserving the max_steps-derived budget contract.
        # Rays that momentarily overflow a level's width pause during
        # that level and may see FEWER total rounds (conservative: they
        # can exhaust earlier than the plain loop, never later); rays
        # that terminate within budget are bit-identical either way.
        consumed = warm
        pr = rows  # current prefix (rows); shrinks per level
        for budget, div in ((3, 2), (4, 4), (None, 8)):
            new_pr = max(1, grid // div) * tile_rows
            if new_pr >= pr:
                continue
            level = (
                (rounds - consumed)
                if budget is None
                else min(budget, rounds - consumed)
            )
            if level <= 0:
                continue
            # Stable live-first partition over the FULL width, not just
            # the current prefix.  A prefix-only sort strands any live ray
            # that didn't fit a level's cut (live fraction momentarily
            # above the level width) outside every later prefix, leaving
            # it to the full-width safety loop — measured as the diffuse
            # legs gaining nothing from the cascade (543 vs 564 ms,
            # probes/out/r3_vol1m_c.log) while coherent sun legs (fast
            # live-count collapse, no overflow) improved 332 -> 112 ms.
            # Full-width sorts self-heal: a paused overflow ray re-enters
            # at the next level's cut.  Cost: ~7 ms per 9-operand 1M sort.
            key = (cmeta & 1) * jnp.int32(n_pad) + iota
            out = jax.lax.sort(
                (key.reshape(n_pad),)
                + tuple(
                    a.reshape(n_pad)
                    for a in (cx, cy, cz, sdx, sdy, sdz, cmeta, cidx)
                ),
                num_keys=1,
            )
            cx, cy, cz, sdx, sdy, sdz, cmeta, cidx = (
                a.reshape(rows, LANES) for a in out[1:]
            )
            pr = new_pr
            bx, by, bz, bmeta = run_rounds(
                cx[:pr], cy[:pr], cz[:pr],
                sdx[:pr], sdy[:pr], sdz[:pr], cmeta[:pr], level,
            )
            cx = cx.at[:pr].set(bx)
            cy = cy.at[:pr].set(by)
            cz = cz.at[:pr].set(bz)
            cmeta = cmeta.at[:pr].set(bmeta)
            consumed += level

        # Safety: any live ray left beyond the FINAL prefix finishes
        # here.  The levels already spent the full round budget on
        # [:pr], and the full-width partitions put every live ray that
        # fit inside it — so only overflow rays (live count above a
        # level width at its cut) can sit in [pr:], and when there are
        # none the suffix loop's cond is false on entry and it costs
        # nothing.  Running the safety loop over the full width instead
        # re-billed `rounds` full-width rounds whenever ANY prefix ray
        # stayed live to the end: the converged diffuse leg has a
        # never-terminating grazing tail (0.6% of rays still live after
        # 18 rounds, probes/out/r3_vol1m_e.log), which made the cascade
        # a net LOSS there (543 -> 570 ms) while the sun leg, whose
        # live count reaches zero, improved 332 -> 118.
        if pr < rows:
            bx, by, bz, bmeta = run_rounds(
                cx[pr:], cy[pr:], cz[pr:],
                sdx[pr:], sdy[pr:], sdz[pr:], cmeta[pr:], rounds - warm
            )
            cx = cx.at[pr:].set(bx)
            cy = cy.at[pr:].set(by)
            cz = cz.at[pr:].set(bz)
            cmeta = cmeta.at[pr:].set(bmeta)
        else:
            # No level engaged (tiny grid with cascade forced on): the
            # two warm-up rounds are all that ran; finish at full width.
            cx, cy, cz, cmeta = run_rounds(
                cx, cy, cz, sdx, sdy, sdz, cmeta, rounds - warm
            )
        out = jax.lax.sort(
            (cidx.reshape(n_pad),)
            + tuple(a.reshape(n_pad) for a in (cx, cy, cz, cmeta)),
            num_keys=1,
        )
        cx, cy, cz, cmeta = (a.reshape(rows, LANES) for a in out[1:])
    else:
        cx, cy, cz, cmeta = run_rounds(
            cx, cy, cz, cdx, cdy, cdz, cmeta, rounds
        )

    def unflat(x):
        return x.reshape(n_pad)[:n].reshape(shape)

    px = unflat(cx)
    py = unflat(cy)
    pz = unflat(cz)
    normal = unflat((cmeta >> 2) & 7)
    air = unflat((cmeta >> 1) & 1).astype(bool)
    done = unflat(cmeta & 1).astype(bool)
    hit = done & ~air

    # Material at the hit voxel: ONE per-element toroidal gather over the
    # fused volume, paid once at the end of the trace (never per round —
    # see the module header on the removed palette experiment).
    pos = jnp.stack([px, py, pz], axis=-1)
    t = jnp.remainder(
        jnp.floor(pos + jnp.float32(_HALF)).astype(jnp.int32), _N
    )
    lin = (t[..., 2] * _N + t[..., 1]) * _N + t[..., 0]
    packed = jnp.where(
        hit,
        fused_flat[jnp.where(hit, lin, 0)] & jnp.uint32(MATERIAL_MASK),
        0,
    )

    from . import shading

    distance = jnp.linalg.norm(origin - pos, axis=-1)
    nxv, nyv, nzv = shading.face_normal_vector(jnp, normal)
    # The 0.001 face-normal nudge is applied to HITS only.  This is a
    # DELIBERATE divergence from the reference, which nudges every result
    # (air included, via the last-crossed normal — raytrace.comp:166-180),
    # as do trace_jax/trace_pallas/reference_tracer; no consumer reads air
    # positions here (see module header).  Exhausted rays return their RAW
    # resume position: nudging them by the stale entry normal pushed the
    # resume point ~0.001 back across the face just crossed, so any
    # consumer chaining resume positions re-parked in the SAME brick
    # forever at ~0.001/round — round 3's "never-terminating tail" was
    # exactly this artifact (probes/out/r4_tail_forensics.log: stuck rays
    # revisit one brick id every round while a raw-position replay
    # marches straight through; the INTERNAL loop, which carries raw
    # positions, converges in <= 4 rounds on world content).
    pos = pos + jnp.where(hit[..., None], jnp.float32(0.001), 0.0) * jnp.stack(
        [nxv, nyv, nzv], axis=-1
    )
    albedo = jnp.stack(
        [
            ((packed >> 14) & 0x7F).astype(jnp.float32) / 127.0,
            ((packed >> 7) & 0x7F).astype(jnp.float32) / 127.0,
            (packed & 0x7F).astype(jnp.float32) / 127.0,
        ],
        axis=-1,
    )
    return {
        "position": pos,
        "normal": normal,
        "air": air,
        "albedo": albedo,
        "distance": distance,
        "exhausted": ~done,
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_steps", "rows", "interpret", "bounces",
        "cascade",
    ),
)
def render_gbuffers_vol(
    fused_flat: jax.Array,
    tables: dict,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    max_steps: int = MAX_TRACE_STEPS,
    row0=0,
    rows: int | None = None,
    interpret: bool | None = None,
    bounces: int = 2,
    escape: bool = True,
    cascade: bool | None = None,
) -> dict[str, jax.Array]:
    """G-buffers via the fast general-volume tracer.

    Same lighting integration as the other tracers (trace_jax
    integrate_gbuffers) with trace_rays_vol plugged in; renders arbitrary
    volume content (preloaded/edited worlds) at brick-pyramid speed.
    escape and cascade forward to trace_rays_vol (occupancy-bounds sky
    completion; straggler cascade).
    """
    from .trace_jax import integrate_gbuffers

    lr_i = uniforms["lr"].astype(jnp.int32)

    def trace(o, d, active=None):
        return trace_rays_vol(
            tables, fused_flat, o, d, lr_i, max_steps=max_steps,
            interpret=interpret, active=active,
            escape=escape, cascade=cascade,
        )

    return integrate_gbuffers(
        trace, blue_noise, uniforms, width, height, row0, rows, bounces
    )
