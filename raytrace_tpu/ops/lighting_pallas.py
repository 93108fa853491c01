"""Fused Pallas lighting kernel: the whole 5-ray path per pixel, one launch.

The staged pipeline (ops/trace_pallas.py driven by trace_jax.integrate_gbuffers)
launches one kernel per bounce leg and synchronizes all rays between legs:
every leg pays its own straggler tail, every intermediate ray state
round-trips HBM, and the compaction cascade's sorts run once per leg.  Here
each lane walks its own light path — primary, sun shadow, first diffuse
bounce, second sun, second diffuse (raytrace.comp:317-350) — transitioning
legs the moment its current ray completes, so the whole frame is ONE kernel
(plus the cascade's re-runs) and ONE compaction pipeline over 1x the pixel
count instead of 5x the ray count.

Design notes (all load-bearing for speed):
  * Traversal reuses the column-height-pyramid + lattice-height design of
    trace_pallas.py (same tables, same hit semantics).
  * Leg transitions run in the OUTER phase loop, not per traversal
    iteration: inner loops only march rays and park them on completion, so
    their bodies stay ~100-300 VPU ops.  Completion is detected
    STATELESSLY from (position, leg) — out-of-bounds means the ray reached
    sky, a position inside a solid column means it hit when it entered —
    which is also what makes the kernel resumable: a cascade level can cut
    the kernel off mid-path and the next level re-derives everything from
    the carried registers.
  * No shading happens in-kernel.  The path's light is a handful of BITS
    (which legs reached sky + which material each hit was), packed into one
    i32 meta word; a final planar XLA pass reconstructs radiance exactly
    (sky/sun colors are pure functions of per-pixel noise and uniforms).
    This keeps the cascade's sort payload at 13 operands and the
    per-iteration transition cost at zero.

Meta word layout (i32):
  bits 0-2   leg (0 primary, 1 sun1, 2 dif1, 3 sun2, 4 dif2, 5 done)
  bits 3-5   current ray's entry-face normal id
  bits 6-8   primary hit normal id
  bits 9-11  dif1 hit normal id (basis for the dif2 direction)
  bit  12    primary reached sky
  bits 13-16 sun1 / dif1 / sun2 / dif2 reached sky
  bits 17-18 primary hit material code (0 none, 1 grass, 2 rock, 3 snow)
  bits 19-20 dif1 hit material code
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LIGHTING_SCALE, MAX_TRACE_STEPS, NORMAL_SKY, ROOT_BLOCK_SIZE
from . import shading
from .trace_pallas import (  # noqa: F401
    _height_from_corners,
    _lut,
    _lut_many,
    build_hf_tables,
)

_HALF = ROOT_BLOCK_SIZE // 2
LANES = 128

# Iteration caps of the fused cascade (see trace_pallas.COMPACT_CAPS): the
# whole 5-leg path shares one budget, so caps cover total path length.
# Measured at 1024² (unified kernel, G-buffers only): () 52.6 ms,
# (32,) 53.9, (48,) 30.1, (64,) 28.1, (48,192) 36.5 — one re-partition at
# 64 iterations is the sweet spot.
FUSED_CAPS = (64,)

# Segment count for the cascade's partition/unsort sorts (see rsort in
# render_gbuffers_fused).  1 = one global sort.  Results are bit-identical
# for any value; this is purely a sorting-network-size vs
# compaction-granularity tradeoff.
SORT_SEG = 1


_MAT_CODES_CHECKED = False


def check_material_codes():
    """Fail loudly if the 2-bit material-code compression is unsound.

    The fused kernel compresses terrain materials into 2-bit codes
    (``_mat_code``: band id 2->1, 5->2, 6->3) and the final shade pass
    reconstructs packed u32s from those codes via PACKED_MATERIALS[2/5/6].
    That is only valid while (a) worldgen's material_band emits exactly ids
    {2, 5, 6} and (b) the CSV still defines those ids as solid materials.
    A materials.csv or band edit must trip this host-side check (run once
    per process from render_gbuffers_fused) instead of silently corrupting
    shading.
    """
    global _MAT_CODES_CHECKED
    if _MAT_CODES_CHECKED:
        return
    import numpy as np

    from .. import materials
    from ..world.generate import material_band

    with jax.ensure_compile_time_eval():
        z = jnp.arange(-64, 320, dtype=jnp.int32)
        band_samples = [
            np.asarray(material_band(z, jnp.full(z.shape, bits, jnp.uint32)))
            for bits in (0, 1, 17, 59, 0x7FFFFFFF, 0xFFFFFFFF)
        ]
    for bands in band_samples:
        extra = set(np.unique(bands).tolist()) - {2, 5, 6}
        if extra:
            raise AssertionError(
                f"material_band emits ids {sorted(extra)} outside the fused "
                "kernel's 2-bit code table {2,5,6} — update _mat_code"
            )
    if len(materials.MATERIALS) <= 6:
        raise AssertionError(
            "materials table no longer contains ids 2/5/6 used by the fused "
            f"kernel (len={len(materials.MATERIALS)})"
        )
    for mid in (2, 5, 6):
        if not materials.SOLID_TABLE[mid]:
            raise AssertionError(
                f"material id {mid} is no longer solid in materials.csv but "
                "the fused kernel shades it as terrain"
            )
        if int(materials.PACKED_MATERIALS[mid]) != materials.MATERIALS[mid].pack():
            raise AssertionError(f"PACKED_MATERIALS[{mid}] out of sync")
    _MAT_CODES_CHECKED = True


def _mat_code(xi, yi, zi, seed):
    """Material band at a solid voxel as a 2-bit code (1 grass 2 rock 3 snow).

    Same band function as trace_pallas._packed_material; the packed u32 is
    reconstructed from the code in the final shade pass.
    """
    from ..world.generate import material_band
    from ..world.noise import hash3_u32

    bits = hash3_u32(xi, yi, zi, seed + 1)
    band = material_band(zi, bits)
    return jnp.where(band == 2, 1, jnp.where(band == 5, 2, 3)).astype(jnp.int32)


def _make_kernel(
    tile_rows: int,
    max_steps: int,
    seed: int,
    unified: bool = False,
    unroll: int = 1,
    lazy_t: bool = False,
    legs: int = 5,
    ref_state: bool = False,
):
    S = tile_rows

    def kernel(
        iscal_ref,  # SMEM (8,) i32: r0x, r0y, lrx, lry, lrz, maxh
        fscal_ref,  # SMEM (8,) f32: sun xyz
        px_ref, py_ref, pz_ref, dx_ref, dy_ref, dz_ref,  # current ray
        qx_ref, qy_ref, qz_ref,  # bounce base point (last nudged hit)
        pd_ref,  # primary distance accumulator
        nw_ref,  # packed per-pixel blue noise (4 bytes)
        meta_ref,  # packed path state (see module docstring)
        hsub_ref, h3_ref, ca_ref, cb_ref, cc_ref, cd_ref,  # region tables
        opx_ref, opy_ref, opz_ref, odx_ref, ody_ref, odz_ref,
        oqx_ref, oqy_ref, oqz_ref, opd_ref, ometa_ref,
        *scratch_refs,  # ref_state mode: see _REFSTATE_SCRATCH
    ):
        r0x = iscal_ref[0]
        r0y = iscal_ref[1]
        lrf = (
            jnp.float32(iscal_ref[2]),
            jnp.float32(iscal_ref[3]),
            jnp.float32(iscal_ref[4]),
        )
        sun = (fscal_ref[0], fscal_ref[1], fscal_ref[2])
        # Region-wide max column height (from the pyramid's h8 level, so it
        # carries the same >= margin).  A ray at zi >= maxh that is not
        # descending can never re-enter terrain: complete it as sky NOW
        # instead of coarse-stepping it to the region boundary.  Bit-exact:
        # sky radiance depends only on the ray direction, and a primary
        # that reaches sky shades depth/fog from constants, not from pd.
        # Every completion-detection site applies the same test, so the
        # cascade's stateless resume stays consistent.
        maxh = iscal_ref[5]

        hsub = hsub_ref[:]
        h3 = h3_ref[:]
        cA, cB, cC, cD = ca_ref[:], cb_ref[:], cc_ref[:], cd_ref[:]

        eps = jnp.float32(1e-4)
        izero = jnp.zeros((S, LANES), jnp.int32)

        # Per-pixel noise values (exact k/255 reconstruction).
        nw = nw_ref[:]
        n1r = (nw & 255).astype(jnp.float32) / 255.0
        n1g = ((nw >> 8) & 255).astype(jnp.float32) / 255.0
        n2r = ((nw >> 16) & 255).astype(jnp.float32) / 255.0
        n2g = ((nw >> 24) & 255).astype(jnp.float32) / 255.0

        def norm3(x, y, z):
            inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
            return x * inv, y * inv, z * inv

        # Jittered sun directions are pure functions of the noise: hoisted
        # out of every loop (raytrace.comp:322 sun + noise.xy * 0.05).
        sj1 = norm3(sun[0] + n1r * 0.05, sun[1] + n1g * 0.05,
                    jnp.zeros((S, LANES), jnp.float32) + sun[2])
        sj2 = norm3(sun[0] + n2r * 0.05, sun[1] + n2g * 0.05,
                    jnp.zeros((S, LANES), jnp.float32) + sun[2])
        # Diffuse sphere points are pure functions of the noise too: the
        # transcendentals hoist out of the loop; only the (cheap) normal
        # displacement + renormalization stays in apply_transition.
        sp1 = shading.sphere_point(jnp, n1r, n1g)
        sp2 = shading.sphere_point(jnp, n2r, n2g)

        def classify(px, py, pz):
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
            ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
            i3 = (ry >> 3) * 32 + (rx >> 3)
            w = _lut(h3, i3)
            h8 = w & 511
            e32 = ((zi >> 5) << 5) >= ((w >> 18) & 511)
            e16 = ((zi >> 4) << 4) >= ((w >> 9) & 511)
            e8 = ((zi >> 3) << 3) >= h8
            return jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))

        def axis_terms(dv):
            """Per-axis sign/reciprocal, shared by every boundary distance
            of the iteration (each was previously recomputed per call —
            ~6 divisions/iteration on the hot path)."""
            mul = jnp.where(dv > 0, jnp.float32(-1.0), jnp.float32(1.0))
            lp = jnp.float32(1.0) / jnp.abs(dv)
            return mul, lp

        def bdist(p, mul, lp, step_f, inv_step):
            """(eps + shifted mod step) * lp with the mod as an exact
            multiply: steps are powers of two, so x * 2^-k == x / 2^k
            bit-for-bit and jnp.mod's runtime division is avoided."""
            shifted = (p + jnp.float32(_HALF)) * mul
            m = shifted - jnp.floor(shifted * inv_step) * step_f
            return (eps + m) * lp

        def inv_of_step(step):
            """Exact reciprocal of the power-of-two step via selects."""
            return jnp.where(
                step == 32, jnp.float32(1 / 32),
                jnp.where(step == 16, jnp.float32(1 / 16),
                          jnp.where(step == 8, jnp.float32(1 / 8),
                                    jnp.where(step == 4, jnp.float32(1 / 4),
                                              jnp.float32(1.0)))),
            )

        def boundary_dist(p, dv, step_f):
            mul, lp = axis_terms(dv)
            m = jnp.mod((p + jnp.float32(_HALF)) * mul, step_f)
            return (eps + m) * lp

        def oob_of(px, py, pz):
            return (
                (jnp.abs(px - lrf[0]) >= jnp.float32(_HALF))
                | (jnp.abs(py - lrf[1]) >= jnp.float32(_HALF))
                | (jnp.abs(pz - lrf[2]) >= jnp.float32(_HALF))
            )

        def hit_info(px, py, pz):
            """(inside_solid, matcode) at the current position."""
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
            ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
            i3 = (ry >> 3) * 32 + (rx >> 3)
            ca, cb, cc, cd = _lut_many((cA, cB, cC, cD), i3)
            hcol = jnp.maximum(
                _height_from_corners(ca, cb, cc, cd, xi, yi, seed), 0
            )
            return zi < hcol, _mat_code(xi, yi, zi, seed)

        # Loop state: positions/dirs/base/meta fields as SoA registers.
        meta0 = meta_ref[:]
        state = dict(
            i=jnp.int32(0),
            px=px_ref[:], py=py_ref[:], pz=pz_ref[:],
            dx=dx_ref[:], dy=dy_ref[:], dz=dz_ref[:],
            qx=qx_ref[:], qy=qy_ref[:], qz=qz_ref[:],
            pd=pd_ref[:],
            leg=meta0 & 7,
            cn=(meta0 >> 3) & 7,
            pn=(meta0 >> 6) & 7,
            nn=(meta0 >> 9) & 7,
            acc=(meta0 >> 12),
            parked=izero,
        )

        def sky_escape(pz, dz):
            """Non-descending ray above every column: sky, immediately."""
            return (dz >= jnp.float32(0)) & (
                jnp.floor(pz).astype(jnp.int32) >= maxh
            )

        def transition(s):
            """Detect completed rays statelessly and start their next leg."""
            leg = s["leg"]
            px, py, pz = s["px"], s["py"], s["pz"]
            live = leg < 5
            oob = oob_of(px, py, pz) | sky_escape(pz, s["dz"])
            solid, matc = hit_info(px, py, pz)
            completed_air = live & oob
            completed_hit = live & ~oob & solid
            return apply_transition(s, completed_air, completed_hit, matc)

        def apply_transition(s, completed_air, completed_hit, matc):
            """Start the next leg for rays whose current ray completed."""
            leg = s["leg"]
            px, py, pz = s["px"], s["py"], s["pz"]
            completed = completed_air | completed_hit

            # Nudged restart point for hit completions (raytrace.comp:166-180).
            nxv, nyv, nzv = shading.face_normal_vector(jnp, s["cn"])
            hx = px + 0.001 * nxv
            hy = py + 0.001 * nyv
            hz = pz + 0.001 * nzv

            is0 = leg == 0
            is1 = leg == 1
            is2 = leg == 2
            is3 = leg == 3
            is4 = leg == 4

            c0h = completed_hit & is0
            c2h = completed_hit & is2
            pn = jnp.where(c0h, s["cn"], s["pn"])
            nn = jnp.where(c2h, s["cn"], s["nn"])

            # Accumulator bits.
            acc = s["acc"]
            acc = acc | jnp.where(completed_air & is0, 1, 0)
            acc = acc | jnp.where(completed_air & is1, 2, 0)
            acc = acc | jnp.where(completed_air & is2, 4, 0)
            acc = acc | jnp.where(completed_air & is3, 8, 0)
            acc = acc | jnp.where(completed_air & is4, 16, 0)
            acc = acc | jnp.where(c0h, matc << 5, 0)
            acc = acc | jnp.where(c2h, matc << 7, 0)

            # Next leg: 0 -> 1 on hit / 5 on air; 1 -> 2; 2 -> 3 on hit / 5;
            # 3 -> 4; 4 -> 5.  Paths cap at `legs` rays (reduced-bounce
            # configs): any leg id >= legs is done.
            next_leg = jnp.where(
                is0, jnp.where(completed_hit, 1, 5),
                jnp.where(is1, 2,
                          jnp.where(is2, jnp.where(completed_hit, 3, 5),
                                    jnp.where(is3, 4, 5))),
            )
            if legs < 5:
                next_leg = jnp.where(next_leg >= legs, 5, next_leg)
            leg_new = jnp.where(completed, next_leg, leg)

            # Fresh base point when a bounce starts from a new hit.
            qx = jnp.where(c0h | c2h, hx, s["qx"])
            qy = jnp.where(c0h | c2h, hy, s["qy"])
            qz = jnp.where(c0h | c2h, hz, s["qz"])

            # New ray origin + direction for lanes starting a leg.
            starts1 = c0h
            starts2 = completed & is1
            starts3 = c2h
            starts4 = completed & is3
            starting = starts1 | starts2 | starts3 | starts4
            dfx, dfy, dfz = shading.diffuse_from_sphere(jnp, sp1, pn)
            gfx, gfy, gfz = shading.diffuse_from_sphere(jnp, sp2, nn)
            npx = jnp.where(starting, qx, px)
            npy = jnp.where(starting, qy, py)
            npz = jnp.where(starting, qz, pz)
            ndx = jnp.where(starts1, sj1[0], jnp.where(starts2, dfx, jnp.where(starts3, sj2[0], jnp.where(starts4, gfx, s["dx"]))))
            ndy = jnp.where(starts1, sj1[1], jnp.where(starts2, dfy, jnp.where(starts3, sj2[1], jnp.where(starts4, gfy, s["dy"]))))
            ndz = jnp.where(starts1, sj1[2], jnp.where(starts2, dfz, jnp.where(starts3, sj2[2], jnp.where(starts4, gfz, s["dz"]))))

            return dict(
                s,
                px=npx, py=npy, pz=npz,
                dx=ndx, dy=ndy, dz=ndz,
                qx=qx, qy=qy, qz=qz,
                leg=leg_new, pn=pn, nn=nn, acc=acc,
                parked=izero,
            )

        def move(s, lx, ly, lz, act):
            """Advance act lanes to the nearest boundary; park on exit."""
            dx_, dy_, dz_ = s["dx"], s["dy"], s["dz"]
            use_x = (lx < ly) & (lx < lz)
            use_y = ~(lx < ly) & (ly < lz)
            lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
            nx_id = jnp.where(dx_ > 0, jnp.int32(1), jnp.int32(0))
            ny_id = jnp.where(dy_ > 0, jnp.int32(3), jnp.int32(2))
            nz_id = jnp.where(dz_ > 0, jnp.int32(5), jnp.int32(4))
            nrm = jnp.where(use_x, nx_id, jnp.where(use_y, ny_id, nz_id))

            npx = jnp.where(act, s["px"] + dx_ * lmin, s["px"])
            npy = jnp.where(act, s["py"] + dy_ * lmin, s["py"])
            npz = jnp.where(act, s["pz"] + dz_ * lmin, s["pz"])
            cn = jnp.where(act, nrm, s["cn"])
            pd = s["pd"] + jnp.where(
                act & (s["leg"] == 0), lmin, jnp.float32(0.0)
            )
            # Rays leaving the region park; the outer transition reads the
            # out-of-bounds position as a sky completion.
            oob = oob_of(npx, npy, npz)
            parked = s["parked"] | (act & oob).astype(jnp.int32)
            return dict(
                s, i=s["i"] + 1, px=npx, py=npy, pz=npz, cn=cn, pd=pd,
                parked=parked,
            )

        def live_of(s):
            return (s["leg"] < 5) & (s["parked"] == 0)

        def cond_phase(s):
            return (s["i"] < max_steps) & jnp.any(live_of(s))

        def body_c(s):
            act = live_of(s)
            step = classify(s["px"], s["py"], s["pz"])
            near = step < 8
            s = dict(s, parked=s["parked"] | (act & near).astype(jnp.int32))
            act = act & ~near
            step_f = jnp.maximum(step, 1).astype(jnp.float32)
            lx = boundary_dist(s["px"], s["dx"], step_f)
            ly = boundary_dist(s["py"], s["dy"], step_f)
            lz = boundary_dist(s["pz"], s["dz"], step_f)
            return move(s, lx, ly, lz, act)

        def body_f(s):
            act = live_of(s)
            px, py, pz = s["px"], s["py"], s["pz"]
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
            ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
            i3 = (ry >> 3) * 32 + (rx >> 3)
            w, word, ca, cb, cc, cd = _lut_many((h3, hsub, cA, cB, cC, cD), i3)
            h8 = w & 511
            e32 = ((zi >> 5) << 5) >= ((w >> 18) & 511)
            e16 = ((zi >> 4) << 4) >= ((w >> 9) & 511)
            e8 = ((zi >> 3) << 3) >= h8
            step = jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))
            quad = (((ry >> 2) & 1) << 1) | ((rx >> 2) & 1)
            delta = (word >> (quad << 3)) & 255
            e4 = ((zi >> 2) << 2) >= (h8 - delta)
            step = jnp.where(step == 0, jnp.where(e4, 4, 0), step)
            fine = step == 0
            s = dict(s, parked=s["parked"] | (act & (step >= 8)).astype(jnp.int32))
            act = act & (step < 8)

            hcol = jnp.maximum(
                _height_from_corners(ca, cb, cc, cd, xi, yi, seed), 0
            )
            # Inside solid: the ray completed when it entered this voxel —
            # park; the outer transition re-derives the hit statelessly.
            hit_now = act & fine & (zi < hcol)
            s = dict(s, parked=s["parked"] | hit_now.astype(jnp.int32))
            act = act & ~hit_now

            step_f = jnp.maximum(step, 1).astype(jnp.float32)
            lxc = boundary_dist(px, s["dx"], step_f)
            lyc = boundary_dist(py, s["dy"], step_f)
            lzc = boundary_dist(pz, s["dz"], step_f)
            lxf = boundary_dist(px, s["dx"], jnp.float32(1.0))
            lyf = boundary_dist(py, s["dy"], jnp.float32(1.0))
            ztop = hcol.astype(jnp.float32)
            lpz = jnp.float32(1.0) / jnp.abs(s["dz"])
            lzf = jnp.where(
                (s["dz"] < 0) & (pz >= ztop),
                (eps + (pz - ztop)) * lpz,
                jnp.float32(jnp.inf),
            )
            lx = jnp.where(fine, lxf, lxc)
            ly = jnp.where(fine, lyf, lyc)
            lz = jnp.where(fine, lzf, lzc)
            return move(s, lx, ly, lz, act)

        def outer_cond(s):
            return (s["i"] < max_steps) & jnp.any(s["leg"] < 5)

        def outer_body(s):
            s = transition(s)
            s = jax.lax.while_loop(cond_phase, body_c, s)
            s = dict(s, parked=(s["leg"] >= 5).astype(jnp.int32))
            s = jax.lax.while_loop(cond_phase, body_f, s)
            return s

        def body_u(s, do_transition=True):
            """Unified body: detect/transition + classify + move, every
            iteration, for every live lane — no phases, no parking, no idle
            lanes waiting for the other phase to drain.

            do_transition=False (lazy transitions) skips the leg-transition
            block: completed lanes simply idle (act masks them out) until a
            transitioning sub-iteration re-detects the completion
            statelessly and starts their next leg.  Saves the transition's
            ~130 ops on skipped sub-iterations for ~1 idle iteration per
            leg."""
            live = s["leg"] < 5
            px, py, pz = s["px"], s["py"], s["pz"]
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
            ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
            i3 = (ry >> 3) * 32 + (rx >> 3)
            w, word, ca, cb, cc, cd = _lut_many((h3, hsub, cA, cB, cC, cD), i3)
            h8 = w & 511
            # Rising rays (dz >= 0): z along the rest of the path never drops
            # below the CURRENT voxel, so the empty-block tests may compare
            # zi itself instead of the 2^k-aligned slab floor — a climbing
            # ray takes 32-steps the whole way out instead of only after
            # clearing its slab.  (The move segment stays inside the current
            # 2^k cell in all axes by lmin-minimality, so the block's max
            # height bounds every column the segment can touch.)
            up = s["dz"] >= 0
            z32 = jnp.where(up, zi, (zi >> 5) << 5)
            z16 = jnp.where(up, zi, (zi >> 4) << 4)
            z8 = jnp.where(up, zi, (zi >> 3) << 3)
            z4 = jnp.where(up, zi, (zi >> 2) << 2)
            e32 = z32 >= ((w >> 18) & 511)
            e16 = z16 >= ((w >> 9) & 511)
            e8 = z8 >= h8
            step = jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))
            quad = (((ry >> 2) & 1) << 1) | ((rx >> 2) & 1)
            delta = (word >> (quad << 3)) & 255
            e4 = z4 >= (h8 - delta)
            step = jnp.where(step == 0, jnp.where(e4, 4, 0), step)
            fine = step == 0
            hcol = jnp.maximum(
                _height_from_corners(ca, cb, cc, cd, xi, yi, seed), 0
            )

            oob = oob_of(px, py, pz) | ((s["dz"] >= 0) & (zi >= maxh))
            completed_air = live & oob
            completed_hit = live & ~oob & (zi < hcol)
            completed = completed_air | completed_hit
            if do_transition:
                matc = _mat_code(xi, yi, zi, seed)
                s = apply_transition(s, completed_air, completed_hit, matc)

            # Transitioned lanes classify at their new origin next
            # iteration; the rest move to the next boundary now.
            act = live & ~completed
            step_f = jnp.maximum(step, 1).astype(jnp.float32)
            inv_step = inv_of_step(step)
            mulx, lpx = axis_terms(s["dx"])
            muly, lpy = axis_terms(s["dy"])
            mulz, lpz = axis_terms(s["dz"])
            one = jnp.float32(1.0)
            lxc = bdist(px, mulx, lpx, step_f, inv_step)
            lyc = bdist(py, muly, lpy, step_f, inv_step)
            lzc = bdist(pz, mulz, lpz, step_f, inv_step)
            lxf = bdist(px, mulx, lpx, one, one)
            lyf = bdist(py, muly, lpy, one, one)
            ztop = hcol.astype(jnp.float32)
            lzf = jnp.where(
                (s["dz"] < 0) & (pz >= ztop),
                (eps + (pz - ztop)) * lpz,
                jnp.float32(jnp.inf),
            )
            lx = jnp.where(fine, lxf, lxc)
            ly = jnp.where(fine, lyf, lyc)
            lz = jnp.where(fine, lzf, lzc)
            return move(s, lx, ly, lz, act)

        if unified and ref_state:
            # --- ref-state variant: state lives in VMEM refs so pl.when
            # can SKIP whole blocks per tile-iteration ---------------------
            # Gate A skips the corner-table gather + exact height eval when
            # no live lane is in fine space (straggler tiles spend most
            # iterations in coarse sky travel); gate B skips the ~130-op
            # leg-transition block when no lane completed.  Results are
            # bit-identical: skipped blocks' stale scratch values are only
            # ever read under lane masks that are all-false when the block
            # was skipped (completed_hit requires `fine`, lzf applies only
            # to fine lanes).
            hcol_s, matc_s, leg_s, cn_s, pn_s, nn_s, acc_s = scratch_refs

            # Position/direction/base/pd state lives directly in the output
            # refs; int fields in scratch.  Initialize once.
            opx_ref[:] = px_ref[:]
            opy_ref[:] = py_ref[:]
            opz_ref[:] = pz_ref[:]
            odx_ref[:] = dx_ref[:]
            ody_ref[:] = dy_ref[:]
            odz_ref[:] = dz_ref[:]
            oqx_ref[:] = qx_ref[:]
            oqy_ref[:] = qy_ref[:]
            oqz_ref[:] = qz_ref[:]
            opd_ref[:] = pd_ref[:]
            leg_s[:] = meta0 & 7
            cn_s[:] = (meta0 >> 3) & 7
            pn_s[:] = (meta0 >> 6) & 7
            nn_s[:] = (meta0 >> 9) & 7
            acc_s[:] = meta0 >> 12
            hcol_s[:] = jnp.full((S, LANES), 1 << 20, jnp.int32)
            matc_s[:] = izero

            def sub_iteration(do_transition):
                px, py, pz = opx_ref[:], opy_ref[:], opz_ref[:]
                leg = leg_s[:]
                live = leg < 5
                xi = jnp.floor(px).astype(jnp.int32)
                yi = jnp.floor(py).astype(jnp.int32)
                zi = jnp.floor(pz).astype(jnp.int32)
                rx = jnp.clip(xi - r0x, 0, ROOT_BLOCK_SIZE - 1)
                ry = jnp.clip(yi - r0y, 0, ROOT_BLOCK_SIZE - 1)
                i3 = (ry >> 3) * 32 + (rx >> 3)
                w, word = _lut_many((h3, hsub), i3)
                h8 = w & 511
                # Rising-ray rule: see body_u.
                up = odz_ref[:] >= 0
                z32 = jnp.where(up, zi, (zi >> 5) << 5)
                z16 = jnp.where(up, zi, (zi >> 4) << 4)
                z8 = jnp.where(up, zi, (zi >> 3) << 3)
                z4 = jnp.where(up, zi, (zi >> 2) << 2)
                e32 = z32 >= ((w >> 18) & 511)
                e16 = z16 >= ((w >> 9) & 511)
                e8 = z8 >= h8
                step = jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))
                quad = (((ry >> 2) & 1) << 1) | ((rx >> 2) & 1)
                delta = (word >> (quad << 3)) & 255
                e4 = z4 >= (h8 - delta)
                step = jnp.where(step == 0, jnp.where(e4, 4, 0), step)
                fine = step == 0

                @pl.when(jnp.any(fine & live))
                def _():
                    ca, cb, cc, cd = _lut_many((cA, cB, cC, cD), i3)
                    hcol_s[:] = jnp.maximum(
                        _height_from_corners(ca, cb, cc, cd, xi, yi, seed), 0
                    )
                    if do_transition:
                        matc_s[:] = _mat_code(xi, yi, zi, seed)

                hcol = hcol_s[:]
                oob = oob_of(px, py, pz) | ((odz_ref[:] >= 0) & (zi >= maxh))
                completed_air = live & oob
                # completed_hit requires `fine`: solid voxels always
                # classify fine (the pyramid never reports them empty), so
                # the extra conjunct is a no-op for real hits and makes
                # stale hcol values harmless when gate A was skipped.
                completed_hit = live & ~oob & fine & (zi < hcol)
                completed = completed_air | completed_hit

                if do_transition:
                    @pl.when(jnp.any(completed))
                    def _():
                        s_now = dict(
                            px=px, py=py, pz=pz,
                            dx=odx_ref[:], dy=ody_ref[:], dz=odz_ref[:],
                            qx=oqx_ref[:], qy=oqy_ref[:], qz=oqz_ref[:],
                            leg=leg, cn=cn_s[:], pn=pn_s[:], nn=nn_s[:],
                            acc=acc_s[:], pd=opd_ref[:], i=jnp.int32(0),
                            parked=izero,
                        )
                        ns = apply_transition(
                            s_now, completed_air, completed_hit, matc_s[:]
                        )
                        opx_ref[:] = ns["px"]
                        opy_ref[:] = ns["py"]
                        opz_ref[:] = ns["pz"]
                        odx_ref[:] = ns["dx"]
                        ody_ref[:] = ns["dy"]
                        odz_ref[:] = ns["dz"]
                        oqx_ref[:] = ns["qx"]
                        oqy_ref[:] = ns["qy"]
                        oqz_ref[:] = ns["qz"]
                        leg_s[:] = ns["leg"]
                        pn_s[:] = ns["pn"]
                        nn_s[:] = ns["nn"]
                        acc_s[:] = ns["acc"]

                # Move (post-transition state; transitioned lanes classify
                # at their new origin next iteration).
                act = live & ~completed
                px2, py2, pz2 = opx_ref[:], opy_ref[:], opz_ref[:]
                dx2, dy2, dz2 = odx_ref[:], ody_ref[:], odz_ref[:]
                step_f = jnp.maximum(step, 1).astype(jnp.float32)
                inv_step = inv_of_step(step)
                mulx, lpx = axis_terms(dx2)
                muly, lpy = axis_terms(dy2)
                mulz, lpz = axis_terms(dz2)
                one = jnp.float32(1.0)
                lxc = bdist(px, mulx, lpx, step_f, inv_step)
                lyc = bdist(py, muly, lpy, step_f, inv_step)
                lzc = bdist(pz, mulz, lpz, step_f, inv_step)
                lxf = bdist(px, mulx, lpx, one, one)
                lyf = bdist(py, muly, lpy, one, one)
                ztop = hcol.astype(jnp.float32)
                lzf = jnp.where(
                    (dz2 < 0) & (pz >= ztop),
                    (eps + (pz - ztop)) * lpz,
                    jnp.float32(jnp.inf),
                )
                lx = jnp.where(fine, lxf, lxc)
                ly = jnp.where(fine, lyf, lyc)
                lz = jnp.where(fine, lzf, lzc)
                use_x = (lx < ly) & (lx < lz)
                use_y = ~(lx < ly) & (ly < lz)
                lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
                nx_id = jnp.where(dx2 > 0, jnp.int32(1), jnp.int32(0))
                ny_id = jnp.where(dy2 > 0, jnp.int32(3), jnp.int32(2))
                nz_id = jnp.where(dz2 > 0, jnp.int32(5), jnp.int32(4))
                nrm = jnp.where(use_x, nx_id, jnp.where(use_y, ny_id, nz_id))
                opx_ref[:] = jnp.where(act, px2 + dx2 * lmin, px2)
                opy_ref[:] = jnp.where(act, py2 + dy2 * lmin, py2)
                opz_ref[:] = jnp.where(act, pz2 + dz2 * lmin, pz2)
                cn_s[:] = jnp.where(act, nrm, cn_s[:])
                opd_ref[:] = opd_ref[:] + jnp.where(
                    act & (leg_s[:] == 0), lmin, jnp.float32(0.0)
                )

            def rs_body(carry):
                i, _ = carry
                for j in range(unroll):
                    sub_iteration((not lazy_t) or j == unroll - 1)
                return (i + unroll, jnp.any(leg_s[:] < 5))

            def rs_cond(carry):
                return (carry[0] < max_steps) & carry[1]

            jax.lax.while_loop(rs_cond, rs_body, (jnp.int32(0), jnp.bool_(True)))

            # Final stateless transition (pure): completions from the last
            # move are applied, then the meta word is packed.
            s_fin = dict(
                px=opx_ref[:], py=opy_ref[:], pz=opz_ref[:],
                dx=odx_ref[:], dy=ody_ref[:], dz=odz_ref[:],
                qx=oqx_ref[:], qy=oqy_ref[:], qz=oqz_ref[:],
                leg=leg_s[:], cn=cn_s[:], pn=pn_s[:], nn=nn_s[:],
                acc=acc_s[:], pd=opd_ref[:], i=jnp.int32(0), parked=izero,
            )
            s = transition(s_fin)
            opx_ref[:] = s["px"]
            opy_ref[:] = s["py"]
            opz_ref[:] = s["pz"]
            odx_ref[:] = s["dx"]
            ody_ref[:] = s["dy"]
            odz_ref[:] = s["dz"]
            oqx_ref[:] = s["qx"]
            oqy_ref[:] = s["qy"]
            oqz_ref[:] = s["qz"]
            opd_ref[:] = s["pd"]
            ometa_ref[:] = (
                s["leg"] | (s["cn"] << 3) | (s["pn"] << 6) | (s["nn"] << 9)
                | (s["acc"] << 12)
            )
            return

        if unified:
            # unroll > 1 runs the body N times per loop trip: the exit test
            # (an all-lane reduction) amortizes over N iterations; done
            # lanes are masked no-ops so semantics are unchanged.
            def body_un(s):
                for j in range(unroll):
                    s = body_u(
                        s, do_transition=(not lazy_t) or j == unroll - 1
                    )
                return s

            s = jax.lax.while_loop(outer_cond, body_un, state)
            # Final stateless transition: completions from the last
            # iteration's move are applied here.
            s = transition(s)
        else:
            s = jax.lax.while_loop(outer_cond, outer_body, state)
            # One final transition so completions from the last phase pass
            # are not lost when every lane is otherwise done (the loop exits
            # before applying them).
            s = transition(s)

        opx_ref[:] = s["px"]
        opy_ref[:] = s["py"]
        opz_ref[:] = s["pz"]
        odx_ref[:] = s["dx"]
        ody_ref[:] = s["dy"]
        odz_ref[:] = s["dz"]
        oqx_ref[:] = s["qx"]
        oqy_ref[:] = s["qy"]
        oqz_ref[:] = s["qz"]
        opd_ref[:] = s["pd"]
        ometa_ref[:] = (
            s["leg"] | (s["cn"] << 3) | (s["pn"] << 6) | (s["nn"] << 9)
            | (s["acc"] << 12)
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_steps", "seed", "tile_rows", "interpret", "caps",
        "unified", "unroll", "rows", "lazy_t", "tail_rows", "bounces",
        "ref_state",
    ),
)
def render_gbuffers_fused(
    tables: dict,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    max_steps: int = MAX_TRACE_STEPS,
    seed: int = 0,
    tile_rows: int = 16,
    interpret: bool | None = None,
    caps: tuple = FUSED_CAPS,
    unified: bool = True,
    unroll: int = 3,
    lazy_t: bool = True,
    tail_rows: int | None = None,
    row0=0,
    rows: int | None = None,
    bounces: int = 2,
    ref_state: bool = False,
) -> dict[str, jax.Array]:
    """Full G-buffer pass through the fused path kernel + compaction cascade.

    Output-compatible with trace_jax.integrate_gbuffers / render_gbuffers_hf.
    `blue_noise` values MUST be exact k/255 multiples (true for the packed-u8
    synthesized texture, utils/blue_noise.py): the kernel traces diffuse and
    sun-jitter directions from a u8-requantized noise word while the final
    shade recomputes the same directions from the float noise — arbitrary
    [0,1) noise would silently diverge traced occlusion from shaded sky.
    `caps` bounds each cascade level's iterations (whole-path budget); after
    each level the not-yet-done rays are stably sorted to the front so
    straggler paths stop holding whole tiles hostage (see
    trace_pallas.COMPACT_CAPS for the rationale and measurements).
    `row0`/`rows` select a band of image rows (multi-chip tile split);
    row0 may be traced (lax.axis_index), rows must be static.
    """
    from .trace_jax import camera_rays

    check_material_codes()
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    band_h = height if rows is None else rows
    origin, ray_dir = camera_rays(uniforms, width, height, row0, rows)
    nh, nw_ = blue_noise.shape[0], blue_noise.shape[1]
    seed_u = uniforms["seed"].astype(jnp.int32)
    off_x = jnp.floor(blue_noise[seed_u // nw_ % nh, seed_u % nw_, 0] * 255.0 + 0.5).astype(jnp.int32)
    off_y = jnp.floor(blue_noise[seed_u // nw_ % nh, seed_u % nw_, 1] * 255.0 + 0.5).astype(jnp.int32)
    off_y = off_y + jnp.asarray(row0, jnp.int32)  # band offset rides the roll
    base = jnp.roll(blue_noise, (-off_y, -off_x), (0, 1))
    reps_y = -(-band_h // nh)
    reps_x = -(-width // nw_)
    noise1 = jnp.tile(base, (reps_y, reps_x, 1))[:band_h, :width]
    base2 = jnp.roll(blue_noise, (-off_y - 2, -off_x - 2), (0, 1))
    noise2 = jnp.tile(base2, (reps_y, reps_x, 1))[:band_h, :width]

    sun = shading.sun_direction(jnp, uniforms["sun_angle"])
    sunlight = shading.sun_color(jnp, sun)
    fscal = jnp.stack(
        [sun[0], sun[1], sun[2], jnp.float32(0), jnp.float32(0),
         jnp.float32(0), jnp.float32(0), jnp.float32(0)]
    ).astype(jnp.float32)
    lri = uniforms["lr"].astype(jnp.int32)
    # Region-wide max column height for the kernel's sky-escape shortcut:
    # the max of the pyramid's per-8-block h8 level keeps its conservative
    # >= margin (a tiny reduce; h3 is 1024 words).
    maxh = jnp.max(tables["h3"] & 511).astype(jnp.int32)
    iscal = jnp.stack(
        [tables["r0"][0], tables["r0"][1], lri[0], lri[1], lri[2],
         maxh, jnp.int32(0), jnp.int32(0)]
    )

    n = width * band_h
    per_tile = tile_rows * LANES
    n_pad = -(-n // per_tile) * per_tile
    grid = n_pad // per_tile
    rows = grid * tile_rows

    def flat(x, pad_value=0.0):
        # Tail rays sit far outside the region: the first transition reads
        # them as sky completions at zero traversal cost.
        f = x.reshape(n)
        f = jnp.pad(f, (0, n_pad - n), constant_values=pad_value)
        return f.reshape(rows, LANES)

    def byte(img):
        return jnp.round(img * 255.0).astype(jnp.int32)

    nw = (
        byte(noise1[..., 0])
        | (byte(noise1[..., 1]) << 8)
        | (byte(noise2[..., 0]) << 16)
        | (byte(noise2[..., 1]) << 24)
    )

    def flat_i(x, pad_value=0):
        f = x.reshape(n)
        f = jnp.pad(f, (0, n_pad - n), constant_values=pad_value)
        return f.reshape(rows, LANES)

    zero_f = jnp.zeros((rows, LANES), jnp.float32)
    zero_i = jnp.zeros((rows, LANES), jnp.int32)
    cx = flat(origin[..., 0])
    cy = flat(origin[..., 1])
    cz = flat(origin[..., 2], 1e9)
    cdx = flat(ray_dir[..., 0])
    cdy = flat(ray_dir[..., 1])
    cdz = flat(ray_dir[..., 2], 1.0)
    cqx, cqy, cqz = zero_f, zero_f, zero_f
    cpd = zero_f
    cnw = flat_i(nw)
    cmeta = zero_i
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    cidx = iota

    table_spec = lambda t: pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    outf = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    outi = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    table_keys = ("hsub", "h3", "cA", "cB", "cC", "cD")

    legs = 1 + 2 * bounces  # rays per path: primary + (sun, diffuse) pairs

    def run_pass(steps, *ops, rows_per_tile=None):
        # Later cascade levels may use smaller tiles: after compaction the
        # stragglers are few, and a smaller tile bounds the idle-lane cost
        # of each tile's max path length more tightly.
        tr = tile_rows if rows_per_tile is None else rows_per_tile
        # grid=(rows // tr): a non-divisor tr would silently drop the tail
        # tile (its output rows would be garbage) — fail loudly instead.
        assert rows % tr == 0, (rows, tr)
        ray_spec = pl.BlockSpec(
            (tr, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        use_rs = ref_state and unified
        kernel = _make_kernel(
            tr, steps, seed, unified, unroll, lazy_t, legs, ref_state=use_rs
        )
        # _REFSTATE_SCRATCH: hcol (i32), matc, leg, cn, pn, nn, acc.
        scratch = (
            [pltpu.VMEM((tr, LANES), jnp.int32)] * 7 if use_rs else []
        )
        return pl.pallas_call(
            kernel,
            grid=(rows // tr,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [ray_spec] * 12
            + [table_spec(tables[k]) for k in table_keys],
            out_specs=[ray_spec] * 11,
            out_shape=[outf] * 10 + [outi],
            scratch_shapes=scratch,
            interpret=interpret,
        )(iscal, fscal, *ops, *(tables[k] for k in table_keys))

    def rsort(key, ops):
        # Segmented sort: rays are independent (the march reads only a
        # lane's own registers) and the final unsort restores exact pixel
        # order, so partitioning within SORT_SEG independent segments is
        # bit-identical to one global sort — while the O(n log^2 n) sorting
        # network shrinks with the segment length.  The only cost is
        # compaction granularity: stragglers pack to the front of their own
        # segment (ceil(live_s/tile) live tiles per segment) instead of the
        # front of the frame.
        seg = SORT_SEG if SORT_SEG > 0 and n_pad % SORT_SEG == 0 else 1
        shape = (seg, n_pad // seg) if seg > 1 else (n_pad,)
        out = jax.lax.sort(
            (key.reshape(shape),) + tuple(x.reshape(shape) for x in ops),
            num_keys=1,
        )
        return tuple(x.reshape(rows, LANES) for x in out[1:])

    levels = [c for c in caps if 0 < c < max_steps] + [max_steps]
    for li, cap in enumerate(levels):
        if li > 0:
            # Stable partition: unfinished paths first (sorted by the
            # single-bit done key + original position; spatial coherence of
            # the stragglers survives).  All-done suffix tiles exit the next
            # pass at zero traversal iterations.
            done = ((cmeta & 7) == 5).astype(jnp.int32)
            key = done * jnp.int32(n_pad) + iota
            (cx, cy, cz, cdx, cdy, cdz, cqx, cqy, cqz, cpd, cnw, cmeta,
             cidx) = rsort(
                key,
                (cx, cy, cz, cdx, cdy, cdz, cqx, cqy, cqz, cpd, cnw, cmeta,
                 cidx),
            )
        (cx, cy, cz, cdx, cdy, cdz, cqx, cqy, cqz, cpd, cmeta) = run_pass(
            cap, cx, cy, cz, cdx, cdy, cdz, cqx, cqy, cqz, cpd, cnw, cmeta,
            rows_per_tile=None if li == 0 else tail_rows,
        )

    # Back to pixel order; only the shade inputs travel.
    cmeta, cpd = rsort(cidx, (cmeta, cpd))

    def unflat(x):
        return x.reshape(n_pad)[:n].reshape(band_h, width)

    meta = unflat(cmeta)
    pdist = unflat(cpd)

    # ---- final shade: reconstruct radiance from the path bits (planar) ----
    leg = meta & 7
    pn = (meta >> 6) & 7
    nn = (meta >> 9) & 7
    acc = meta >> 12
    p_air = (acc & 1) != 0
    a1 = ((acc >> 1) & 1).astype(jnp.float32)
    a2 = ((acc >> 2) & 1).astype(jnp.float32)
    a3 = ((acc >> 3) & 1).astype(jnp.float32)
    a4 = ((acc >> 4) & 1).astype(jnp.float32)
    pmat = (acc >> 5) & 3
    dmat = (acc >> 7) & 3

    from ..materials import PACKED_MATERIALS

    def mat_albedo(code):
        packed = jnp.where(
            code == 1, jnp.int32(int(PACKED_MATERIALS[2])),
            jnp.where(code == 2, jnp.int32(int(PACKED_MATERIALS[5])),
                      jnp.where(code == 3, jnp.int32(int(PACKED_MATERIALS[6])),
                                jnp.int32(0))),
        )
        return [
            ((packed >> 14) & 0x7F).astype(jnp.float32) / 127.0,
            ((packed >> 7) & 0x7F).astype(jnp.float32) / 127.0,
            (packed & 0x7F).astype(jnp.float32) / 127.0,
        ]

    alb_p = mat_albedo(pmat)
    alb_d = mat_albedo(dmat)

    def sky_ch(dxyz, include_sun):
        return shading.sample_sky(jnp, dxyz, sun, sunlight, include_sun)

    d1 = shading.diffuse_direction(jnp, noise1[..., 0], noise1[..., 1], pn)
    d2 = shading.diffuse_direction(jnp, noise2[..., 0], noise2[..., 1], nn)
    rd = (ray_dir[..., 0], ray_dir[..., 1], ray_dir[..., 2])
    sky0 = sky_ch(rd, True)
    sky1 = sky_ch(d1, True)
    sky2 = sky_ch(d2, True)
    fog0 = sky_ch(rd, False)

    light = []
    for c in range(3):
        lh = a1 * sunlight[c] + a2 * sky1[c] + (
            a3 * sunlight[c] + a4 * sky2[c]
        ) * alb_d[c]
        light.append(jnp.where(p_air, sky0[c] + jnp.zeros_like(lh), lh))
    lighting = jnp.stack(light, -1) / jnp.float32(LIGHTING_SCALE)

    exhausted = leg == 0  # primary ray never resolved: the REPORT_ERROR case
    depth = jnp.where(
        p_air,
        jnp.uint32(0xFFFF),
        jnp.minimum(pdist * 32.0, jnp.float32(0xFFFF)).astype(jnp.uint32),
    ).astype(jnp.uint16)
    depth = jnp.where(exhausted, jnp.uint16(256 * 254), depth)
    fog = jnp.stack(
        [jnp.broadcast_to(f, leg.shape) for f in fog0], -1
    ) / 2.0
    fog = jnp.where(exhausted[..., None], jnp.array([1.0, 0.0, 1.0], jnp.float32), fog)

    hit_mask = ~p_air
    albedo = jnp.stack(
        [jnp.where(hit_mask, a, 1.0) for a in alb_p], -1
    )
    normal = jnp.where(p_air, jnp.int32(NORMAL_SKY), pn).astype(jnp.uint8)

    return {
        "lighting": lighting,
        "depth": depth,
        "normal": normal,
        "albedo": albedo,
        "emission": jnp.zeros_like(lighting),
        "fog": fog,
    }
