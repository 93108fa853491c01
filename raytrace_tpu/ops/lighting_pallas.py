"""Fused Pallas lighting kernel: the whole 5-ray path per pixel, one launch.

The staged pipeline (ops/trace_pallas.py driven by trace_jax.integrate_gbuffers)
launches one kernel per bounce leg and synchronizes all rays between legs, so
each leg's cost is the max over ALL pixels, and every intermediate ray state
round-trips HBM.  Here each lane walks its own light path — primary, sun
shadow, first diffuse bounce, second sun, second diffuse
(raytrace.comp:317-350) — transitioning legs the moment its current ray
completes.  Tile cost becomes max over lanes of the *total* path length
instead of the sum of per-leg maxima, intermediate state never leaves VMEM,
and four dispatches disappear.

Traversal reuses the column-height-pyramid + analytic-column design of
trace_pallas.py (same tables, same hit semantics); the sky/sun shading
(ops/shading.py formulas) is evaluated in-kernel at leg transitions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MAX_TRACE_STEPS, ROOT_BLOCK_SIZE
from . import shading
from .trace_pallas import _lut, _packed_material, build_hf_tables  # noqa: F401

_HALF = ROOT_BLOCK_SIZE // 2
LANES = 128


def _make_kernel(tile_rows: int, max_steps: int, seed: int):
    S = tile_rows

    def kernel(
        iscal_ref,  # SMEM (8,) i32: r0x, r0y, lrx, lry, lrz
        fscal_ref,  # SMEM (8,) f32: sunx, suny, sunz, slr, slg, slb
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # camera rays
        n1r_ref, n1g_ref, n2r_ref, n2g_ref,  # per-pixel blue noise
        hsub_ref, h3_ref,  # packed pyramid tables (see build_hf_tables)
        lr_ref, lg_ref, lb_ref,  # lighting out (pre /16)
        pnormal_ref, pair_ref, ppacked_ref, pdist_ref, pexh_ref,  # primary out
    ):
        r0x = iscal_ref[0]
        r0y = iscal_ref[1]
        lrf = (
            jnp.float32(iscal_ref[2]),
            jnp.float32(iscal_ref[3]),
            jnp.float32(iscal_ref[4]),
        )
        sun = (fscal_ref[0], fscal_ref[1], fscal_ref[2])
        sunlight = (fscal_ref[3], fscal_ref[4], fscal_ref[5])

        hsub = hsub_ref[:]
        h3 = h3_ref[:]
        n1r, n1g = n1r_ref[:], n1g_ref[:]
        n2r, n2g = n2r_ref[:], n2g_ref[:]

        eps = jnp.float32(1e-4)

        def norm3(x, y, z):
            inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-20))
            return x * inv, y * inv, z * inv

        def sky3(dx_, dy_, dz_, include_sun):
            r, g, b = shading.sample_sky(
                jnp, (dx_, dy_, dz_), sun, sunlight, include_sun
            )
            return r, g, b

        def sun_jitter(nr, ng):
            return norm3(sun[0] + nr * 0.05, sun[1] + ng * 0.05, sun[2])

        def diffuse3(nr, ng, normal_id):
            return shading.diffuse_direction(jnp, nr, ng, normal_id)

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
            step = jnp.where(e32, 32, jnp.where(e16, 16, jnp.where(e8, 8, 0)))
            return xi, yi, zi, step, h8, i3, rx, ry

        def height_of(xi, yi):
            from ..world.heightmap import height_at

            return height_at(xi, yi, seed)

        def boundary_dist(p, dv, step_f):
            mul = jnp.where(dv > 0, jnp.float32(-1.0), jnp.float32(1.0))
            lp = jnp.float32(1.0) / jnp.abs(dv)
            m = jnp.mod((p + jnp.float32(_HALF)) * mul, step_f)
            return (eps + m) * lp

        zero = jnp.zeros((S, LANES), jnp.float32)
        izero = jnp.zeros((S, LANES), jnp.int32)

        state = dict(
            i=jnp.int32(0),
            leg=izero,  # 0 primary, 1 sun1, 2 dif1, 3 sun2, 4 dif2, 5 done
            px=ox_ref[:], py=oy_ref[:], pz=oz_ref[:],
            dx=dx_ref[:], dy=dy_ref[:], dz=dz_ref[:],
            normal=izero,
            parked=izero,
            lightr=zero, lightg=zero, lightb=zero,
            l2r=zero, l2g=zero, l2b=zero,
            q1x=zero, q1y=zero, q1z=zero,  # primary hit position (nudged)
            q2x=zero, q2y=zero, q2z=zero,  # dif1 hit position (nudged)
            p_normal=izero, p_air=izero, p_packed=izero, p_dist=zero,
            n1_normal=izero,  # normal at primary hit (for d1) / dif1 hit (for d2)
            d1_packed=izero,  # dif1 hit material (0 if sky)
        )

        def transition(s, completed_hit, completed_air, hcol):
            """Apply leg transitions for rays that just completed."""
            leg = s["leg"]
            px, py, pz = s["px"], s["py"], s["pz"]
            dx_, dy_, dz_ = s["dx"], s["dy"], s["dz"]
            completed = completed_hit | completed_air

            # Hit voxel + nudged restart position for hit completions.
            nx_, ny_, nz_ = shading.face_normal_vector(jnp, s["normal"])
            hx = px + 0.001 * nx_
            hy = py + 0.001 * ny_
            hz = pz + 0.001 * nz_
            xi = jnp.floor(px).astype(jnp.int32)
            yi = jnp.floor(py).astype(jnp.int32)
            zi = jnp.floor(pz).astype(jnp.int32)
            packed = _packed_material(xi, yi, zi, seed).astype(jnp.int32)

            # Shading values used at transitions.
            skyr, skyg, skyb = sky3(dx_, dy_, dz_, True)
            sjx1, sjy1, sjz1 = sun_jitter(n1r, n1g)
            sjx2, sjy2, sjz2 = sun_jitter(n2r, n2g)

            is0 = leg == 0
            is1 = leg == 1
            is2 = leg == 2
            is3 = leg == 3
            is4 = leg == 4

            # --- record primary G-buffer data (leg 0 completion) ---
            c0 = completed & is0
            ox0, oy0, oz0 = ox_ref[:], oy_ref[:], oz_ref[:]
            dist0 = jnp.sqrt(
                (px - ox0) ** 2 + (py - oy0) ** 2 + (pz - oz0) ** 2
            )
            p_air = jnp.where(c0, completed_air.astype(jnp.int32), s["p_air"])
            p_normal = jnp.where(c0, s["normal"], s["p_normal"])
            p_packed = jnp.where(
                c0 & completed_hit, packed, s["p_packed"]
            )
            p_dist = jnp.where(c0, dist0, s["p_dist"])

            # --- lighting accumulation ---
            lightr, lightg, lightb = s["lightr"], s["lightg"], s["lightb"]
            # primary sky: full sky with sun disk
            a0 = c0 & completed_air
            lightr = jnp.where(a0, skyr, lightr)
            lightg = jnp.where(a0, skyg, lightg)
            lightb = jnp.where(a0, skyb, lightb)
            # sun legs reaching sky add sunlight
            a1 = completed_air & is1
            lightr = jnp.where(a1, lightr + sunlight[0], lightr)
            lightg = jnp.where(a1, lightg + sunlight[1], lightg)
            lightb = jnp.where(a1, lightb + sunlight[2], lightb)
            a2 = completed_air & is2
            lightr = jnp.where(a2, lightr + skyr, lightr)
            lightg = jnp.where(a2, lightg + skyg, lightg)
            lightb = jnp.where(a2, lightb + skyb, lightb)
            l2r, l2g, l2b = s["l2r"], s["l2g"], s["l2b"]
            a3 = completed_air & is3
            l2r = jnp.where(a3, l2r + sunlight[0], l2r)
            l2g = jnp.where(a3, l2g + sunlight[1], l2g)
            l2b = jnp.where(a3, l2b + sunlight[2], l2b)
            a4 = completed_air & is4
            l2r = jnp.where(a4, l2r + skyr, l2r)
            l2g = jnp.where(a4, l2g + skyg, l2g)
            l2b = jnp.where(a4, l2b + skyb, l2b)

            # --- saved hit state ---
            h0 = c0 & completed_hit
            q1x = jnp.where(h0, hx, s["q1x"])
            q1y = jnp.where(h0, hy, s["q1y"])
            q1z = jnp.where(h0, hz, s["q1z"])
            h2_ = completed_hit & is2
            q2x = jnp.where(h2_, hx, s["q2x"])
            q2y = jnp.where(h2_, hy, s["q2y"])
            q2z = jnp.where(h2_, hz, s["q2z"])
            d1_packed = jnp.where(h2_, packed, s["d1_packed"])
            n1_normal = jnp.where(
                h0, s["normal"], jnp.where(h2_, s["normal"], s["n1_normal"])
            )

            # --- next leg + next ray ---
            # leg 0: hit -> 1 (sun1 from q1); air -> 5
            # leg 1: always -> 2 (dif1 from q1, diffuse(n1, primary normal))
            # leg 2: hit -> 3 (sun2 from q2); air -> 5
            # leg 3: always -> 4 (dif2 from q2, diffuse(n2, dif1 normal))
            # leg 4: always -> 5
            next_leg = jnp.where(
                is0, jnp.where(completed_hit, 1, 5),
                jnp.where(is1, 2,
                          jnp.where(is2, jnp.where(completed_hit, 3, 5),
                                    jnp.where(is3, 4, 5))),
            )
            leg_new = jnp.where(completed, next_leg, leg)

            dfx, dfy, dfz = diffuse3(n1r, n1g, n1_normal)
            dfx2, dfy2, dfz2 = diffuse3(n2r, n2g, n1_normal)

            starts1 = completed & is0 & completed_hit  # -> sun1
            starts2 = completed & is1                  # -> dif1
            starts3 = completed & is2 & completed_hit  # -> sun2
            starts4 = completed & is3                  # -> dif2
            npx = jnp.where(starts1 | starts2, q1x, jnp.where(starts3 | starts4, q2x, px))
            npy = jnp.where(starts1 | starts2, q1y, jnp.where(starts3 | starts4, q2y, py))
            npz = jnp.where(starts1 | starts2, q1z, jnp.where(starts3 | starts4, q2z, pz))
            ndx = jnp.where(starts1, sjx1, jnp.where(starts2, dfx, jnp.where(starts3, sjx2, jnp.where(starts4, dfx2, dx_))))
            ndy = jnp.where(starts1, sjy1, jnp.where(starts2, dfy, jnp.where(starts3, sjy2, jnp.where(starts4, dfy2, dy_))))
            ndz = jnp.where(starts1, sjz1, jnp.where(starts2, dfz, jnp.where(starts3, sjz2, jnp.where(starts4, dfz2, dz_))))

            return dict(
                s,
                leg=leg_new,
                px=npx, py=npy, pz=npz,
                dx=ndx, dy=ndy, dz=ndz,
                lightr=lightr, lightg=lightg, lightb=lightb,
                l2r=l2r, l2g=l2g, l2b=l2b,
                q1x=q1x, q1y=q1y, q1z=q1z,
                q2x=q2x, q2y=q2y, q2z=q2z,
                p_normal=p_normal, p_air=p_air, p_packed=p_packed, p_dist=p_dist,
                n1_normal=n1_normal, d1_packed=d1_packed,
            )

        def move_and_complete(s, lx, ly, lz, act, hit_now, hcol):
            """Advance act lanes, detect air completions, run transitions."""
            dx_, dy_, dz_ = s["dx"], s["dy"], s["dz"]
            use_x = (lx < ly) & (lx < lz)
            use_y = ~(lx < ly) & (ly < lz)
            lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
            nx_id = jnp.where(dx_ > 0, jnp.int32(1), jnp.int32(0))
            ny_id = jnp.where(dy_ > 0, jnp.int32(3), jnp.int32(2))
            nz_id = jnp.where(dz_ > 0, jnp.int32(5), jnp.int32(4))
            nrm = jnp.where(use_x, nx_id, jnp.where(use_y, ny_id, nz_id))

            move = act & ~hit_now
            npx = jnp.where(move, s["px"] + dx_ * lmin, s["px"])
            npy = jnp.where(move, s["py"] + dy_ * lmin, s["py"])
            npz = jnp.where(move, s["pz"] + dz_ * lmin, s["pz"])
            nnormal = jnp.where(move, nrm, s["normal"])

            oob = (
                (jnp.abs(npx - lrf[0]) >= jnp.float32(_HALF))
                | (jnp.abs(npy - lrf[1]) >= jnp.float32(_HALF))
                | (jnp.abs(npz - lrf[2]) >= jnp.float32(_HALF))
            )
            completed_air = move & oob
            s = dict(s, px=npx, py=npy, pz=npz, normal=nnormal, i=s["i"] + 1)
            return transition(s, hit_now, completed_air, hcol)

        # ---- alternating coarse/fine phases (see trace_pallas.py) ----
        def live(s):
            return (s["leg"] < 5) & (s["parked"] == 0)

        def cond_phase(s):
            return (s["i"] < max_steps) & (
                jnp.sum(live(s).astype(jnp.int32)) > 0
            )

        def body_c(s):
            act = live(s)
            _, _, _, step, _, _, _, _ = classify(s["px"], s["py"], s["pz"])
            near = step < 8
            s = dict(s, parked=s["parked"] | (act & near).astype(jnp.int32))
            act = act & ~near
            step_f = jnp.maximum(step, 1).astype(jnp.float32)
            lx = boundary_dist(s["px"], s["dx"], step_f)
            ly = boundary_dist(s["py"], s["dy"], step_f)
            lz = boundary_dist(s["pz"], s["dz"], step_f)
            return move_and_complete(
                s, lx, ly, lz, act, jnp.zeros((S, LANES), bool), izero
            )

        def body_f(s):
            act = live(s)
            px, py, pz = s["px"], s["py"], s["pz"]
            xi, yi, zi, step, h8, i3, rx, ry = classify(px, py, pz)
            word = _lut(hsub, i3)
            quad = (((ry >> 2) & 1) << 1) | ((rx >> 2) & 1)
            delta = (word >> (quad << 3)) & 255
            e4 = ((zi >> 2) << 2) >= (h8 - delta)
            step = jnp.where(step == 0, jnp.where(e4, 4, 0), step)
            fine = step == 0
            s = dict(s, parked=s["parked"] | (act & (step >= 8)).astype(jnp.int32))
            act = act & (step < 8)

            hcol = jnp.maximum(height_of(xi, yi), 0)
            hit_now = act & fine & (zi < hcol)

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
            return move_and_complete(s, lx, ly, lz, act, hit_now, hcol)

        def outer_cond(s):
            return (s["i"] < max_steps) & (
                jnp.sum((s["leg"] < 5).astype(jnp.int32)) > 0
            )

        def outer_body(s):
            s = dict(s, parked=izero)
            s = jax.lax.while_loop(cond_phase, body_c, s)
            s = dict(s, parked=(s["leg"] >= 5).astype(jnp.int32))
            s = jax.lax.while_loop(cond_phase, body_f, s)
            return s

        s = jax.lax.while_loop(outer_cond, outer_body, state)

        # Final combine: light += light2 * albedo(dif1); d1_packed is 0 when
        # dif1 reached the sky, so the term vanishes (raytrace.comp:333-348).
        p1 = s["d1_packed"]
        a1r = ((p1 >> 14) & 0x7F).astype(jnp.float32) / 127.0
        a1g = ((p1 >> 7) & 0x7F).astype(jnp.float32) / 127.0
        a1b = (p1 & 0x7F).astype(jnp.float32) / 127.0
        lr_ref[:] = s["lightr"] + s["l2r"] * a1r
        lg_ref[:] = s["lightg"] + s["l2g"] * a1g
        lb_ref[:] = s["lightb"] + s["l2b"] * a1b
        pnormal_ref[:] = s["p_normal"]
        pair_ref[:] = s["p_air"]
        ppacked_ref[:] = s["p_packed"]
        pdist_ref[:] = s["p_dist"]
        pexh_ref[:] = (s["leg"] == 0).astype(jnp.int32)  # primary never resolved

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "max_steps", "seed", "tile_rows", "interpret"),
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
) -> dict[str, jax.Array]:
    """Full G-buffer pass through the fused lighting kernel.

    Output-compatible with trace_jax.integrate_gbuffers / render_gbuffers_hf.
    """
    from ..constants import LIGHTING_SCALE, NORMAL_SKY
    from .trace_jax import camera_rays

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    origin, ray_dir = camera_rays(uniforms, width, height)
    nh, nw = blue_noise.shape[0], blue_noise.shape[1]
    seed_u = uniforms["seed"].astype(jnp.int32)
    off_x = jnp.floor(blue_noise[seed_u // nw % nh, seed_u % nw, 0] * 255.0 + 0.5).astype(jnp.int32)
    off_y = jnp.floor(blue_noise[seed_u // nw % nh, seed_u % nw, 1] * 255.0 + 0.5).astype(jnp.int32)
    base = jnp.roll(blue_noise, (-off_y, -off_x), (0, 1))
    reps_y = -(-height // nh)
    reps_x = -(-width // nw)
    noise1 = jnp.tile(base, (reps_y, reps_x, 1))[:height, :width]
    base2 = jnp.roll(blue_noise, (-off_y - 2, -off_x - 2), (0, 1))
    noise2 = jnp.tile(base2, (reps_y, reps_x, 1))[:height, :width]

    sun = shading.sun_direction(jnp, uniforms["sun_angle"])
    sunlight = shading.sun_color(jnp, sun)
    fscal = jnp.stack(
        [sun[0], sun[1], sun[2], sunlight[0], sunlight[1], sunlight[2],
         jnp.float32(0), jnp.float32(0)]
    ).astype(jnp.float32)
    lri = uniforms["lr"].astype(jnp.int32)
    iscal = jnp.stack(
        [tables["r0"][0], tables["r0"][1], lri[0], lri[1], lri[2],
         jnp.int32(0), jnp.int32(0), jnp.int32(0)]
    )

    n = width * height
    per_tile = tile_rows * LANES
    n_pad = -(-n // per_tile) * per_tile
    grid = n_pad // per_tile

    def flat(x, pad_value=0.0):
        # Tail rays must terminate in one step (see trace_pallas.flat).
        f = x.reshape(n)
        f = jnp.pad(f, (0, n_pad - n), constant_values=pad_value)
        return f.reshape(grid * tile_rows, LANES)

    comps = [
        flat(origin[..., 0]), flat(origin[..., 1]), flat(origin[..., 2], 1e9),
        flat(ray_dir[..., 0]), flat(ray_dir[..., 1]), flat(ray_dir[..., 2], 1.0),
        flat(noise1[..., 0]), flat(noise1[..., 1]),
        flat(noise2[..., 0]), flat(noise2[..., 1]),
    ]

    kernel = _make_kernel(tile_rows, max_steps, seed)
    ray_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = lambda t: pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    outf = jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.float32)
    outi = jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.int32)

    lr_, lg_, lb_, pnormal, pair, ppacked, pdist, pexh = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [ray_spec] * 10
        + [table_spec(tables[k]) for k in ("hsub", "h3")],
        out_specs=[ray_spec] * 8,
        out_shape=[outf, outf, outf, outi, outi, outi, outf, outi],
        interpret=interpret,
    )(iscal, fscal, *comps, tables["hsub"], tables["h3"])

    def unflat(x):
        return x.reshape(n_pad)[:n].reshape(height, width)

    light = jnp.stack([unflat(lr_), unflat(lg_), unflat(lb_)], -1)
    p_air = unflat(pair).astype(bool)
    p_packed = unflat(ppacked)
    p_dist = unflat(pdist)
    p_normal = unflat(pnormal)
    exhausted = unflat(pexh).astype(bool)

    albedo = jnp.stack(
        [
            ((p_packed >> 14) & 0x7F).astype(jnp.float32) / 127.0,
            ((p_packed >> 7) & 0x7F).astype(jnp.float32) / 127.0,
            (p_packed & 0x7F).astype(jnp.float32) / 127.0,
        ],
        -1,
    )
    hit_mask = ~p_air

    def sky_img(d, include_sun):
        r, g, b = shading.sample_sky(
            jnp, (d[..., 0], d[..., 1], d[..., 2]), sun, sunlight, include_sun
        )
        r, g, b = jnp.broadcast_arrays(r, g, b)
        return jnp.stack([r, g, b], -1)

    depth = jnp.where(
        p_air,
        jnp.uint32(0xFFFF),
        jnp.minimum(p_dist * 32.0, jnp.float32(0xFFFF)).astype(jnp.uint32),
    ).astype(jnp.uint16)
    fog = sky_img(ray_dir, False) / 2.0
    fog = jnp.where(exhausted[..., None], jnp.array([1.0, 0.0, 1.0], jnp.float32), fog)
    depth = jnp.where(exhausted, jnp.uint16(256 * 254), depth)

    return {
        "lighting": light / jnp.float32(LIGHTING_SCALE),
        "depth": depth,
        "normal": jnp.where(p_air, jnp.int32(NORMAL_SKY), p_normal).astype(jnp.uint8),
        "albedo": jnp.where(hit_mask[..., None], albedo, 1.0),
        "emission": jnp.zeros_like(light),
        "fog": fog,
    }
