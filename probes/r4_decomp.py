"""Round-4 evidence probe: where does a volume_fast round go, and WHY does
the grazing tail never terminate?

Three measurement groups in one process (TPU, dispatch-train timing):

  1. Round decomposition at 1M diffuse rays: the Pallas coarse pass alone,
     the (n, 16) detail row gather alone, resolve_mixed alone on a
     realistic post-kernel parked state, and one full round — so the
     round-4 restructure attacks the biggest line item, not a guess.
  2. Config-1 (512^2 primary, single chunk) post-modulus-fix marginals:
     rounds=1/2/3, plus the parked hardware A/Bs from VERDICT task 5
     (approach_jump, sub_bricks, compact_cap, cascade).
  3. Tail instrumentation: take the rays still live after 18 rounds of a
     converged diffuse leg (marches are memoryless in position/direction,
     so re-tracing from their resume state reproduces their future), run
     them 1 round at a time, and print per-round live counts + distance
     travelled percentiles + sample-ray brick sequences.  Distinguishes
     "stuck re-parking in one brick" (a bug) from "legally skimming many
     distinct mixed bricks" (geometry to bound by distance).

  timeout 3600 python probes/r4_decomp.py 2>&1 | tee probes/out/r4_decomp.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace_tpu.ops.trace_jax import camera_rays
from raytrace_tpu.ops import trace_vol_pallas as tv
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera

W = H = 1024
N_TRAIN = 10
LANES = 128


def _timeit(fn, label, n=N_TRAIN):
    f = jax.jit(lambda t: jnp.sum(fn(t)))
    float(f(jnp.float32(0.0)))
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    float(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    from raytrace_tpu.render.pipeline import Pipeline

    p = Pipeline(width=W, height=H, tracer="volume_fast")
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.heading, cam.pitch = 0.8, -0.3
    p.converge_streaming((cam.origin[0], 0, cam.origin[2]), max_moves=24)
    p.fill_uniforms(cam, 0.6, bump_seed=False)
    fused = p.streamer.volume
    tables = build_vol_tables(fused)
    uni = p.uniforms.as_device_dict()
    lr = uni["lr"].astype(jnp.int32)
    lri = jnp.asarray(lr, jnp.int32)

    o0, d0 = camera_rays(uni, W, H)
    prim = trace_rays_vol(tables, fused, o0, d0, lr, cascade=False)
    surf = jax.block_until_ready(prim["position"])
    hitm = jnp.asarray(~prim["air"]).reshape(W * H)
    n = W * H
    n_act = int(jnp.sum(hitm))
    print(f"active diffuse rays: {n_act} / {n}", flush=True)

    i = jnp.arange(n, dtype=jnp.uint32)
    a = ((i * jnp.uint32(2654435761)) & jnp.uint32(0xFFFF)).astype(
        jnp.float32
    ) * (6.2832 / 65536.0)
    b = ((i * jnp.uint32(40503)) & jnp.uint32(0x7FFF)).astype(
        jnp.float32
    ) * (1.5708 / 32768.0)
    ddif = jnp.stack(
        [jnp.cos(a) * jnp.sin(b), jnp.sin(a) * jnp.sin(b), jnp.cos(b)],
        axis=-1,
    ).reshape(n, 3)
    osurf = surf.reshape(n, 3)

    # ---------------------------------------------------------------
    # 1. Round decomposition at 1M rays
    # ---------------------------------------------------------------
    tile_rows = 16
    rows = n // LANES
    grid = rows // tile_rows

    def flat(x):
        return x.reshape(rows, LANES)

    cx, cy, cz = (flat(osurf[:, k]) for k in range(3))
    cdx, cdy, cdz = (flat(ddif[:, k]) for k in range(3))
    big = jnp.int32(1) << 30
    inf_bounds = jnp.stack([-big, big, -big, big, -big, big])
    occ_bounds = tv._occupancy_world_bounds(tables["any8b"], lri)
    iscal = jnp.concatenate([lri, occ_bounds, inf_bounds, jnp.zeros(1, jnp.int32)])

    ray_spec = pl.BlockSpec(
        (tile_rows, LANES), lambda ii: (ii, 0), memory_space=pltpu.VMEM
    )
    table_spec = lambda t: pl.BlockSpec(
        t.shape, lambda ii: (0, 0), memory_space=pltpu.VMEM
    )
    outf = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    outi = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    def kern_pass(ox, oy, oz, n0):
        kernel = tv._make_vol_kernel(tile_rows, 96)
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [ray_spec] * 7
            + [table_spec(tables["any8"]), table_spec(tables["all8"]),
               table_spec(tables["any_hi"])],
            out_specs=[ray_spec] * 5,
            out_shape=[outf, outf, outf, outi, outi],
        )(iscal, ox, oy, oz, cdx, cdy, cdz, n0,
          tables["any8"], tables["all8"], tables["any_hi"])

    # Kernel pass alone (fresh diffuse rays; dominant park population).
    _timeit(
        lambda t: kern_pass(cx + 0.0 * t, cy, cz,
                            jnp.zeros((rows, LANES), jnp.int32))[0],
        "1M kernel coarse pass alone (cap=96)",
    )

    # Realistic post-kernel state for resolve timing.
    px, py, pz, nrm, status = jax.block_until_ready(
        kern_pass(cx, cy, cz, jnp.zeros((rows, LANES), jnp.int32))
    )
    meta0 = ((nrm & 7) << 2) | status
    n_parked = int(jnp.sum((meta0 & tv._PARKED) != 0))
    print(f"parked after 1 kernel pass: {n_parked} / {n} "
          f"({100.0 * n_parked / n:.1f}%)", flush=True)

    detail = tables["detail"]
    fpx, fpy, fpz = (v.reshape(n) for v in (px, py, pz))
    fdx, fdy, fdz = (v.reshape(n) for v in (cdx, cdy, cdz))
    fmeta = meta0.reshape(n)

    # Detail row gather alone (the resolve's only memory touch).
    def brick_ids(pxv, pyv, pzv):
        xi = jnp.floor(pxv).astype(jnp.int32)
        yi = jnp.floor(pyv).astype(jnp.int32)
        zi = jnp.floor(pzv).astype(jnp.int32)
        tx = (xi + 128) & 255
        ty = (yi + 128) & 255
        tz = (zi + 128) & 255
        return ((tz >> 3) * 32 + (ty >> 3)) * 32 + (tx >> 3)

    b0 = brick_ids(fpx, fpy, fpz)
    _timeit(lambda t: detail[(b0 + 0 * t.astype(jnp.int32))].astype(jnp.float32),
            "1M x 16-word detail row gather alone")

    # Full resolve_mixed alone on the parked state.
    _timeit(
        lambda t: tv.resolve_mixed(
            detail, fpx + 0.0 * t, fpy, fpz, fdx, fdy, fdz,
            (fmeta >> 2) & 7, fmeta, lri,
        )[0],
        "1M resolve_mixed alone (gather + march)",
    )

    # One full round through the public API for the same population.
    _timeit(
        lambda t: trace_rays_vol(
            tables, fused, osurf + 0.0 * t, ddif, lr, rounds=1,
            active=hitm, cascade=False,
        )["distance"],
        "1M one full round (public API, rounds=1)",
    )

    # Converged diffuse leg: cascade ON (production default) for reference.
    _timeit(
        lambda t: trace_rays_vol(
            tables, fused, osurf + 0.0 * t, ddif, lr, active=hitm,
        )["distance"],
        "1M diffuse converged (cascade default ON)",
    )

    # ---------------------------------------------------------------
    # 2. Config-1 post-fix marginals + parked A/Bs
    # ---------------------------------------------------------------
    from raytrace_tpu.ops.trace_jax import fuse_volume
    from raytrace_tpu.world.generate import generate_chunk
    from raytrace_tpu.utils.blue_noise import get_blue_noise_f32
    from raytrace_tpu.ops.trace_vol_pallas import render_gbuffers_vol

    mats, mf = generate_chunk((0, 0, 0), seed=0)
    vol_m = jnp.zeros((256, 256, 256), jnp.uint32)
    vol_f = jnp.full((256, 256, 256), 6, jnp.uint8)
    vol_m = vol_m.at[128:192, 128:192, 128:192].set(mats)
    vol_f = vol_f.at[128:192, 128:192, 128:192].set(mf)
    fused1 = fuse_volume(vol_m, vol_f)
    tables1 = build_vol_tables(fused1)
    bn = jnp.asarray(get_blue_noise_f32())
    cam1 = Camera(origin=[32.0, -40.0, 60.0])
    cam1.pitch = -0.5
    fwd, up, right = cam1.scaled_basis()
    uni1 = dict(
        origin=jnp.asarray(cam1.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(0.6),
        seed=jnp.int32(7),
        lr=jnp.asarray((0, 0, 0), jnp.float32),
    )
    lr1 = uni1["lr"].astype(jnp.int32)
    o1, d1 = camera_rays(uni1, 512, 512)

    def cfg1(t, **kw):
        u = dict(uni1, origin=uni1["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        o, d = camera_rays(u, 512, 512)
        return trace_rays_vol(
            tables1, fused1, o, d, lr1, max_steps=1024, **kw
        )["distance"]

    base = _timeit(lambda t: cfg1(t), "cfg1 trace-only baseline")
    for r in (1, 2, 3, 4, 6):
        _timeit(lambda t, r=r: cfg1(t, rounds=r), f"cfg1 trace-only rounds={r}")
    _timeit(lambda t: cfg1(t, approach_jump=True), "cfg1 approach_jump=True")
    _timeit(lambda t: cfg1(t, escape=False), "cfg1 escape=False")
    for sb in (2, 4):
        _timeit(lambda t, sb=sb: cfg1(t, sub_bricks=sb), f"cfg1 sub_bricks={sb}")
    _timeit(lambda t: cfg1(t, cascade=True), "cfg1 cascade=True")
    print(f"cfg1 baseline => {512 * 512 / base / 1e3:.2f} Mrays/s", flush=True)

    # How many rounds does config 1 actually need?
    for r in (2, 3, 4, 6, 8, 11):
        rr = trace_rays_vol(tables1, fused1, o1, d1, lr1, max_steps=1024,
                            rounds=r)
        live = int(jnp.sum(jnp.asarray(rr["exhausted"])))
        print(f"cfg1 live after {r:2d} rounds: {live}", flush=True)

    # ---------------------------------------------------------------
    # 3. Tail instrumentation
    # ---------------------------------------------------------------
    r18 = trace_rays_vol(tables, fused, osurf, ddif, lr, rounds=18,
                         active=hitm, cascade=False)
    live18 = jnp.asarray(r18["exhausted"]).reshape(n) & hitm
    n_live = int(jnp.sum(live18))
    print(f"\ntail: {n_live} rays live after 18 rounds", flush=True)
    idx = jnp.nonzero(live18, size=max(n_live, 1), fill_value=0)[0]
    tp = jnp.asarray(r18["position"]).reshape(n, 3)[idx]
    td = ddif[idx]
    m = int(idx.shape[0])

    # Run the tail population forward one round at a time.
    pos = tp
    prev_live = jnp.ones((m,), bool)
    for k in range(1, 13):
        rr = trace_rays_vol(tables, fused, pos, td, lr, rounds=1,
                            active=prev_live, cascade=False)
        new_pos = jnp.asarray(rr["position"])
        step = jnp.einsum("ij,ij->i", new_pos - pos, td)
        still = jnp.asarray(rr["exhausted"]).reshape(m) & prev_live
        ns = int(jnp.sum(still))
        sl = jnp.where(prev_live, step, jnp.nan)
        qs = jnp.nanpercentile(sl, jnp.asarray([0.0, 10.0, 50.0, 90.0, 100.0]))
        print(f"tail round +{k:2d}: live {ns:6d}  step-along-dir "
              f"p0/p10/p50/p90/p100 = "
              + "/".join(f"{float(q):.3f}" for q in qs), flush=True)
        # NOTE positions of DONE rays include the 0.001 normal nudge and
        # hit semantics; only live rays' resume positions matter for the
        # progress signal, hence the where(prev_live) mask uses the
        # PREVIOUS round's liveness (rays that finished this round still
        # report a final position, fine for a one-round delta).
        pos = new_pos
        prev_live = still
        if ns == 0:
            break

    # Sample-ray forensics: brick id sequences for 6 tail rays.
    print("\nsample tail rays (brick ids per round):", flush=True)
    for s in range(min(6, m)):
        pp = tp[s:s + 1]
        dd = td[s:s + 1]
        bricks = []
        lastpos = pp
        for k in range(10):
            rr = trace_rays_vol(tables, fused, lastpos, dd, lr, rounds=1,
                                cascade=False)
            lastpos = jnp.asarray(rr["position"])
            bricks.append(int(brick_ids(lastpos[0, 0], lastpos[0, 1],
                                        lastpos[0, 2])))
            if not bool(jnp.asarray(rr["exhausted"])[0]):
                bricks.append(-1)  # terminated
                break
        p0 = [round(float(v), 2) for v in tp[s]]
        dv = [round(float(v), 3) for v in td[s]]
        print(f"  ray {s}: start {p0} dir {dv} bricks {bricks}", flush=True)


if __name__ == "__main__":
    main()
