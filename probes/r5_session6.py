"""Round-5 TPU session 6: pick HONEST whole-path defaults (schedule + drain).

Session 4's audit: the shipped b2 default (LV_D cap=416) exhausts 355k/1M
primaries ON THE BENCH WORLD (34% magenta) and 17.6% on a sparse
single-chunk scene — round 5's earlier "74.8 ms" and round 4's "91.65 ms"
tuning wins were partly quality cuts, and production volume rendering has
cut rays since the round-4 pipeline switch to path_vol.  The fix (this
session's path_vol change) appends a SAFETY DRAIN: extra rounds at
reduction safety_R that run only while mid-path rays remain, making any
schedule cut-free up to the drain bound.

This probe picks the default (schedule, cap, safety_R) by measuring the
full matrix on BOTH scenes with hard gates: exhausted-primary count == 0
and energy ratio == 1 vs a converged flat frame.  Every row here renders
the complete frame — no more timing numbers that skip a third of the rays.

  timeout 5400 python probes/r5_session6.py 2>&1 | tee probes/out/r5_session6.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

R4_SCHED = ((1, 4), (2, 3), (4, 4), (8, 6), (16, None))
LV_D = ((1, 1), (2, 2), (4, 2), (8, 3), (16, 6), (32, None))


def _timeit(fn, label, n=10):
    f = jax.jit(lambda t: jnp.sum(fn(t)))
    float(f(jnp.float32(0.0)))
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    float(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:64s} {dt:9.2f} ms", flush=True)
    return dt


def _energy(gb):
    tot = jnp.float32(0.0)
    for k in sorted(gb):
        v = gb[k]
        if v.dtype == jnp.float32:
            tot = tot + jnp.sum(v)
    return tot


def run_block(name, gb_fn, rays, candidates):
    @jax.jit
    def ref_stats(t):
        g = gb_fn(t, levels=((1, None),), cap=224, rounds=40, safety=0)
        return jnp.sum((g["depth"] == 65024).astype(jnp.int32)), _energy(g)

    rex, ren = ref_stats(jnp.float32(0.0))
    rex, ren = int(rex), float(ren)
    print(f"{name} converged ref: ex={rex} energy={ren:.6g}", flush=True)
    rows = []
    for label, kw in candidates:
        @jax.jit
        def stats(t, kw=kw):
            g = gb_fn(t, **kw)
            return jnp.sum((g["depth"] == 65024).astype(jnp.int32)), _energy(g)

        ex, en = stats(jnp.float32(0.0))
        ex, en = int(ex), float(en)
        ok = ex == rex and abs(en / ren - 1) < 5e-4
        dt = _timeit(lambda t, kw=kw: gb_fn(t, **kw)["albedo"],
                     f"{name} {label}")
        print(f"  => {rays/dt/1e3:.2f} Mrays/s  ex={ex} "
              f"energy_ratio={en/ren:.5f} {'OK' if ok else '!!CUTS'}",
              flush=True)
        if ok:
            rows.append((dt, label))
    rows.sort()
    if rows:
        print(f"{name} honest winner: {rows[0][1]} @ {rows[0][0]:.2f} ms",
              flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    bn = jnp.asarray(get_blue_noise_f32())

    # ---------------- bench world (1024^2 b2) --------------------------
    from raytrace_tpu.render.pipeline import Pipeline

    W = H = 1024
    p = Pipeline(width=W, height=H, tracer="volume_fast")
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.heading, cam.pitch = 0.8, -0.3
    p.converge_streaming((cam.origin[0], 0, cam.origin[2]), max_moves=24)
    p.fill_uniforms(cam, 0.6, bump_seed=False)
    fusedW = p.streamer.volume
    tablesW = build_vol_tables(fusedW)
    uniW = p.uniforms.as_device_dict()

    def bench_gb(t, **kw):
        u = dict(uniW, origin=uniW["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        return render_gbuffers_path(fusedW, tablesW, bn, u, W, H, **kw)

    print("--- bench world b2: schedule x drain matrix ---", flush=True)
    run_block(
        "bench", bench_gb, W * H * 5,
        [
            ("LV_D cap=416 drain R4", dict(safety_R=4)),
            ("LV_D cap=416 drain R2", dict(safety_R=2)),
            ("LV_D cap=416 drain R8", dict(safety_R=8)),
            ("LV_D cap=224 drain R4", dict(cap=224, safety_R=4)),
            ("r4sched cap=96  drain R4",
             dict(levels=R4_SCHED, cap=96, safety_R=4)),
            ("r4sched cap=224 drain R4",
             dict(levels=R4_SCHED, cap=224, safety_R=4)),
            ("mid ((1,2),(2,2),(4,3),(8,4),(16,8),(32,~)) c416 R4",
             dict(levels=((1, 2), (2, 2), (4, 3), (8, 4), (16, 8),
                          (32, None)), cap=416, safety_R=4)),
            ("flat cap=224 r:auto", dict(levels=((1, None),), cap=224)),
        ],
    )

    # ---------------- sparse single chunk (512^2 b0: config 1) ---------
    from raytrace_tpu.ops.trace_jax import fuse_volume
    from raytrace_tpu.world.generate import generate_chunk

    mats, mf = generate_chunk((0, 0, 0), seed=0)
    vol_m = jnp.zeros((256, 256, 256), jnp.uint32)
    vol_f = jnp.full((256, 256, 256), 6, jnp.uint8)
    vol_m = vol_m.at[128:192, 128:192, 128:192].set(mats)
    vol_f = vol_f.at[128:192, 128:192, 128:192].set(mf)
    fused1 = fuse_volume(vol_m, vol_f)
    tables1 = build_vol_tables(fused1)
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

    def cfg1_gb(t, **kw):
        u = dict(uni1, origin=uni1["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        return render_gbuffers_path(
            fused1, tables1, bn, u, 512, 512, 1024, bounces=0, **kw
        )

    print("--- cfg1 b0: schedule x drain matrix ---", flush=True)
    run_block(
        "cfg1", cfg1_gb, 512 * 512,
        [
            ("B0 ((1,1),(8,2),(32,~)) c224 drain R4", dict(safety_R=4)),
            ("B0 c224 drain R2", dict(safety_R=2)),
            ("B0 c224 drain R8", dict(safety_R=8)),
            ("(1,2)(4,~) c96 drain R4",
             dict(levels=((1, 2), (4, None)), cap=96, safety_R=4)),
            ("(1,1)(2,1)(4,2)(16,~) c96 drain R4",
             dict(levels=((1, 1), (2, 1), (4, 2), (16, None)), cap=96,
                  safety_R=4)),
            ("(1,1)(2,1)(4,2)(16,~) c96 drain R2",
             dict(levels=((1, 1), (2, 1), (4, 2), (16, None)), cap=96,
                  safety_R=2)),
        ],
    )

    # ---------------- sparse scene at b2 (production stress) -----------
    print("--- sparse single chunk at b2 (drain stress) ---", flush=True)

    def sparse2_gb(t, **kw):
        u = dict(uni1, origin=uni1["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        return render_gbuffers_path(
            fused1, tables1, bn, u, 512, 512, bounces=2, **kw
        )

    run_block(
        "sparse-b2", sparse2_gb, 512 * 512 * 5,
        [
            ("LV_D cap=416 drain R4", dict(safety_R=4)),
            ("r4sched cap=224 drain R4",
             dict(levels=R4_SCHED, cap=224, safety_R=4)),
        ],
    )


if __name__ == "__main__":
    main()
