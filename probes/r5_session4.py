"""Round-5 TPU session 4: HONEST retune of the whole-path schedules.

Round-5 sessions 2b/3 tuned cfg1 (and baked PATH_LEVELS_B0) on timing
alone; a CPU audit this session found the baked bounces=0 schedule
exhausts 31% of primaries on the config-1 scene (magenta frame) — the
rays converge fine by ~4 rounds on a flat schedule, but the narrowed
levels' capacity is far below this scene's live curve (58% of rays are
still live after round 1; narrowing to 1/8 drops them).  Every timing
here is gated on TWO quality checks against a converged flat-budget
frame: exhausted-primary count == 0 and total-image energy ratio ~= 1
(cut secondary legs contribute no light, so energy < 1 exposes them
even though only primaries turn pink).

Blocks:
  A. cfg1 (512^2 b0, exact apps/benchmark scene): honest baseline
     (flat schedule) + gated narrowing-schedule grid + dispatch
     amortization (scan-of-K frames in one jit vs the dispatch train —
     the empty-jit train floor is 2.1 ms/frame, 24%% of an 8.9 ms frame).
  B. bench shape (1024^2 b2 generated world): quality audit of the
     shipped LV_D cap=416 defaults (74.8 ms, r5_session3) — exhausted
     primaries + energy ratio vs a converged flat frame.
  C. fused procedural kernel: pink counts at b1/b2 defaults (the 126
     Mrays/s headline and cfg3 run caps=(64,)) + cfg3 full-frame unroll.

  timeout 5400 python probes/r5_session4.py 2>&1 | tee probes/out/r5_session4.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.constants import MAX_TRACE_STEPS
from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


def _timeit(fn, label, n=10, opts=None):
    f = jax.jit(lambda t: jnp.sum(fn(t)), compiler_options=opts)
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


def main():
    print("devices:", jax.devices(), flush=True)
    bn = jnp.asarray(get_blue_noise_f32())

    # ================= A: cfg1 honest hunt =============================
    print("--- A: cfg1 honest schedule hunt (gated) ---", flush=True)
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

    def cfg1_moved(t):
        return dict(uni1, origin=uni1["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    def cfg1_gb(t, **kw):
        return render_gbuffers_path(
            fused1, tables1, bn, cfg1_moved(t), 512, 512, 1024, bounces=0, **kw
        )

    @jax.jit
    def cfg1_ref_stats(t):
        gb = cfg1_gb(t, levels=((1, None),), cap=224, rounds=8)
        return jnp.sum((gb["depth"] == 65024).astype(jnp.int32)), _energy(gb)

    ref_ex, ref_en = cfg1_ref_stats(jnp.float32(0.0))
    ref_ex, ref_en = int(ref_ex), float(ref_en)
    print(f"cfg1 converged reference: exhausted={ref_ex} energy={ref_en:.6g}",
          flush=True)

    def gate1(label, **kw):
        @jax.jit
        def stats(t):
            gb = cfg1_gb(t, **kw)
            return jnp.sum((gb["depth"] == 65024).astype(jnp.int32)), _energy(gb)

        ex, en = stats(jnp.float32(0.0))
        ex, en = int(ex), float(en)
        ok = ex == ref_ex and abs(en / ref_en - 1) < 5e-4
        dt = _timeit(lambda t: cfg1_gb(t, **kw)["albedo"], f"cfg1 {label}")
        print(
            f"  => {512*512/dt/1e3:.2f} Mrays/s  ex={ex} energy_ratio="
            f"{en/ref_en:.5f} {'OK' if ok else '!!CUTS'}",
            flush=True,
        )
        return dt, ok

    results = []
    for label, kw in (
        ("SHIPPED b0 default  [known-broken]", {}),
        ("flat cap=224 r5 [honest baseline]",
         dict(levels=((1, None),), cap=224, rounds=5)),
        ("flat cap=96  r5",
         dict(levels=((1, None),), cap=96, rounds=5)),
        ("flat cap=96  r6",
         dict(levels=((1, None),), cap=96, rounds=6)),
        ("(1,1)(2,1)(4,1)(8,~) cap=96 r5",
         dict(levels=((1, 1), (2, 1), (4, 1), (8, None)), cap=96, rounds=5)),
        ("(1,1)(2,1)(4,1)(8,~) cap=96 r6",
         dict(levels=((1, 1), (2, 1), (4, 1), (8, None)), cap=96, rounds=6)),
        ("(1,1)(2,1)(4,~) cap=96 r5",
         dict(levels=((1, 1), (2, 1), (4, None)), cap=96, rounds=5)),
        ("(1,1)(2,2)(8,~) cap=96 r6",
         dict(levels=((1, 1), (2, 2), (8, None)), cap=96, rounds=6)),
        ("(1,2)(4,~) cap=96 r5",
         dict(levels=((1, 2), (4, None)), cap=96, rounds=5)),
        ("(1,1)(2,1)(4,1)(8,1)(32,~) cap=96 r7",
         dict(levels=((1, 1), (2, 1), (4, 1), (8, 1), (32, None)),
              cap=96, rounds=7)),
        ("(1,1)(2,1)(4,2)(16,~) cap=96 r7",
         dict(levels=((1, 1), (2, 1), (4, 2), (16, None)), cap=96, rounds=7)),
    ):
        dt, ok = gate1(label, **kw)
        if ok:
            results.append((dt, label, kw))

    results.sort()
    best_dt, best_label, best_kw = results[0]
    print(f"cfg1 honest winner: {best_label} @ {best_dt:.2f} ms", flush=True)

    # Dispatch amortization: the empty-jit dispatch train bills ~2.1 ms
    # per frame through the tunnel.  Chain K frames inside ONE jit (scan)
    # and compare per-frame cost; every frame is fully rendered and
    # reduced, nothing is elided.
    for K in (4, 8):
        def burst(t, K=K, kw=best_kw):
            def step(acc, i):
                return acc + jnp.sum(
                    cfg1_gb(t + 0.03 * i.astype(jnp.float32), **kw)["albedo"]
                ), None
            return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(K))[0]

        f = jax.jit(burst)
        float(f(jnp.float32(0.0)))
        t0 = time.monotonic()
        out = None
        for i in range(6):
            out = f(jnp.float32(0.001 + 0.2 * i))
        float(out)
        dt = (time.monotonic() - t0) / 6 / K * 1e3
        print(f"cfg1 scan-of-{K} per frame: {dt:9.2f} ms  "
              f"=> {512*512/dt/1e3:.2f} Mrays/s", flush=True)

    # ================= B: bench-shape quality audit ====================
    print("--- B: bench shape b2 quality audit ---", flush=True)
    from raytrace_tpu.ops.denoise_pallas import denoise_finalize_pallas
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

    def movedW(t):
        return dict(uniW, origin=uniW["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    def bench_gb(t, **kw):
        return render_gbuffers_path(fusedW, tablesW, bn, movedW(t), W, H, **kw)

    @jax.jit
    def bench_ref_stats(t):
        gb = bench_gb(t, levels=((1, None),), cap=224, rounds=30)
        return jnp.sum((gb["depth"] == 65024).astype(jnp.int32)), _energy(gb)

    bex, ben = bench_ref_stats(jnp.float32(0.0))
    bex, ben = int(bex), float(ben)
    print(f"bench converged reference: exhausted={bex} energy={ben:.6g}",
          flush=True)

    for label, kw in (
        ("SHIPPED LV_D cap=416", {}),
        ("LV_D cap=416 r30", dict(rounds=30)),
    ):
        @jax.jit
        def stats(t, kw=kw):
            gb = bench_gb(t, **kw)
            return jnp.sum((gb["depth"] == 65024).astype(jnp.int32)), _energy(gb)

        ex, en = stats(jnp.float32(0.0))
        ex, en = int(ex), float(en)
        print(f"bench {label}: ex={ex} (ref {bex}) energy_ratio={en/ben:.5f}",
              flush=True)

    def bench_full(t, **kw):
        return denoise_finalize_pallas(bench_gb(t, **kw), bn)

    dt = _timeit(lambda t: bench_full(t), "bench-shape SHIPPED full frame")
    print(f"  => {W*H*5/dt/1e3:.2f} Mrays/s", flush=True)

    # ================= C: fused procedural quality + cfg3 ==============
    print("--- C: fused kernel pink audit + cfg3 unroll ---", flush=True)
    from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
    from raytrace_tpu.ops.trace_pallas import build_hf_tables

    hf_tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    cam3 = Camera(origin=[-30.0, -100.0, 60.0])
    cam3.pitch = -0.1
    fwd, up, right = cam3.scaled_basis()
    uni3 = dict(
        origin=jnp.asarray(cam3.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(0.6),
        seed=jnp.int32(7),
        lr=jnp.asarray((0, 0, 0), jnp.float32),
    )

    def moved3(t):
        return dict(uni3, origin=uni3["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    for b in (1, 2):
        @jax.jit
        def pink(t, b=b):
            gb = render_gbuffers_fused(
                hf_tables, bn, moved3(t), W, H, MAX_TRACE_STEPS, 0, bounces=b
            )
            return (
                jnp.sum((gb["depth"] == 65024).astype(jnp.int32)),
                _energy(gb),
            )

        ex, en = pink(jnp.float32(0.0))
        print(f"fused b{b} defaults: pink={int(ex)} energy={float(en):.6g}",
              flush=True)

    def cfg3_full(t, **kw):
        gb = render_gbuffers_fused(
            hf_tables, bn, moved3(t), W, H, MAX_TRACE_STEPS, 0,
            bounces=1, **kw
        )
        return denoise_finalize_pallas(gb, bn)

    for u in (4, 5, 6):
        dt = _timeit(lambda t, u=u: cfg3_full(t, unroll=u),
                     f"cfg3 FULL frame unroll={u}")


if __name__ == "__main__":
    main()
