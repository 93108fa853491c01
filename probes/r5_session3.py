"""Round-5 TPU session 3: cap-sweep continuation, fused unroll, per-level caps.

Blocks:
  F. bench shape (1024^2 b2 whole-path full pipeline): continue the cap
     sweep past 416 (r5_session2b measured 288: 85.6, 352: 78.6, 416:
     74.8 ms — still monotone).  Stop at the first non-improvement.
  G. fused PROCEDURAL kernel unroll: bounces=1 G-buffers measured 33.73
     (unroll=3, shipped) vs 32.80 ms (unroll=4) in r5_session2b; sweep
     unroll at bounces=2 too (the 126 Mrays/s headline ships unroll=3)
     and measure the cfg3 FULL frame at the winner.  Also tile_rows=8.
  H. cfg1 (512^2 b0 whole-path): per-level caps — a small cap on the
     full-width first round bounds the wave where all 262k rays march;
     the narrowed levels keep big caps.  Quality gate: exhausted-primary
     count (depth==65024) must stay 0 vs the shipped default.

  timeout 5400 python probes/r5_session3.py 2>&1 | tee probes/out/r5_session3.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.constants import MAX_TRACE_STEPS
from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

W = H = 1024


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


def main():
    print("devices:", jax.devices(), flush=True)
    from raytrace_tpu.ops.denoise_pallas import denoise_finalize_pallas
    from raytrace_tpu.render.pipeline import Pipeline

    bn = jnp.asarray(get_blue_noise_f32())

    # ================= F: bench-shape cap continuation =================
    print("--- F: bench shape cap sweep continuation ---", flush=True)
    p = Pipeline(width=W, height=H, tracer="volume_fast")
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.heading, cam.pitch = 0.8, -0.3
    p.converge_streaming((cam.origin[0], 0, cam.origin[2]), max_moves=24)
    p.fill_uniforms(cam, 0.6, bump_seed=False)
    fused = p.streamer.volume
    tables = build_vol_tables(fused)
    uni = p.uniforms.as_device_dict()

    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    def path_frame(t, **kw):
        gb = render_gbuffers_path(fused, tables, bn, moved(t), W, H, **kw)
        return denoise_finalize_pallas(gb, bn)

    best = 74.80  # cap=416, r5_session2b
    for cap in (480, 544, 608):
        dt = _timeit(lambda t, c=cap: path_frame(t, cap=c),
                     f"bench-shape LV_D cap={cap}")
        print(f"  => {W*H*5/dt/1e3:.2f} Mrays/s", flush=True)
        if dt > best * 0.995:
            break
        best = dt

    # ================= G: fused procedural unroll ======================
    print("--- G: fused procedural unroll / tile_rows ---", flush=True)
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

    def gb_fused(t, bounces, **kw):
        return render_gbuffers_fused(
            hf_tables, bn, moved3(t), W, H, MAX_TRACE_STEPS, 0,
            bounces=bounces, **kw
        )["lighting"]

    # Headline path (bounces=2): does unroll=4/5 beat the shipped 3?
    for u in (3, 4, 5):
        _timeit(lambda t, u=u: gb_fused(t, 2, unroll=u),
                f"b2 G-buffers unroll={u}")
    # cfg3 (bounces=1): combos on top of the known unroll=4 win.
    for kw, name in (
        (dict(unroll=4), "unroll=4"),
        (dict(unroll=5), "unroll=5"),
        (dict(unroll=6), "unroll=6"),
        (dict(unroll=4, tile_rows=8), "unroll=4 tile_rows=8"),
        (dict(unroll=4, tile_rows=32), "unroll=4 tile_rows=32"),
        (dict(unroll=4, caps=(96,)), "unroll=4 caps=(96,)"),
        (dict(unroll=4, caps=(128,)), "unroll=4 caps=(128,)"),
    ):
        _timeit(lambda t, kw=kw: gb_fused(t, 1, **kw),
                f"b1 G-buffers {name}")

    def full3(t, **kw):
        gb = render_gbuffers_fused(
            hf_tables, bn, moved3(t), W, H, MAX_TRACE_STEPS, 0,
            bounces=1, **kw
        )
        return denoise_finalize_pallas(gb, bn)

    _timeit(lambda t: full3(t, unroll=4), "cfg3 FULL frame unroll=4")

    # ================= H: cfg1 per-level caps ==========================
    print("--- H: cfg1 per-level caps ---", flush=True)
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

    def exhausted(**kw):
        gb = jax.jit(lambda t: cfg1_gb(t, **kw)["depth"])(jnp.float32(0.0))
        return int(jnp.sum(gb == 65024))

    base_ex = exhausted()
    print(f"cfg1 default exhausted-primary count: {base_ex}", flush=True)

    _timeit(lambda t: cfg1_gb(t)["albedo"], "cfg1 NEW per-legs default")
    # Per-level caps: tiny cap on the full-width wave, rounds must still
    # give stragglers >= 1024 total steps across the schedule.
    for lv, cap, rounds, name in (
        (((1, 1, 64), (8, 2), (32, None)), 224, 6,
         "lv0cap=64  (8,2)@224 r6"),
        (((1, 1, 32), (8, 2), (32, None)), 224, 6,
         "lv0cap=32  (8,2)@224 r6"),
        (((1, 1, 96), (8, 2), (32, None)), 224, 6,
         "lv0cap=96  (8,2)@224 r6"),
        (((1, 1, 64), (8, 1, 256), (32, None, 256)), 256, 5,
         "lv0cap=64  (8,1)@256 r5"),
        (((1, 2, 64), (16, None, 256)), 256, 6,
         "lv0 2x64   (16,~)@256 r6"),
        (((1, 1, 64), (32, None, 256)), 256, 6,
         "lv0cap=64  (32,~)@256 r6"),
        (((1, 1, 64), (4, 1), (32, None)), 224, 6,
         "lv0cap=64  (4,1)(32)@224 r6"),
    ):
        dt = _timeit(
            lambda t, l=lv, c=cap, r=rounds: cfg1_gb(
                t, levels=l, cap=c, rounds=r
            )["albedo"],
            f"cfg1 {name}",
        )
        ex = exhausted(levels=lv, cap=cap, rounds=rounds)
        print(f"  => {512*512/dt/1e3:.2f} Mrays/s  exhausted={ex}"
              f"{' !!REGRESSION' if ex > base_ex else ''}", flush=True)

    # Tile shape: smaller tiles give the narrowed levels finer granularity.
    for tr in (8, 32):
        dt = _timeit(
            lambda t, tr=tr: cfg1_gb(t, tile_rows=tr)["albedo"],
            f"cfg1 default schedule tile_rows={tr}",
        )
        print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
