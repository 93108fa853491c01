"""Round-5 TPU session 2: cfg3 caps grid + cap-sweep extension + cfg1 defaults.

Blocks:
  C. cfg3 interactive (1024^2 bounces=1, fused procedural): FUSED_CAPS was
     tuned for the 5-leg path; grid caps for the 3-leg budget.  The r5
     session-1 run died before this block produced a single number.
     Bar: full interactive frame <= 33 ms.
  D. bench shape (1024^2 bounces=2 full pipeline) at the NEWLY SHIPPED
     defaults (PATH_LEVELS=LV_D, cap=288) + extend the cap sweep (352,
     416) — r5_session1 measured monotone improvement through 288.
  E. cfg1 (512^2 bounces=0) at the shipped defaults + the session-1
     winner (1,8,32)@224 + high caps, so BENCHMARKS.md can cite what
     apps/benchmark actually runs.

  timeout 5400 python probes/r5_session2.py 2>&1 | tee probes/out/r5_session2.log
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

    bn = jnp.asarray(get_blue_noise_f32())

    # ================= C: cfg3 interactive caps ========================
    print("--- C: cfg3 interactive (fused bounces=1) caps grid ---", flush=True)
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

    def b1_gb(t, **kw):
        return render_gbuffers_fused(
            hf_tables, bn, moved3(t), W, H, MAX_TRACE_STEPS, 0, bounces=1, **kw
        )["lighting"]

    _timeit(b1_gb, "cfg3 b1 G-buffers caps=(64,) [shipped]")
    for caps in ((48,), (40,), (32,), (56,), (48, 192), (64, 256)):
        _timeit(
            lambda t, c=caps: b1_gb(t, caps=c), f"cfg3 b1 G-buffers caps={caps}"
        )
    for unroll in (4,):
        _timeit(
            lambda t, u=unroll: b1_gb(t, unroll=u),
            f"cfg3 b1 G-buffers unroll={unroll}",
        )

    def full3(t, **kw):
        gb = render_gbuffers_fused(
            hf_tables, bn, moved3(t), W, H, MAX_TRACE_STEPS, 0, bounces=1, **kw
        )
        return denoise_finalize_pallas(gb, bn)

    _timeit(full3, "cfg3 interactive full frame caps=(64,)")
    for caps in ((48,), (40,), (32,)):
        _timeit(
            lambda t, c=caps: full3(t, caps=c),
            f"cfg3 interactive full frame caps={caps}",
        )

    # ================= D: bench shape at shipped defaults ==============
    print("--- D: bench shape (1024^2 b2 full pipeline) defaults + caps ---",
          flush=True)
    from raytrace_tpu.render.pipeline import Pipeline

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

    dt = _timeit(path_frame, "bench-shape SHIPPED DEFAULTS (LV_D cap=288)")
    print(f"  => {W*H*5/dt/1e3:.2f} Mrays/s", flush=True)
    for cap in (352, 416):
        dt = _timeit(
            lambda t, c=cap: path_frame(t, cap=c), f"bench-shape LV_D cap={cap}"
        )
        print(f"  => {W*H*5/dt/1e3:.2f} Mrays/s", flush=True)

    # ================= E: cfg1 at shipped defaults =====================
    print("--- E: cfg1 (512^2 b0) shipped defaults + winners ---", flush=True)
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

    def cfg1_frame(t, **kw):
        return render_gbuffers_path(
            fused1, tables1, bn, cfg1_moved(t), 512, 512, 1024, bounces=0, **kw
        )["albedo"]

    for label, kw in (
        ("cfg1 SHIPPED DEFAULTS (LV_D cap=288)", {}),
        ("cfg1 (1,8,32) cap=224 [s1 winner]",
         dict(levels=((1, 1), (8, 2), (32, None)), cap=224)),
        ("cfg1 (1,8,32) cap=288",
         dict(levels=((1, 1), (8, 2), (32, None)), cap=288)),
        ("cfg1 (1,8,32) cap=352",
         dict(levels=((1, 1), (8, 2), (32, None)), cap=352)),
        ("cfg1 LV_D cap=224", dict(cap=224)),
    ):
        dt = _timeit(lambda t, k=kw: cfg1_frame(t, **k), label)
        print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
