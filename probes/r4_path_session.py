"""Round-4 TPU session: measure the whole-path volume pipeline.

Steps (dispatch-train timing, one process):
  1. volume_fast full pipeline at the bench shape (1024^2, 5 rays/px,
     denoise+finalize): staged (round-3 architecture) vs whole-path
     (ops/path_vol.py), plus whole-path at bounces=1/0.
  2. Level-schedule A/B on the whole-path loop (all value/static-gated;
     each variant is its own jit instance).
  3. Config 1 (512^2 primary, single chunk): staged vs whole-path trace,
     plus the full benchmark-config frame both ways.

  timeout 5400 python probes/r4_path_session.py 2>&1 | tee probes/out/r4_path_session.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import (
    build_vol_tables,
    render_gbuffers_vol,
)
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

W = H = 1024
N_TRAIN = 10


def _timeit(fn, label, n=N_TRAIN):
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


def main():
    print("devices:", jax.devices(), flush=True)
    from raytrace_tpu.ops.denoise_pallas import denoise_finalize_pallas
    from raytrace_tpu.render.pipeline import Pipeline

    p = Pipeline(width=W, height=H, tracer="volume_fast")
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.heading, cam.pitch = 0.8, -0.3
    p.converge_streaming((cam.origin[0], 0, cam.origin[2]), max_moves=24)
    p.fill_uniforms(cam, 0.6, bump_seed=False)
    fused = p.streamer.volume
    tables = build_vol_tables(fused)
    uni = p.uniforms.as_device_dict()
    bn = p.blue_noise

    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    # ---- 1. full pipeline at the bench shape --------------------------
    def staged_frame(t):
        gb = render_gbuffers_vol(fused, tables, bn, moved(t), W, H)
        return denoise_finalize_pallas(gb, bn)

    def path_frame(t, **kw):
        gb = render_gbuffers_path(fused, tables, bn, moved(t), W, H, **kw)
        return denoise_finalize_pallas(gb, bn)

    base_staged = _timeit(staged_frame, "bench-shape full frame STAGED (r3 architecture)")
    base_path = _timeit(path_frame, "bench-shape full frame WHOLE-PATH")
    print(f"  => staged {W*H*5/base_staged/1e3:.2f} Mrays/s, "
          f"whole-path {W*H*5/base_path/1e3:.2f} Mrays/s", flush=True)
    _timeit(lambda t: path_frame(t, bounces=1), "whole-path bounces=1")
    _timeit(lambda t: path_frame(t, bounces=0), "whole-path bounces=0")

    # G-buffers only (no denoise) for decomposition.
    _timeit(
        lambda t: render_gbuffers_path(fused, tables, bn, moved(t), W, H)[
            "lighting"
        ],
        "whole-path G-buffers only",
    )

    # ---- 2. level-schedule A/B ---------------------------------------
    for levels in (
        ((1, None),),
        ((1, 4), (2, None)),
        ((1, 4), (2, 3), (4, None)),
        ((1, 4), (2, 3), (4, 4), (8, None)),
        ((1, 4), (2, 3), (4, 4), (8, 6), (16, None)),
        ((1, 3), (2, 2), (4, 3), (8, 4), (16, None)),
        ((1, 6), (4, 6), (16, None)),
        ((1, 2), (2, 2), (4, 3), (8, 4), (16, 8), (32, None)),
    ):
        _timeit(
            lambda t, lv=levels: path_frame(t, levels=lv),
            f"whole-path levels={levels}",
        )

    # cap A/B (kernel inner budget per round)
    for cap in (48, 96, 160):
        _timeit(
            lambda t, c=cap: path_frame(t, cap=c),
            f"whole-path cap={cap}",
        )

    # ---- 3. config 1 --------------------------------------------------
    from raytrace_tpu.ops.trace_jax import camera_rays, fuse_volume
    from raytrace_tpu.ops.trace_vol_pallas import trace_rays_vol
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
    lr1 = uni1["lr"].astype(jnp.int32)

    def cfg1_moved(t):
        return dict(uni1, origin=uni1["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    def cfg1_trace(t):
        o, d = camera_rays(cfg1_moved(t), 512, 512)
        return trace_rays_vol(tables1, fused1, o, d, lr1, max_steps=1024)[
            "distance"
        ]

    dt = _timeit(cfg1_trace, "cfg1 staged trace only")
    print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)

    def cfg1_staged_frame(t):
        return render_gbuffers_vol(
            fused1, tables1, bn, cfg1_moved(t), 512, 512, 1024, bounces=0
        )["albedo"]

    dt = _timeit(cfg1_staged_frame, "cfg1 STAGED full config frame")
    print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)

    def cfg1_path_frame(t, **kw):
        return render_gbuffers_path(
            fused1, tables1, bn, cfg1_moved(t), 512, 512, 1024, bounces=0,
            **kw
        )["albedo"]

    dt = _timeit(cfg1_path_frame, "cfg1 WHOLE-PATH full config frame")
    print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)
    for levels in (
        ((1, 1), (4, None)),
        ((1, 1), (8, None)),
        ((1, 2), (8, None)),
        ((1, 1), (2, 1), (8, None)),
        ((1, 1), (4, 2), (16, None)),
    ):
        dt = _timeit(
            lambda t, lv=levels: cfg1_path_frame(t, levels=lv),
            f"cfg1 whole-path levels={levels}",
        )
        print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
