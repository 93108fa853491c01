"""Round-4 TPU session 2: tune the whole-path loop (cap x levels grid).

r4_path_session.log found two independent wins over the defaults at the
bench shape (1024^2, 5 rays/px, full pipeline):
  levels ((1,2),(2,2),(4,3),(8,4),(16,8),(32,None))  195.7 -> 147.7 ms
  cap 96 -> 160                                      195.7 -> 157.5 ms
This probe crosses them, pushes narrowing one level deeper (64), and
repeats the winner grid at config 1 (512^2, bounces=0, single chunk).

  timeout 5400 python probes/r4_path_tune.py 2>&1 | tee probes/out/r4_path_tune.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

W = H = 1024
N_TRAIN = 10

LV_A = ((1, 2), (2, 2), (4, 3), (8, 4), (16, 8), (32, None))  # s1 winner
LV_B = ((1, 2), (2, 2), (4, 2), (8, 3), (16, 4), (32, 8), (64, None))
LV_C = ((1, 2), (2, 2), (4, 3), (8, 4), (16, 6), (32, 12), (64, None))
LV_D = ((1, 1), (2, 2), (4, 2), (8, 3), (16, 6), (32, None))


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

    def path_frame(t, **kw):
        gb = render_gbuffers_path(fused, tables, bn, moved(t), W, H, **kw)
        return denoise_finalize_pallas(gb, bn)

    best = (1e9, None)
    for lv_name, lv in (("A", LV_A), ("B", LV_B), ("C", LV_C), ("D", LV_D)):
        for cap in (96, 160, 224):
            dt = _timeit(
                lambda t, l=lv, c=cap: path_frame(t, levels=l, cap=c),
                f"bench-shape levels={lv_name} cap={cap}",
            )
            if dt < best[0]:
                best = (dt, (lv_name, lv, cap))
    dt, (lv_name, lv, cap) = best
    print(
        f"  => best: levels={lv_name} cap={cap}: {dt:.2f} ms = "
        f"{W*H*5/dt/1e3:.2f} Mrays/s",
        flush=True,
    )

    # ---- config 1 (512^2 bounces=0, single loaded chunk) ---------------
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

    for lv_name, lv in (
        ("A", LV_A),
        ("B", LV_B),
        ("1,8", ((1, 1), (8, None))),
        ("1,4,16", ((1, 1), (4, 2), (16, None))),
        ("1,4,32", ((1, 1), (4, 2), (16, 4), (32, None))),
    ):
        for cap in (96, 160, 224):
            dt = _timeit(
                lambda t, l=lv, c=cap: cfg1_frame(t, levels=l, cap=c),
                f"cfg1 levels={lv_name} cap={cap}",
            )
            print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)

    # ---- 4K volume_fast at the best bench schedule ---------------------
    W4, H4 = 3840, 2160
    from raytrace_tpu.ops.denoise_pallas import scoped_vmem_options

    f4 = jax.jit(
        lambda t: jnp.sum(
            denoise_finalize_pallas(
                render_gbuffers_path(
                    fused, tables, bn, moved(t), W4, H4, levels=lv, cap=cap
                ),
                bn,
            )
        ),
        compiler_options=scoped_vmem_options(H4, W4),
    )
    float(f4(jnp.float32(0.0)))
    t0 = time.monotonic()
    out = None
    for i in range(3):
        out = f4(jnp.float32(0.001 + 0.03 * i))
    float(out)
    dt = (time.monotonic() - t0) / 3 * 1e3
    print(
        f"{'4K volume_fast full frame (best schedule)':64s} {dt:9.2f} ms"
        f"  = {W4*H4*5/dt/1e3:.2f} Mrays/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
