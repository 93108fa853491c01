"""Round-4 TPU session 3: A/B the parallel one-pass resolve vs the serial
march, at the shapes that matter.

The serial resolve's <= 23-trip while_loop streams the whole ray state
through HBM every trip (probes/out/r4_decomp.log: ~7 ms march at 1M rays on
top of the 4.4 ms gather).  resolve_mixed_parallel evaluates all 21
candidate crossings in one fused pass.  CPU tests prove discrete-output
equality (tests/test_trace_vol.py::test_parallel_resolve_matches_serial);
this probe decides the default.

  timeout 5400 python probes/r4_resolve_ab.py 2>&1 | tee probes/out/r4_resolve_ab.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.ops.path_vol import render_gbuffers_path
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

W = H = 1024
LV_D = ((1, 1), (2, 2), (4, 2), (8, 3), (16, 6), (32, None))  # s2 winner
LV_B = ((1, 2), (2, 2), (4, 2), (8, 3), (16, 4), (32, 8), (64, None))
CFG1_LVS = (
    ("B", LV_B),
    ("1,8", ((1, 1), (8, None))),
    ("1,4,16", ((1, 1), (4, 2), (16, None))),
)


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


def main():
    print("devices:", jax.devices(), flush=True)
    from raytrace_tpu.ops.denoise_pallas import (
        denoise_finalize_pallas,
        scoped_vmem_options,
    )
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

    # ---- bench-shape full pipeline, best schedule, both resolvers ------
    for res in ("serial", "parallel"):
        for cap in (96, 224):
            _timeit(
                lambda t, r=res, c=cap: denoise_finalize_pallas(
                    render_gbuffers_path(
                        fused, tables, bn, moved(t), W, H,
                        levels=LV_D, cap=c, resolve=r,
                    ),
                    bn,
                ),
                f"bench-shape LV_D cap={cap} resolve={res}",
            )

    # ---- 1M-ray legs, both resolvers -----------------------------------
    rng = np.random.default_rng(0)
    n1 = 1 << 20
    o1 = jnp.asarray(
        np.stack(
            [
                rng.uniform(-100, 100, n1),
                rng.uniform(-100, 100, n1),
                rng.uniform(5, 90, n1),
            ],
            -1,
        ),
        jnp.float32,
    )
    d1 = rng.normal(size=(n1, 3))
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d1 = jnp.asarray(d1, jnp.float32)
    lr = jnp.asarray(p.uniforms.lr, jnp.int32)
    for res in ("serial", "parallel"):
        def leg(t, r=res):
            got = trace_rays_vol(
                tables, fused, o1, d1 + t * 0, lr, resolve=r
            )
            return got["position"]

        _timeit(leg, f"1M random-leg trace resolve={res}", n=5)

    # ---- config 1, both resolvers x schedules ---------------------------
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

    for res in ("serial", "parallel"):
        for lv_name, lv in CFG1_LVS:
            for cap in (96, 224):
                dt = _timeit(
                    lambda t, l=lv, c=cap, r=res: render_gbuffers_path(
                        fused1, tables1, bn, cfg1_moved(t), 512, 512, 1024,
                        bounces=0, levels=l, cap=c, resolve=r,
                    )["albedo"],
                    f"cfg1 levels={lv_name} cap={cap} resolve={res}",
                )
                print(f"  => {512*512/dt/1e3:.2f} Mrays/s", flush=True)

    # ---- 4K volume_fast, parallel resolve, best schedule ----------------
    W4, H4 = 3840, 2160
    f4 = jax.jit(
        lambda t: jnp.sum(
            denoise_finalize_pallas(
                render_gbuffers_path(
                    fused, tables, bn, moved(t), W4, H4,
                    levels=LV_D, cap=224, resolve="parallel",
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
        f"{'4K volume_fast full frame (parallel, LV_D, cap=224)':64s} {dt:9.2f} ms"
        f"  = {W4*H4*5/dt/1e3:.2f} Mrays/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
