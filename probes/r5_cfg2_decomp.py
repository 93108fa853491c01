"""Round-5 TPU session 3: config 2 (1080p) non-square penalty hunt.

Known (r4_cfg_decomp): cfg2 full frame 78.71 ms; G-buffers alone 69.35 ms;
the same-Mpx square 1440^2 runs ~35% more rays/s per-ray than 1920x1080.
This probe separates the fused kernel's TRACE cost from its fixed floor
(setup + partition sorts + planar shade) per shape — the floor is measured
with max_steps=2 (every ray exhausts immediately; trace work ~zero, all
other stages identical) — and sweeps tile_rows at 1080p.

  timeout 5400 python probes/r5_cfg2_decomp.py 2>&1 | tee probes/out/r5_cfg2_decomp.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.constants import MAX_TRACE_STEPS
from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
from raytrace_tpu.ops.trace_pallas import build_hf_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


def _timeit(fn, label, n=8, opts=None):
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
    bn = jnp.asarray(get_blue_noise_f32())
    tables = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    fwd, up, right = cam.scaled_basis()
    uni = dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(0.6),
        seed=jnp.int32(7),
        lr=jnp.asarray((0, 0, 0), jnp.float32),
    )

    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    def gb(t, w, h, steps=MAX_TRACE_STEPS, **kw):
        return render_gbuffers_fused(
            tables, bn, moved(t), w, h, steps, 0, bounces=1, **kw
        )["lighting"]

    shapes = (
        (1024, 1024), (1920, 1080), (1920, 1088), (2048, 1024),
        (1024, 2048), (1440, 1440), (1664, 1280),
    )
    for w, h in shapes:
        full = _timeit(lambda t, w=w, h=h: gb(t, w, h), f"{w}x{h} b1 G-buffers")
        floor = _timeit(
            lambda t, w=w, h=h: gb(t, w, h, steps=2),
            f"{w}x{h} b1 floor (max_steps=2)",
        )
        rays = w * h * 3
        print(
            f"  => per-ray full {full*1e6/rays:.2f} ns, trace {(full-floor)*1e6/rays:.2f} ns,"
            f" floor {floor:.2f} ms",
            flush=True,
        )

    print("--- tile_rows sweep at 1080p ---", flush=True)
    for tr in (8, 16, 32):
        _timeit(
            lambda t, tr=tr: gb(t, 1920, 1080, tile_rows=tr),
            f"1080p b1 tile_rows={tr}",
        )
    print("--- tail_rows sweep at 1080p (cascade level 2 tile size) ---", flush=True)
    for tl in (4, 8):
        _timeit(
            lambda t, tl=tl: gb(t, 1920, 1080, tail_rows=tl),
            f"1080p b1 tail_rows={tl}",
        )
    print("--- unroll sweep at 1080p ---", flush=True)
    for u in (4, 5):
        _timeit(
            lambda t, u=u: gb(t, 1920, 1080, unroll=u),
            f"1080p b1 unroll={u}",
        )
    print("--- 1080p full frame (G-buffers + strip denoise) ---", flush=True)
    from raytrace_tpu.ops.denoise_pallas import (
        denoise_finalize_pallas,
        scoped_vmem_options,
    )

    def full(t, **kw):
        g = render_gbuffers_fused(
            tables, bn, moved(t), 1920, 1080, MAX_TRACE_STEPS, 0,
            bounces=1, **kw
        )
        return denoise_finalize_pallas(g, bn)

    opts = scoped_vmem_options(1080, 1920)
    _timeit(lambda t: full(t), "1080p full frame (shipped)", opts=opts)
    _timeit(lambda t: full(t, unroll=4), "1080p full frame unroll=4", opts=opts)

    print("--- 1080p UNSTRIPED denoise attempt (raised limits) ---", flush=True)
    # The 2.39M-padded-px unstriped plane failed at the 48M scoped limit;
    # at ~40 B/padded-px the demand is ~95.6 MiB, right at the new 96 MiB
    # option and under a 112 MiB trial (v5e VMEM is 128 MiB).  If this
    # compiles and beats strips, MAX_VMEM_PIXELS can rise past 1080p.
    import raytrace_tpu.ops.denoise_pallas as dp

    saved = dp.MAX_VMEM_PIXELS
    for limit_kib in (98304, 114688):
        dp.MAX_VMEM_PIXELS = 2_500_000
        try:
            assert dp._strip_plan(1080, 1920) is None
            _timeit(
                lambda t: full(t),
                f"1080p full frame UNSTRIPED limit={limit_kib//1024}M",
                opts={"xla_tpu_scoped_vmem_limit_kib": limit_kib},
            )
            break
        except Exception as e:
            print(f"  limit={limit_kib//1024}M FAILED: {str(e)[:160]}", flush=True)
        finally:
            dp.MAX_VMEM_PIXELS = saved


if __name__ == "__main__":
    main()
