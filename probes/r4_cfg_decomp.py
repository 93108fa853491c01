"""Round-4 TPU session: decompose configs 3 (interactive), 2 (1080p),
and 5 (4K) to find where the remaining milliseconds go.

VERDICT r3 tasks 3/4/6: config 3 interactive needs <= 33 ms (at 35.76),
config 2 wants >= 90 Mrays/s (at 78.91), config 5 fused wants <= 600 ms
(at 755).  Each block times the full production path, then its stages in
isolation (dispatch-train methodology, one process).

  timeout 5400 python probes/r4_cfg_decomp.py 2>&1 | tee probes/out/r4_cfg_decomp.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.constants import MAX_TRACE_STEPS
from raytrace_tpu.ops.denoise_pallas import (
    denoise_finalize_pallas,
    scoped_vmem_options,
)
from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
from raytrace_tpu.ops.trace_pallas import build_hf_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


def _sync(x):
    return float(jnp.sum(x))


def _train(fn, label, n=20, opts=None):
    f = jax.jit(lambda t: jnp.sum(fn(t)), compiler_options=opts)
    _sync(f(jnp.float32(0.0)))
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    _sync(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:64s} {dt:9.2f} ms", flush=True)
    return dt


def _uniforms(cam, sun_angle=0.6, seed=7, lr=(0, 0, 0)):
    fwd, up, right = cam.scaled_basis()
    return dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(sun_angle),
        seed=jnp.int32(seed),
        lr=jnp.asarray(lr, jnp.float32),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    bn = jnp.asarray(get_blue_noise_f32())
    lr = jnp.zeros(3, jnp.int32)
    tables = build_hf_tables(lr, seed=0)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    uni = _uniforms(cam)

    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    # ================= config 3 interactive (1024^2, bounces=1) ========
    print("--- config 3 interactive decomposition ---", flush=True)
    W = H = 1024

    def frame_b1(t):
        gb = render_gbuffers_fused(
            tables, bn, moved(t), W, H, MAX_TRACE_STEPS, 0, bounces=1
        )
        return denoise_finalize_pallas(gb, bn)

    dev_ms = _train(frame_b1, "cfg3 device frame train (bounces=1, fixed tables)")
    _train(
        lambda t: render_gbuffers_fused(
            tables, bn, moved(t), W, H, MAX_TRACE_STEPS, 0, bounces=1
        )["lighting"],
        "cfg3 G-buffers only (bounces=1)",
    )
    gb_fixed = jax.block_until_ready(
        render_gbuffers_fused(tables, bn, uni, W, H, MAX_TRACE_STEPS, 0, bounces=1)
    )
    _train(
        lambda t: denoise_finalize_pallas(
            dict(gb_fixed, lighting=gb_fixed["lighting"] + t), bn
        ),
        "cfg3 denoise+finalize only",
    )

    # The production interactive loop (streaming + packed upload), exactly
    # what benchmark config 3 times — then the same loop WITHOUT the final
    # sync to expose the host dispatch rate (1-core host + tunnel).
    from raytrace_tpu.apps.benchmark import config3_flythrough
    from raytrace_tpu.render.pipeline import Pipeline

    config3_flythrough("fused", 60, bounces=1, _name="cfg3 interactive loop")

    p = Pipeline(width=W, height=H, tracer="fused", bounces=1)
    c3 = Camera(origin=[-30.0, -100.0, 60.0])
    c3.pitch = -0.1
    for _ in range(4):
        _sync(p.draw_frame(c3, 0.6))
    from collections import deque

    inflight = deque()
    t0 = time.monotonic()
    for _ in range(60):
        c3.origin[0] += 1.2
        inflight.append(p.draw_frame(c3, 0.6))
        if len(inflight) > 2:
            inflight.popleft()
    t_dispatch = (time.monotonic() - t0) / 60 * 1e3
    _sync(inflight.pop())
    print(f"{'cfg3 host dispatch rate (no end sync)':64s} {t_dispatch:9.2f} ms", flush=True)

    # ================= config 2 (1920x1080, bounces=1) ==================
    print("--- config 2 1080p decomposition ---", flush=True)
    W2, H2 = 1920, 1080
    opts2 = scoped_vmem_options(H2, W2)

    def frame2(t):
        gb = render_gbuffers_fused(
            tables, bn, moved(t), W2, H2, MAX_TRACE_STEPS, 0, bounces=1
        )
        return denoise_finalize_pallas(gb, bn)

    full2 = _train(frame2, "cfg2 full frame train", opts=opts2)
    gb2_ms = _train(
        lambda t: render_gbuffers_fused(
            tables, bn, moved(t), W2, H2, MAX_TRACE_STEPS, 0, bounces=1
        )["lighting"],
        "cfg2 G-buffers only",
        opts=opts2,
    )
    gb2 = jax.block_until_ready(
        render_gbuffers_fused(tables, bn, uni, W2, H2, MAX_TRACE_STEPS, 0, bounces=1)
    )
    den2 = _train(
        lambda t: denoise_finalize_pallas(
            dict(gb2, lighting=gb2["lighting"] + t), bn
        ),
        "cfg2 denoise+finalize only",
        opts=opts2,
    )
    print(
        f"  => cfg2 {W2*H2*3/full2/1e3:.2f} Mrays/s; unaccounted "
        f"{full2 - gb2_ms - den2:.2f} ms",
        flush=True,
    )
    # Square-ish comparator at the same ray count: is the shape or the px
    # count what hurts?  1080p = 2.07 Mpx; 1440^2 = 2.07 Mpx.
    _train(
        lambda t: render_gbuffers_fused(
            tables, bn, moved(t), 1440, 1440, MAX_TRACE_STEPS, 0, bounces=1
        )["lighting"],
        "same-Mpx square 1440^2 G-buffers only",
        opts=scoped_vmem_options(1440, 1440),
    )

    # ================= config 5 (4K fused) ==============================
    print("--- config 5 4K decomposition ---", flush=True)
    W5, H5 = 3840, 2160
    opts5 = scoped_vmem_options(H5, W5)

    def frame5(t):
        gb = render_gbuffers_fused(
            tables, bn, moved(t), W5, H5, MAX_TRACE_STEPS, 0, bounces=2
        )
        return denoise_finalize_pallas(gb, bn)

    full5 = _train(frame5, "cfg5 DIRECT 4K full frame train", n=6, opts=opts5)
    print(f"  => direct {W5*H5*5/full5/1e3:.2f} Mrays/s", flush=True)
    gb5_ms = _train(
        lambda t: render_gbuffers_fused(
            tables, bn, moved(t), W5, H5, MAX_TRACE_STEPS, 0, bounces=2
        )["lighting"],
        "cfg5 G-buffers only",
        n=6,
        opts=opts5,
    )
    gb5 = jax.block_until_ready(
        render_gbuffers_fused(tables, bn, uni, W5, H5, MAX_TRACE_STEPS, 0, bounces=2)
    )
    den5 = _train(
        lambda t: denoise_finalize_pallas(
            dict(gb5, lighting=gb5["lighting"] + t), bn
        ),
        "cfg5 denoise+finalize only",
        n=6,
        opts=opts5,
    )
    print(
        f"  => cfg5 direct: gbuf {gb5_ms:.1f} + denoise {den5:.1f} + "
        f"unaccounted {full5 - gb5_ms - den5:.1f} ms",
        flush=True,
    )

    # The tiled wrapper as config 5 actually measures (1-device mesh,
    # per-frame sync) vs the same wrapper dispatch-trained.
    from raytrace_tpu.parallel.tiles import make_tile_mesh, render_frame_tiled

    mesh = make_tile_mesh()

    def f5t(t):
        return render_frame_tiled(
            tables, bn, moved(t), W5, H5, mesh, MAX_TRACE_STEPS, tracer="fused"
        )

    _sync(f5t(jnp.float32(0.0)))
    t0 = time.monotonic()
    for i in range(3):
        _sync(f5t(jnp.float32(0.001 + 0.03 * i)))
    dt = (time.monotonic() - t0) / 3 * 1e3
    print(f"{'cfg5 tiled wrapper, per-frame sync (config5 methodology)':64s} {dt:9.2f} ms", flush=True)
    t0 = time.monotonic()
    out = None
    for i in range(6):
        out = f5t(jnp.float32(0.001 + 0.03 * i))
    _sync(out)
    dt = (time.monotonic() - t0) / 6 * 1e3
    print(f"{'cfg5 tiled wrapper, dispatch train':64s} {dt:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
