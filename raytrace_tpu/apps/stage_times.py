"""Per-stage frame timing: where does a frame's time go?

Times each pipeline stage in isolation by chaining N invocations inside one
jitted fori_loop (same methodology as bench.py: a single scalar readback,
so the axon host-roundtrip (~35 ms) is amortized instead of billed N times).

Usage: python -m raytrace_tpu.apps.stage_times [--tracer fused] [--unified]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def _time_loop(fn, n=10, label=""):
    """Mean ms/iteration of fn chained n times in one program."""

    @jax.jit
    def loop():
        def body(i, acc):
            out = fn(i)
            return acc + out

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    r = loop()
    float(r)  # compile + first run
    t0 = time.monotonic()
    float(loop())
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:44s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracer", default="fused")
    ap.add_argument("--unified", action="store_true")
    ap.add_argument("--caps", default=None, help="comma ints, e.g. 48,192")
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    if args.unified:  # render_frame reads the env var (render/pipeline.py)
        import os

        os.environ["RAYTRACE_TPU_UNIFIED"] = "1"

    from ..constants import DEFAULT_HEIGHT, DEFAULT_WIDTH, MAX_TRACE_STEPS
    from ..ops.denoise import denoise_chain
    from ..ops.finalize import finalize_frame
    from ..render.camera import Camera
    from ..render.pipeline import Pipeline, render_frame

    W, H = DEFAULT_WIDTH, DEFAULT_HEIGHT
    pipeline = Pipeline(width=W, height=H, tracer=args.tracer)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    for _ in range(6):
        float(jnp.sum(pipeline.draw_frame(cam, 0.6)))
    uniforms = pipeline.uniforms.as_device_dict()
    world = pipeline._hf_tables
    bn = pipeline.blue_noise
    n = args.frames

    kw = {}
    if args.caps is not None:
        kw["caps"] = tuple(int(c) for c in args.caps.split(",") if c)

    def vary(u, i):
        return dict(
            u,
            origin=u["origin"] + jnp.float32(0.03) * i * jnp.asarray([1.0, 1.0, 0.0]),
            sun_angle=u["sun_angle"] + jnp.float32(0.01) * i,
            seed=u["seed"] + i,
        )

    # --- G-buffers only ---
    if args.tracer == "fused":
        from ..ops.lighting_pallas import render_gbuffers_fused

        def gb_fn(i):
            gb = render_gbuffers_fused(
                world, bn, vary(uniforms, i), W, H, MAX_TRACE_STEPS,
                pipeline.seed, unified=args.unified, **kw,
            )
            return jnp.sum(gb["lighting"])

    else:
        from ..ops.trace_pallas import render_gbuffers_hf

        def gb_fn(i):
            gb = render_gbuffers_hf(
                world, bn, vary(uniforms, i), W, H, MAX_TRACE_STEPS,
                pipeline.seed, **kw,
            )
            return jnp.sum(gb["lighting"])

    t_gb = _time_loop(gb_fn, n, f"gbuffers ({args.tracer}, unified={args.unified})")

    # --- denoise chain on a fixed G-buffer ---
    if args.tracer == "fused":
        from ..ops.lighting_pallas import render_gbuffers_fused

        gb0 = render_gbuffers_fused(
            world, bn, uniforms, W, H, MAX_TRACE_STEPS, pipeline.seed,
            unified=args.unified, **kw,
        )
    else:
        from ..ops.trace_pallas import render_gbuffers_hf

        gb0 = render_gbuffers_hf(
            world, bn, uniforms, W, H, MAX_TRACE_STEPS, pipeline.seed, **kw
        )
    gb0 = {k: v.block_until_ready() for k, v in gb0.items()}

    def dn_fn(i):
        out = denoise_chain(
            gb0["lighting"] + jnp.float32(1e-9) * i, gb0["depth"], gb0["normal"]
        )
        return jnp.sum(out)

    t_dn = _time_loop(dn_fn, n, "denoise chain (6 passes)")

    den0 = denoise_chain(gb0["lighting"], gb0["depth"], gb0["normal"])

    def fin_fn(i):
        out = finalize_frame(
            gb0["albedo"], gb0["emission"], gb0["fog"],
            den0 + jnp.float32(1e-9) * i, gb0["depth"], bn,
        )
        return jnp.sum(out)

    t_fin = _time_loop(fin_fn, n, "finalize")

    # --- full frame ---
    def full_fn(i):
        f = render_frame(
            world, bn, vary(uniforms, i), W, H,
            tracer=args.tracer, seed=pipeline.seed,
        )
        return jnp.sum(f)

    t_full = _time_loop(full_fn, n, "full frame (render_frame)")
    print(
        f"{'sum of stages':44s} {t_gb + t_dn + t_fin:8.2f} ms "
        f"(full {t_full:.2f})"
    )
    mrays = W * H * 5 / (t_full * 1e-3) / 1e6
    print(f"{'implied throughput':44s} {mrays:8.1f} Mrays/s")


if __name__ == "__main__":
    main()
