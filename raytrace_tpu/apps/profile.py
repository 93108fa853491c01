"""Profiling harness: capture device traces of the frame pipeline.

Reference: misc/capture_perf_data.sh + misc/gen_flamegraph.sh (Linux perf +
flamegraph over the CPU binary).  The TPU-native equivalent captures an XLA
device trace with jax.profiler (viewable in TensorBoard / Perfetto) plus a
per-stage wall breakdown.

Usage: python -m raytrace_tpu.apps.profile [--out /tmp/rt_trace] [--frames 5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax

from ..render.camera import Camera
from ..render.pipeline import Pipeline


def run(out_dir: str = "/tmp/raytrace_tpu_trace", frames: int = 5, width=1024, height=1024, tracer="fused"):
    pipeline = Pipeline(width=width, height=height, tracer=tracer)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3

    # Warm up compiles AND streaming convergence (the static camera needs
    # several slice moves; tracing before convergence records slice-upload
    # programs instead of the steady-state frame).
    for _ in range(6):
        np.asarray(pipeline.draw_frame(cam, 0.6))

    with jax.profiler.trace(out_dir):
        t0 = time.monotonic()
        for i in range(frames):
            frame = pipeline.draw_frame(cam, 0.6 + 0.01 * i)
        np.asarray(frame)
        dt = (time.monotonic() - t0) / frames
    print(f"{frames} frames, {dt * 1000:.1f} ms/frame avg; trace written to {out_dir}")
    return dt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/raytrace_tpu_trace")
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument(
        "--tracer", default="fused",
        choices=["fused", "hf", "volume", "volume_fast"],
    )
    ns = ap.parse_args()
    run(ns.out, ns.frames, tracer=ns.tracer)


if __name__ == "__main__":
    main()
