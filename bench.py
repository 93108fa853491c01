#!/usr/bin/env python
"""Headline benchmark: path-traced ray throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the reference's frame shape (BASELINE.md): 1024x1024 pixels,
up to 5 rays/pixel (primary + 2 sun + 2 diffuse), <=2048 DDA steps/ray,
full generated world resident on device, 6-pass denoise + finalize.
Throughput counts 5 rays/pixel/frame.  Baseline target: 100 Mrays/s
(BASELINE.json north_star).

Timing is honest: each frame is synced by a host readback of the final
image (block_until_ready alone under-reports on the axon platform).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MRAYS = 100.0
WIDTH = HEIGHT = 1024
RAYS_PER_PIXEL = 5
# Warmup covers jit compilation AND terrain-streaming convergence (the
# static bench camera needs ~4 slice moves before the region settles).
WARMUP = 6
FRAMES = 5


def main():
    import jax.numpy as jnp

    from raytrace_tpu.render.camera import Camera
    from raytrace_tpu.render.pipeline import Pipeline

    tracer = os.environ.get("RAYTRACE_TPU_TRACER", "hf")
    pipeline = Pipeline(width=WIDTH, height=HEIGHT, tracer=tracer)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3

    def sync(frame):
        # Force completion with an on-device reduction + scalar readback.
        # (A full-frame np.asarray would bill the host link, not the TPU;
        # block_until_ready under-reports on this platform.)
        return float(jnp.sum(frame))

    for i in range(WARMUP):
        sync(pipeline.draw_frame(cam, 0.6))

    t0 = time.monotonic()
    checksum = 0.0
    for i in range(FRAMES):
        frame = pipeline.draw_frame(cam, 0.6 + 0.01 * i)
        checksum += sync(frame)
    dt = (time.monotonic() - t0) / FRAMES

    mrays = WIDTH * HEIGHT * RAYS_PER_PIXEL / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "path_trace_throughput",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
