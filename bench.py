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
WARMUP = 2
FRAMES = 5


def main():
    import jax.numpy as jnp

    from raytrace_tpu.render.camera import Camera
    from raytrace_tpu.render.pipeline import Pipeline

    pipeline = Pipeline(width=WIDTH, height=HEIGHT)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3

    for i in range(WARMUP):
        frame = pipeline.draw_frame(cam, 0.6)
        np.asarray(frame)

    t0 = time.monotonic()
    checksum = 0.0
    for i in range(FRAMES):
        frame = pipeline.draw_frame(cam, 0.6 + 0.01 * i)
        checksum += float(np.asarray(frame)[0, 0, 0])  # host sync
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
