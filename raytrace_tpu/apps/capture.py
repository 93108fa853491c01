"""Batch dataset capture: render many parameterized views to disk.

Reference: capture_training_data.py — a 5 positions x 7 angles x 5 sun
angles sweep that re-launched the whole binary per configuration (175
process spawns; its .dat output path is vestigial, SURVEY §2 #32).

TPU-native version: ONE process, one resident world volume, all
configurations rendered back-to-back through the jitted frame program (the
uniforms are traced arguments, so no recompilation between views), saved as
raw .dat / PNG + a manifest.  This is the working version of the capability
the reference's script encodes (BASELINE config 4).

Usage: python -m raytrace_tpu.apps.capture [--out DIR] [--size WxH]
       [--limit N] [--format dat|png|png-fast]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time
from pathlib import Path

import numpy as np

from ..render.camera import Camera
from ..render.pipeline import Pipeline
from ..utils.perf import StatTracker

# The reference sweep grid (capture_training_data.py:19-38).
POSITIONS = [
    (-30.0, -128.0, 100.0),
    (200.0, -50.0, 80.0),
    (-150.0, 60.0, 120.0),
    (40.0, 180.0, 60.0),
    (-80.0, -40.0, 140.0),
]
NUM_HEADINGS = 7
SUN_ANGLES = [0.2, 0.6, 1.0, 1.4, 1.8]


def sweep_configs():
    for pos in POSITIONS:
        for i in range(NUM_HEADINGS):
            heading = 2.0 * math.pi * i / NUM_HEADINGS
            for sun in SUN_ANGLES:
                yield dict(origin=pos, heading=heading, pitch=-0.3, sun_angle=sun)


def run(out_dir="capture", width=512, height=512, limit=None, max_steps=2048,
        save=True, pipeline=None, fmt="dat"):
    """pipeline: optional pre-built Pipeline (tests inject a cheap one).

    fmt: on-disk format.  "dat" (default) writes the raw u8 RGB frame bytes
    — byte-for-byte the content a training loader wants and exact parity
    with the reference sweep's .dat output (capture_training_data.py +
    .gitignore:5); shape/dtype land in the manifest.  "png-fast" writes
    PNGs at zlib level 1; "png" at the PIL default level 6.  On a
    single-core host encoding dominates the sweep (zlib-6 measured ~3x the
    render time at 512², and threads serialize on one core), so the format
    IS the throughput knob.
    """
    configs = list(sweep_configs())
    if limit:
        configs = configs[:limit]
    out = Path(out_dir)
    if save:
        out.mkdir(parents=True, exist_ok=True)
    if pipeline is None:
        pipeline = Pipeline(width=width, height=height, max_steps=max_steps)
    tracker = StatTracker(len(configs), "views")
    manifest = []
    t0 = time.monotonic()
    last_origin = None

    import jax.numpy as jnp

    def draw(cfg):
        cam = Camera(
            origin=list(cfg["origin"]), heading=cfg["heading"], pitch=cfg["pitch"]
        )
        nonlocal last_origin
        if cfg["origin"] != last_origin:
            # Recenter the world region on the new viewpoint (the reference
            # sweep relaunched the process per position for the same effect).
            pipeline.teleport(cam)
            last_origin = cfg["origin"]
        frame = pipeline.draw_frame(cam, cfg["sun_angle"])
        # Quantize on device: the PNG needs uint8 anyway, and the u8 frame
        # is 12x less host-transfer than f32 over the remote tunnel.
        return jnp.clip(frame * 255.0, 0, 255).astype(jnp.uint8)

    # PNG encoding runs on a worker pool: zlib compression is the slowest
    # stage of the sweep (~3x the render time at 512²) and releases the
    # GIL, so the device never waits on Pillow.  The main thread only does
    # the device readback (keeps the one-view-deep pipeline deterministic);
    # futures are drained at the end and re-raise any encode error.
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 4))
    futures = []

    if fmt == "dat":
        def write(path, arr):
            arr.tofile(path)
    elif fmt in ("png", "png-fast"):
        from ..testing.golden import save_png

        level = 1 if fmt == "png-fast" else 6

        def write(path, arr):
            save_png(path, arr, compress_level=level)
    else:
        raise ValueError(f"unknown capture format {fmt!r}")
    ext = "dat" if fmt == "dat" else "png"

    def sink(i, cfg, frame_u8):
        arr = np.asarray(frame_u8)  # device -> host sync
        if save:
            name = f"view_{i:05d}.{ext}"
            futures.append(pool.submit(write, out / name, arr))
            entry = {**cfg, "file": name}
            if fmt == "dat":
                entry["shape"] = list(arr.shape)
                entry["dtype"] = str(arr.dtype)
            manifest.append(entry)
        tracker.advance()
        print(f"\r{tracker.status()}   ", end="", flush=True)

    # K-deep view pipelining (the reference's fence is one-frame-deep,
    # pipeline.rs:162-235; K>1 additionally hides the ~35 ms host-readback
    # latency of the remote tunnel): dispatch up to K views ahead, start
    # each frame's device->host copy asynchronously at dispatch, and drain
    # in submission order — np.asarray in sink then finds the bytes
    # already on the host instead of billing a fresh round trip per view.
    # K u8 frames in flight is ~0.8 MB each at 512²; device memory is not
    # a concern.
    from collections import deque

    K = 4
    pending = deque()
    t_start = time.monotonic()
    for i, cfg in enumerate(configs):
        frame_u8 = draw(cfg)
        try:
            frame_u8.copy_to_host_async()
        except AttributeError:  # non-jax array from an injected pipeline
            pass
        pending.append((i, cfg, frame_u8))
        if i == 0:
            # Steady-state clock: the first view carries the jit compiles
            # (minutes through the remote tunnel; measured steady state is
            # ~65 ms/view at 512²).  The reference's per-process relaunch
            # had the same warm/cold split — its sweep timing is all warm.
            np.asarray(frame_u8)
            t0 = time.monotonic()
        while len(pending) > K:
            sink(*pending.popleft())
    while pending:
        sink(*pending.popleft())
    for f in futures:
        f.result()  # propagate encode/write failures
    pool.shutdown()
    print()
    if save:
        (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    if len(configs) >= 2:
        # Steady-state clock: t0 starts after view 0's sync, so the jit
        # compiles are excluded and n-1 views were timed.
        return len(configs) - 1, time.monotonic() - t0
    # A single view has no steady-state window; fall back to whole-run
    # timing (includes compile) rather than reporting an inflated rate.
    return len(configs), time.monotonic() - t_start


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="capture")
    ap.add_argument("--size", default="512x512")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--format", default="dat", choices=("dat", "png", "png-fast"),
        help="dat = raw u8 RGB (reference-sweep parity, cheapest); "
        "png-fast = zlib level 1; png = level 6",
    )
    ns = ap.parse_args()
    w, h = map(int, ns.size.split("x"))
    n, dt = run(ns.out, w, h, ns.limit, fmt=ns.format)
    print(f"{n} views in {dt:.1f}s ({n / dt:.2f} views/s)")


if __name__ == "__main__":
    main()
