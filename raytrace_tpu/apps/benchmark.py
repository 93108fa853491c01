"""Benchmark suite reproducing the BASELINE measurement configs.

BASELINE.md lists five configs; each prints one JSON line.  bench.py at the
repo root remains the single headline number (config "full frame").

  1. single loaded chunk, 512x512, primary rays only
  2. full generated world, 1920x1080, one diffuse bounce
  3. 60-frame flythrough with chunk streaming
  4. batch dataset capture (views/s, extrapolated to the 10k-view target)
  5. tile-split 4K path tracing over all available devices

Usage: python -m raytrace_tpu.apps.benchmark [--configs 1,2,3,4] [--tracer hf]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import MAX_TRACE_STEPS
from ..render.camera import Camera
from ..render.pipeline import Pipeline
from ..utils.blue_noise import get_blue_noise_f32


def _sync(x):
    return float(jnp.sum(x))


def _time_chained(frame_of_step, n=20, compiler_options=None):
    """Time n frames as an async dispatch train with ONE final sync.

    A per-rep host sync would bill ~35 ms of tunnel latency per frame
    (docs/DESIGN.md "Known costs"), drowning fast configs.  A fori_loop
    chain avoids that but measured ~2x slower per frame than the
    production dispatch pattern (loop-carried serialization defeats XLA's
    inter-frame overlap), so this times what draw_frame actually does:
    dispatch n frames back-to-back, block once at the end.

    compiler_options: pass denoise_pallas.scoped_vmem_options(h, w) for
    frames big enough to run the striped denoise chain — nested-jit
    compiler options don't propagate, so the OUTER jit must carry them.
    """
    f = jax.jit(
        lambda t: jnp.sum(frame_of_step(t)), compiler_options=compiler_options
    )
    _sync(f(jnp.float32(0.0)))  # compile + warm
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    _sync(out)
    return (time.monotonic() - t0) / n


def _emit(name, value, unit, extra=None):
    rec = {"config": name, "value": round(value, 2), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


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


def config1_single_chunk(tracer="volume_fast"):
    """512x512 primary-only over a single loaded chunk.

    This config exercises arbitrary volume content: the default
    "volume_fast" tracer is the brick-pyramid general path
    (ops/trace_vol_pallas.py); --tracer volume measures the exact
    reference-DDA baseline it replaced."""
    from ..ops.path_vol import render_gbuffers_path
    from ..ops.trace_jax import fuse_volume, render_gbuffers
    from ..ops.trace_vol_pallas import build_vol_tables
    from ..world.generate import generate_chunk

    mats, mf = generate_chunk((0, 0, 0), seed=0)
    vol_m = jnp.zeros((256, 256, 256), jnp.uint32)
    vol_f = jnp.full((256, 256, 256), 6, jnp.uint8)
    vol_m = vol_m.at[128:192, 128:192, 128:192].set(mats)
    vol_f = vol_f.at[128:192, 128:192, 128:192].set(mf)
    fused = fuse_volume(vol_m, vol_f)
    bn = jnp.asarray(get_blue_noise_f32())
    cam = Camera(origin=[32.0, -40.0, 60.0])
    cam.pitch = -0.5
    uni = _uniforms(cam)
    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    if tracer == "volume":
        def gb(t):
            return render_gbuffers(
                fused, bn, moved(t), 512, 512, 1024, bounces=0
            )
    else:
        # The whole-path round loop is the production volume_fast renderer
        # (render/pipeline.py routes through it); measure what ships.
        tables = build_vol_tables(fused)

        def gb(t):
            return render_gbuffers_path(
                fused, tables, bn, moved(t), 512, 512, 1024, bounces=0,
            )

    def frame(t):
        return gb(t)["albedo"]

    # Quality audit in the emitted record: a schedule that exhausts rays
    # renders pink pixels instead of doing the work — its Mrays/s would be
    # fiction (round-5 lesson: a timing-only retune shipped a default that
    # cut 31% of this very config's primaries).  Exhausted must be 0.
    exhausted = int(
        jax.jit(
            lambda t: jnp.sum((gb(t)["depth"] == 65024).astype(jnp.int32))
        )(jnp.float32(0.0))
    )

    dt = _time_chained(frame)
    return _emit(
        "1_single_chunk_primary", 512 * 512 / dt / 1e6, "Mrays/s",
        {"exhausted_px": exhausted},
    )


def config2_world_1080p(tracer="fused"):
    from ..ops.trace_pallas import build_hf_tables, render_gbuffers_hf

    lr = jnp.zeros(3, jnp.int32)
    tables = build_hf_tables(lr, seed=0)
    bn = jnp.asarray(get_blue_noise_f32())
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    uni = _uniforms(cam)

    def frame(t):
        u = dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        if tracer == "fused":
            from ..ops.lighting_pallas import render_gbuffers_fused

            gb = render_gbuffers_fused(
                tables, bn, u, 1920, 1080, MAX_TRACE_STEPS, 0, bounces=1
            )
        else:
            gb = render_gbuffers_hf(
                tables, bn, u, 1920, 1080, MAX_TRACE_STEPS, 0, bounces=1
            )
        from ..ops.denoise_pallas import denoise_finalize_pallas

        return denoise_finalize_pallas(gb, bn)

    from ..ops.denoise_pallas import scoped_vmem_options

    dt = _time_chained(frame, compiler_options=scoped_vmem_options(1080, 1920))
    rays = 1920 * 1080 * 3  # primary + sun + diffuse
    return _emit(
        "2_world_1080p_1bounce", rays / dt / 1e6, "Mrays/s", {"ms_per_frame": round(dt * 1e3, 1)}
    )


def config3_flythrough(tracer="fused", frames=60, bounces=2, _name=None):
    from collections import deque

    pipeline = Pipeline(width=1024, height=1024, tracer=tracer, bounces=bounces)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.1
    # Warm up compile + initial streaming.
    for _ in range(4):
        _sync(pipeline.draw_frame(cam, 0.6))
    # Production frame loop: draw_frame is fully async (one packed upload +
    # one dispatch), so frames are dispatched back-to-back and synced ONCE
    # at the end — the same methodology as every other config
    # (_time_chained).  A per-frame host readback would bill a flat ~35 ms
    # tunnel round trip per frame (docs/DESIGN.md "Known costs") that a
    # colocated-host deployment does not pay; a bounded in-flight window
    # (refs dropped two frames back) keeps device memory flat like the
    # reference's one-frame-deep fencing (pipeline.rs:162-235).
    inflight = deque()
    t0 = time.monotonic()
    for i in range(frames):
        cam.origin[0] += 1.2  # fly +x: crosses a slice boundary every ~13 frames
        inflight.append(pipeline.draw_frame(cam, 0.6))
        if len(inflight) > 2:
            inflight.popleft()  # drop ref; buffer freed once computed
    last = inflight.pop()
    _sync(last)
    dt = (time.monotonic() - t0) / frames
    return _emit(
        _name or "3_flythrough_streaming", dt * 1e3, "ms/frame",
        {"fps": round(1 / dt, 2), "bounces": bounces},
    )


def config3_flythrough_both(tracer="fused", frames=60):
    """Config 3 full (2 bounces, 5 rays/px) + the interactive preset
    (1 bounce, 3 rays/px — the reference's visual floor is the denoiser)."""
    full = config3_flythrough(tracer, frames, bounces=2)
    interactive = config3_flythrough(
        tracer, frames, bounces=1, _name="3_flythrough_interactive"
    )
    return full, interactive


def config4_capture(tracer="fused", views=30, fmt="dat"):
    import tempfile

    from .capture import run

    # save=True: the BASELINE capability is views ON DISK (+ manifest); the
    # steady-state clock includes draining the encode pool.  Default format
    # is the raw u8 .dat the reference sweep wrote
    # (capture_training_data.py) — on this single-core host zlib encoding,
    # not rendering, bounds PNG throughput.
    with tempfile.TemporaryDirectory() as td:
        n, dt = run(
            out_dir=td, width=512, height=512, limit=views, save=True, fmt=fmt
        )
    rate = n / dt
    return _emit(
        "4_batch_capture", rate, "views/s",
        {"est_10k_views_min": round(10000 / rate / 60, 1), "format": fmt},
    )


def config5_tiled_4k(tracer="fused"):
    from ..parallel.tiles import make_tile_mesh, render_frame_tiled

    if tracer in ("fused", "hf"):
        from ..ops.trace_pallas import build_hf_tables

        world = build_hf_tables(jnp.zeros(3, jnp.int32), seed=0)
    elif tracer == "volume_fast":
        from ..ops.trace_jax import fuse_volume
        from ..ops.trace_vol_pallas import build_vol_tables
        from ..world.generate import generate_box

        box = generate_box((-128, -128, -128), (256, 256, 256), seed=0)
        fused = fuse_volume(box["materials"], box["minefield"])
        world = (fused, build_vol_tables(fused))
    else:
        from ..ops.trace_jax import fuse_volume
        from ..world.generate import generate_box

        box = generate_box((-128, -128, -128), (256, 256, 256), seed=0)
        world = fuse_volume(box["materials"], box["minefield"])
    bn = jnp.asarray(get_blue_noise_f32())
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    uni = _uniforms(cam)
    mesh = make_tile_mesh()
    n_dev = len(jax.devices())
    W, H = 3840, 2160

    # render_frame_tiled carries its own jit + scoped-vmem compiler options
    # (the per-device denoise region runs the real Pallas chain now — on a
    # 1-device mesh the whole frame does).
    def f(v, b, u):
        return render_frame_tiled(
            v, b, u, W, H, mesh, MAX_TRACE_STEPS, tracer=tracer
        )

    _sync(f(world, bn, uni))
    t0 = time.monotonic()
    n = 3
    for _ in range(n):
        _sync(f(world, bn, uni))
    dt = (time.monotonic() - t0) / n
    return _emit(
        "5_tiled_4k", W * H * 5 / dt / 1e6, "Mrays/s", {"devices": n_dev, "ms": round(dt * 1e3)}
    )


CONFIGS = {
    "1": config1_single_chunk,
    "2": config2_world_1080p,
    "3": config3_flythrough_both,
    "4": config4_capture,
    "5": config5_tiled_4k,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", default="1,2,3,4")
    ap.add_argument("--tracer", default="fused")
    ns = ap.parse_args()
    for c in ns.configs.split(","):
        CONFIGS[c.strip()](tracer=ns.tracer)


if __name__ == "__main__":
    main()
