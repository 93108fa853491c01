"""Config-1 cost decomposition at the config-1 scene (single chunk, 512^2
primary-only, volume_fast tracer).

Answers, in ONE process (one backend init; every variant compiled in the
same process so the remote compile cache is shared):

  1. noop dispatch-train overhead (floor every frame pays)
  2. trace-only cost vs compact_cap (None / 16384 / 32768)
  3. per-round marginal cost: trace with rounds forced to 1/2/3
     (differencing isolates kernel-pass + resolve cost per round)
  4. the full config-1 frame (albedo out) at the best compact_cap

Methodology: async dispatch train of N invocations + ONE jnp.sum readback
(apps/benchmark._time_chained) — a per-rep host sync would bill ~35 ms of
tunnel latency each (docs/DESIGN.md "Known costs").

Usage (tunnel must be up):
  timeout 3600 python probes/r3_cfg1_decomp.py 2>&1 | tee probes/out/r3_cfg1_decomp.log
"""

import os
import sys
import time

# Runnable as `python probes/r3_cfg1_decomp.py` (puts probes/ on sys.path,
# not the repo root — the reason step 3b of the r3 session crashed).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops.trace_jax import fuse_volume
from raytrace_tpu.ops.trace_vol_pallas import (
    build_vol_tables,
    render_gbuffers_vol,
    trace_rays_vol,
)
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32
from raytrace_tpu.world.generate import generate_chunk
from raytrace_tpu.apps.benchmark import _uniforms

W = H = 512
N_TRAIN = 20


def _time(fn, label, n=N_TRAIN):
    f = jax.jit(lambda t: jnp.sum(fn(t)))
    float(f(jnp.float32(0.0)))  # compile + warm
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    float(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:52s} {dt:8.2f} ms   {W * H / dt / 1e3:7.1f} Mrays/s", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)

    # Config-1 scene (apps/benchmark.config1_single_chunk).
    mats, mf = generate_chunk((0, 0, 0), seed=0)
    vol_m = jnp.zeros((256, 256, 256), jnp.uint32)
    vol_f = jnp.full((256, 256, 256), 6, jnp.uint8)
    vol_m = vol_m.at[128:192, 128:192, 128:192].set(mats)
    vol_f = vol_f.at[128:192, 128:192, 128:192].set(mf)
    fused = fuse_volume(vol_m, vol_f)
    tables = build_vol_tables(fused)
    bn = jnp.asarray(get_blue_noise_f32())
    cam = Camera(origin=[32.0, -40.0, 60.0])
    cam.pitch = -0.5
    uni = _uniforms(cam)

    from raytrace_tpu.ops.trace_jax import camera_rays

    def rays(t):
        # THE primary-ray generation the g-buffer pass uses (same function,
        # same frustum), so trace-only rows difference cleanly against the
        # full-frame rows; its cost is bounded by the noop row.
        u = dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        return camera_rays(u, W, H)

    lr = jnp.zeros(3, jnp.int32)

    _time(lambda t: rays(t)[1], "noop (ray gen only)")

    for cc in (None, 16384, 32768):
        _time(
            lambda t, cc=cc: trace_rays_vol(
                tables, fused, *rays(t), lr, max_steps=1024, compact_cap=cc
            )["distance"],
            f"trace-only compact_cap={cc}",
        )

    # Occupancy-bounds escape / approach-jump A/B (traced flags: all three
    # rows share ONE compiled program with the default row above).
    _time(
        lambda t: trace_rays_vol(
            tables, fused, *rays(t), lr, max_steps=1024, escape=False
        )["distance"],
        "trace-only escape=False",
    )
    _time(
        lambda t: trace_rays_vol(
            tables, fused, *rays(t), lr, max_steps=1024, approach_jump=True
        )["distance"],
        "trace-only approach_jump=True",
    )
    _time(
        lambda t: render_gbuffers_vol(
            fused, tables, bn,
            dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0])),
            W, H, 1024, bounces=0, compact_cap=16384, approach_jump=True,
        )["albedo"],
        "full config-1 frame cc=16384 + jump",
    )

    # Decision-critical rows FIRST (a slow-compile day can eat the tail:
    # ~10 jitted variants at 150-350 s each can exceed the step timeout).
    for cc in (None, 16384):
        _time(
            lambda t, cc=cc: render_gbuffers_vol(
                fused,
                tables,
                bn,
                dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0])),
                W,
                H,
                1024,
                bounces=0,
                compact_cap=cc,
            )["albedo"],
            f"full config-1 frame compact_cap={cc}",
        )

    for r in (1, 2, 3):
        _time(
            lambda t, r=r: trace_rays_vol(
                tables, fused, *rays(t), lr, max_steps=1024, rounds=r
            )["distance"],
            f"trace-only rounds={r} (marginal = round cost)",
        )


if __name__ == "__main__":
    main()
