"""Round-5 follow-up: near-boundary UNSTRIPED shapes at the raised limit.

r5_denoise_vmem found 1088^2 unstriped (1.402M padded px, inside the
1.7M MAX_VMEM_PIXELS budget) fails to compile at the DEFAULT scoped
limit while 1024^2 (1.254M) passes — the pixel budget alone is not a
compile bound.  Fix under test: scoped_vmem_options returns the raised
96M limit for ANY padded plane bigger than the known-good 1024^2
footprint, striped or not.  This probe drives every in-budget unstriped
shape class at 96M (expect: all compile), plus a paired
G-buffer+denoise program at the boundary, plus the exact r4 crash
shapes end-to-end through the SHIPPED helper.

  timeout 5400 python probes/r5_denoise_vmem2.py 2>&1 | tee probes/out/r5_denoise_vmem2.log
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
    _strip_plan,
)
from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
from raytrace_tpu.ops.trace_pallas import build_hf_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


def _try(fn, label, n=4, opts=None):
    try:
        f = jax.jit(lambda t: jnp.sum(fn(t)), compiler_options=opts)
        float(f(jnp.float32(0.0)))
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if "emory" in l), msg[0] if msg else "?")
        print(f"{label:64s} COMPILE FAIL: {head[:100]}", flush=True)
        return None
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

    def full(t, w, h):
        g = render_gbuffers_fused(
            tables, bn, dict(uni, origin=uni["origin"] + t), w, h,
            MAX_TRACE_STEPS, 0, bounces=0,
        )
        return denoise_finalize_pallas(g, bn)

    # Every shape the shipped helper must handle, driven THROUGH the
    # helper (G-buffers + denoise in one program, like production).
    for w, h in ((1088, 1088), (1152, 1152), (1216, 1216), (1280, 1024),
                 (1536, 896), (896, 1536), (1920, 1080), (2176, 640),
                 (1088, 1152)):
        opts = scoped_vmem_options(h, w)
        plan = _strip_plan(h, w)
        tag = "unstriped" if plan is None else (
            "xla" if plan == "xla" else f"{len(plan)}strips")
        _try(
            lambda t, w=w, h=h: full(t, w, h),
            f"{w}x{h} full frame [{tag}, opts={'96M' if opts else 'default'}]",
            opts=opts,
        )


if __name__ == "__main__":
    main()
