"""Round-5 TPU session 2: make the denoiser's VMEM plan a real bound.

Round 4 lost two probe sessions to AOT "Ran out of memory in memory space
vmem" inside denoise_finalize_pallas (VERDICT r4 weak #3):
  * cfg2 decomposition: denoise ALONE at 1080p (strip plane 1088x1152)
    demanded 49.64 M > 48 M — yet the same strips compile fine when the
    G-buffer pass shares the program (apps/benchmark config 2, 78.71 ms).
  * r4_path_tune: 4K whole-path + denoise (strip plane 2176x640) demanded
    61.59 M > 48 M.
So the demand is PROGRAM-dependent (XLA assigns scoped VMEM across the
whole module), and 48 MiB is too tight a ceiling for programs that pair
the strip chain with other VMEM-hungry stages.  This probe:
  1. reproduces both failures as written (expect: compile error),
  2. retries at raised limits (96 MiB) — expect pass; records ms,
  3. checks the raised limit does NOT regress the known-good programs
     (cfg2 full frame, 4K denoise) vs their 48 MiB numbers,
  4. sweeps unstriped-boundary shapes at the DEFAULT limit to find where
     the unstriped plan stops compiling (calibrates MAX_VMEM_PIXELS).

  timeout 5400 python probes/r5_denoise_vmem.py 2>&1 | tee probes/out/r5_denoise_vmem.log
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.constants import MAX_TRACE_STEPS
from raytrace_tpu.ops.denoise_pallas import denoise_finalize_pallas, _strip_plan
from raytrace_tpu.ops.lighting_pallas import render_gbuffers_fused
from raytrace_tpu.ops.trace_pallas import build_hf_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32


def _sync(x):
    return float(jnp.sum(x))


def _try(fn, label, n=6, opts=None):
    """Compile + time; on compile failure print the error and continue."""
    try:
        f = jax.jit(lambda t: jnp.sum(fn(t)), compiler_options=opts)
        _sync(f(jnp.float32(0.0)))
    except Exception as e:
        msg = str(e).splitlines()
        head = next((l for l in msg if "emory" in l), msg[0] if msg else "?")
        print(f"{label:64s} COMPILE FAIL: {head[:110]}", flush=True)
        return None
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    _sync(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:64s} {dt:9.2f} ms", flush=True)
    return dt


def lim(kib):
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


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

    def gb_at(w, h, bounces=1):
        g = render_gbuffers_fused(
            tables, bn, uni, w, h, MAX_TRACE_STEPS, 0, bounces=bounces
        )
        return jax.block_until_ready(g)

    # ---- 1+2: crash repro A (1080p denoise alone) at 48 then 96 --------
    print("--- crash A: 1080p denoise-alone ---", flush=True)
    gb2 = gb_at(1920, 1080)
    for kib in (49152, 65536, 98304):
        _try(
            lambda t: denoise_finalize_pallas(
                dict(gb2, lighting=gb2["lighting"] + t), bn
            ),
            f"1080p denoise-alone limit={kib//1024}M",
            opts=lim(kib),
        )

    # ---- crash repro B: 4K denoise alone (2176x640 strips) -------------
    print("--- crash B: 4K denoise-alone ---", flush=True)
    gb5 = gb_at(3840, 2160, bounces=0)
    for kib in (49152, 98304):
        _try(
            lambda t: denoise_finalize_pallas(
                dict(gb5, lighting=gb5["lighting"] + t), bn
            ),
            f"4K denoise-alone limit={kib//1024}M",
            n=3,
            opts=lim(kib),
        )

    # ---- 3: known-good programs at 48 vs 96 (no regression allowed) ----
    print("--- known-good A/B: 48M vs 96M ---", flush=True)

    def frame2(t):
        gb = render_gbuffers_fused(
            tables, bn, dict(uni, origin=uni["origin"] + t), 1920, 1080,
            MAX_TRACE_STEPS, 0, bounces=1,
        )
        return denoise_finalize_pallas(gb, bn)

    for kib in (49152, 98304):
        _try(frame2, f"cfg2 full frame limit={kib//1024}M", opts=lim(kib))

    def frame5(t):
        gb = render_gbuffers_fused(
            tables, bn, dict(uni, origin=uni["origin"] + t), 3840, 2160,
            MAX_TRACE_STEPS, 0, bounces=2,
        )
        return denoise_finalize_pallas(gb, bn)

    for kib in (49152, 98304):
        _try(frame5, f"cfg5 4K full frame limit={kib//1024}M", n=3, opts=lim(kib))

    # ---- 4: unstriped-boundary sweep at the DEFAULT limit --------------
    print("--- unstriped boundary sweep (default scoped limit) ---", flush=True)
    for w, h in ((1024, 1024), (1088, 1088), (1152, 1152), (1216, 1216),
                 (1280, 1024), (1536, 896), (896, 1536)):
        plan = _strip_plan(h, w)
        gb = gb_at(w, h, bounces=0)
        _try(
            lambda t, g=gb: denoise_finalize_pallas(
                dict(g, lighting=g["lighting"] + t), bn
            ),
            f"{w}x{h} denoise-alone default-limit plan={plan if plan else 'unstriped'}",
            n=3,
        )


if __name__ == "__main__":
    main()
