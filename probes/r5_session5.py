"""Round-5 TPU session 5: cascade SORT_SEG sweep (fused kernel fixed cost).

The fused cascade partitions stragglers with jax.lax.sort over 13 operands
at full ray width (1M rows at 1024^2), then unsorts 2 operands at the end —
an O(n log^2 n) sorting network whose cost does not shrink with bounces.
SORT_SEG segments the sort into independent slices (bit-identical results,
lighting_pallas.rsort); segment length n/S turns log^2(n) into log^2(n/S)
and exposes more parallelism.  At bounces=1 (cfg3's 33 ms bar, r5 best
full frame 36.7 ms) the sorts are a larger fraction of the frame than at
b2, so this is the main untested lever left.

Blocks:
  A. equality pin: b1 G-buffers at SORT_SEG=16 vs 1 (depth + lighting
     bit-equal) — one-off safety net on hardware before trusting timings.
  B. SORT_SEG sweep at 1024^2 b1 and b2 G-buffers.
  C. cfg3 FULL frame + bench-shape b2 FULL frame at the winner.
  D. 1080p b1 G-buffers at the winner (cfg2's 90 Mrays/s bar).

  timeout 5400 python probes/r5_session5.py 2>&1 | tee probes/out/r5_session5.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import raytrace_tpu.ops.lighting_pallas as lp
from raytrace_tpu.constants import MAX_TRACE_STEPS
from raytrace_tpu.ops.denoise_pallas import denoise_finalize_pallas, scoped_vmem_options
from raytrace_tpu.ops.trace_pallas import build_hf_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

W = H = 1024


def _timeit(fn, label, n=10, opts=None):
    f = jax.jit(lambda t: jnp.sum(fn(t)), compiler_options=opts)
    float(f(jnp.float32(0.0)))
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
    cam.pitch = -0.1
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

    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    def gb(t, bounces, w=W, h=H, **kw):
        return render(tables, bn, moved(t), w, h, MAX_TRACE_STEPS, 0,
                      bounces=bounces, **kw)

    render = lp.render_gbuffers_fused

    # --- A: bit-equality pin at SORT_SEG=16 ---------------------------
    print("--- A: SORT_SEG=16 equality pin (b1) ---", flush=True)
    lp.SORT_SEG = 1
    ref = jax.jit(lambda t: gb(t, 1))(jnp.float32(0.0))
    ref = {k: np.asarray(v) for k, v in ref.items()}
    lp.SORT_SEG = 16
    got = jax.jit(lambda t: gb(t, 1))(jnp.float32(0.0))
    got = {k: np.asarray(v) for k, v in got.items()}
    for k in ("depth", "lighting"):
        same = np.array_equal(ref[k], got[k])
        print(f"  {k}: {'bit-equal' if same else 'DIFFERS'}", flush=True)
        if not same:
            print("  ABORT: SORT_SEG changes the frame", flush=True)
            return

    # --- B: sweep ------------------------------------------------------
    print("--- B: SORT_SEG sweep, 1024^2 G-buffers ---", flush=True)
    results = {}
    for b in (1, 2):
        for seg in (1, 4, 16, 64, 256):
            lp.SORT_SEG = seg
            dt = _timeit(lambda t, b=b: gb(t, b)["lighting"],
                         f"b{b} G-buffers SORT_SEG={seg}")
            results[(b, seg)] = dt
    # No-partition variant at b1: with only 3 legs the tail may be small
    # enough that skipping the 13-operand sort entirely wins (b2 measured
    # caps=() 52.6 vs 28.1 ms — but that was 5 legs).
    lp.SORT_SEG = 1
    _timeit(lambda t: gb(t, 1, caps=())["lighting"], "b1 G-buffers caps=()")

    best1 = min((v, s) for (b, s), v in results.items() if b == 1)
    best2 = min((v, s) for (b, s), v in results.items() if b == 2)
    print(f"winners: b1 seg={best1[1]} ({best1[0]:.2f} ms), "
          f"b2 seg={best2[1]} ({best2[0]:.2f} ms)", flush=True)

    # --- C: full frames at the winners ---------------------------------
    print("--- C: full frames at winners ---", flush=True)
    def full(t, bounces, **kw):
        return denoise_finalize_pallas(gb(t, bounces, **kw), bn)

    lp.SORT_SEG = best1[1]
    for u in (3, 5):
        dt = _timeit(lambda t, u=u: full(t, 1, unroll=u),
                     f"cfg3 FULL frame seg={best1[1]} unroll={u}")
        print(f"  => {1/dt*1e3:.1f} fps", flush=True)
    lp.SORT_SEG = best2[1]
    dt = _timeit(lambda t: full(t, 2), f"bench-shape FULL frame seg={best2[1]}")
    print(f"  => {W*H*5/dt/1e3:.2f} Mrays/s", flush=True)

    # --- D: 1080p at the b1 winner --------------------------------------
    print("--- D: 1080p b1 at winner ---", flush=True)
    lp.SORT_SEG = best1[1]
    opts = scoped_vmem_options(1080, 1920)
    dt = _timeit(lambda t: gb(t, 1, w=1920, h=1080)["lighting"],
                 f"1080p b1 G-buffers seg={best1[1]}")
    dt = _timeit(
        lambda t: denoise_finalize_pallas(gb(t, 1, w=1920, h=1080), bn),
        f"1080p b1 FULL frame seg={best1[1]}", opts=opts)
    print(f"  => {1920*1080*3/dt/1e3:.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
