"""Why doesn't the cascade help the converged diffuse leg?  Three
independent measurements in one process (relative times only):

  1. live fraction after k rounds at the BENCH scene (not the centered
     probe scene the published live curve came from),
  2. per-round cost vs batch width (is run_rounds width-proportional?),
  3. sub_bricks A/B on the converged diffuse leg.

  timeout 3600 python probes/r3_vol1m_e.py 2>&1 | tee probes/out/r3_vol1m_e.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops.trace_jax import camera_rays
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera

W = H = 1024
N_TRAIN = 10


def _time(fn, label, n=N_TRAIN):
    f = jax.jit(lambda t: jnp.sum(fn(t)))
    float(f(jnp.float32(0.0)))
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    float(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:52s} {dt:8.2f} ms   {W * H / dt / 1e3:7.1f} Mrays/s",
          flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    from raytrace_tpu.render.pipeline import Pipeline

    p = Pipeline(width=W, height=H, tracer="volume_fast")
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.heading, cam.pitch = 0.8, -0.3
    p.converge_streaming((cam.origin[0], 0, cam.origin[2]), max_moves=24)
    p.fill_uniforms(cam, 0.6, bump_seed=False)
    fused = p.streamer.volume
    tables = build_vol_tables(fused)
    uni = p.uniforms.as_device_dict()
    lr = uni["lr"].astype(jnp.int32)

    o0, d0 = camera_rays(uni, W, H)
    prim = trace_rays_vol(tables, fused, o0, d0, lr, cascade=False)
    surf = jax.block_until_ready(prim["position"])
    hitm = jnp.asarray(~prim["air"]).reshape(W * H)
    n = W * H
    n_act = int(jnp.sum(hitm))

    i = jnp.arange(n, dtype=jnp.uint32)
    h = (i * jnp.uint32(2654435761)) & jnp.uint32(0xFFFF)
    a = h.astype(jnp.float32) * (6.2832 / 65536.0)
    b = ((i * jnp.uint32(40503)) & jnp.uint32(0x7FFF)).astype(
        jnp.float32
    ) * (1.5708 / 32768.0)
    ddif = jnp.stack(
        [jnp.cos(a) * jnp.sin(b), jnp.sin(a) * jnp.sin(b), jnp.cos(b)],
        axis=-1,
    ).reshape(n, 3)
    osurf = surf.reshape(n, 3)

    # 1. Live curve at THIS scene (cascade decision points + tail).
    print(f"active diffuse rays: {n_act} / {n}", flush=True)
    for k in (2, 5, 9, 14, 18):
        r = trace_rays_vol(
            tables, fused, osurf, ddif, lr, rounds=k,
            active=hitm, cascade=False,
        )
        live = int(jnp.sum(jnp.asarray(r["exhausted"]).reshape(n) & hitm))
        print(f"live after {k:2d} rounds: {live:8d}  "
              f"({100.0 * live / n:5.2f}% of batch, "
              f"{100.0 * live / max(n_act, 1):5.2f}% of active)", flush=True)

    # 2. Width-proportionality: one round over the full batch vs the
    #    front half vs the front eighth (same ray population class).
    for frac, name in ((1, "full"), (2, "half"), (8, "eighth")):
        m = n // frac

        def legm(t, m=m):
            return (osurf[:m] + 0.0 * t, ddif[:m])

        f = jax.jit(
            lambda t, m=m: jnp.sum(trace_rays_vol(
                tables, fused, *legm(t), lr, rounds=1,
                active=hitm[:m], cascade=False,
            )["distance"])
        )
        float(f(jnp.float32(0.0)))
        t0 = time.monotonic()
        for i_ in range(N_TRAIN):
            out = f(jnp.float32(0.001 + 0.03 * i_))
        float(out)
        dt = (time.monotonic() - t0) / N_TRAIN * 1e3
        print(f"one round, {name:7s} width ({m:8d} rays) "
              f"{dt:8.2f} ms", flush=True)

    # 3. sub_bricks on the converged diffuse leg (plain loop).
    def leg(t):
        return osurf + 0.0 * t, ddif

    for sb in (1, 2, 4):
        _time(
            lambda t, sb=sb: trace_rays_vol(
                tables, fused, *leg(t), lr, active=hitm,
                cascade=False, sub_bricks=sb,
            )["distance"],
            f"diffuse converged sub_bricks={sb}",
        )


if __name__ == "__main__":
    main()
