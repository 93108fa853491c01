"""Part B of the 1M vol decomp: the INCOHERENT legs (crashed out of part A).

Diffuse-like bounce legs are where the full volume_fast pipeline spends
~430 ms/leg vs 44 ms for a coherent primary leg — this isolates why:
per-round cost (gather locality) vs round count (stragglers).

  timeout 3600 python probes/r3_vol1m_b.py 2>&1 | tee probes/out/r3_vol1m_b.log
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
    prim = trace_rays_vol(tables, fused, o0, d0, lr)
    surf = jax.block_until_ready(prim["position"])
    hitm = jnp.asarray(~prim["air"]).reshape(W * H)
    print("primary hits:", int(hitm.sum()), "/", W * H, flush=True)

    def diffuse(t):
        i = jnp.arange(W * H, dtype=jnp.uint32)
        h = (i * jnp.uint32(2654435761)
             + (t * 1e4).astype(jnp.uint32)) & jnp.uint32(0xFFFF)
        a = h.astype(jnp.float32) * (6.2832 / 65536.0)
        b = ((i * jnp.uint32(40503)) & jnp.uint32(0x7FFF)).astype(
            jnp.float32
        ) * (1.5708 / 32768.0)  # upper hemisphere
        d = jnp.stack(
            [jnp.cos(a) * jnp.sin(b), jnp.sin(a) * jnp.sin(b), jnp.cos(b)],
            axis=-1,
        ).reshape(W * H, 3)
        return surf.reshape(W * H, 3), d

    def sun(t):
        d = jnp.tile(
            jnp.asarray([[0.3, 0.25, 0.92]], jnp.float32), (W * H, 1)
        )
        return surf.reshape(W * H, 3) + 0.0 * t, d

    for r in (1, 2, 3):
        _time(
            lambda t, r=r: trace_rays_vol(
                tables, fused, *diffuse(t), lr, rounds=r,
                active=hitm,
            )["distance"],
            f"diffuse leg rounds={r}",
        )
    _time(
        lambda t: trace_rays_vol(
            tables, fused, *diffuse(t), lr, active=hitm
        )["distance"],
        "diffuse leg converged (rounds=22)",
    )
    _time(
        lambda t: trace_rays_vol(
            tables, fused, *sun(t), lr, active=hitm
        )["distance"],
        "sun-shadow leg converged",
    )


if __name__ == "__main__":
    main()
