"""Live-ray count after r rounds, per leg type (1M rays, generated world).

trace_rays_vol(rounds=r)["exhausted"] counts exactly the rays still live
when the budget cut them off — the live-count curve without any tracer
instrumentation.  Decides the straggler-cascade prefix width and the
multi-brick resolve depth.

  timeout 3600 python probes/r3_live_curve.py 2>&1 | tee probes/out/r3_live.log
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops.trace_jax import camera_rays
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera

W = H = 1024


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
    n = W * H
    print(f"primary hits: {int(hitm.sum())} / {n}", flush=True)

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
    dsun = jnp.tile(jnp.asarray([[0.3, 0.25, 0.92]], jnp.float32), (n, 1))
    osurf = surf.reshape(n, 3)

    legs = {
        "primary": (o0.reshape(n, 3), d0.reshape(n, 3), None),
        "sun": (osurf, dsun, hitm),
        "diffuse": (osurf, ddif, hitm),
    }
    for name, (o, d, act) in legs.items():
        for r in (1, 2, 4, 8, 16):
            got = trace_rays_vol(
                tables, fused, o, d, lr, rounds=r, active=act,
                cascade=False,
            )
            live = int(jnp.sum(got["exhausted"]))
            print(f"{name:8s} live after {r:2d} rounds: {live:8d}"
                  f"  ({100.0 * live / n:.2f}%)", flush=True)

    # Does the multi-brick resolve actually shrink the round count?  With
    # K=4 the live count after r rounds should approach the K=1 count
    # after ~4r rounds; if it doesn't, stragglers are not marching
    # consecutive bricks (re-park/oscillation would show as a plateau).
    for K in (1, 4):
        for r in (2, 4, 8):
            got = trace_rays_vol(
                tables, fused, osurf, ddif, lr, rounds=r, active=hitm,
                cascade=False, sub_bricks=K,
            )
            live = int(jnp.sum(got["exhausted"]))
            print(f"diffuse K={K} live after {r:2d} rounds: {live:8d}"
                  f"  ({100.0 * live / n:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
