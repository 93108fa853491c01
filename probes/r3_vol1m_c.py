"""In-process A/B of the straggler cascade (congestion-immune: every row
shares one process, so only RELATIVE times matter).

  timeout 3600 python probes/r3_vol1m_c.py 2>&1 | tee probes/out/r3_vol1m_c.log
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

    def diffuse(t):
        return osurf + 0.0 * t, ddif

    # Calibration rows first: one full round, and a bare 9-operand sort.
    _time(
        lambda t: trace_rays_vol(
            tables, fused, *diffuse(t), lr, rounds=1, active=hitm,
        )["distance"],
        "CAL one full-width round",
    )
    ops = [osurf[:, 0] + 0.0, osurf[:, 1], osurf[:, 2],
           ddif[:, 0], ddif[:, 1], ddif[:, 2]]
    iv = jnp.arange(n, dtype=jnp.int32)

    def sort9(t):
        key = (iv & 1) * n + iv + (t * 0).astype(jnp.int32)
        out = jax.lax.sort(
            (key,) + tuple(ops) + (iv, iv), num_keys=1
        )
        return out[1]

    _time(sort9, "CAL 9-operand 1M sort")

    for name in ("diffuse", "sun"):
        if name == "sun":
            d = jnp.tile(jnp.asarray([[0.3, 0.25, 0.92]], jnp.float32),
                         (n, 1))
        else:
            d = ddif

        def leg(t, d=d):
            return osurf + 0.0 * t, d

        for casc in (False, True):
            _time(
                lambda t, casc=casc: trace_rays_vol(
                    tables, fused, *leg(t), lr, active=hitm, cascade=casc,
                )["distance"],
                f"{name} converged cascade={casc}",
            )


if __name__ == "__main__":
    main()
