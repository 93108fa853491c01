"""Vol-tracer cost decomposition at the FULL-PIPELINE scale (1024^2 rays,
generated world, post-palette-removal), to size the straggler problem.

Rows:
  1. noop (ray gen only)           — dispatch-train floor
  2. trace rounds=1/2/3            — marginal = per-round full-batch cost
  3. trace on an EMPTY volume      — kernel pass + resolve-on-nothing
     (isolates the Pallas pass + fixed resolve overhead from real work)
  4. trace converged (default)     — how many effective rounds the while
     loop really runs (infer: (t4 - floor) / marginal)
  5. a diffuse-like incoherent leg — surface-origin rays, random dirs
     (the straggler population that holds the full pipeline hostage)

Usage (tunnel up):
  timeout 7200 python probes/r3_vol1m_decomp.py 2>&1 | tee probes/out/r3_vol1m.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops.trace_jax import camera_rays, fuse_volume
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera

W = H = 1024
N_TRAIN = 10


def _time(fn, label, n=N_TRAIN):
    f = jax.jit(lambda t: jnp.sum(fn(t)))
    float(f(jnp.float32(0.0)))  # compile + warm
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

    # The bench scene: full generated world streamed in (what bench.py uses).
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

    def rays(t):
        u = dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))
        return camera_rays(u, W, H)

    _time(lambda t: rays(t)[1], "noop (ray gen only)")

    for r in (1, 2, 3):
        _time(
            lambda t, r=r: trace_rays_vol(
                tables, fused, *rays(t), lr, rounds=r
            )["distance"],
            f"trace rounds={r} (marginal = round cost)",
        )

    _time(
        lambda t: trace_rays_vol(tables, fused, *rays(t), lr)["distance"],
        "trace converged (default rounds=22)",
    )

    # Empty volume: every ray escapes via occupancy bounds in round 1 —
    # kernel pass + fixed resolve overhead, no real parked work.
    empty = fuse_volume(
        jnp.zeros((256, 256, 256), jnp.uint32),
        jnp.full((256, 256, 256), 6, jnp.uint8),
    )
    etab = build_vol_tables(empty)
    _time(
        lambda t: trace_rays_vol(etab, empty, *rays(t), lr)["distance"],
        "trace EMPTY volume (kernel+fixed overhead)",
    )

    # Diffuse-like leg: origins on the terrain surface (primary hit points),
    # directions from a hash — spatially incoherent, grazing-heavy.
    o0, d0 = rays(jnp.float32(0.0))
    prim = trace_rays_vol(tables, fused, o0, d0, lr)
    surf = prim["position"]

    def diffuse(t):
        i = jnp.arange(W * H, dtype=jnp.uint32)
        h = (i * jnp.uint32(2654435761) + (t * 1e4).astype(jnp.uint32)) & jnp.uint32(0xFFFF)
        a = h.astype(jnp.float32) * (6.2832 / 65536.0)
        b = ((i * jnp.uint32(40503)) & jnp.uint32(0xFFFF)).astype(jnp.float32) * (3.1416 / 65536.0)
        d = jnp.stack(
            [jnp.cos(a) * jnp.sin(b), jnp.sin(a) * jnp.sin(b), jnp.cos(b)],
            axis=-1,
        ).reshape(W * H, 3)
        return surf.reshape(W * H, 3), d

    _time(
        lambda t: trace_rays_vol(tables, fused, *diffuse(t), lr)["distance"],
        "trace diffuse-like leg (incoherent, surface origins)",
    )


if __name__ == "__main__":
    main()
