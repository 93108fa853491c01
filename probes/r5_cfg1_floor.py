"""Round-5 TPU session 1b: decompose config 1's 3.47 ms setup+final floor.

r5_session1 block A measured render_gbuffers_path(rounds=0) — setup (camera
rays, noise, flatten) + the final planar pass (albedo row-gather, sky,
depth/fog) with ZERO trace rounds — at 3.47 ms.  The 40 Mrays/s bar needs
the whole frame in 6.55 ms, so the floor must shrink to ~1.5 ms.  This
probe times each stage standalone at 512^2 (the pieces re-created exactly
as render_gbuffers_path builds them).

  timeout 3600 python probes/r5_cfg1_floor.py 2>&1 | tee probes/out/r5_cfg1_floor.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytrace_tpu.ops import shading
from raytrace_tpu.ops.trace_jax import MATERIAL_MASK, camera_rays, frame_noise, fuse_volume
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.utils.blue_noise import get_blue_noise_f32
from raytrace_tpu.world.generate import generate_chunk

W = H = 512


def _timeit(fn, label, n=20):
    f = jax.jit(lambda t: jnp.sum(fn(t)))
    float(f(jnp.float32(0.0)))
    t0 = time.monotonic()
    out = None
    for i in range(n):
        out = f(jnp.float32(0.001 + 0.03 * i))
    float(out)
    dt = (time.monotonic() - t0) / n * 1e3
    print(f"{label:64s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    mats, mf = generate_chunk((0, 0, 0), seed=0)
    vol_m = jnp.zeros((256, 256, 256), jnp.uint32)
    vol_f = jnp.full((256, 256, 256), 6, jnp.uint8)
    vol_m = vol_m.at[128:192, 128:192, 128:192].set(mats)
    vol_f = vol_f.at[128:192, 128:192, 128:192].set(mf)
    fused1 = fuse_volume(vol_m, vol_f)
    fused_flat = fused1  # already flat (16M u32)
    cam1 = Camera(origin=[32.0, -40.0, 60.0])
    cam1.pitch = -0.5
    fwd, up, right = cam1.scaled_basis()
    uni = dict(
        origin=jnp.asarray(cam1.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(0.6),
        seed=jnp.int32(7),
        lr=jnp.asarray((0, 0, 0), jnp.float32),
    )
    bn = jnp.asarray(get_blue_noise_f32())

    def moved(t):
        return dict(uni, origin=uni["origin"] + t * jnp.asarray([1.0, 1.0, 0.0]))

    # --- empty jit: dispatch-train floor --------------------------------
    _timeit(lambda t: t * 2.0, "empty jit (dispatch train floor)")

    # --- camera rays ----------------------------------------------------
    _timeit(
        lambda t: camera_rays(moved(t), W, H, 0, H)[1], "camera_rays alone"
    )

    # --- frame noise (unused at bounces=0 but traced unless DCE'd) ------
    _timeit(
        lambda t: frame_noise(bn, moved(t)["seed"] + 0 * t.astype(jnp.int32), W, H, 0, None)[0],
        "frame_noise alone",
    )

    # --- flatten / pad / reshape of 9 planes ----------------------------
    LANES, tile_rows = 128, 16
    n = H * W
    per_tile = tile_rows * LANES
    n_pad = -(-n // per_tile) * per_tile
    rows_t = (n_pad // per_tile) * tile_rows

    def flat(x, pad=0.0):
        f = jnp.asarray(x, jnp.float32).reshape(n)
        f = jnp.pad(f, (0, n_pad - n), constant_values=pad)
        return f.reshape(rows_t, LANES)

    def setup(t):
        origin, ray_dir = camera_rays(moved(t), W, H, 0, H)
        outs = [
            flat(origin[..., 0]), flat(origin[..., 1]), flat(origin[..., 2], 1e9),
            flat(ray_dir[..., 0]), flat(ray_dir[..., 1]), flat(ray_dir[..., 2], 1.0),
        ]
        return sum(jnp.sum(o) for o in outs)

    _timeit(lambda t: setup(t), "camera_rays + flatten 6 planes")

    # --- final-pass pieces ----------------------------------------------
    sun = shading.sun_direction(jnp, uni["sun_angle"])
    sunlight = shading.sun_color(jnp, sun)
    _, ray_dir0 = jax.block_until_ready(camera_rays(uni, W, H, 0, H))
    prim_lin = jnp.arange(n, dtype=jnp.int32).reshape(H, W) % (1 << 24)

    def sky(t):
        d = ray_dir0 + t * 0
        r, g, b = shading.sample_sky(
            jnp, (d[..., 0], d[..., 1], d[..., 2]), sun, sunlight, True
        )
        return jnp.stack(jnp.broadcast_arrays(r, g, b), -1)

    _timeit(sky, "sample_sky over 512^2 (one eval)")
    _timeit(lambda t: sky(t) + sky(t * 2), "sample_sky x2 (light + fog)")

    def albedo(t):
        safe = (prim_lin + t.astype(jnp.int32) * 0)
        base = safe >> 3
        rows8 = fused_flat.reshape(-1, 8)[base]
        word = jnp.take_along_axis(rows8, (safe & 7)[..., None], axis=-1)[..., 0]
        packed = word & jnp.uint32(MATERIAL_MASK)
        return jnp.stack(
            [((packed >> 14) & 0x7F).astype(jnp.float32),
             ((packed >> 7) & 0x7F).astype(jnp.float32),
             (packed & 0x7F).astype(jnp.float32)], -1)

    _timeit(albedo, "albedo 8-word row gather over 512^2")

    # --- the whole rounds=0 program again for reference ------------------
    from raytrace_tpu.ops.path_vol import render_gbuffers_path

    tables1 = build_vol_tables(fused1)

    def floor_frame(t, **kw):
        return render_gbuffers_path(
            fused1, tables1, bn, moved(t), W, H, 1024, bounces=0, rounds=0, **kw
        )["albedo"]

    _timeit(floor_frame, "render_gbuffers_path rounds=0 (reference)")
    # G-buffer dict summed whole (is the cost in buffers we don't read?)
    def floor_all(t):
        gb = render_gbuffers_path(
            fused1, tables1, bn, moved(t), W, H, 1024, bounces=0, rounds=0
        )
        return sum(jnp.sum(jnp.asarray(v, jnp.float32)) for v in gb.values())

    _timeit(floor_all, "rounds=0, all G-buffers summed")


if __name__ == "__main__":
    main()
