"""Replay one stuck grazing-tail ray through the exact kernel/resolve
float32 math, printing every intermediate, to root-cause the
never-terminating tail (VERDICT r3 task 2).

r4_decomp.log showed tail rays re-parking in the SAME brick for 10+
rounds with ~0.001 median progress/round — positions pinned at
multiple-of-8 coordinates (brick walls) with a small direction component
toward the wall.  This probe re-implements one kernel classification +
one resolve march in numpy float32 (formula-for-formula from
ops/trace_vol_pallas.py) on host-pulled tables, for a handful of stuck
rays, with full-precision printing.

  timeout 3600 python probes/r4_tail_forensics.py 2>&1 | tee probes/out/r4_tail_forensics.log
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from raytrace_tpu.ops.trace_jax import camera_rays
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera

W = H = 1024
F = np.float32
HALF = F(128.0)
EPS = F(1e-4)


def fmt(x):
    return f"{float(x):.9g}"


def march_one(p, d, detail, any8b, all8b, lr, max_rounds=4):
    """Replay rounds of kernel-classify + resolve-march for ONE ray, all
    in numpy float32 with the module's exact formulas."""
    p = p.astype(F).copy()
    d = d.astype(F).copy()
    lrf = lr.astype(F)
    inv_len = F(1.0) / F(np.sqrt(max(float(d[0]) ** 2 + float(d[1]) ** 2
                                    + float(d[2]) ** 2, 1e-20)))
    d = (d * inv_len).astype(F)
    lp = (F(1.0) / np.abs(d)).astype(F)
    mul = np.where(d > 0, F(-1.0), F(1.0)).astype(F)

    def brick(pv):
        xi = np.floor(pv).astype(np.int64)
        t = (xi + 128) & 255
        return ((t[2] >> 3) * 32 + (t[1] >> 3)) * 32 + (t[0] >> 3), t

    for rnd in range(max_rounds):
        b0, t = brick(p)
        bz, by, bx = b0 // 1024, (b0 // 32) % 32, b0 % 32
        a8 = bool(any8b[bz, by, bx])
        f8 = bool(all8b[bz, by, bx])
        print(f"round {rnd}: p=({fmt(p[0])}, {fmt(p[1])}, {fmt(p[2])}) "
              f"brick={b0} (z{bz},y{by},x{bx}) any={a8} all={f8}")
        if not a8:
            print("  -> brick empty: kernel would STEP (not stuck here)")
            # Step one pyramid move like the kernel (step=8 minimum).
            step_f = F(8.0)
            ls = (EPS + np.mod((p + HALF) * mul, step_f).astype(F)) * lp
            ax = int(np.argmin(ls))
            p = (p + d * ls[ax]).astype(F)
            continue
        if f8:
            print("  -> all-solid: kernel HIT (done)")
            return
        # Parked: resolve march.
        words = detail[b0]
        for i in range(23):
            bn, t = brick(p)
            if bn != b0:
                print(f"  march {i}: exited brick -> {bn} at "
                      f"p=({fmt(p[0])}, {fmt(p[1])}, {fmt(p[2])})")
                break
            v = ((int(t[2]) & 7) << 6) | ((int(t[1]) & 7) << 3) | (int(t[0]) & 7)
            solid = (int(words[v >> 5]) >> (v & 31)) & 1
            m = np.mod((p + HALF) * mul, F(1.0)).astype(F)
            ls = ((EPS + m) * lp).astype(F)
            ax = int(np.argmin([ls[0], ls[1], ls[2]]))
            print(f"  march {i}: p=({fmt(p[0])}, {fmt(p[1])}, {fmt(p[2])}) "
                  f"v={v} solid={solid} "
                  f"m=({fmt(m[0])}, {fmt(m[1])}, {fmt(m[2])}) "
                  f"l=({fmt(ls[0])}, {fmt(ls[1])}, {fmt(ls[2])}) ax={ax} "
                  f"lmin={fmt(ls[ax])}")
            if solid:
                print("  -> HIT")
                return
            p = (p + d * ls[ax]).astype(F)
        else:
            print("  march: 23 crossings exhausted, still in brick -> "
                  "'treat as exited', kernel re-parks SAME brick (STUCK)")


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
    a = ((i * jnp.uint32(2654435761)) & jnp.uint32(0xFFFF)).astype(
        jnp.float32
    ) * (6.2832 / 65536.0)
    b = ((i * jnp.uint32(40503)) & jnp.uint32(0x7FFF)).astype(
        jnp.float32
    ) * (1.5708 / 32768.0)
    ddif = jnp.stack(
        [jnp.cos(a) * jnp.sin(b), jnp.sin(a) * jnp.sin(b), jnp.cos(b)],
        axis=-1,
    ).reshape(n, 3)
    osurf = surf.reshape(n, 3)

    r18 = trace_rays_vol(tables, fused, osurf, ddif, lr, rounds=18,
                         active=hitm, cascade=False)
    live18 = np.asarray(r18["exhausted"]).reshape(n) & np.asarray(hitm)
    idx = np.nonzero(live18)[0]
    print(f"stuck candidates: {idx.size}", flush=True)

    tp = np.asarray(r18["position"]).reshape(n, 3)[idx]
    td = np.asarray(ddif)[idx]
    detail = np.asarray(tables["detail"])
    any8b = np.asarray(tables["any8b"])
    all8b = np.asarray(tables["all8b"])
    lrh = np.asarray(lr)

    for s in range(min(4, idx.size)):
        print(f"\n=== stuck ray {s} (pixel {int(idx[s])}) ===")
        print("  pos bits:", [np.float32(v).tobytes().hex() for v in tp[s]])
        print("  dir:", [fmt(v) for v in td[s]])
        march_one(tp[s], td[s], detail, any8b, all8b, lrh)


if __name__ == "__main__":
    main()
