"""Debug viewer: dump the blue-noise texture (and G-buffers) as PNGs.

Parity with the reference's unused `test.comp` blue-noise debug shader
(shaders/glsl/test.comp) plus a practical G-buffer inspector.

Usage: python -m raytrace_tpu.apps.debug_view [--out /tmp/rt_debug]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def run(out_dir: str = "/tmp/rt_debug", gbuffers: bool = False):
    from ..testing.golden import save_png
    from ..utils.blue_noise import get_blue_noise

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    bn = get_blue_noise()
    save_png(out / "blue_noise_rgb.png", bn[:, :, :3] / 255.0)
    save_png(out / "blue_noise_r.png", np.repeat(bn[:, :, :1], 3, -1) / 255.0)

    if gbuffers:
        import jax.numpy as jnp

        from ..ops.trace_pallas import build_hf_tables, render_gbuffers_hf
        from ..render.camera import Camera
        from ..utils.blue_noise import get_blue_noise_f32

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
            lr=jnp.zeros(3, jnp.float32),
        )
        gb = render_gbuffers_hf(
            tables, jnp.asarray(get_blue_noise_f32()), uni, 512, 512, 1024, 0
        )
        save_png(out / "gb_albedo.png", np.asarray(gb["albedo"]))
        save_png(out / "gb_lighting.png", np.asarray(gb["lighting"]) * 4.0)
        save_png(out / "gb_fog.png", np.asarray(gb["fog"]))
        depth = np.asarray(gb["depth"]).astype(np.float32) / 65535.0
        save_png(out / "gb_depth.png", np.repeat(depth[..., None], 3, -1))
        normal = np.asarray(gb["normal"]).astype(np.float32) / 16.0
        save_png(out / "gb_normal.png", np.repeat(normal[..., None], 3, -1))
    print(f"debug views written to {out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/rt_debug")
    ap.add_argument("--gbuffers", action="store_true")
    ns = ap.parse_args()
    run(ns.out, ns.gbuffers)


if __name__ == "__main__":
    main()
