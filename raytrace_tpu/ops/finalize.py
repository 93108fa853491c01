"""Frame finalization: composite, fog, filmic tonemap, dither.

Reference: shaders/glsl/finalize.comp.  Pure elementwise math plus one
blue-noise modular lookup; XLA fuses the whole thing into the end of the
frame pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import LIGHTING_SCALE
from .shading import filmic_curve

FOG_SCALE = 32.0 * 128.0 * 8.0  # finalize.comp:46


@functools.partial(jax.jit, static_argnames=("flip",))
def finalize_frame(
    albedo: jax.Array,
    emission: jax.Array,
    fog: jax.Array,
    lighting: jax.Array,
    depth: jax.Array,
    blue_noise: jax.Array,
    row0=0,
    flip: bool = True,
) -> jax.Array:
    """(H, W, 3) float32 final frame in [0, ~1].

    Composite albedo*light*LIGHTING_SCALE + emission*4, depth-proportional
    fog (terrain only), filmic curve, blue-noise dither /128, and the
    vertical flip into window coordinates (finalize.comp:33-63).

    `row0` offsets the dither pattern for banded rendering; `flip=False`
    lets the multi-chip tile split flip once after band assembly.
    """
    h, w = albedo.shape[:2]
    # Channel-planar internally (see ops/denoise.py): (H, W) planes keep the
    # VPU lanes full; a trailing 3-channel axis would waste 126/128 lanes.
    albedo_p = albedo.transpose(2, 0, 1)
    emission_p = emission.transpose(2, 0, 1)
    fog_p = fog.transpose(2, 0, 1)
    light_p = lighting.transpose(2, 0, 1) * jnp.float32(LIGHTING_SCALE)
    final = albedo_p * light_p + emission_p * 4.0

    depth_f = depth.astype(jnp.float32)
    fog_amount = jnp.minimum(depth_f / FOG_SCALE, 1.0)[None]
    is_terrain = (depth < jnp.uint16(0xFFFF))[None]
    final = jnp.where(
        is_terrain, final + (fog_p * 2.0 - final) * fog_amount, final
    )

    final = filmic_curve(jnp, final)

    ny, nx = blue_noise.shape[0], blue_noise.shape[1]
    if isinstance(row0, int) and row0 == 0:
        # Full-frame fast path: modular dither = tile, not gather.
        dither = jnp.tile(
            blue_noise[:, :, :3].transpose(2, 0, 1), (1, -(-h // ny), -(-w // nx))
        )[:, :h, :w]
    else:
        py = jnp.remainder(
            jnp.asarray(row0, jnp.int32) + jnp.arange(h, dtype=jnp.int32), ny
        )[:, None]
        px = jnp.arange(w, dtype=jnp.int32)[None, :] % nx
        dither = blue_noise[py, px, :3].transpose(2, 0, 1)
    final = final + dither / 128.0

    # Window coordinates are upside-down relative to world space.
    final = final.transpose(1, 2, 0)
    return final[::-1] if flip else final


def finalize_frame_np(albedo, emission, fog, lighting, depth, blue_noise):
    """NumPy oracle (used by tests)."""
    import numpy as np

    from .shading import filmic_curve as fc

    h, w = albedo.shape[:2]
    final = albedo * (lighting * np.float32(LIGHTING_SCALE)) + emission * 4.0
    fog_amount = np.minimum(depth.astype(np.float32) / FOG_SCALE, 1.0)[..., None]
    is_terrain = (depth < np.uint16(0xFFFF))[..., None]
    final = np.where(is_terrain, final + (fog * 2.0 - final) * fog_amount, final)
    final = fc(np, final)
    py = np.arange(h)[:, None] % blue_noise.shape[0]
    px = np.arange(w)[None, :] % blue_noise.shape[1]
    final = final + blue_noise[py, px, :3] / 128.0
    return final[::-1]
