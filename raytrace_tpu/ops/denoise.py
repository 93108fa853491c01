"""Edge-aware à-trous bilateral denoiser.

Reference: shaders/glsl/bilateral_denoise.comp (one pass) and the pass
schedule of pipeline.rs:103-115 (six passes, dilations 1,2,4,8,8,16,
ping-ponging two lighting buffers).

TPU-native formulation: each pass is a 33-tap stencil expressed as static
shifted slices of an edge-padded image, so XLA fuses the whole pass into one
elementwise pipeline over VMEM tiles — there is no gather and no ping-pong
buffer management (SSA values replace the descriptor-set variants of
descriptor_sets.rs:24-44).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import DENOISE_SIZES, NORMAL_SKY

# (dx, dy, weight) taps of the dilated kernel (bilateral_denoise.comp:43-84)
# plus the center tap weight 0.146634 (line 41).
_CENTER_WEIGHT = 0.146634
_TAPS = (
    [(0, 1, 0.092566), (0, -1, 0.092566), (1, 0, 0.092566), (-1, 0, 0.092566)]
    + [(1, 1, 0.058434), (-1, 1, 0.058434), (-1, -1, 0.058434), (1, -1, 0.058434)]
    + [(2, 0, 0.023205), (-2, 0, 0.023205), (0, 2, 0.023205), (0, -2, 0.023205)]
    + [(2, 2, 0.003672), (-2, 2, 0.003672), (-2, -2, 0.003672), (2, -2, 0.003672)]
    + [
        (2, 1, 0.014648),
        (-2, 1, 0.014648),
        (-2, -1, 0.014648),
        (2, -1, 0.014648),
        (1, 2, 0.014648),
        (-1, 2, 0.014648),
        (-1, -2, 0.014648),
        (1, -2, 0.014648),
    ]
    + [(3, 0, 0.002289), (-3, 0, 0.002289), (0, 3, 0.002289), (0, -3, 0.002289)]
    + [
        (3, 1, 0.001445),
        (-3, 1, 0.001445),
        (-3, -1, 0.001445),
        (3, -1, 0.001445),
        (1, 3, 0.001445),
        (-1, 3, 0.001445),
        (-1, -3, 0.001445),
        (1, -3, 0.001445),
    ]
)
_MAX_REACH = 3


def _pad_edge(img: jax.Array, pad: int) -> jax.Array:
    """Edge-pad the trailing two (H, W) dims of a (..., H, W) array."""
    cfg = [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(img, cfg, mode="edge")


def _denoise_planar(lighting_chw, depth, normal, size):
    """One à-trous pass on channel-planar (3, H, W) lighting.

    Channel-planar is the TPU-native image layout: every elementwise op
    tiles (H, W) onto full 8x128 vregs, where an (H, W, 3) layout would put
    the 3-wide channel axis on the 128-lane dimension (~2% lane
    utilization).  Weights follow bilateral_denoise.comp:23-33: gaussian tap
    weight divided by (4*|depth_c - depth_s|/256 + 10*(normal mismatch) + 1).
    """
    h, w = lighting_chw.shape[1:]
    pad = _MAX_REACH * size
    lp = _pad_edge(lighting_chw, pad)
    dp = _pad_edge(depth.astype(jnp.float32) / 256.0, pad)
    np_ = _pad_edge(normal, pad)

    center_d = dp[pad : pad + h, pad : pad + w]
    center_n = np_[pad : pad + h, pad : pad + w]

    total_w = jnp.full((h, w), _CENTER_WEIGHT, jnp.float32)
    acc = lighting_chw * _CENTER_WEIGHT
    for dx, dy, base_w in _TAPS:
        oy, ox = pad + dy * size, pad + dx * size
        tap_l = lp[:, oy : oy + h, ox : ox + w]
        tap_d = dp[oy : oy + h, ox : ox + w]
        tap_n = np_[oy : oy + h, ox : ox + w]
        depth_diff = 4.0 * jnp.abs(center_d - tap_d)
        normal_diff = jnp.where(tap_n == center_n, 0.0, 10.0)
        wgt = base_w / (depth_diff + normal_diff + 1.0)
        total_w = total_w + wgt
        acc = acc + tap_l * wgt[None]

    blurred = acc / total_w[None]
    sky = (center_n >= NORMAL_SKY)[None]
    return jnp.where(sky, lighting_chw, blurred)


def bilateral_denoise(
    lighting: jax.Array, depth: jax.Array, normal: jax.Array, size: int
) -> jax.Array:
    """One à-trous pass with dilation `size`.

    lighting (H, W, 3) f32; depth (H, W) u16 view distance*32; normal (H, W)
    u8 face id (>= 16 means sky: passthrough).
    """
    out = _denoise_planar(lighting.transpose(2, 0, 1), depth, normal, size)
    return out.transpose(1, 2, 0)


@jax.jit
def denoise_chain(lighting: jax.Array, depth: jax.Array, normal: jax.Array) -> jax.Array:
    """The full 6-pass schedule (pipeline.rs:103-115).

    Transposes to channel-planar once, runs all six passes planar, and
    transposes back (two cheap relayouts instead of six lane-starved passes).
    """
    out = lighting.transpose(2, 0, 1)
    for size in DENOISE_SIZES:
        out = _denoise_planar(out, depth, normal, size)
    return out.transpose(1, 2, 0)


def bilateral_denoise_np(lighting, depth, normal, size):
    """NumPy oracle for one pass (used by tests)."""
    import numpy as np

    h, w = lighting.shape[:2]
    pad = _MAX_REACH * size
    lp = np.pad(lighting, [(pad, pad), (pad, pad), (0, 0)], mode="edge")
    dp = np.pad(depth.astype(np.float32) / 256.0, pad, mode="edge")
    npd = np.pad(normal, pad, mode="edge")
    center_d = dp[pad : pad + h, pad : pad + w]
    center_n = npd[pad : pad + h, pad : pad + w]
    total_w = np.full((h, w), _CENTER_WEIGHT, np.float32)
    acc = lighting * _CENTER_WEIGHT
    for dx, dy, base_w in _TAPS:
        oy, ox = pad + dy * size, pad + dx * size
        tap_l = lp[oy : oy + h, ox : ox + w]
        tap_d = dp[oy : oy + h, ox : ox + w]
        tap_n = npd[oy : oy + h, ox : ox + w]
        wgt = base_w / (4.0 * np.abs(center_d - tap_d) + np.where(tap_n == center_n, 0.0, 10.0) + 1.0)
        total_w = total_w + wgt
        acc = acc + tap_l * wgt[..., None]
    blurred = acc / total_w[..., None]
    return np.where((center_n >= NORMAL_SKY)[..., None], lighting, blurred)
