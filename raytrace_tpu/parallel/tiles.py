"""Multi-chip tile-split rendering over a device mesh.

The reference is single-GPU; its only parallelism is pixel workgroups
(SURVEY §2 "parallelism strategies").  The TPU-native scale-out splits the
image into row bands over a 1-D `jax.sharding.Mesh` ("tiles" axis) under
`shard_map`:

  * the world volume and blue noise are replicated (64 MB — cheap),
  * each device path-traces its own band (embarrassingly parallel),
  * the 6-pass a-trous denoiser exchanges 3*size-row halos with band
    neighbors per pass via `lax.ppermute` over ICI — the exact sharded
    equivalent of the single-device stencil (no approximation at seams),
  * finalize runs per band; the assembled frame is flipped once globally.

Collective cost per frame: 6 passes x 2 directions x (3*size rows x width x
4 buffers), nearest-neighbor only — rides ICI, never DCN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import DENOISE_SIZES, MAX_TRACE_STEPS, NORMAL_SKY
from ..ops.denoise import _CENTER_WEIGHT, _TAPS
from ..ops.finalize import finalize_frame
from ..ops.trace_jax import render_gbuffers

AXIS = "tiles"


def make_tile_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (AXIS,))


def _exchange_halo(x: jax.Array, pad: int, axis_name: str) -> jax.Array:
    """Pad a band along rows with `pad` rows from each mesh neighbor.

    Edge devices clamp-replicate their own border rows, matching the
    single-device sampleAt clamp (bilateral_denoise.comp:14-21).
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    top_own = x[:pad]
    bot_own = x[-pad:]
    if n > 1:
        # My bottom rows become the lower neighbor's top halo and vice versa.
        from_above = jax.lax.ppermute(bot_own, axis_name, [(j, j + 1) for j in range(n - 1)])
        from_below = jax.lax.ppermute(top_own, axis_name, [(j + 1, j) for j in range(n - 1)])
    else:
        from_above = bot_own
        from_below = top_own
    # Clamp at the image border: replicate own edge row.
    edge_top = jnp.broadcast_to(x[0:1], top_own.shape)
    edge_bot = jnp.broadcast_to(x[-1:], bot_own.shape)
    top = jnp.where(i == 0, edge_top, from_above)
    bot = jnp.where(i == n - 1, edge_bot, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def _denoise_pass_banded(lighting, depth, normal, size: int, axis_name: str):
    """One a-trous pass on a row band with halo exchange (exact stencil)."""
    pad = 3 * size
    lp = _exchange_halo(lighting, pad, axis_name)
    dp = _exchange_halo(depth.astype(jnp.float32) / 256.0, pad, axis_name)
    np_ = _exchange_halo(normal, pad, axis_name)

    # x-axis clamp padding stays local.
    lp = jnp.pad(lp, [(0, 0), (pad, pad), (0, 0)], mode="edge")
    dp = jnp.pad(dp, [(0, 0), (pad, pad)], mode="edge")
    np_ = jnp.pad(np_, [(0, 0), (pad, pad)], mode="edge")

    h, w = lighting.shape[:2]
    center_d = dp[pad : pad + h, pad : pad + w]
    center_n = np_[pad : pad + h, pad : pad + w]
    total_w = jnp.full((h, w), _CENTER_WEIGHT, jnp.float32)
    acc = lighting * _CENTER_WEIGHT
    for dx, dy, base_w in _TAPS:
        oy, ox = pad + dy * size, pad + dx * size
        tap_l = lp[oy : oy + h, ox : ox + w]
        tap_d = dp[oy : oy + h, ox : ox + w]
        tap_n = np_[oy : oy + h, ox : ox + w]
        wgt = base_w / (4.0 * jnp.abs(center_d - tap_d) + jnp.where(tap_n == center_n, 0.0, 10.0) + 1.0)
        total_w = total_w + wgt
        acc = acc + tap_l * wgt[..., None]
    blurred = acc / total_w[..., None]
    return jnp.where((center_n >= NORMAL_SKY)[..., None], lighting, blurred)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "max_steps", "mesh", "tracer")
)
def render_frame_tiled(
    world,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    mesh: Mesh,
    max_steps: int = MAX_TRACE_STEPS,
    tracer: str = "volume",
) -> jax.Array:
    """Full frame over a 1-D device mesh; returns (H, W, 3) float32.

    `world` is the fused u32 volume for tracer="volume" or the
    build_hf_tables dict for tracer="hf"/"fused" (the Pallas hot paths;
    tables are replicated — they are ~10 KB)."""
    n = mesh.shape[AXIS]
    assert height % n == 0, (height, n)
    band = height // n

    # The neighbor halo exchange sends 3*size rows per pass; bands narrower
    # than the largest reach fall back to an all_gather of the G-buffers
    # (only relevant for tiny test images — production bands are >= 48 rows).
    halo_ok = band >= 3 * max(DENOISE_SIZES)

    def shard_fn(vol, bn, uni):
        i = jax.lax.axis_index(AXIS)
        row0 = i * band
        if tracer == "fused":
            from ..ops.lighting_pallas import render_gbuffers_fused

            gb = render_gbuffers_fused(
                vol, bn, uni, width, height, max_steps,
                row0=row0, rows=band,
            )
        elif tracer == "hf":
            from ..ops.trace_pallas import render_gbuffers_hf

            gb = render_gbuffers_hf(
                vol, bn, uni, width, height, max_steps,
                row0=row0, rows=band,
            )
        else:
            gb = render_gbuffers(
                vol, bn, uni, width, height, max_steps, row0=row0, rows=band
            )
        lighting = gb["lighting"]
        if halo_ok:
            for size in DENOISE_SIZES:
                lighting = _denoise_pass_banded(
                    lighting, gb["depth"], gb["normal"], size, AXIS
                )
        else:
            from ..ops.denoise import denoise_chain

            full_l = jax.lax.all_gather(lighting, AXIS, tiled=True)
            full_d = jax.lax.all_gather(gb["depth"], AXIS, tiled=True)
            full_n = jax.lax.all_gather(gb["normal"], AXIS, tiled=True)
            lighting = jax.lax.dynamic_slice_in_dim(
                denoise_chain(full_l, full_d, full_n), i * band, band, 0
            )
        frame_band = finalize_frame(
            gb["albedo"], gb["emission"], gb["fog"], lighting, gb["depth"], bn,
            row0=row0, flip=False,
        )
        return frame_band

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    frame = fn(world, blue_noise, uniforms)
    return frame[::-1]
