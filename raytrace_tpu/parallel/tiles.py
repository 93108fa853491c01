"""Multi-chip tile-split rendering over a device mesh.

The reference is single-GPU; its only parallelism is pixel workgroups
(SURVEY §2 "parallelism strategies").  The TPU-native scale-out splits the
image into row bands over a 1-D `jax.sharding.Mesh` ("tiles" axis) under
`shard_map`:

  * the world volume and blue noise are replicated (64 MB — cheap),
  * each device path-traces its own band (embarrassingly parallel),
  * the 6-pass a-trous denoiser runs the full VMEM Pallas chain per device
    after ONE `lax.ppermute` halo exchange of 2*ROW_HALO = 256 real rows
    per neighbor (exact: the chain's total influence radius is 117 rows —
    see _denoise_band_pallas); bands too narrow for that fall back to the
    banded XLA stencil with six per-pass 3*size-row exchanges, and tiny
    test bands to an all_gather,
  * finalize runs per band; the assembled frame is flipped once globally.

Collective cost per frame (Pallas plan): 2 directions x (256 rows x width x
(3 lighting f32 + depth u16 + normal u8)), nearest-neighbor only — rides
ICI, never DCN.
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
from ..ops.denoise_pallas import STRIP_HALO as ROW_HALO
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


def _denoise_band_pallas(lighting, depth, normal, band, height, row0, axis_name):
    """The full 6-pass VMEM Pallas chain on this device's band, exact.

    One halo exchange of 2*ROW_HALO rows per neighbor replaces the six
    per-pass stencil exchanges; each device then denoises a
    (band + 2*ROW_HALO)-row region of REAL rows that contains its center
    band at least ROW_HALO = 128 rows from every region boundary that is
    not a true image edge.  The chain's total influence radius is
    sum(3 * size) = 117 < 128, so the center rows are bit-identical to the
    full-frame chain; where a region boundary IS the image edge the chain's
    per-pass edge clamp is exactly the reference semantics
    (bilateral_denoise.comp:14-21).  Same exactness-by-halo argument as the
    column strips (denoise_pallas.STRIP_HALO), turned back 90 degrees.

    Requires band >= 2*ROW_HALO (single-hop ppermute); callers guard.
    """
    from ..ops.denoise_pallas import denoise_chain_pallas

    n = jax.lax.axis_size(axis_name)
    h2 = 2 * ROW_HALO

    def ext(x):
        if n > 1:
            top = jax.lax.ppermute(
                x[-h2:], axis_name, [(j, j + 1) for j in range(n - 1)]
            )
            bot = jax.lax.ppermute(
                x[:h2], axis_name, [(j + 1, j) for j in range(n - 1)]
            )
        else:
            top, bot = x[-h2:], x[:h2]
        return jnp.concatenate([top, x, bot], axis=0)

    # ext rows cover global [row0 - 2H, row0 + band + 2H).  The worked
    # region is the (band + 2H)-row window starting at
    # g = clamp(row0 - H, 0, height - band - 2H): centered for interior
    # devices, flush against the true image edge for edge devices (so the
    # chain's own clamp lands exactly on the image border).
    g = jnp.clip(row0 - ROW_HALO, 0, height - band - h2)
    off = g - row0 + h2  # offset of the region inside ext

    def region(x):
        e = ext(x)
        return jax.lax.dynamic_slice_in_dim(e, off, band + h2, axis=0)

    den = denoise_chain_pallas(region(lighting), region(depth), region(normal))
    return jax.lax.dynamic_slice_in_dim(den, row0 - g, band, axis=0)


_RFT_STATICS = ("width", "height", "max_steps", "mesh", "tracer")
# Lazy jit instances (compiler_options initializes the backend eagerly —
# must not happen at import time; same pattern as render/pipeline.py).
_rft_jit_cache: dict = {}


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

    `world` is the fused u32 volume for tracer="volume", a
    (fused_volume, build_vol_tables dict) pair for tracer="volume_fast"
    (the brick-pyramid general-content path), or the build_hf_tables dict
    for tracer="hf"/"fused" (the Pallas hot paths; all tables are
    replicated — they are small against the 64 MB volume).

    Raises XLA's scoped-vmem limit iff the per-device denoise region is big
    enough to run the striped Pallas chain (same rule as render_frame)."""
    from ..ops.denoise_pallas import scoped_vmem_options

    n = mesh.shape[AXIS]
    band = height // max(n, 1)
    region_h = height if n == 1 else band + 2 * ROW_HALO
    runs_pallas = n == 1 or band >= 2 * ROW_HALO
    # Take the options dict straight from the denoiser (single source for
    # the scoped-vmem limit); key the jit cache on its presence.
    opts = scoped_vmem_options(region_h, width) if runs_pallas else None
    scoped = opts is not None
    if scoped not in _rft_jit_cache:
        _rft_jit_cache[scoped] = jax.jit(
            _render_frame_tiled_impl,
            static_argnames=_RFT_STATICS,
            compiler_options=opts,
        )
    return _rft_jit_cache[scoped](
        world, blue_noise, uniforms, width, height, mesh, max_steps, tracer
    )


def _render_frame_tiled_impl(
    world,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    mesh: Mesh,
    max_steps: int = MAX_TRACE_STEPS,
    tracer: str = "volume",
) -> jax.Array:
    n = mesh.shape[AXIS]
    assert height % n == 0, (height, n)
    band = height // n

    # Denoiser plan, best first:
    #  * bands wide enough for a single-hop 2*ROW_HALO exchange run the full
    #    VMEM Pallas chain per device (production 4K/8 = 270-row bands),
    #  * else bands wider than the largest per-pass reach run the banded XLA
    #    stencil with six per-pass halo exchanges,
    #  * else (tiny test images) all_gather the G-buffers.
    pallas_ok = band >= 2 * ROW_HALO and n > 1
    # A 1-device mesh's band IS the whole frame: no exchange, straight to
    # the VMEM chain (this is the one-real-chip 4K path — the XLA stencil
    # here cost config 5 roughly half its frame time in round 2).
    pallas_whole = n == 1
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
        elif tracer == "volume_fast":
            from ..ops.path_vol import render_gbuffers_path

            fused_flat, vol_tables = vol
            gb = render_gbuffers_path(
                fused_flat, vol_tables, bn, uni, width, height, max_steps,
                row0=row0, rows=band,
            )
        else:
            gb = render_gbuffers(
                vol, bn, uni, width, height, max_steps, row0=row0, rows=band
            )
        lighting = gb["lighting"]
        if pallas_whole:
            from ..ops.denoise_pallas import denoise_chain_pallas

            lighting = denoise_chain_pallas(lighting, gb["depth"], gb["normal"])
        elif pallas_ok:
            lighting = _denoise_band_pallas(
                lighting, gb["depth"], gb["normal"], band, height, row0, AXIS
            )
        elif halo_ok:
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
