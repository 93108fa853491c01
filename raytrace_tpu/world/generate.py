"""On-device terrain generation.

Reference: src/world/generate.rs (heightmap -> voxel fill -> material bands).

TPU-first design: generation is a *pure elementwise function of world
coordinates*, jitted and evaluated for whole boxes at once on the device.
The reference generates chunk-by-chunk on the host and uploads; here a
256x256x16 streaming slice (or the whole 256^3 start volume) is produced
directly in HBM with zero host work and zero host->device traffic.

Semantics note (proved equivalent to the reference's chunk-based water fill,
generate.rs:63-64): "fill the whole chunk with material 2 if chunk_top < 12"
holds exactly for chunks whose top is <= 0, i.e. for voxels with world
z < 0.  Therefore: solid(x,y,z) = (z < height(x,y)) | (z < 0), and the
material band function (generate.rs:31-51) already yields material 2 for all
z < 20, matching the filled value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import BAND_HIGH, BAND_LOW, BAND_MID, CHUNK_SIZE
from ..materials import PACKED_MATERIALS
from .chunk import minefield_from_solid
from .heightmap import heightmap_grid
from .noise import hash3_u32

_PACKED_GRASS = int(PACKED_MATERIALS[2])  # green grass
_PACKED_ROCK = int(PACKED_MATERIALS[5])  # red rock
_PACKED_SNOW = int(PACKED_MATERIALS[6])  # snow white


def material_band(z: jax.Array, rand_bits: jax.Array) -> jax.Array:
    """Height-banded stochastic material id (reference generate.rs:31-51).

    z < 20: grass.  20..80: dither grass->rock with threshold (z-20)/60.
    80..160: dither rock->snow with threshold (z-80)/80.  >= 160: snow.
    The reference draws from a sequential ThreadRng; we use a counter-based
    per-voxel hash for determinism (same distribution).
    """
    r60 = (rand_bits % jnp.uint32(BAND_MID - BAND_LOW)).astype(jnp.int32)
    r80 = (rand_bits % jnp.uint32(BAND_HIGH - BAND_MID)).astype(jnp.int32)
    mid = jnp.where(r60 < z - BAND_LOW, jnp.int32(5), jnp.int32(2))
    high = jnp.where(r80 < z - BAND_MID, jnp.int32(6), jnp.int32(5))
    m = jnp.where(
        z < BAND_LOW,
        jnp.int32(2),
        jnp.where(z < BAND_MID, mid, jnp.where(z < BAND_HIGH, high, jnp.int32(6))),
    )
    return m


def _packed_for_band(m: jax.Array) -> jax.Array:
    """Material id {2,5,6} -> packed u32, as selects (no gather needed)."""
    return jnp.where(
        m == 2,
        jnp.uint32(_PACKED_GRASS),
        jnp.where(m == 5, jnp.uint32(_PACKED_ROCK), jnp.uint32(_PACKED_SNOW)),
    ).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("shape", "seed", "with_minefield"))
def generate_box(origin, shape, seed: int = 0, with_minefield: bool = True):
    """Generate terrain for a world-space box.

    Args:
      origin: (x0, y0, z0) int32 world voxel origin (traced ok).
      shape: static (X, Y, Z) extents.  For minefield output, the box must be
        64-aligned with 64-multiple extents.
      seed: world seed.
      with_minefield: also compute the LOD minefield.

    Returns:
      dict with 'materials' u32 (Z, Y, X), 'solid' bool, and optionally
      'minefield' u8.
    """
    nx, ny, nz = shape
    x0 = jnp.asarray(origin[0], jnp.int32)
    y0 = jnp.asarray(origin[1], jnp.int32)
    z0 = jnp.asarray(origin[2], jnp.int32)

    heights = heightmap_grid(x0, y0, (ny, nx), seed=seed)  # (Y, X)
    wz = z0 + jnp.arange(nz, dtype=jnp.int32)[:, None, None]  # (Z,1,1)
    wx = x0 + jnp.arange(nx, dtype=jnp.int32)[None, None, :]
    wy = y0 + jnp.arange(ny, dtype=jnp.int32)[None, :, None]

    solid = (wz < heights[None, :, :]) | (wz < 0)

    rand_bits = hash3_u32(
        jnp.broadcast_to(wx, (nz, ny, nx)),
        jnp.broadcast_to(wy, (nz, ny, nx)),
        jnp.broadcast_to(wz, (nz, ny, nx)),
        seed + 1,
    )
    band = material_band(jnp.broadcast_to(wz, (nz, ny, nx)), rand_bits)
    materials = jnp.where(solid, _packed_for_band(band), jnp.uint32(0))

    out = {"materials": materials, "solid": solid}
    if with_minefield:
        out["minefield"] = minefield_from_solid(solid)
    return out


def generate_chunk(chunk_coord, seed: int = 0):
    """Generate one 64^3 chunk; returns (materials u32, minefield u8).

    Equivalent of the reference stack generate_heightmap -> generate_chunk ->
    pack_into (generate.rs:17-85, chunk.rs:125-184) as one fused device call.
    """
    cx, cy, cz = chunk_coord
    origin = (
        jnp.int32(cx) * CHUNK_SIZE,
        jnp.int32(cy) * CHUNK_SIZE,
        jnp.int32(cz) * CHUNK_SIZE,
    )
    box = generate_box(origin, (CHUNK_SIZE, CHUNK_SIZE, CHUNK_SIZE), seed=seed)
    return box["materials"], box["minefield"]
