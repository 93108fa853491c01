"""Chunk packing: occupancy pyramid and the "minefield" LOD acceleration grid.

Reference: src/world/chunk.rs:125-184 (`UnpackedChunkData::pack_into`).

The minefield assigns every voxel a u8 that the tracer reads as a safe step
size: 0 = solid (hit); m >= 1 = "the 2^(m-1)-aligned block containing this
voxel is entirely empty", so a ray may skip to that block's boundary.  The
reference builds this with a scalar loop over voxels walking per-chunk LOD
bitmaps; here it is a max-pool pyramid plus broadcasting — pure reshapes and
reductions that XLA fuses on TPU.

Key structural fact exploited throughout the framework: chunk origins are
64-aligned in world space, so every 2^k LOD block (k <= 6) is aligned to the
global 2^k grid.  Occupancy/minefield for ANY 64-aligned region can therefore
be computed directly, without assembling per-chunk bitmaps
(the per-chunk LODs of chunk.rs are an implementation detail, not semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CHUNK_SIZE, MAX_CHUNK_LOD


def _pool2(occ: jax.Array) -> jax.Array:
    """2x2x2 any-reduce of a (Z, Y, X) bool array."""
    z, y, x = occ.shape
    r = occ.reshape(z // 2, 2, y // 2, 2, x // 2, 2)
    return jnp.any(r, axis=(1, 3, 5))


def occupancy_pyramid(solid: jax.Array, levels: int = MAX_CHUNK_LOD) -> list[jax.Array]:
    """Occupancy at block sizes 2^1 .. 2^levels.

    ``pyramid[k-1][bz, by, bx]`` is True iff the 2^k block at that position
    contains any solid voxel (the reference's per-chunk `lods`,
    chunk.rs:126-149, generalized to any 64-aligned region).
    """
    occ = solid
    pyramid = []
    for _ in range(levels):
        occ = _pool2(occ)
        pyramid.append(occ)
    return pyramid


def _upsample(occ: jax.Array, factor: int, out_shape) -> jax.Array:
    """Nearest upsample of a (Z, Y, X) bool grid by `factor` per axis."""
    z, y, x = occ.shape
    r = jnp.broadcast_to(
        occ[:, None, :, None, :, None], (z, factor, y, factor, x, factor)
    )
    return r.reshape(out_shape)


def minefield_from_solid(solid: jax.Array) -> jax.Array:
    """Per-voxel minefield u8 from a (Z, Y, X) solidity grid.

    All dims must be multiples of CHUNK_SIZE and the region 64-aligned in
    world space.  Matches reference chunk.rs:125-184 exactly, including the
    empty-chunk fill value MAX_CHUNK_LOD (= 6).
    """
    assert all(d % CHUNK_SIZE == 0 for d in solid.shape), solid.shape
    pyramid = occupancy_pyramid(solid, MAX_CHUNK_LOD)
    # Smallest occupied level wins; descending writes achieve "first hit".
    mf = jnp.full(solid.shape, MAX_CHUNK_LOD, dtype=jnp.uint8)
    for level in range(MAX_CHUNK_LOD - 1, 0, -1):
        occ_up = _upsample(pyramid[level - 1], 1 << level, solid.shape)
        mf = jnp.where(occ_up, jnp.uint8(level), mf)
    mf = jnp.where(solid, jnp.uint8(0), mf)
    return mf


def pack_chunk(solid: jax.Array, packed_materials: jax.Array):
    """(solid, packed u32 materials) -> (materials, minefield) device arrays.

    The reference's pack_into also zeroes materials of a fully-empty chunk
    (chunk.rs:154-161); generation already stores air as 0 so no special case
    is needed.
    """
    return packed_materials, minefield_from_solid(solid)
