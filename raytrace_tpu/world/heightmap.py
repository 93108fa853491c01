"""Terrain heightmap generation (on device).

Reference: src/world/generate.rs:11-29 (`height`, `generate_heightmap`) and
src/world/heightmap.rs (a 64x64 per-chunk-column height grid).

Height formula: ``floor(mountain_noise2(x/600, y/600) * 600 * 0.2 + 10)``
(reference generate.rs:11-15; the truncating `as isize` cast equals floor
here because the value is non-negative, and NaN casts to 0 which
mountain_noise2 already folds to 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import (
    CHUNK_SIZE,
    WORLDGEN_HEIGHT_MUL,
    WORLDGEN_HEIGHT_OFFSET,
    WORLDGEN_SCALE,
)
from .noise import mountain_noise2


def height_at(x: jax.Array, y: jax.Array, seed=0) -> jax.Array:
    """World terrain height for integer world columns (x, y) -> int32."""
    fx = jnp.asarray(x, jnp.float32) / WORLDGEN_SCALE
    fy = jnp.asarray(y, jnp.float32) / WORLDGEN_SCALE
    n = mountain_noise2(fx, fy, seed)
    h = n * (WORLDGEN_SCALE * WORLDGEN_HEIGHT_MUL) + WORLDGEN_HEIGHT_OFFSET
    return jnp.floor(h).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("shape", "seed"))
def heightmap_grid(origin_x, origin_y, shape=(CHUNK_SIZE, CHUNK_SIZE), seed=0):
    """Heights over an integer grid; returns (Y, X) int32.

    ``heights[y, x]`` is the terrain height of world column
    ``(origin_x + x, origin_y + y)`` — same indexing as the reference's
    row-major Heightmap (src/world/heightmap.rs:4-17).
    """
    ny, nx = shape
    gx = origin_x + jnp.arange(nx, dtype=jnp.int32)[None, :]
    gy = origin_y + jnp.arange(ny, dtype=jnp.int32)[:, None]
    gx = jnp.broadcast_to(gx, (ny, nx))
    gy = jnp.broadcast_to(gy, (ny, nx))
    return height_at(gx, gy, seed)


def generate_heightmap(chunk_coord_xy, seed=0) -> jax.Array:
    """Per-chunk 64x64 heightmap (reference generate.rs:17-29)."""
    cx, cy = chunk_coord_xy
    return heightmap_grid(
        jnp.int32(cx) * CHUNK_SIZE, jnp.int32(cy) * CHUNK_SIZE, seed=seed
    )
