"""Runtime world editing: write material boxes into the resident volume.

The fast general tracer exists to render ARBITRARY volume content (its
module docstring cites user edits as a headline case), and the reference's
fused volume is equally writable in principle — but neither exposed an
editing surface.  This module does: axis-aligned world-space boxes are
written straight into the resident toroidal fused volume
(render/streaming.py owns it), with the per-voxel LOD "minefield"
repaired so BOTH tracers stay exact:

  * the brick-pyramid tracer (ops/trace_vol_pallas.py) reads only
    solidity (step == 0), which the edit sets exactly;
  * the reference-semantics DDA (ops/trace_jax.py, raytrace.comp:82-183)
    skips by minefield step, whose claims ("this 2^k block is all air",
    chunk.rs:125-184) an edit can break.  Minefield is recomputed EXACTLY
    per affected 64-aligned world chunk via the same minefield_from_solid
    used at generation; a chunk only partially resident in the active
    window falls back to clamping its resident air voxels to step 1 —
    smaller-than-optimal steps are always correct, merely slower, and the
    non-resident rest of the chunk cannot be read without aliasing the
    toroidal wrap.

Semantics and limits (documented, not hidden):

  * Edits apply to the RESIDENT volume only; the box must lie inside the
    active window [lr - 128, lr + 128) or ValueError is raised (texels
    outside it alias other world regions).
  * Terrain streaming regenerates content from worldgen as the window
    moves: a region that streams out and back loses its edits (the
    reference's world is procedurally owned; edits are session overlays,
    not persistent world state).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import CHUNK_SIZE, ROOT_BLOCK_SIZE
from ..materials import PACKED_MATERIALS
from ..ops.trace_jax import MATERIAL_MASK, STEP_SHIFT, fuse_volume
from .chunk import minefield_from_solid

_N = ROOT_BLOCK_SIZE  # 256
_HALF = _N // 2


def _texel_ix(w0: int, n: int) -> np.ndarray:
    """Texel indices of world coords [w0, w0+n) (toroidal, absolute)."""
    return (np.arange(w0, w0 + n) + _HALF) % _N


def edit_fused_volume(
    fused_flat,
    window_offset,
    world_min,
    shape,
    material_id: int | None,
):
    """Write an axis-aligned box into the fused volume; returns the new
    fused (N^3,) array.

    world_min/shape: (x, y, z) world-voxel min corner and extents.
    material_id: row index into the material table (solid box), or None
    to carve air.  window_offset: the streamer's render offset (the
    center of the resident window).
    """
    world_min = tuple(int(v) for v in world_min)
    shape = tuple(int(v) for v in shape)
    if min(shape) <= 0:
        raise ValueError(f"empty edit box: shape={shape}")
    for a in range(3):
        lo, hi = window_offset[a] - _HALF, window_offset[a] + _HALF
        if world_min[a] < lo or world_min[a] + shape[a] > hi:
            raise ValueError(
                f"edit box axis {a} [{world_min[a]}, {world_min[a] + shape[a]})"
                f" outside the resident window [{lo}, {hi})"
            )
    if material_id is not None and not 0 <= material_id < len(PACKED_MATERIALS):
        raise ValueError(f"unknown material id {material_id}")

    vol3 = fused_flat.reshape(_N, _N, _N)  # (z, y, x) texels

    # 1. The box itself: exact material word + exact solidity (step 0 for
    # solid, step 1 — the no-claim single-voxel step — for carved air).
    if material_id is None:
        word = jnp.uint32(0) | (jnp.uint32(1) << STEP_SHIFT)
    else:
        word = jnp.uint32(int(PACKED_MATERIALS[material_id]))
    ix = np.ix_(
        _texel_ix(world_min[2], shape[2]),  # z
        _texel_ix(world_min[1], shape[1]),  # y
        _texel_ix(world_min[0], shape[0]),  # x
    )
    vol3 = vol3.at[ix].set(word)

    # 2. Repair the minefield per affected 64-aligned world chunk.
    def chunk_range(a):
        c0 = (world_min[a] // CHUNK_SIZE) * CHUNK_SIZE
        c1 = ((world_min[a] + shape[a] - 1) // CHUNK_SIZE) * CHUNK_SIZE
        return range(c0, c1 + 1, CHUNK_SIZE)

    for cz in chunk_range(2):
        for cy in chunk_range(1):
            for cx in chunk_range(0):
                resident = all(
                    c >= window_offset[a] - _HALF
                    and c + CHUNK_SIZE <= window_offset[a] + _HALF
                    for a, c in enumerate((cx, cy, cz))
                )
                cix = np.ix_(
                    _texel_ix(cz, CHUNK_SIZE),
                    _texel_ix(cy, CHUNK_SIZE),
                    _texel_ix(cx, CHUNK_SIZE),
                )
                sub = vol3[cix]
                step = (sub >> STEP_SHIFT).astype(jnp.int32)
                if resident:
                    # Exact: same function generation uses (chunk.rs
                    # parity), from the chunk's post-edit solidity.
                    mats = sub & jnp.uint32(MATERIAL_MASK)
                    mf = minefield_from_solid(step == 0)
                    new = fuse_volume(mats, mf).reshape(sub.shape)
                else:
                    # Chunk straddles the window edge: its full solidity is
                    # not resident, so exact recompute is impossible.
                    # Clamp resident air voxels to step 1 (no emptiness
                    # claim) — conservative steps are always correct.
                    clamped = jnp.minimum(step, 1).astype(jnp.uint32)
                    new = (sub & jnp.uint32(MATERIAL_MASK)) | (
                        clamped << STEP_SHIFT
                    )
                vol3 = vol3.at[cix].set(new)

    return vol3.reshape(-1)
