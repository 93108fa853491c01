"""Terrain streaming into the resident toroidal world volume.

Reference: src/render/pipeline/terrain_upload.rs (TerrainUploadManager).
The control logic — Position{origin, num_loaded_slices}, one slice request
per frame along the axis of largest camera drift, increase/decrease with
region wrap — is reproduced exactly (terrain_upload.rs:294-367).

The data plane is inverted, TPU-first: where the reference gathers from up
to 25 CPU-cached chunks into a staging buffer and issues a
copy_buffer_to_image (terrain_upload.rs:84-275), here the slice is
*generated directly on the device* (worldgen is a jitted function of world
coordinates) and written into the fused volume with a donated
`lax.dynamic_update_slice` — zero host work, zero host->device traffic.
A cache-backed host path (`source="cache"`) exists for parity with the
reference's disk-cache streaming and for pre-generated worlds.

Addressing invariant (proved from render_data.rs:203-249 +
terrain_upload.rs:207-233): world voxel w lives at texel (w + 128) mod 256,
and because region origins only ever change by +/-4 chunks, the texel
offset of a slice is always num_slices*16 on every axis.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    CHUNK_SIZE,
    ROOT_BLOCK_SIZE,
    ROOT_CHUNK_SIZE,
    SLICE_SIZE,
    SLICES_PER_ROOT,
)
from ..world.generate import generate_box
from .. import native
from ..ops.trace_jax import fuse_volume

AXIS_X, AXIS_Y, AXIS_Z = 0, 1, 2
_HALF_CHUNKS = ROOT_CHUNK_SIZE // 2


@dataclasses.dataclass
class Position:
    """Region origin (chunks) + loaded-slice counts (terrain_upload.rs:22-47)."""

    origin: tuple[int, int, int] = (-_HALF_CHUNKS, -_HALF_CHUNKS, -_HALF_CHUNKS)
    num_loaded_slices: tuple[int, int, int] = (0, 0, 0)

    def render_offset(self) -> tuple[int, int, int]:
        return tuple(
            (o + _HALF_CHUNKS) * CHUNK_SIZE + n * SLICE_SIZE
            for o, n in zip(self.origin, self.num_loaded_slices)
        )


@dataclasses.dataclass
class SliceRequest:
    origin: tuple[int, int, int]  # region origin in chunks to load from
    num_slices: tuple[int, int, int]
    axis: int
    new_position: Position


def _slab_world_box(req: SliceRequest):
    """World-space box (origin xyz, shape xyz) covered by a slice request."""
    w0 = tuple(
        o * CHUNK_SIZE + n * SLICE_SIZE for o, n in zip(req.origin, req.num_slices)
    )
    shape = [ROOT_BLOCK_SIZE] * 3
    shape[req.axis] = SLICE_SIZE
    return w0, tuple(shape)


@functools.partial(jax.jit, static_argnames=("axis", "shape_xyz", "seed"), donate_argnums=0)
def _generate_and_apply(volume, w0, ns, axis: int, shape_xyz, seed: int):
    """Generate a world slab on device and write it at its toroidal offset.

    The slab's world box is not 64-aligned, so terrain is generated for the
    64-aligned enclosure (minefield LOD blocks are globally 64-aligned, see
    world/chunk.py), sliced, rolled into texel space, and stored.
    """
    w0 = [jnp.asarray(v, jnp.int32) for v in w0]
    aligned0 = [v - jnp.remainder(v, CHUNK_SIZE) for v in w0]
    # Slab origins are SLICE_SIZE-aligned, so the intra-chunk offset is at
    # most CHUNK_SIZE - SLICE_SIZE = 48; the static 64-aligned enclosure is
    # ceil64(shape + 48).
    enclosure = tuple(
        -(-(s + CHUNK_SIZE - SLICE_SIZE) // CHUNK_SIZE) * CHUNK_SIZE for s in shape_xyz
    )
    box = generate_box(tuple(aligned0), enclosure, seed=seed, with_minefield=True)
    fused = (
        box["materials"].astype(jnp.uint32)
        | (box["minefield"].astype(jnp.uint32) << jnp.uint32(24))
    )
    # Slice the exact world box out of the enclosure (note zyx array order).
    start = [w0[2] - aligned0[2], w0[1] - aligned0[1], w0[0] - aligned0[0]]
    sizes = (shape_xyz[2], shape_xyz[1], shape_xyz[0])
    slab = jax.lax.dynamic_slice(fused, start, sizes)

    # Texel offset is ns*16 on every axis; off-axis extents are full 256 and
    # wrap toroidally -> roll into texel space, then one aligned store.
    return _store_slab(volume, slab, ns, axis)


@functools.partial(jax.jit, static_argnames=("seed",))
def _generate_region(origin_chunks, ns, seed: int):
    """Generate a full 256^3 region at slice-granular world offset.

    World start w0 = origin*64 + ns*16 is not chunk-aligned when ns != 0,
    so terrain comes from the 64-aligned 320^3 enclosure, sliced, then
    rolled into texel space ((w + 128) mod 256 addressing).
    """
    w0 = origin_chunks * CHUNK_SIZE + ns * SLICE_SIZE
    aligned0 = w0 - jnp.remainder(w0, CHUNK_SIZE)
    enc = ROOT_BLOCK_SIZE + CHUNK_SIZE
    box = generate_box(
        (aligned0[0], aligned0[1], aligned0[2]), (enc, enc, enc), seed=seed
    )
    fused = (
        box["materials"].astype(jnp.uint32)
        | (box["minefield"].astype(jnp.uint32) << jnp.uint32(24))
    )
    start = w0 - aligned0
    slab = jax.lax.dynamic_slice(
        fused, (start[2], start[1], start[0]), (ROOT_BLOCK_SIZE,) * 3
    )
    t = ns * SLICE_SIZE
    slab = jnp.roll(slab, (t[2], t[1], t[0]), (0, 1, 2))
    return slab.reshape(-1)


class TerrainStreamer:
    """Owns the resident fused world volume and streams slices into it."""

    def __init__(self, seed: int = 0, source: str = "device", storage=None):
        assert source in ("device", "cache")
        self.seed = seed
        self.source = source
        self.storage = storage
        self.cpu_position = Position()
        self.gpu_position = Position()
        self.request_queue: list[SliceRequest] = []
        self.volume = None  # fused u32 (256^3,) device array
        # Slab write log for incremental derived-table updates
        # ((arr_axis, texel_start) per applied slice); None = the whole
        # volume changed (initialize/teleport) and consumers must rebuild.
        self._slab_log: list[tuple[int, int]] | None = None

    # -- initialization (render_data.rs:203-301) --
    def initialize(self, volume=None) -> jax.Array:
        """Build/load the initial 4^3-chunk region.  A preassembled fused
        volume may be supplied (tests, checkpoints)."""
        if volume is not None:
            # Private copy: streaming updates DONATE self.volume, which
            # would invalidate the caller's array (and any other pipeline
            # initialized from the same buffer) if we aliased it.
            self.volume = jnp.array(
                jnp.asarray(volume).reshape(-1), copy=True
            )
            return self.volume
        origin_vox = tuple(c * CHUNK_SIZE for c in self.cpu_position.origin)
        if self.source == "device":
            box = generate_box(
                origin_vox, (ROOT_BLOCK_SIZE,) * 3, seed=self.seed, with_minefield=True
            )
            self.volume = fuse_volume(box["materials"], box["minefield"])
        else:
            mats = np.zeros((ROOT_BLOCK_SIZE,) * 3, np.uint32)
            mf = np.zeros((ROOT_BLOCK_SIZE,) * 3, np.uint8)
            for cz in range(ROOT_CHUNK_SIZE):
                for cy in range(ROOT_CHUNK_SIZE):
                    for cx in range(ROOT_CHUNK_SIZE):
                        coord = tuple(
                            o + d for o, d in zip(self.cpu_position.origin, (cx, cy, cz))
                        )
                        m, f = self.storage.borrow_packed_chunk_data(coord)
                        dst = (cx * CHUNK_SIZE, cy * CHUNK_SIZE, cz * CHUNK_SIZE)
                        native.copy3d(m, mats, (CHUNK_SIZE,) * 3, dst_start=dst)
                        native.copy3d(f, mf, (CHUNK_SIZE,) * 3, dst_start=dst)
            self.volume = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
        self.volume = jax.device_put(self.volume)
        return self.volume

    def teleport(self, center) -> None:
        """Recenter the loaded region on an arbitrary world position.

        The reference has no equivalent (its dataset sweep relaunches the
        whole process per camera position, capture_training_data.py:9);
        here the region is regenerated around the target in one device
        call.  The center quantizes to the slice grid (16 voxels); region
        origins keep the o = -2 (mod 4) chunk invariant the toroidal
        addressing depends on, with the remainder carried in
        num_loaded_slices exactly as streaming would have left it.
        """
        assert self.source == "device", "teleport requires device worldgen"
        origin, ns = [], []
        for c in center:
            total16 = int(round(float(c) / SLICE_SIZE))
            k, n = divmod(total16, SLICES_PER_ROOT)
            origin.append(-_HALF_CHUNKS + (ROOT_BLOCK_SIZE // CHUNK_SIZE) * k)
            ns.append(n)
        pos = Position(tuple(origin), tuple(ns))
        self.cpu_position = pos
        self.gpu_position = pos
        self.request_queue.clear()
        self._slab_log = None  # whole volume replaced: tables must rebuild
        self.volume = _generate_region(
            jnp.asarray(pos.origin, jnp.int32), jnp.asarray(ns, jnp.int32), self.seed
        )

    def edit_box(self, world_min, shape, material_id=None) -> None:
        """Write an axis-aligned world-space box into the resident volume
        (solid ``material_id`` or carved air when None) with exact
        solidity and repaired minefield — see world/edit.py for the
        semantics and limits.  Derived tables rebuild on next use (the
        slab log is invalidated, same as teleport)."""
        from ..world.edit import edit_fused_volume

        self.volume = edit_fused_volume(
            self.volume,
            self.gpu_position.render_offset(),
            world_min,
            shape,
            material_id,
        )
        self._slab_log = None  # consumers must fully rebuild tables

    # -- request generation (terrain_upload.rs:294-349) --
    def request_increase(self, axis: int) -> None:
        old = Position(self.cpu_position.origin, self.cpu_position.num_loaded_slices)
        ns = list(self.cpu_position.num_loaded_slices)
        org = list(self.cpu_position.origin)
        ns[axis] += 1
        if ns[axis] == SLICES_PER_ROOT:
            ns[axis] = 0
            org[axis] += ROOT_BLOCK_SIZE // CHUNK_SIZE
        self.cpu_position = Position(tuple(org), tuple(ns))
        load_origin = list(old.origin)
        load_origin[axis] += ROOT_CHUNK_SIZE
        self.request_queue.append(
            SliceRequest(
                tuple(load_origin), old.num_loaded_slices, axis, self.cpu_position
            )
        )

    def request_decrease(self, axis: int) -> None:
        ns = list(self.cpu_position.num_loaded_slices)
        org = list(self.cpu_position.origin)
        if ns[axis] == 0:
            ns[axis] = SLICES_PER_ROOT
            org[axis] -= ROOT_BLOCK_SIZE // CHUNK_SIZE
        ns[axis] -= 1
        self.cpu_position = Position(tuple(org), tuple(ns))
        self.request_queue.append(
            SliceRequest(
                self.cpu_position.origin,
                self.cpu_position.num_loaded_slices,
                axis,
                self.cpu_position,
            )
        )

    def request_move_towards(self, desired_center) -> None:
        """Queue at most one slice move toward the target (x-then-y-then-z
        priority, terrain_upload.rs:351-367)."""
        current = self.cpu_position.render_offset()
        delta = [int(d) - c for d, c in zip(desired_center, current)]
        for axis in (AXIS_X, AXIS_Y, AXIS_Z):
            if delta[axis] > SLICE_SIZE:
                self.request_increase(axis)
                return
            if -delta[axis] > SLICE_SIZE:
                self.request_decrease(axis)
                return

    # -- request consumption (terrain_upload.rs:84-288) --
    def setup_next_request(self) -> bool:
        """Apply one queued slice to the device volume; True if one ran."""
        if not self.request_queue:
            return False
        req = self.request_queue.pop(0)
        w0, shape = _slab_world_box(req)
        if self.source == "device":
            self.volume = _generate_and_apply(
                self.volume,
                tuple(jnp.int32(v) for v in w0),
                req.num_slices,
                req.axis,
                shape,
                self.seed,
            )
        else:
            self.volume = self._apply_from_cache(req, w0, shape)
        if self._slab_log is not None:
            # Array axis 2-axis: the volume is (z, y, x); texel start
            # matches _store_slab's dynamic_update_slice offset.
            self._slab_log.append(
                (2 - req.axis, req.num_slices[req.axis] * SLICE_SIZE)
            )
            if len(self._slab_log) > 64:
                # Consumer isn't draining (hf/fused tracers never do) or
                # fell far behind: stop accumulating; a later drain just
                # triggers one full rebuild.
                self._slab_log = None
        self.gpu_position = req.new_position
        return True

    def drain_slab_log(self):
        """Consume the slab log: a list of (arr_axis, texel_start) writes
        since the last drain, or None when the whole volume was replaced
        (consumers must fully rebuild derived tables).  Draining arms the
        log either way."""
        log = self._slab_log
        self._slab_log = []
        return log

    def _apply_from_cache(self, req: SliceRequest, w0, shape):
        """Host path: assemble the slab from cached chunks (native copy3d),
        then apply on device (parity with terrain_upload.rs:84-204)."""
        mats = np.zeros((shape[2], shape[1], shape[0]), np.uint32)
        mf = np.zeros((shape[2], shape[1], shape[0]), np.uint8)
        c0 = [v // CHUNK_SIZE for v in w0]
        c1 = [-(-(v + s) // CHUNK_SIZE) for v, s in zip(w0, shape)]
        for cz in range(c0[2], c1[2]):
            for cy in range(c0[1], c1[1]):
                for cx in range(c0[0], c1[0]):
                    m, f = self.storage.borrow_packed_chunk_data((cx, cy, cz))
                    dst = (
                        cx * CHUNK_SIZE - w0[0],
                        cy * CHUNK_SIZE - w0[1],
                        cz * CHUNK_SIZE - w0[2],
                    )
                    native.copy3d(m, mats, (CHUNK_SIZE,) * 3, dst_start=dst)
                    native.copy3d(f, mf, (CHUNK_SIZE,) * 3, dst_start=dst)
        slab = fuse_volume(jnp.asarray(mats), jnp.asarray(mf)).reshape(
            shape[2], shape[1], shape[0]
        )
        return _apply_slab(self.volume, slab, req.num_slices, req.axis)

    def get_render_offset(self) -> tuple[int, int, int]:
        return self.gpu_position.render_offset()


def _store_slab(volume, slab, ns, axis: int):
    """Roll a world-ordered slab into texel space and store it (traced)."""
    vol3 = volume.reshape(ROOT_BLOCK_SIZE, ROOT_BLOCK_SIZE, ROOT_BLOCK_SIZE)
    ns = jnp.asarray(ns, jnp.int32)
    t = ns * SLICE_SIZE
    shifts, axes = [], []
    for arr_axis, xyz_axis in ((0, 2), (1, 1), (2, 0)):
        if xyz_axis != axis:
            shifts.append(t[xyz_axis])
            axes.append(arr_axis)
    slab = jnp.roll(slab, shifts, axes)
    start3 = [jnp.int32(0)] * 3
    start3[2 - axis] = t[axis]
    vol3 = jax.lax.dynamic_update_slice(vol3, slab, start3)
    return vol3.reshape(-1)


@functools.partial(jax.jit, static_argnames=("axis",), donate_argnums=0)
def _apply_slab(volume, slab, ns, axis: int):
    """Write a pre-assembled fused slab at its toroidal position."""
    return _store_slab(volume, slab, ns, axis)
