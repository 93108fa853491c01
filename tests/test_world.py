"""Worldgen, LOD minefield, and chunk cache tests (reference src/world/*)."""

import numpy as np
import pytest

from raytrace_tpu.constants import CHUNK_SIZE, MAX_CHUNK_LOD
from raytrace_tpu.materials import PACKED_MATERIALS
from raytrace_tpu.world.chunk import minefield_from_solid, occupancy_pyramid
from raytrace_tpu.world.generate import generate_box, generate_chunk
from raytrace_tpu.world.heightmap import heightmap_grid


def _minefield_oracle(solid):
    """Scalar transcription of reference chunk.rs:125-184 pack_into."""
    Z, Y, X = solid.shape
    mf = np.full(solid.shape, MAX_CHUNK_LOD, np.uint8)
    occ = {}
    s = solid
    for level in range(1, MAX_CHUNK_LOD + 1):
        z, y, x = s.shape
        s = s.reshape(z // 2, 2, y // 2, 2, x // 2, 2).any((1, 3, 5))
        occ[level] = s
    for z in range(Z):
        for y in range(Y):
            for x in range(X):
                if solid[z, y, x]:
                    mf[z, y, x] = 0
                    continue
                for level in range(1, MAX_CHUNK_LOD + 1):
                    if occ[level][z >> level, y >> level, x >> level]:
                        mf[z, y, x] = level
                        break
    return mf


def test_minefield_matches_scalar_oracle_random():
    rng = np.random.default_rng(3)
    solid = rng.random((64, 64, 64)) < 0.02
    got = np.asarray(minefield_from_solid(solid))
    np.testing.assert_array_equal(got, _minefield_oracle(solid))


def test_minefield_empty_and_full():
    empty = np.zeros((64, 64, 64), bool)
    assert (np.asarray(minefield_from_solid(empty)) == MAX_CHUNK_LOD).all()
    full = np.ones((64, 64, 64), bool)
    assert (np.asarray(minefield_from_solid(full)) == 0).all()


def test_minefield_multi_chunk_region_equals_per_chunk(small_world):
    # LOD blocks are 64-aligned globally: region-level packing must equal
    # chunk-by-chunk packing.
    solid = small_world["solid"]
    region_mf = small_world["minefield"]
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                sl = np.s_[
                    cz * 64 : (cz + 1) * 64,
                    cy * 64 : (cy + 1) * 64,
                    cx * 64 : (cx + 1) * 64,
                ]
                got = np.asarray(minefield_from_solid(solid[sl]))
                np.testing.assert_array_equal(region_mf[sl], got)


def test_minefield_step_safety_invariant(small_world):
    """A voxel with minefield m>=1 implies its 2^(m-1)-aligned block is empty."""
    solid = small_world["solid"]
    mf = small_world["minefield"]
    rng = np.random.default_rng(0)
    zs, ys, xs = np.nonzero(mf >= 1)
    pick = rng.choice(len(zs), size=min(500, len(zs)), replace=False)
    for i in pick:
        z, y, x = int(zs[i]), int(ys[i]), int(xs[i])
        m = int(mf[z, y, x]) - 1
        b = 1 << m
        z0, y0, x0 = (z >> m) << m, (y >> m) << m, (x >> m) << m
        assert not solid[z0 : z0 + b, y0 : y0 + b, x0 : x0 + b].any()


def test_generate_chunk_deterministic():
    m1, f1 = generate_chunk((1, -2, 0), seed=5)
    m2, f2 = generate_chunk((1, -2, 0), seed=5)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_water_world_chunk_is_solid_grass():
    # Chunks entirely below z=0 are filled with material 2
    # (reference generate.rs:63-64, chunk_top < 12).
    m, f = generate_chunk((0, 0, -1), seed=0)
    assert (np.asarray(f) == 0).all()
    assert (np.asarray(m) == PACKED_MATERIALS[2]).all()


def test_sky_chunk_is_air():
    m, f = generate_chunk((0, 0, 8), seed=0)
    assert (np.asarray(m) == 0).all()
    assert (np.asarray(f) == MAX_CHUNK_LOD).all()


def test_solid_matches_height_rule(small_world):
    """solid == (z < height) | (z < 0), with bands/materials in range."""
    origin = small_world["origin"]
    h = np.asarray(heightmap_grid(origin[0], origin[1], (128, 128)))
    z = origin[2] + np.arange(128)[:, None, None]
    expect = (z < h[None]) | (z < 0)
    np.testing.assert_array_equal(small_world["solid"], expect)


def test_material_bands(small_world):
    """Solid voxels carry band-appropriate materials (generate.rs:31-51)."""
    mats = small_world["materials"]
    solid = small_world["solid"]
    origin_z = small_world["origin"][2]
    z = origin_z + np.arange(128)[:, None, None]
    z = np.broadcast_to(z, mats.shape)
    packed = mats[solid]
    zz = z[solid]
    grass, rock, snow = (int(PACKED_MATERIALS[i]) for i in (2, 5, 6))
    assert set(np.unique(packed)) <= {grass, rock, snow}
    assert (packed[zz < 20] == grass).all()
    assert (packed[(zz >= 20) & (zz < 80)] != snow).all()
    assert (packed[zz >= 160] == snow).all() if (zz >= 160).any() else True


def test_height_statistics():
    h = np.asarray(heightmap_grid(0, 0, (256, 256)))
    assert h.min() >= 0
    assert 10 <= h.mean() <= 80
    assert h.max() <= 600 * 0.2 * 2.2 + 10


def test_chunk_storage_roundtrip(tmp_path):
    from raytrace_tpu.world.storage import ChunkStorage

    store = ChunkStorage(tmp_path, seed=0)
    m1, f1 = store.borrow_packed_chunk_data((0, 0, 0))
    assert store.has_chunk((0, 0, 0))
    # Second load must come from disk and match exactly.
    m2, f2 = store.borrow_packed_chunk_data((0, 0, 0))
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(f1, f2)


def test_chunk_storage_corrupt_file_regenerates(tmp_path, capsys):
    from raytrace_tpu.world.storage import ChunkStorage

    store = ChunkStorage(tmp_path, seed=0)
    m1, _ = store.borrow_packed_chunk_data((0, 0, 0))
    store.path_for((0, 0, 0)).write_bytes(b"garbage!")
    m2, _ = store.borrow_packed_chunk_data((0, 0, 0))
    np.testing.assert_array_equal(m1, m2)
    assert "WARNING" in capsys.readouterr().out
