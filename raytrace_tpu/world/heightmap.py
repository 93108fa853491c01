"""Terrain heightmap generation (on device).

Reference: src/world/generate.rs:11-29 (`height`, `generate_heightmap`) and
src/world/heightmap.rs (a 64x64 per-chunk-column height grid).

Height formula (reference generate.rs:11-15):
``floor(mountain_noise2(x/600, y/600) * 600 * 0.2 + 10)`` — slope-eroded
multifractal noise scaled to [10, ~142].  The truncating `as isize` cast
equals floor here because the value is non-negative, and NaN casts to 0
which the noise already folds to 0.

TPU-native world definition (v2 — the lattice decomposition)
------------------------------------------------------------
The smooth, expensive parts of the mountain function — the first
``BASE_OCTAVES_TABLED`` octaves of the multifractal and the d=0.2
central-difference erosion slope (reference functions.rs:86-93), whose
spatial wavelengths are >= ~70 world units — are defined on a **global
integer lattice** with ``LATTICE_SPACING`` = 8 world units and bilinearly
interpolated between lattice points; only the highest octave (wavelength
~7.5 units, which an 8-unit lattice cannot carry) stays analytic per
column.  Lattice values are quantized to 16-bit fixed point so they pack
into per-block VMEM tables for the Pallas tracer (ops/trace_pallas.py),
whose inner loop then costs one perlin evaluation + four table words per
column instead of fourteen perlin evaluations.

The quantized-bilinear form IS the world: every consumer (worldgen, the
volume tracer's chunks, the NumPy oracle's volumes, the Pallas kernels,
tests) evaluates the same function, so the framework stays exactly
self-consistent.  Against the pure-analytic v1 recipe the terrain is
statistically identical (height correlation >= 0.998, matched means,
mean |Δh| < 0.3 voxels — measured over 256² regions near and far from
the origin).
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
from .noise import (
    DEFAULT_LACUNARITY,
    DEFAULT_OCTAVES,
    DEFAULT_PERSISTENCE,
    SLOPE_OCTAVES,
    basic_multi,
    perlin2,
)

# --- world-v2 lattice parameters (part of the world definition) -----------
LATTICE_SPACING = 8  # world units between lattice samples (= HF block size)
BASE_OCTAVES_TABLED = 5  # octaves 0..4 live on the lattice; octave 5 analytic
# 16-bit fixed-point quantization of the lattice fields.
R_LO, R_STEP = -4.0, 2.0**-13  # partial multifractal value, range [-4, 4)
E_LO, E_STEP = -2.0, 2.0**-14  # erosion term (1 - slope) * 0.7, range [-2, 2)

_G = LATTICE_SPACING
_K = BASE_OCTAVES_TABLED


def lattice_fields_q(wx, wy, seed=0):
    """Quantized lattice fields at world coords (wx, wy) -> (r16, e16) i32.

    ``wx``/``wy`` are expected to be multiples of LATTICE_SPACING (the global
    lattice); the function itself is defined everywhere.  r16 encodes the
    accumulated multifractal after BASE_OCTAVES_TABLED octaves, e16 the
    erosion term ``(1 - slope) * 0.7`` with slope = central difference at
    d=0.2 of the 2-octave partial field (see noise.SLOPE_OCTAVES).
    """
    fx = jnp.asarray(wx, jnp.float32) / WORLDGEN_SCALE
    fy = jnp.asarray(wy, jnp.float32) / WORLDGEN_SCALE
    r = basic_multi(fx, fy, seed, octaves=_K)

    d = jnp.float32(0.2)

    def f01(a, b):
        return basic_multi(a, b, seed, octaves=SLOPE_OCTAVES) * 0.5 + 0.5

    dx = (f01(fx + d, fy) - f01(fx - d, fy)) / (2.0 * d)
    dy = (f01(fx, fy + d) - f01(fx, fy - d)) / (2.0 * d)
    slope = jnp.sqrt(dx * dx + dy * dy)
    e = (1.0 - slope) * 0.7

    r16 = jnp.clip(jnp.round((r - R_LO) / R_STEP), 0, 65535).astype(jnp.int32)
    e16 = jnp.clip(jnp.round((e - E_LO) / E_STEP), 0, 65535).astype(jnp.int32)
    return r16, e16


def dequant_lattice(r16, e16):
    """16-bit lattice fields -> float32 values.

    ``r16 * R_STEP`` is exact in f32 (integer < 2^16 times a power of two),
    so XLA and Mosaic reconstruct identical values from the same words.
    """
    r = jnp.float32(R_LO) + r16.astype(jnp.float32) * jnp.float32(R_STEP)
    e = jnp.float32(E_LO) + e16.astype(jnp.float32) * jnp.float32(E_STEP)
    return r, e


def height_from_lattice(r, e, fx, fy, seed=0):
    """Finish the height: analytic high octaves + erosion + scaling.

    ``r``/``e`` are the bilinearly interpolated lattice fields at the
    column; fx/fy = world_x / WORLDGEN_SCALE.  Shared by every consumer
    (XLA worldgen and the Mosaic kernels) so the math stays identical.
    """
    freq = float(DEFAULT_LACUNARITY) ** _K * 2.0  # DEFAULT_FREQUENCY = 2
    amp = float(DEFAULT_PERSISTENCE) ** _K
    q = jnp.float32(1.0)
    px = fx * jnp.float32(freq)
    py = fy * jnp.float32(freq)
    for k in range(_K, DEFAULT_OCTAVES):
        q = q * (1.0 + perlin2(px, py, seed + k) * jnp.float32(amp))
        px = px * jnp.float32(DEFAULT_LACUNARITY)
        py = py * jnp.float32(DEFAULT_LACUNARITY)
        amp *= float(DEFAULT_PERSISTENCE)
    base = r * q * 0.5 + 0.5
    eroded = base + e
    n = jnp.where(
        eroded >= 0.0, (jnp.abs(eroded) / 1.5) ** jnp.float32(2.6), 0.0
    )
    h = n * jnp.float32(WORLDGEN_SCALE * WORLDGEN_HEIGHT_MUL) + jnp.float32(
        WORLDGEN_HEIGHT_OFFSET
    )
    return jnp.floor(h).astype(jnp.int32)


def height_at(x: jax.Array, y: jax.Array, seed=0) -> jax.Array:
    """World terrain height for integer world columns (x, y) -> int32.

    Direct (non-tabled) evaluation: four lattice corners + bilinear + the
    analytic top octave.  Heavy grid consumers use heightmap_grid, which
    evaluates each lattice point once.
    """
    xi = jnp.asarray(x)
    yi = jnp.asarray(y)
    if not jnp.issubdtype(xi.dtype, jnp.integer):
        xi = jnp.floor(xi).astype(jnp.int32)
        yi = jnp.floor(yi).astype(jnp.int32)
    xi = xi.astype(jnp.int32)
    yi = yi.astype(jnp.int32)
    gx0 = (xi >> 3) << 3  # arithmetic shift = floor division for negatives
    gy0 = (yi >> 3) << 3
    tx = (xi & 7).astype(jnp.float32) * jnp.float32(1.0 / _G)
    ty = (yi & 7).astype(jnp.float32) * jnp.float32(1.0 / _G)

    corners = [
        dequant_lattice(*lattice_fields_q(gx0 + ox * _G, gy0 + oy * _G, seed))
        for oy in (0, 1)
        for ox in (0, 1)
    ]
    (r00, e00), (r10, e10), (r01, e01), (r11, e11) = corners

    def bil(v00, v10, v01, v11):
        top = v00 + tx * (v10 - v00)
        bot = v01 + tx * (v11 - v01)
        return top + ty * (bot - top)

    r = bil(r00, r10, r01, r11)
    e = bil(e00, e10, e01, e11)
    fx = xi.astype(jnp.float32) / WORLDGEN_SCALE
    fy = yi.astype(jnp.float32) / WORLDGEN_SCALE
    return height_from_lattice(r, e, fx, fy, seed)


@functools.partial(jax.jit, static_argnames=("shape", "seed"))
def heightmap_grid(origin_x, origin_y, shape=(CHUNK_SIZE, CHUNK_SIZE), seed=0):
    """Heights over an integer grid; returns (Y, X) int32.

    ``heights[y, x]`` is the terrain height of world column
    ``(origin_x + x, origin_y + y)`` — same indexing as the reference's
    row-major Heightmap (src/world/heightmap.rs:4-17).

    Fast path: evaluates each covered lattice point once ((N/8+2)² points
    instead of 4 per column), expands corners to voxel resolution with
    repeats, and runs only the analytic top octave per column.  Origins may
    be traced values (streaming rebuilds tables inside jit).
    """
    ny, nx = shape
    ox = jnp.asarray(origin_x, jnp.int32)
    oy = jnp.asarray(origin_y, jnp.int32)
    gx0 = (ox >> 3) << 3
    gy0 = (oy >> 3) << 3
    # Lattice grid covering [gx0, origin_x + nx]: nlx cells + 1.
    nlx = nx // _G + 2
    nly = ny // _G + 2
    lx = gx0 + jnp.arange(nlx + 1, dtype=jnp.int32)[None, :] * _G
    ly = gy0 + jnp.arange(nly + 1, dtype=jnp.int32)[:, None] * _G
    r16, e16 = lattice_fields_q(
        jnp.broadcast_to(lx, (nly + 1, nlx + 1)),
        jnp.broadcast_to(ly, (nly + 1, nlx + 1)),
        seed,
    )
    r, e = dequant_lattice(r16, e16)

    # Corner fields at voxel resolution, offset by the origin's intra-cell
    # phase (dynamic slice: origins may be traced).
    sx = ox - gx0
    sy = oy - gy0

    def expand(v):
        full = jnp.repeat(jnp.repeat(v, _G, axis=0), _G, axis=1)
        return jax.lax.dynamic_slice(full, (sy, sx), (ny, nx))

    r00 = expand(r[:-1, :-1])
    r10 = expand(r[:-1, 1:])
    r01 = expand(r[1:, :-1])
    r11 = expand(r[1:, 1:])
    e00 = expand(e[:-1, :-1])
    e10 = expand(e[:-1, 1:])
    e01 = expand(e[1:, :-1])
    e11 = expand(e[1:, 1:])

    gx = ox + jnp.arange(nx, dtype=jnp.int32)[None, :]
    gy = oy + jnp.arange(ny, dtype=jnp.int32)[:, None]
    gx = jnp.broadcast_to(gx, (ny, nx))
    gy = jnp.broadcast_to(gy, (ny, nx))
    tx = (gx & 7).astype(jnp.float32) * jnp.float32(1.0 / _G)
    ty = (gy & 7).astype(jnp.float32) * jnp.float32(1.0 / _G)

    def bil(v00, v10, v01, v11):
        top = v00 + tx * (v10 - v00)
        bot = v01 + tx * (v11 - v01)
        return top + ty * (bot - top)

    rr = bil(r00, r10, r01, r11)
    ee = bil(e00, e10, e01, e11)
    fx = gx.astype(jnp.float32) / WORLDGEN_SCALE
    fy = gy.astype(jnp.float32) / WORLDGEN_SCALE
    return height_from_lattice(rr, ee, fx, fy, seed)


def generate_heightmap(chunk_coord_xy, seed=0) -> jax.Array:
    """Per-chunk 64x64 heightmap (reference generate.rs:17-29)."""
    cx, cy = chunk_coord_xy
    return heightmap_grid(
        jnp.int32(cx) * CHUNK_SIZE, jnp.int32(cy) * CHUNK_SIZE, seed=seed
    )
