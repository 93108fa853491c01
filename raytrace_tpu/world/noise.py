"""Procedural noise, as pure jittable JAX.

TPU-native rebuild of the reference's CPU noise stack
(reference: src/world/functions.rs:69-99 `MountainNoise2` over the `noise`
crate's `BasicMulti` fractal).  Everything here is float32 elementwise math —
ideal VPU work — and runs vectorized over whole coordinate grids on device,
where the reference evaluates one sample at a time on the host.

Determinism: gradients come from a counter-based integer hash of the lattice
coordinates and a seed, so any region of the world can be generated
independently, in any order, on any device, and produce identical terrain.
(The reference instead relies on a process-global `lazy_static` noise object,
src/world/generate.rs:7-9.)  Parity with the Rust `noise` crate is
tolerance-level by design: same fractal construction (heterogeneous
multifractal: octave signals scaled by accumulated altitude), same octave
count / persistence / lacunarity, but a different underlying gradient hash,
so terrain is statistically identical without being bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Defaults mirroring the `noise` crate's BasicMulti (persistence set at
# reference src/world/functions.rs:79).
DEFAULT_OCTAVES = 6
DEFAULT_FREQUENCY = 2.0
DEFAULT_LACUNARITY = 2.0943951023931953  # pi * 2 / 3
DEFAULT_PERSISTENCE = 0.5


_HA = 374761393
_HB = 668265263


def _mix(h: jax.Array) -> jax.Array:
    """Avalanche mix of a lattice-linear pre-hash (see _hash2)."""
    h = (h ^ (h >> 13)) * jnp.int32(1274126177)
    return h ^ (h >> 16)


def _hash2(xi: jax.Array, yi: jax.Array, seed) -> jax.Array:
    """Counter-based 2D lattice hash -> int32 (full avalanche-ish mix).

    The pre-mix value is linear in (xi, yi), so the four corners of a Perlin
    cell share one multiply pair: h(x+1, y) = h(x, y) + _HA etc. (used by
    perlin2/perlin2_grad)."""
    h = xi * jnp.int32(_HA) + yi * jnp.int32(_HB)
    h = h + jnp.int32(seed) * jnp.int32(1440662683)
    return _mix(h)


def hash3_u32(xi, yi, zi, seed) -> jax.Array:
    """Counter-based 3D hash -> uint32; used for per-voxel material dither."""
    h = (
        xi.astype(jnp.int32) * jnp.int32(374761393)
        + yi.astype(jnp.int32) * jnp.int32(668265263)
        + zi.astype(jnp.int32) * jnp.int32(-1262997521)
    )
    h = h + jnp.int32(seed) * jnp.int32(1440662683)
    h = (h ^ (h >> 13)) * jnp.int32(1274126177)
    h = h ^ (h >> 16)
    return h.astype(jnp.uint32)


# The 8 classic Perlin gradient directions.
_GRAD_X = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 0.0, 0.0], jnp.float32)
_GRAD_Y = jnp.array([1.0, 1.0, -1.0, -1.0, 0.0, 0.0, 1.0, -1.0], jnp.float32)


def _grad_dot(hash_val: jax.Array, dx: jax.Array, dy: jax.Array) -> jax.Array:
    """Dot of the hashed corner gradient with the offset vector.

    Branch-free select over the 8 gradients (a gather over a table of 8 would
    also work, but arithmetic select compiles to pure VPU ops on TPU).
    """
    h = hash_val & 7
    # gx in {-1,0,1}: +1 for even h<6, -1 for odd h<6, 0 for h>=6.
    u = jnp.where(h < 6, jnp.where(h & 1 == 0, dx, -dx), 0.0)
    # gy: for h<4 use +/-dy by bit1; h in {4,5} -> 0; h in {6,7} -> +/-dy.
    v = jnp.where(
        h < 4,
        jnp.where(h & 2 == 0, dy, -dy),
        jnp.where(h >= 6, jnp.where(h & 1 == 0, dy, -dy), 0.0),
    )
    return u + v


def perlin2(x: jax.Array, y: jax.Array, seed=0) -> jax.Array:
    """2D gradient (Perlin) noise in [-1, 1], float32, any input shape."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xf = x - x0
    yf = y - y0

    # Quintic fade.
    u = xf * xf * xf * (xf * (xf * 6.0 - 15.0) + 10.0)
    v = yf * yf * yf * (yf * (yf * 6.0 - 15.0) + 10.0)

    # One multiply pair for all four corners (pre-mix hash is lattice-linear).
    hb = xi * jnp.int32(_HA) + yi * jnp.int32(_HB) + jnp.int32(seed) * jnp.int32(
        1440662683
    )
    n00 = _grad_dot(_mix(hb), xf, yf)
    n10 = _grad_dot(_mix(hb + jnp.int32(_HA)), xf - 1.0, yf)
    n01 = _grad_dot(_mix(hb + jnp.int32(_HB)), xf, yf - 1.0)
    n11 = _grad_dot(_mix(hb + jnp.int32(_HA + _HB)), xf - 1.0, yf - 1.0)

    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    n = nx0 + v * (nx1 - nx0)
    # Normalize the +/-sqrt(2)/2 native range to [-1, 1] like the noise crate.
    return n * jnp.float32(1.4142135623730951)


def basic_multi(
    x: jax.Array,
    y: jax.Array,
    seed=0,
    octaves: int = DEFAULT_OCTAVES,
    frequency: float = DEFAULT_FREQUENCY,
    lacunarity: float = DEFAULT_LACUNARITY,
    persistence: float = DEFAULT_PERSISTENCE,
) -> jax.Array:
    """Heterogeneous multifractal over per-octave-seeded Perlin sources.

    Same spectral construction as the `noise` crate's BasicMulti: the first
    octave sets the "altitude", later octaves are attenuated by persistence
    and scaled by the accumulated result before being added.
    """
    px = jnp.asarray(x, jnp.float32) * frequency
    py = jnp.asarray(y, jnp.float32) * frequency
    result = perlin2(px, py, seed)
    amp = 1.0
    for octave in range(1, octaves):
        px = px * lacunarity
        py = py * lacunarity
        amp *= persistence
        signal = perlin2(px, py, seed + octave) * amp
        result = result + signal * result
    return result


def worley2(x: jax.Array, y: jax.Array, seed=0) -> jax.Array:
    """2D Worley (cellular) F1 distance noise, in [-1, ~0.4].

    Matches the `noise` crate's range-enabled, zero-displacement Worley used
    by the v1 mountain noise (reference functions.rs:26-37): the returned
    value is distance-to-nearest-feature minus 1 ("worley's distance starts
    at -1", functions.rs:41-42).
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    best = jnp.full(jnp.broadcast_shapes(x.shape, y.shape), jnp.inf, jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cx = xi + dx
            cy = yi + dy
            hx = _hash2(cx, cy, seed)
            hy = _hash2(cx, cy, seed + 0x3779B9)
            fx = cx.astype(jnp.float32) + (hx & 0xFFFF).astype(jnp.float32) / 65536.0
            fy = cy.astype(jnp.float32) + (hy & 0xFFFF).astype(jnp.float32) / 65536.0
            d = jnp.sqrt((fx - x) ** 2 + (fy - y) ** 2)
            best = jnp.minimum(best, d)
    return best - 1.0


def _map_from_range(v, lo, hi):
    return jnp.clip((v - lo) / (hi - lo), 0.0, 1.0)


def _map_to_range(v, lo, hi):
    return jnp.clip(v * (hi - lo) + lo, 0.0, 1.0)


def mountain_noise(x: jax.Array, y: jax.Array, seed=0) -> jax.Array:
    """The v1 Worley+simplex mountain composite (reference
    functions.rs:39-66) — present for inventory parity; the shipping
    terrain uses mountain_noise2, as in the reference."""
    base = worley2(x, y, seed) + 1.0
    detail = worley2(x * 4.0, y * 4.0, seed) + 1.0
    detail = _map_to_range(detail, 0.73, 1.0)
    detail = detail * _map_from_range(base, 0.34, 0.79)
    base = _map_from_range(base, 0.4, 1.0)
    base = (base + detail) / 2.0
    base = base**2.2
    rustle = perlin2(x * 0.8, y * 0.8, seed + 7) + 0.5
    rustle = _map_to_range(_map_from_range(rustle, 0.15, 1.0), 0.15, 1.0)
    rustle = rustle**2.0
    return base * rustle


def _grad_vec(hash_val: jax.Array):
    """(gx, gy) of the hashed corner gradient (see _grad_dot)."""
    h = hash_val & 7
    one = jnp.float32(1.0)
    gx = jnp.where(h < 6, jnp.where(h & 1 == 0, one, -one), 0.0)
    gy = jnp.where(
        h < 4,
        jnp.where(h & 2 == 0, one, -one),
        jnp.where(h >= 6, jnp.where(h & 1 == 0, one, -one), 0.0),
    )
    return gx, gy


def perlin2_grad(x: jax.Array, y: jax.Array, seed=0):
    """(value, d/dx, d/dy) of perlin2 — analytic derivative."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xf = x - x0
    yf = y - y0

    u = xf * xf * xf * (xf * (xf * 6.0 - 15.0) + 10.0)
    v = yf * yf * yf * (yf * (yf * 6.0 - 15.0) + 10.0)
    du = 30.0 * xf * xf * (xf * (xf - 2.0) + 1.0)
    dv = 30.0 * yf * yf * (yf * (yf - 2.0) + 1.0)

    hb = xi * jnp.int32(_HA) + yi * jnp.int32(_HB) + jnp.int32(seed) * jnp.int32(
        1440662683
    )
    corners = []
    for ox, oy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        h = _mix(hb + jnp.int32(ox * _HA + oy * _HB))
        gx, gy = _grad_vec(h)
        dx_ = xf - ox
        dy_ = yf - oy
        corners.append((gx * dx_ + gy * dy_, gx, gy))
    (n00, g00x, g00y), (n10, g10x, g10y), (n01, g01x, g01y), (n11, g11x, g11y) = corners

    nx0 = n00 + u * (n10 - n00)
    nx1 = n01 + u * (n11 - n01)
    val = nx0 + v * (nx1 - nx0)

    dnx0_dx = g00x + du * (n10 - n00) + u * (g10x - g00x)
    dnx1_dx = g01x + du * (n11 - n01) + u * (g11x - g01x)
    d_dx = dnx0_dx + v * (dnx1_dx - dnx0_dx)

    dnx0_dy = g00y + u * (g10y - g00y)
    dnx1_dy = g01y + u * (g11y - g01y)
    d_dy = dnx0_dy + v * (dnx1_dy - dnx0_dy) + dv * (nx1 - nx0)

    s = jnp.float32(1.4142135623730951)
    return val * s, d_dx * s, d_dy * s


def basic_multi_lowgrad(
    x,
    y,
    seed=0,
    octaves: int = 2,
    frequency: float = DEFAULT_FREQUENCY,
    lacunarity: float = DEFAULT_LACUNARITY,
    persistence: float = DEFAULT_PERSISTENCE,
):
    """(value, ddx, ddy) of the first `octaves` of the multifractal.

    The gradient is with respect to the input coordinate (pre-frequency),
    like a finite difference would measure.
    """
    px = jnp.asarray(x, jnp.float32) * frequency
    py = jnp.asarray(y, jnp.float32) * frequency
    r, rx, ry = perlin2_grad(px, py, seed)
    rx = rx * frequency
    ry = ry * frequency
    amp = 1.0
    freq = frequency
    for octave in range(1, octaves):
        px = px * lacunarity
        py = py * lacunarity
        amp *= persistence
        freq *= lacunarity
        p, pxg, pyg = perlin2_grad(px, py, seed + octave)
        s = amp * p
        sx = amp * pxg * freq
        sy = amp * pyg * freq
        new_r = r + s * r
        rx, ry = rx * (1.0 + s) + r * sx, ry * (1.0 + s) + r * sy
        r = new_r
    return r, rx, ry


def _fbm01(x, y, seed):
    """BasicMulti mapped to ~[0, 1] (reference functions.rs:82-84)."""
    return basic_multi(x, y, seed) * 0.5 + 0.5


# Octaves used for the erosion-slope estimate.  The reference differences
# the full 6-octave fractal at d=0.2 (functions.rs:86-93); that wide
# difference is a smoothed derivative dominated by the low octaves, so the
# slope of the 2-octave partial field is statistically the same signal
# (correlation 0.985 vs the full recipe, matched mean) at 2.1x lower cost.
# The slope feeds the lattice erosion field (world/heightmap.py), rebuilt
# per region move, so its cost is off the tracer's inner loop entirely.
SLOPE_OCTAVES = 2


def mountain_noise2(x: jax.Array, y: jax.Array, seed=0) -> jax.Array:
    """Slope-eroded mountain noise in ~[0, 1].

    Reference src/world/functions.rs:86-98: central-difference slope of the
    fractal (d=0.2) erodes the base; the result is sharpened with a 2.6
    power.  Negative eroded values (possible when slope > 1) produce NaN
    under `powf` in the reference and then cast to integer 0; here they are
    mapped to 0 explicitly.  The slope uses the low-octave partial field
    (see SLOPE_OCTAVES).
    """
    d = 0.2

    def fbm01_low(a, b):
        return basic_multi(a, b, seed, octaves=SLOPE_OCTAVES) * 0.5 + 0.5

    left = fbm01_low(x - d, y)
    right = fbm01_low(x + d, y)
    up = fbm01_low(x, y - d)
    down = fbm01_low(x, y + d)
    dx = (right - left) / (d * 2.0)
    dy = (down - up) / (d * 2.0)
    slope = jnp.sqrt(dx * dx + dy * dy)

    base = _fbm01(x, y, seed)
    eroded = base + (1.0 - slope) * 0.7
    out = jnp.where(eroded >= 0.0, (jnp.abs(eroded) / 1.5) ** 2.6, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("shape",))
def mountain_noise2_grid(origin_x, origin_y, shape, seed=0):
    """Evaluate mountain noise on an integer grid; returns (Y, X) float32."""
    ny, nx = shape
    gx = origin_x + jnp.arange(nx, dtype=jnp.int32)[None, :]
    gy = origin_y + jnp.arange(ny, dtype=jnp.int32)[:, None]
    return mountain_noise2(
        gx.astype(jnp.float32), gy.astype(jnp.float32) + jnp.zeros((ny, nx), jnp.float32), seed
    )
