"""On-device path tracer (pure JAX / XLA).

Semantics follow the reference kernel exactly (shaders/glsl/raytrace.comp):
minefield-accelerated DDA with toroidal addressing of a resident 256^3
volume, then primary + sun-shadow + two diffuse-bounce lighting with
blue-noise sampling.  See testing/reference_tracer.py for the NumPy oracle
these ops are validated against.

TPU-first design decisions (vs. the GLSL):
  * One fused u32 volume instead of two textures: minefield step in bits
    24-31, packed material in the low bits.  The DDA inner loop costs one
    1-D linearized gather per step instead of two 3-D texture fetches.
  * Struct-of-arrays over a flat ray batch inside a `lax.while_loop` with a
    live-ray early exit; all lanes step together with `where` masks (the
    SIMT `break` of raytrace.comp:113-162 becomes a done-mask).
  * Blue-noise offsets are per-pixel rather than per-8x8-workgroup: the
    reference's noise_offset (raytrace.comp:298-304) is constant across a
    GPU workgroup, which is a scheduling artifact, not a semantic choice;
    per-pixel decorrelates the dither and removes any workgroup notion.
    Its second noise fetch at +2/512 *texels* (raytrace.comp:336) rounds to
    the same texel under the NEAREST sampler; we shift by +2 whole texels so
    the second bounce gets genuinely fresh noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import LIGHTING_SCALE, MAX_TRACE_STEPS, NORMAL_SKY, ROOT_BLOCK_SIZE
from . import shading

_HALF = ROOT_BLOCK_SIZE // 2  # 128
_N = ROOT_BLOCK_SIZE  # 256

STEP_SHIFT = 24  # minefield bits in the fused volume
MATERIAL_MASK = (1 << STEP_SHIFT) - 1


def fuse_volume(materials: jax.Array, minefield: jax.Array) -> jax.Array:
    """Pack (materials u32, minefield u8) into the fused traversal volume."""
    return (materials.astype(jnp.uint32) | (minefield.astype(jnp.uint32) << STEP_SHIFT)).reshape(-1)


def _lookup(fused_flat: jax.Array, pos: jax.Array) -> jax.Array:
    """Toroidal fused-volume lookup at world positions (..., 3) xyz."""
    t = jnp.floor(pos + jnp.float32(_HALF)).astype(jnp.int32)
    t = jnp.remainder(t, _N)
    lin = (t[..., 2] * _N + t[..., 1]) * _N + t[..., 0]
    return fused_flat[lin]


def _normalize(v: jax.Array) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-20))


@functools.partial(jax.jit, static_argnames=("max_steps",))
def trace_rays(
    fused_flat: jax.Array,
    origin: jax.Array,
    direction: jax.Array,
    lr: jax.Array,
    max_steps: int = MAX_TRACE_STEPS,
) -> dict[str, jax.Array]:
    """Trace a batch of rays; shapes (..., 3) xyz, float32.

    Returns position/normal/air/albedo/distance with the HitResult semantics
    of raytrace.comp:62-183 (position nudged 0.001 off the hit face,
    distance measured pre-nudge).
    """
    direction = _normalize(direction.astype(jnp.float32))
    origin = origin.astype(jnp.float32)
    lr = lr.astype(jnp.float32)

    length_per_axis = jnp.float32(1.0) / jnp.abs(direction)
    normals = jnp.where(
        direction > 0,
        jnp.array([1, 3, 5], jnp.int32),
        jnp.array([0, 2, 4], jnp.int32),
    )
    muls = jnp.where(direction > 0, jnp.float32(-1.0), jnp.float32(1.0))

    shape = origin.shape[:-1]
    fused0 = _lookup(fused_flat, origin)
    step0 = (fused0 >> STEP_SHIFT).astype(jnp.int32)
    state = dict(
        i=jnp.int32(0),
        pos=origin,
        normal=jnp.zeros(shape, jnp.int32),
        air=jnp.zeros(shape, bool),
        done=jnp.zeros(shape, bool),
        hit_packed=jnp.zeros(shape, jnp.uint32),
        step_size=((1 << step0) // 2).astype(jnp.float32),
    )

    def cond(s):
        return (s["i"] < max_steps) & ~jnp.all(s["done"])

    def body(s):
        active = ~s["done"]
        shifted = (s["pos"] + jnp.float32(_HALF)) * muls
        ss = s["step_size"][..., None]
        m = jnp.where(ss > 0, jnp.mod(shifted, jnp.where(ss > 0, ss, 1.0)), 0.0)
        l = (jnp.float32(1e-4) + m) * length_per_axis

        lx, ly, lz = l[..., 0], l[..., 1], l[..., 2]
        use_x = (lx < ly) & (lx < lz)
        use_y = ~(lx < ly) & (ly < lz)
        lmin = jnp.where(use_x, lx, jnp.where(use_y, ly, lz))
        axis_normal = jnp.where(
            use_x, normals[..., 0], jnp.where(use_y, normals[..., 1], normals[..., 2])
        )

        pos = jnp.where(active[..., None], s["pos"] + direction * lmin[..., None], s["pos"])
        normal = jnp.where(active, axis_normal, s["normal"])

        fused = _lookup(fused_flat, pos)
        cur_step = (fused >> STEP_SHIFT).astype(jnp.int32)

        out_of_bounds = jnp.any(jnp.abs(pos - lr) >= jnp.float32(_HALF), axis=-1)
        hit = cur_step <= 0
        new_air = active & out_of_bounds
        new_hit = active & ~out_of_bounds & hit
        done = s["done"] | new_air | new_hit

        return dict(
            i=s["i"] + 1,
            pos=pos,
            normal=normal,
            air=s["air"] | new_air,
            done=done,
            hit_packed=jnp.where(
                new_hit, fused & jnp.uint32(MATERIAL_MASK), s["hit_packed"]
            ),
            step_size=jnp.where(
                done, s["step_size"], ((1 << cur_step) // 2).astype(jnp.float32)
            ),
        )

    s = jax.lax.while_loop(cond, body, state)

    distance = jnp.linalg.norm(origin - s["pos"], axis=-1)
    nx, ny, nz = shading.face_normal_vector(jnp, s["normal"])
    pos = s["pos"] + jnp.float32(0.001) * jnp.stack([nx, ny, nz], axis=-1)

    p = s["hit_packed"]
    albedo = jnp.stack(
        [
            ((p >> 14) & 0x7F).astype(jnp.float32) / 127.0,
            ((p >> 7) & 0x7F).astype(jnp.float32) / 127.0,
            (p & 0x7F).astype(jnp.float32) / 127.0,
        ],
        axis=-1,
    )
    return {
        "position": pos,
        "normal": s["normal"],
        "air": s["air"],
        "albedo": albedo,
        "distance": distance,
        "exhausted": ~s["done"],
        "steps": s["i"],
    }


def camera_rays(uniforms: dict, width: int, height: int, row0=0, rows=None):
    """Per-pixel primary ray origins/directions (raytrace.comp:296-315).

    uniforms carries origin/forward/up/right with up/right already scaled by
    the 0.4 FOV factor (pipeline.rs:198-199).  `row0`/`rows` select a band of
    image rows (used by the multi-chip tile split); screen coordinates stay
    relative to the full `height`.
    """
    n_rows = height if rows is None else rows
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = (jnp.asarray(row0, jnp.float32) + jnp.arange(n_rows, dtype=jnp.float32))[:, None]
    sx = (px / width) * 2.0 - 1.0
    sy = (py / height) * 2.0 - 1.0
    ray_dir = _normalize(
        uniforms["forward"][None, None]
        + sx[..., None] * uniforms["right"][None, None]
        + sy[..., None] * uniforms["up"][None, None]
    )
    origin = jnp.broadcast_to(uniforms["origin"], ray_dir.shape)
    below = -uniforms["origin"][1] > jnp.float32(_HALF)
    space = -uniforms["origin"][1] - jnp.float32(_HALF)
    t = space / ray_dir[..., 1] + jnp.float32(1e-4)
    origin = jnp.where(below, origin + t[..., None] * ray_dir, origin)
    return origin, ray_dir


@functools.partial(
    jax.jit, static_argnames=("width", "height", "max_steps", "rows", "bounces")
)
def render_gbuffers(
    fused_flat: jax.Array,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    max_steps: int = MAX_TRACE_STEPS,
    row0=0,
    rows: int | None = None,
    bounces: int = 2,
) -> dict[str, jax.Array]:
    """G-buffers via the general volume tracer (see integrate_gbuffers)."""

    def trace(o, d, active=None):
        # The volume tracer has no compaction; masked rays cost nothing
        # extra there (lanes are fully data-parallel), so `active` is moot.
        return trace_rays(fused_flat, o, d, uniforms["lr"], max_steps)

    return integrate_gbuffers(
        trace, blue_noise, uniforms, width, height, row0, rows, bounces
    )


def frame_noise(
    blue_noise: jax.Array, seed: jax.Array, width: int, height: int,
    row0=0, rows: int | None = None,
):
    """Per-pixel blue-noise planes (noise1, noise2) for one frame.

    The reference samples the noise texture at pixel + per-frame offset
    (raytrace.comp:298-304, second fetch at +2 texels for the second
    bounce); here the modular lookup is a roll + tile (XLA's per-element
    gather is ~85 M/s on TPU; this is free).  `row0`/`rows` select a band
    of image rows (multi-chip tile split); row0 may be traced.
    """
    nh, nw = blue_noise.shape[0], blue_noise.shape[1]
    n_rows = height if rows is None else rows
    seed = jnp.asarray(seed, jnp.int32)
    # Round (not floor): the texture holds k/255 quantized to f32, and
    # k/255*255 can land an ulp below k depending on who did the division;
    # rounding makes the offset independent of that (raytrace.comp:302-303).
    off_x = jnp.floor(blue_noise[seed // nw % nh, seed % nw, 0] * 255.0 + 0.5).astype(jnp.int32)
    off_y = jnp.floor(blue_noise[seed // nw % nh, seed % nw, 1] * 255.0 + 0.5).astype(jnp.int32)
    if isinstance(row0, int) and row0 == 0 and n_rows == height:
        # Full-frame fast path.
        base = jnp.roll(blue_noise, (-off_y, -off_x), (0, 1))
        reps_y = -(-height // nh)
        reps_x = -(-width // nw)
        tiled = jnp.tile(base, (reps_y, reps_x, 1))
        noise1 = tiled[:height, :width]
        base2 = jnp.roll(blue_noise, (-off_y - 2, -off_x - 2), (0, 1))
        noise2 = jnp.tile(base2, (reps_y, reps_x, 1))[:height, :width]
    else:
        # Row-band path: same roll+tile construction with a dynamic row
        # slice (row0 may be a traced lax.axis_index value).
        reps_y = -(-n_rows // nh) + 1
        reps_x = -(-width // nw)
        r0m = jnp.remainder(jnp.asarray(row0, jnp.int32), nh)

        def band_noise(dy, dx):
            base = jnp.roll(blue_noise, (-off_y - dy, -off_x - dx), (0, 1))
            strip = jnp.tile(base, (reps_y, reps_x, 1))
            return jax.lax.dynamic_slice(
                strip, (r0m, 0, 0), (n_rows, strip.shape[1], strip.shape[2])
            )[:, :width]

        noise1 = band_noise(0, 0)
        noise2 = band_noise(2, 2)
    return noise1, noise2


def integrate_gbuffers(
    trace,
    blue_noise: jax.Array,
    uniforms: dict,
    width: int,
    height: int,
    row0=0,
    rows: int | None = None,
    bounces: int = 2,
) -> dict[str, jax.Array]:
    """Full lighting pass producing the 6 G-buffers (raytrace.comp:290-400).

    `trace(origin, direction) -> hit dict` supplies the tracer (general
    volume DDA or the Pallas heightfield kernel).  blue_noise: (512, 512, 4)
    float32 in [0, 1].  `row0`/`rows` render only a band of image rows
    (multi-chip tile split).  `bounces` limits the light path: 0 = primary
    G-buffers only (sky lighting), 1 = sun + one diffuse bounce, 2 = the
    reference's full path (benchmark configs; reference always uses 2).
    Returns lighting/(H,W,3), depth u16, normal u8, albedo, emission, fog.
    """
    n_rows = height if rows is None else rows
    origin, ray_dir = camera_rays(uniforms, width, height, row0, n_rows)

    sun = shading.sun_direction(jnp, uniforms["sun_angle"])
    sun_vec = jnp.stack(sun)
    sunlight = shading.sun_color(jnp, sun)
    sunlight_vec = jnp.stack(sunlight)

    noise1, noise2 = frame_noise(
        blue_noise, uniforms["seed"], width, height, row0, rows
    )

    def sky(d, include_sun):
        r, g, b = shading.sample_sky(
            jnp, (d[..., 0], d[..., 1], d[..., 2]), sun, sunlight, include_sun
        )
        r, g, b = jnp.broadcast_arrays(r, g, b)
        return jnp.stack([r, g, b], -1)

    primary = trace(origin, ray_dir)
    hit_mask = ~primary["air"]

    def sun_dir_from(noise):
        d = sun_vec[None, None] + jnp.stack(
            [noise[..., 0], noise[..., 1], jnp.zeros_like(noise[..., 0])], -1
        ) * jnp.float32(0.05)
        return _normalize(d)

    def trace_pair(from_pos, sun_d, dif_d, active):
        """Trace the sun-shadow and diffuse rays of one bounce as a single
        doubled batch (one kernel dispatch instead of two).  `active` marks
        the pixels whose bounce legs exist at all — the reference skips
        these rays entirely for sky pixels (raytrace.comp:320-341), and the
        compacting tracer turns skipped rays into zero work."""
        o = jnp.concatenate([from_pos, from_pos], axis=0)
        d = jnp.concatenate([sun_d, dif_d], axis=0)
        r = trace(o, d, jnp.concatenate([active, active], axis=0))
        n = from_pos.shape[0]
        sun_r = {k: (v[:n] if jnp.ndim(v) else v) for k, v in r.items()}
        dif_r = {k: (v[n:] if jnp.ndim(v) else v) for k, v in r.items()}
        return sun_r, dif_r

    light_hit = jnp.zeros(origin.shape, jnp.float32)
    if bounces >= 1:
        d1 = jnp.stack(
            shading.diffuse_direction(
                jnp, noise1[..., 0], noise1[..., 1], primary["normal"]
            ),
            -1,
        )
        sun1, dif1 = trace_pair(
            primary["position"], sun_dir_from(noise1), d1, hit_mask
        )
        light_hit = jnp.where(sun1["air"][..., None], sunlight_vec[None, None], 0.0)
        light_hit = light_hit + jnp.where(dif1["air"][..., None], sky(d1, True), 0.0)

    if bounces >= 2:
        d2 = jnp.stack(
            shading.diffuse_direction(
                jnp, noise2[..., 0], noise2[..., 1], dif1["normal"]
            ),
            -1,
        )
        sun2, dif2 = trace_pair(
            dif1["position"], sun_dir_from(noise2), d2,
            hit_mask & ~dif1["air"],
        )
        light2 = jnp.where(sun2["air"][..., None], sunlight_vec[None, None], 0.0)
        light2 = light2 + jnp.where(dif2["air"][..., None], sky(d2, True), 0.0)
        light2 = light2 * dif1["albedo"]
        light_hit = light_hit + jnp.where(dif1["air"][..., None], 0.0, light2)

    light = jnp.where(hit_mask[..., None], light_hit, sky(ray_dir, True))

    depth = jnp.where(
        primary["air"],
        jnp.uint32(0xFFFF),
        jnp.minimum(
            jnp.linalg.norm(uniforms["origin"][None, None] - primary["position"], axis=-1)
            * 32.0,
            jnp.float32(0xFFFF),
        ).astype(jnp.uint32),
    ).astype(jnp.uint16)

    fog = sky(ray_dir, False) / 2.0
    # In-kernel fault containment (raytrace.comp REPORT_ERROR, :5-7,387-400):
    # rays that exhausted the step limit are highlighted pink in the fog
    # buffer with a near-max depth so they fog to pure error color.
    exhausted = primary["exhausted"][..., None]
    fog = jnp.where(exhausted, jnp.array([1.0, 0.0, 1.0], jnp.float32), fog)
    depth = jnp.where(primary["exhausted"], jnp.uint16(256 * 254), depth)

    return {
        "lighting": light / jnp.float32(LIGHTING_SCALE),
        "depth": depth,
        "normal": jnp.where(primary["air"], jnp.int32(NORMAL_SKY), primary["normal"]).astype(
            jnp.uint8
        ),
        "albedo": jnp.where(hit_mask[..., None], primary["albedo"], 1.0),
        "emission": jnp.zeros_like(light),
        "fog": fog,
    }
