"""Sky, sun, and tone-mapping math.

Direct re-expressions of the procedural shading in the reference kernels:
sun_color (raytrace.comp:259-269), sample_sky (raytrace.comp:271-288),
sun direction (raytrace.comp:317), filmic_curve (finalize.comp:21-31).

Every function takes an ``xp`` array module (numpy or jax.numpy) so the
NumPy golden tracer and the on-device JAX path share one source of truth
for the formulas.  Vector quantities are carried as separate x/y/z arrays
(struct-of-arrays) because that is the layout both tracers use.
"""

from __future__ import annotations

SUN_MAIN_COLOR = (0.9647 * 2.0, 0.7843 * 2.0, 0.8824 * 2.0)
SUN_SUNSET_COLOR = (0.7412 * 2.0, 0.2157 * 2.0, 0.1686 * 2.0)
SKY_BRIGHT_COLOR = (0.5294, 0.8275, 0.9647)
SKY_DARK_COLOR = (0.0863, 0.1294, 0.2196)


def sun_direction(xp, sun_angle):
    """Unnormalized-then-normalized sun vector (raytrace.comp:317)."""
    sx = xp.cos(sun_angle) * 0.5 + (sun_angle - 0.5) * 0.5
    sy = xp.sin(sun_angle)
    sz = xp.cos(sun_angle)
    norm = xp.sqrt(sx * sx + sy * sy + sz * sz)
    return sx / norm, sy / norm, sz / norm


def _mix(a, b, t):
    return a + (b - a) * t


def sun_color(xp, sun_dir):
    """Sunlight color from sun elevation (raytrace.comp:259-269)."""
    sx, sy, sz = sun_dir
    horizon = xp.sqrt(sx * sx + sy * sy)
    sun_amount = xp.minimum(1.0 - horizon, 0.02) * 50.0
    out = []
    for main, sunset in zip(SUN_MAIN_COLOR, SUN_SUNSET_COLOR):
        day = _mix(sunset, main, sun_amount)
        night = _mix(sunset, 0.0, sun_amount * 2.0)
        out.append(xp.where(sz >= 0.0, day, night))
    return tuple(out)


def sample_sky(xp, direction, sun_dir, sunlight, include_sun):
    """Procedural sky dome radiance (raytrace.comp:271-288).

    ``direction`` must be normalized; ``include_sun`` may be a bool or a
    bool array (primary sky rays include the solar disk, fog color does not).
    """
    dx, dy, dz = direction
    sx, sy, sz = sun_dir
    lr, lg, lb = sunlight

    sunlight_amount = xp.clip((lr + lg + lb) * 0.2 - 0.02, 0.0, 1.0)
    horizon = xp.sqrt(dx * dx + dy * dy) ** _mix(40.0, 10.0, sunlight_amount)
    dist = xp.sqrt((sx - dx) ** 2 + (sy - dy) ** 2 + (sz - dz) ** 2)
    sun_amount = 1.0 - 0.5 * dist
    sun_halo_amount = xp.maximum(sun_amount, 0.0) ** _mix(5.0, 1.0, sunlight_amount)
    bright_amount = xp.minimum(horizon + sun_halo_amount * 0.5, 1.0)
    glow = xp.maximum(sun_amount, 0.0) ** 5.0 * 0.5
    disk = xp.logical_and(sun_amount > 0.98, include_sun)
    out = []
    for dark, bright, sun in zip(SKY_DARK_COLOR, SKY_BRIGHT_COLOR, (lr, lg, lb)):
        c = _mix(dark, bright, bright_amount * xp.maximum(sunlight_amount, 0.1))
        c = c + sun * glow
        c = c + xp.where(disk, sun, 0.0)
        out.append(c)
    return tuple(out)


def filmic_curve(xp, x):
    """Piecewise filmic tone curve (finalize.comp:21-31)."""
    seg1 = x * x
    seg2 = x * 0.6 - 0.09
    seg3 = 1.0 - 0.219512195116 * (x - 2.5) * (x - 2.5)
    return xp.where(
        x < 0.3, seg1, xp.where(x < 1.13333, seg2, xp.where(x < 2.5, seg3, 1.0))
    )


def sphere_point(xp, noise_r, noise_g):
    """Random unit-sphere point from two noise values (raytrace.comp:189-203).

    A pure function of the per-pixel noise — callers with iteration loops
    hoist this (the transcendentals) and keep only diffuse_from_sphere in
    the loop body.
    """
    pi = 3.141592653589793
    theta1 = pi * 2.0 * noise_r
    # theta2 = arccos(1 - 2g); use cos(theta2) = 1-2g and
    # sin(theta2) = sqrt(1 - cos^2) directly (arccos has no Mosaic lowering
    # and sin(arccos(x)) >= 0 on [0, pi], so this is exact).
    cos_t2 = xp.clip(1.0 - 2.0 * noise_g, -1.0, 1.0)
    sin_t2 = xp.sqrt(xp.maximum(1.0 - cos_t2 * cos_t2, 0.0))
    return xp.sin(theta1) * sin_t2, xp.cos(theta1) * sin_t2, cos_t2


def diffuse_from_sphere(xp, sp, normal_id):
    """Sphere point + hit face's outward normal, normalized (:204-212).

    Degenerate guard: the blue-noise texture contains exact 255/255 = 1.0
    values, so sphere_point can return exactly -n for a face normal n and
    the sum cancels to the zero vector.  The reference's
    normalize(vec3(0)) is NaN/undefined (raytrace.comp:204-212) and a
    NaN ray never terminates (every comparison is false — it silently
    burns the whole step budget); here the limit direction is the face
    normal itself, which is both defined and the physical limit of the
    cosine-ish lobe as the sample approaches the antipode.
    """
    nx, ny, nz = face_normal_vector(xp, normal_id)
    dx = sp[0] + nx
    dy = sp[1] + ny
    dz = sp[2] + nz
    norm = xp.sqrt(dx * dx + dy * dy + dz * dz)
    degenerate = norm < 1e-6
    norm = xp.maximum(norm, 1e-20)
    return (
        xp.where(degenerate, nx, dx / norm),
        xp.where(degenerate, ny, dy / norm),
        xp.where(degenerate, nz, dz / norm),
    )


def diffuse_direction(xp, noise_r, noise_g, normal_id):
    """Cosine-ish bounce direction (raytrace.comp:189-212).

    Random point on the unit sphere from two noise values, displaced by the
    hit face's outward unit normal, then normalized.
    """
    return diffuse_from_sphere(xp, sphere_point(xp, noise_r, noise_g), normal_id)


def face_normal_vector(xp, normal_id):
    """Face id -> outward unit normal (raytrace.comp:230-244).

    Ids: 0/1 = -/+X face hit, 2/3 = -/+Y, 4/5 = -/+Z.  Even ids mean the ray
    was travelling in -axis direction, so the outward normal is +axis; odd
    ids the reverse (matches the position nudge at raytrace.comp:166-180).
    """
    sign = xp.where(normal_id % 2 == 0, 1.0, -1.0)
    axis = normal_id // 2
    nx = xp.where(axis == 0, sign, 0.0)
    ny = xp.where(axis == 1, sign, 0.0)
    nz = xp.where(axis == 2, sign, 0.0)
    return nx, ny, nz
