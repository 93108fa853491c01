"""Fast general-volume tracer tests (ops/trace_vol_pallas.py).

The defining property: it renders ARBITRARY volume content — including
shapes the heightfield fast path cannot represent (floating boxes, caves,
overhangs) — with the exact hit semantics of the reference DDA
(trace_jax.trace_rays / raytrace.comp:82-183).  Interpret mode on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.materials import PACKED_MATERIALS
from raytrace_tpu.ops.trace_jax import camera_rays, fuse_volume, trace_rays
from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables, trace_rays_vol
from raytrace_tpu.render.camera import Camera
from raytrace_tpu.world.chunk import minefield_from_solid

LR = jnp.zeros(3, jnp.int32)


def _fuse(solid, material_id=5):
    mats = np.where(solid, np.uint32(PACKED_MATERIALS[material_id]), np.uint32(0))
    mf = np.asarray(minefield_from_solid(jnp.asarray(solid)))
    return fuse_volume(jnp.asarray(mats), jnp.asarray(mf))


@pytest.fixture(scope="module")
def weird_world():
    """Content impossible for the heightfield tracer: slab + floating box +
    a cave tunnel under the surface."""
    solid = np.zeros((256, 256, 256), bool)
    solid[:100] = True
    solid[140:150, 120:140, 120:140] = True
    solid[90:100, 128:132, 128:132] = False
    fused = _fuse(solid)
    return fused, build_vol_tables(fused)


def _cam_rays(origin, pitch, n=24):
    cam = Camera(origin=list(origin))
    cam.pitch = pitch
    fwd, up, right = cam.scaled_basis()
    uni = dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
    )
    return camera_rays(uni, n, n)


def _both(fused, tables, o, d, **kw):
    want = {
        k: np.asarray(v)
        for k, v in trace_rays(fused, o, d, jnp.zeros(3, jnp.float32), 512).items()
    }
    got = {
        k: np.asarray(v)
        for k, v in trace_rays_vol(
            tables, fused, o, d, LR, interpret=True, **kw
        ).items()
    }
    return want, got


def _assert_match(want, got, pos_atol=1e-3):
    np.testing.assert_array_equal(got["air"], want["air"])
    hit = ~want["air"]
    np.testing.assert_array_equal(got["normal"][hit], want["normal"][hit])
    dp = np.abs(got["position"] - want["position"]).max(-1)
    assert dp[hit].max() < pos_atol, dp[hit].max()
    np.testing.assert_allclose(got["albedo"][hit], want["albedo"][hit], atol=1e-5)
    assert not got["exhausted"].any()


def test_matches_reference_dda_on_arbitrary_content(weird_world):
    fused, tables = weird_world
    o, d = _cam_rays((0.0, -80.0, 40.0), -0.4)
    want, got = _both(fused, tables, o, d)
    hit = ~want["air"]
    assert hit.sum() > 100  # scene actually visible
    _assert_match(want, got)


def test_floating_box_visible(weird_world):
    """Rays aimed at the floating box must hit it (the heightfield path
    cannot represent it at all) — and agree with the reference DDA."""
    fused, tables = weird_world
    # Box spans z 12..22, y -8..12, x -8..12 in world coords.
    o = np.tile(np.array([[2.0, -60.0, 17.0]], np.float32), (16, 1))
    d = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (16, 1))
    d[:, 0] = np.linspace(-0.12, 0.12, 16)
    want, got = _both(fused, tables, jnp.asarray(o), jnp.asarray(d))
    assert (~want["air"]).sum() >= 14  # most rays hit the box front face
    _assert_match(want, got)


@pytest.mark.slow
def test_generated_world_matches(full_world_volume):
    mats, mf = full_world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    tables = build_vol_tables(fused)
    o, d = _cam_rays((-30.0, -100.0, 60.0), -0.3)
    want, got = _both(fused, tables, o, d)
    # Terrain has knife-edge voxel corners where fp route differences can
    # flip a face: require near-exact rather than exact agreement.
    assert (got["air"] == want["air"]).mean() > 0.995
    hit = ~want["air"] & ~got["air"]
    assert (got["normal"][hit] == want["normal"][hit]).mean() > 0.99
    dp = np.abs(got["position"] - want["position"]).max(-1)
    assert (dp[hit] < 1e-2).mean() > 0.99
    close = hit & (dp < 1e-3)
    np.testing.assert_allclose(
        got["albedo"][close], want["albedo"][close], atol=1e-5
    )


def test_straggler_cascade_bit_identical(weird_world):
    """The straggler cascade (2 full-width rounds -> live-first partition
    -> quarter-width remainder -> safety loop -> order-restoring sort)
    must be bit-identical to the plain round loop: the marches are
    memoryless in (position, direction), only batch layout changes."""
    fused, tables = weird_world
    rng = np.random.default_rng(11)
    n = 5 * 2048  # several tiles so the quarter-width prefix is a real slice
    o = np.stack(
        [
            rng.uniform(-110, 110, n),
            rng.uniform(-110, 110, n),
            rng.uniform(30, 120, n),
        ],
        axis=-1,
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    plain = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, rounds=12, cascade=False
    )
    casc = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, rounds=12, cascade=True
    )
    for k in plain:
        np.testing.assert_array_equal(
            np.asarray(casc[k]), np.asarray(plain[k]), err_msg=k
        )

    # Composes with the active mask (bounce-leg contract): outputs match
    # on active lanes; inactive lanes are caller-masked by contract.
    act = jnp.asarray(rng.random(n) < 0.5)
    pa = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, rounds=12,
        cascade=False, active=act,
    )
    ca = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, rounds=12,
        cascade=True, active=act,
    )
    m = np.asarray(act)
    for k in pa:
        np.testing.assert_array_equal(
            np.asarray(ca[k])[m], np.asarray(pa[k])[m], err_msg=k
        )


def test_straggler_cascade_budget_boundary(weird_world):
    """Pin the cascade's budget contract AT the exhaustion boundary.

    With a tiny round budget (rounds=3) many rays exhaust, exercising the
    path where cascade and plain loop may legitimately diverge.  The
    contract (trace_rays_vol docstring): each cascade level is debited
    the rounds consumed before it, so no ray marches MORE than ``rounds``
    rounds — a ray the plain loop exhausts is exhausted by the cascade
    too (superset) — and every ray that terminates under both reports
    bit-identical results.  Rays that momentarily overflow a level's
    width may see fewer rounds (exhaust earlier), never more."""
    fused, tables = weird_world
    rng = np.random.default_rng(23)
    n = 5 * 2048
    o = np.stack(
        [
            rng.uniform(-110, 110, n),
            rng.uniform(-110, 110, n),
            rng.uniform(30, 120, n),
        ],
        axis=-1,
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    plain = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, rounds=3, cascade=False
    )
    casc = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, rounds=3, cascade=True
    )
    ex_p = np.asarray(plain["exhausted"])
    ex_c = np.asarray(casc["exhausted"])
    assert ex_p.any(), "boundary test needs rays that exhaust the budget"
    # Budget never exceeded: plain-exhausted => cascade-exhausted.
    np.testing.assert_array_equal(ex_c | ~ex_p, np.ones_like(ex_p))
    both_done = ~ex_p & ~ex_c
    assert both_done.any()
    for k in plain:
        np.testing.assert_array_equal(
            np.asarray(casc[k])[both_done],
            np.asarray(plain[k])[both_done],
            err_msg=k,
        )


def test_sky_and_bounds(weird_world):
    fused, tables = weird_world
    o = jnp.asarray([[0.5, 0.5, 110.0]] * 2, jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float32)
    got = {
        k: np.asarray(v)
        for k, v in trace_rays_vol(
            tables, fused, o, d, LR, interpret=True, rounds=2
        ).items()
    }
    assert got["air"].all()


def test_active_mask_skips_rays(weird_world):
    fused, tables = weird_world
    o = jnp.asarray([[0.5, -60.0, 20.0]] * 4, jnp.float32)
    d = jnp.asarray([[0.0, 1.0, -0.3]] * 4, jnp.float32)
    active = jnp.asarray([True, False, True, False])
    got = trace_rays_vol(
        tables, fused, o, d, LR, interpret=True, active=active, rounds=2
    )
    ref = trace_rays_vol(tables, fused, o, d, LR, interpret=True, rounds=2)
    # Active rays give real results; inactive rays' outputs are unspecified
    # (caller masks them) but must not poison the active lanes.
    np.testing.assert_allclose(
        np.asarray(got["position"])[[0, 2]],
        np.asarray(ref["position"])[[0, 2]],
        atol=1e-5,
    )


def test_occupancy_world_bounds():
    """Bounds = exact world-space AABB of occupied bricks for any lr,
    including non-brick-aligned windows (wrap-straddling slots count both
    pieces) and the empty volume (inverted box)."""
    from raytrace_tpu.ops.trace_vol_pallas import _occupancy_world_bounds

    rng = np.random.default_rng(3)
    any8b = np.zeros((32, 32, 32), bool)
    idx = rng.integers(0, 32, (40, 3))
    any8b[idx[:, 0], idx[:, 1], idx[:, 2]] = True

    for lr in [(0, 0, 0), (16, -48, 112), (-16, 0, 48), (5, -3, 250)]:
        got = np.asarray(
            _occupancy_world_bounds(
                jnp.asarray(any8b), jnp.asarray(lr, jnp.int32)
            )
        )
        occ_ax = [any8b.any((0, 1)), any8b.any((0, 2)), any8b.any((1, 2))]
        for axis in range(3):
            lo = lr[axis] - 128
            ts = np.concatenate(
                [np.arange(8 * bt, 8 * bt + 8) for bt in np.nonzero(occ_ax[axis])[0]]
            )
            ws = lo + ((ts - lo - 128) % 256)  # world coord of each texel
            assert got[2 * axis] == ws.min(), (axis, lr)
            assert got[2 * axis + 1] == ws.max() + 1, (axis, lr)

    empty = np.asarray(
        _occupancy_world_bounds(
            jnp.zeros((32, 32, 32), bool), jnp.zeros(3, jnp.int32)
        )
    )
    assert (empty[0::2] > empty[1::2]).all()  # inverted => every ray is sky


def test_escape_equivalence(weird_world):
    """escape=True completes sky rays early; hit results are bit-identical
    to escape=False and the air partition is unchanged."""
    fused, tables = weird_world
    for origin, pitch in [
        ((0.5, -60.0, 40.0), -0.4),  # toward terrain: mixed hit/sky
        ((0.5, -60.0, 40.0), 0.9),   # skyward: all air
        ((0.5, 0.5, -50.0), -1.2),   # inside the slab looking down
    ]:
        o, d = _cam_rays(origin, pitch)
        ref = {
            k: np.asarray(v)
            for k, v in trace_rays_vol(
                tables, fused, o, d, LR, interpret=True, escape=False
            ).items()
        }
        got = {
            k: np.asarray(v)
            for k, v in trace_rays_vol(
                tables, fused, o, d, LR, interpret=True
            ).items()
        }
        np.testing.assert_array_equal(got["air"], ref["air"], err_msg=str(pitch))
        np.testing.assert_array_equal(got["exhausted"], ref["exhausted"])
        hit = ~ref["air"]
        for k in ("position", "normal", "albedo", "distance"):
            np.testing.assert_array_equal(
                got[k][hit], ref[k][hit], err_msg=f"{k} pitch={pitch}"
            )


def test_escape_frames_bit_equal(weird_world):
    """Escaped air rays report different positions, but no g-buffer reads
    them: full frames must be bit-identical with escape on and off."""
    from raytrace_tpu.ops.trace_vol_pallas import render_gbuffers_vol
    from raytrace_tpu.utils.blue_noise import get_blue_noise_f32

    fused, tables = weird_world
    cam = Camera(origin=[0.5, -60.0, 40.0])
    cam.pitch = -0.3
    fwd, up, right = cam.scaled_basis()
    uni = dict(
        origin=jnp.asarray(cam.origin, jnp.float32),
        forward=jnp.asarray(fwd, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
        sun_angle=jnp.float32(0.6),
        seed=jnp.int32(7),
        lr=jnp.asarray(LR, jnp.float32),
    )
    bn = jnp.asarray(get_blue_noise_f32())
    on = render_gbuffers_vol(fused, tables, bn, uni, 32, 32, 512, bounces=1)
    off = render_gbuffers_vol(
        fused, tables, bn, uni, 32, 32, 512, bounces=1, escape=False
    )
    for k in on:
        np.testing.assert_array_equal(
            np.asarray(on[k]), np.asarray(off[k]), err_msg=k
        )


def test_pyramid_table_invariants():
    """any/all bit planes must be consistent with each other and the voxels."""
    rng = np.random.default_rng(0)
    solid = np.zeros((256, 256, 256), bool)
    solid[rng.integers(0, 256, 500), rng.integers(0, 256, 500),
          rng.integers(0, 256, 500)] = True
    solid[:40, :64, :64] = True  # one fully solid area
    fused = _fuse(solid)
    t = {k: np.asarray(v) for k, v in build_vol_tables(fused).items()}

    def unpack(words, n):
        bits = (words.reshape(-1)[:, None] >> np.arange(32)[None, :]) & 1
        return bits.reshape(-1)[:n].astype(bool)

    any8 = unpack(t["any8"], 32768).reshape(32, 32, 32)
    all8 = unpack(t["all8"], 32768).reshape(32, 32, 32)
    want_any = solid.reshape(32, 8, 32, 8, 32, 8).any((1, 3, 5))
    want_all = solid.reshape(32, 8, 32, 8, 32, 8).all((1, 3, 5))
    np.testing.assert_array_equal(any8, want_any)
    np.testing.assert_array_equal(all8, want_all)
    any16 = unpack(t["any_hi"][0], 4096).reshape(16, 16, 16)
    np.testing.assert_array_equal(
        any16, solid.reshape(16, 16, 16, 16, 16, 16).any((1, 3, 5))
    )
    # Detail rows (occupancy bits) reconstruct the exact voxel grid.
    det = np.asarray(t["detail"])
    bits = ((det.reshape(-1)[:, None] >> np.arange(32)[None, :]) & 1).astype(bool)
    vox = bits.reshape(32, 32, 32, 8, 8, 8)  # (bz,by,bx,lz,ly,lx)
    vox = vox.transpose(0, 3, 1, 4, 2, 5).reshape(256, 256, 256)
    np.testing.assert_array_equal(vox, solid)


@pytest.mark.slow
def test_pathological_content_reports_exhausted():
    """A volume where every brick is mixed exhausts the round budget for
    grazing rays without crashing (REPORT_ERROR pink-pixel analog)."""
    z = np.arange(256)
    solid = np.zeros((256, 256, 256), bool)
    solid[(z[:, None, None] + np.arange(256)[None, :, None] * 0
           + np.arange(256)[None, None, :]) % 9 == 0] = True
    fused = _fuse(solid)
    tables = build_vol_tables(fused)
    o = jnp.asarray([[-120.0, -120.0, 10.3]], jnp.float32)
    d = jnp.asarray([[1.0, 1.0, 0.001]], jnp.float32)
    got = trace_rays_vol(tables, fused, o, d, LR, interpret=True, rounds=2)
    # Either it found a hit within 2 rounds or it reported exhausted;
    # the call must complete and stay finite.
    assert np.isfinite(np.asarray(got["position"])).all()


def test_exhausted_resume_positions_chain_to_completion():
    """Exhausted rays must return their RAW resume position so a consumer
    can chain rounds: the round-3 "never-terminating tail" was resume
    positions being nudged 0.001 back across the face just crossed, which
    re-parked chained rays in the same brick forever
    (probes/out/r4_tail_forensics.log).

    Content: one solid voxel at every brick's min corner — every brick is
    mixed (parks every round) but a mid-brick grazing corridor never hits.
    A rounds=1 trace exhausts; chaining the returned positions must make
    at least one brick of progress per chain and finish as air."""
    solid = np.zeros((256, 256, 256), bool)
    solid[::8, ::8, ::8] = True
    fused = _fuse(solid)
    tables = build_vol_tables(fused)
    o = jnp.asarray([[90.5, 12.5, 12.5]], jnp.float32)
    d = jnp.asarray([[1.0, 0.0, 0.001]], jnp.float32)

    full = trace_rays_vol(tables, fused, o, d, LR, interpret=True)
    assert bool(full["air"][0]) and not bool(full["exhausted"][0])

    pos = o
    live = True
    along = [float(pos[0, 0])]
    for _ in range(12):
        got = trace_rays_vol(tables, fused, pos, d, LR, interpret=True, rounds=1)
        pos = got["position"]
        along.append(float(pos[0, 0]))
        if not bool(got["exhausted"][0]):
            assert bool(got["air"][0])
            live = False
            break
    assert not live, f"chained resume made no progress: x per chain = {along}"
    # Strict forward progress along the ray every chained round.
    assert all(b > a + 0.5 for a, b in zip(along, along[1:])), along


def test_parallel_resolve_matches_serial(weird_world):
    """The one-pass parallel resolve (all candidate crossings at once) must
    agree with the serial march on every discrete output — air, normal,
    exhausted, albedo — and on positions to eps scale (the two place hit
    points the same eps past the same face; only fp op order differs, plus
    the sliding of that eps along grazing faces, bounded ~1e-2)."""
    fused, tables = weird_world
    rng = np.random.default_rng(7)
    n = 4096
    o = jnp.asarray(
        np.stack(
            [
                rng.uniform(-120, 120, n),
                rng.uniform(-120, 120, n),
                rng.uniform(-20, 120, n),
            ],
            -1,
        ),
        jnp.float32,
    )
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    a = {
        k: np.asarray(v)
        for k, v in trace_rays_vol(
            tables, fused, o, d, LR, interpret=True, resolve="serial"
        ).items()
    }
    b = {
        k: np.asarray(v)
        for k, v in trace_rays_vol(
            tables, fused, o, d, LR, interpret=True, resolve="parallel"
        ).items()
    }
    np.testing.assert_array_equal(a["air"], b["air"])
    np.testing.assert_array_equal(a["exhausted"], b["exhausted"])
    hit = ~a["air"] & ~a["exhausted"]
    assert hit.sum() > 500
    np.testing.assert_array_equal(a["normal"][hit], b["normal"][hit])
    np.testing.assert_allclose(a["albedo"][hit], b["albedo"][hit], atol=1e-6)
    dp = np.abs(a["position"] - b["position"]).max(-1)
    assert dp[hit].max() < 2e-2, dp[hit].max()


def test_hit_albedo_matches_volume_material(weird_world):
    """The end-of-trace material gather must return exactly the hit voxel's
    packed albedo bits from the fused volume (toroidal addressing)."""
    fused, tables = weird_world
    o, d = _cam_rays((0.0, 0.0, 120.0), -0.6)
    got = trace_rays_vol(tables, fused, o, d, LR, interpret=True)
    hit = ~np.asarray(got["air"])
    assert hit.any()
    vol = np.asarray(fused).reshape(256, 256, 256)
    pos = np.asarray(got["position"])[hit]
    # Undo the 0.001 normal nudge to land inside the hit voxel.
    from raytrace_tpu.ops import shading

    nrm = np.asarray(got["normal"])[hit]
    nx, ny, nz = shading.face_normal_vector(np, nrm)
    pos = pos - 0.001 * np.stack([nx, ny, nz], axis=-1)
    t = np.floor(pos + 128.0).astype(np.int64) % 256
    packed = vol[t[:, 2], t[:, 1], t[:, 0]]
    from raytrace_tpu.ops.trace_jax import MATERIAL_MASK

    want = np.stack(
        [
            ((packed & MATERIAL_MASK) >> 14) & 0x7F,
            ((packed & MATERIAL_MASK) >> 7) & 0x7F,
            (packed & MATERIAL_MASK) & 0x7F,
        ],
        axis=-1,
    ).astype(np.float32) / 127.0
    np.testing.assert_allclose(
        np.asarray(got["albedo"])[hit], want, atol=1e-6
    )


def test_update_vol_tables_matches_full_rebuild(weird_world):
    """After a 16-thick slab write, the incremental table update must equal
    a full rebuild bit-for-bit on every table."""
    from raytrace_tpu.ops.trace_vol_pallas import update_vol_tables

    fused, tables = weird_world
    vol3 = np.asarray(fused).reshape(256, 256, 256).copy()
    rng = np.random.default_rng(7)
    for arr_axis, t0 in ((0, 32), (1, 240), (2, 0)):
        sl = [slice(None)] * 3
        sl[arr_axis] = slice(t0, t0 + 16)
        # New content: zero 30% of the slab's words.
        region = vol3[tuple(sl)]
        mask = rng.random(region.shape) < 0.3
        vol3[tuple(sl)] = np.where(mask, 0, region)
        new_fused = jnp.asarray(vol3.reshape(-1))
        # Minefield consistency doesn't matter for tables (they read only
        # step==0 and material bits), so the raw edit is fine here.
        from raytrace_tpu.ops.trace_vol_pallas import build_vol_tables

        want = build_vol_tables(new_fused)
        got = update_vol_tables(tables, new_fused, t0, arr_axis)
        for k in want:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]), err_msg=f"{k} ax{arr_axis}"
            )
        tables = got
