"""Engine tests: controls edge detection, camera movement, CLI override."""

import math

import numpy as np

from raytrace_tpu.engine.controls import ControlSet
from raytrace_tpu.engine.game import Game
from raytrace_tpu.render.camera import compute_triple_euler_vector


def test_controls_edges():
    c = ControlSet()
    c.add_control("fwd", "w")
    assert not c.is_held("fwd")
    c.on_pressed("w")
    assert c.is_held("fwd") and c.is_pressed("fwd") and not c.is_released("fwd")
    c.tick()
    assert c.is_held("fwd") and not c.is_pressed("fwd")
    c.on_released("w")
    assert not c.is_held("fwd") and c.is_released("fwd")
    c.tick()
    assert not c.is_released("fwd")
    # Unknown names/codes are ignored.
    c.on_pressed("zzz")
    assert not c.is_held("nope")


def test_camera_basis_orthonormal():
    for heading, pitch in [(0.0, 0.0), (1.2, -0.7), (math.pi / 2, 0.3)]:
        f, u, r = compute_triple_euler_vector(heading, pitch)
        f, u, r = np.array(f), np.array(u), np.array(r)
        assert abs(np.dot(f, u)) < 1e-6
        assert abs(np.linalg.norm(f) - 1) < 1e-6
        np.testing.assert_allclose(np.cross(f, u), r, atol=1e-6)
    # Default heading pi/2 faces +Y (render/mod.rs:14-31).
    f, _, _ = compute_triple_euler_vector(math.pi / 2, 0.0)
    np.testing.assert_allclose(f, [0, 1, 0], atol=1e-6)


def test_game_movement():
    g = Game()
    assert g.camera.origin == [-30.0, -128.0, 100.0]
    g.controls.on_pressed("w")
    g.tick(1.0)
    # Default heading pi/2: forward is +Y at 50 units/s (game/mod.rs:89-95).
    assert abs(g.camera.origin[1] - (-128.0 + 50.0)) < 1e-4
    g.controls.on_released("w")
    g.controls.tick()
    g.controls.on_pressed("r")
    g.tick(0.5)
    assert abs(g.sun_angle - 0.5) < 1e-6


def test_game_cli_override():
    g = Game(["1", "2", "3", "0.5", "-0.25", "1.5"])
    assert g.camera.origin == [1.0, 2.0, 3.0]
    assert g.camera.heading == 0.5
    assert g.camera.pitch == -0.25
    assert g.sun_angle == 1.5


def test_perf_ring_buffer():
    from raytrace_tpu.utils.perf import RingBufferAverage

    r = RingBufferAverage(4)
    for v in (1.0, 2.0, 3.0):
        r.push_sample(v)
    assert abs(r.average() - 2.0) < 1e-9
    assert r.max() == 3.0
    for v in (4.0, 5.0):
        r.push_sample(v)
    assert r.max() == 5.0  # window slid past the 1.0
