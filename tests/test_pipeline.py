"""End-to-end frame pipeline tests (CPU backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.engine.game import Game
from raytrace_tpu.ops.trace_jax import fuse_volume
from raytrace_tpu.render.pipeline import Pipeline


@pytest.fixture()
def pipeline(full_world_volume):
    mats, mf = full_world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    # Preload the cached world (identical content) to skip initialize-time
    # generation on the slow CPU backend.
    return Pipeline(
        width=64,
        height=64,
        max_steps=256,
        tracer="volume",
        preloaded_volume=fused,
    )


def test_draw_frame_produces_finite_image(pipeline):
    game = Game()
    frame = np.asarray(pipeline.draw_frame(game.camera, 0.6))
    assert frame.shape == (64, 64, 3)
    assert np.isfinite(frame).all()
    assert frame.std() > 0.01  # not a constant image
    assert pipeline.uniforms.seed == 1


def test_frame_loop_with_streaming(pipeline):
    """Moving the camera +x past the slice threshold triggers exactly one
    slice upload per frame and shifts the render offset."""
    game = Game(["40", "0", "60", "1.5708", "-0.3", "0.6"])
    f1 = pipeline.draw_frame(game.camera, 0.6)
    assert pipeline.streamer.get_render_offset() == (16, 0, 0)
    f2 = np.asarray(pipeline.draw_frame(game.camera, 0.6))
    assert pipeline.streamer.get_render_offset() == (32, 0, 0)
    assert np.isfinite(f2).all()


def test_seed_advances_and_wraps(pipeline):
    game = Game()
    pipeline.uniforms.seed = 512 * 512 * 4 - 1
    pipeline.draw_frame(game.camera, 0.0)
    assert pipeline.uniforms.seed == 0


def test_validate_mode_runs(capsys):
    """Pipeline(validate=True) performs per-frame finite/limiter checks
    (the reference's debug-build validation layers, debug.rs:52-110)."""
    from raytrace_tpu.render.camera import Camera
    from raytrace_tpu.render.pipeline import Pipeline

    p = Pipeline(width=32, height=32, max_steps=64, tracer="hf", validate=True)
    cam = Camera(origin=[-30.0, -100.0, 60.0])
    cam.pitch = -0.3
    frame = p.draw_frame(cam, 0.6)
    import numpy as np

    assert np.isfinite(np.asarray(frame)).all()
