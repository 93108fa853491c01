"""App-level smoke tests (CPU backend, cheap injected pipelines)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from raytrace_tpu.ops.trace_jax import fuse_volume
from raytrace_tpu.render.pipeline import Pipeline


@pytest.fixture()
def cheap_pipeline(full_world_volume):
    mats, mf = full_world_volume
    fused = fuse_volume(jnp.asarray(mats), jnp.asarray(mf))
    return Pipeline(
        width=48, height=48, max_steps=128, tracer="volume",
        preloaded_volume=fused,
    )


@pytest.mark.slow
def test_capture_run_writes_pngs_and_manifest(cheap_pipeline, tmp_path):
    from raytrace_tpu.apps.capture import run

    n, dt = run(out_dir=tmp_path, limit=2, pipeline=cheap_pipeline, fmt="png")
    files = sorted(p.name for p in tmp_path.iterdir())
    assert "manifest.json" in files
    assert "view_00000.png" in files and "view_00001.png" in files
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert len(manifest) == 2
    assert manifest[0]["file"] == "view_00000.png"
    assert "sun_angle" in manifest[0]


@pytest.mark.slow
def test_capture_run_dat_format(cheap_pipeline, tmp_path):
    """Default format: raw u8 RGB bytes + shape/dtype in the manifest
    (reference-sweep .dat parity) — the cheapest on-disk encoding."""
    from raytrace_tpu.apps.capture import run

    n, dt = run(out_dir=tmp_path, limit=2, pipeline=cheap_pipeline)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert manifest[0]["file"] == "view_00000.dat"
    assert manifest[0]["shape"] == [48, 48, 3]
    raw = np.fromfile(tmp_path / "view_00000.dat", np.uint8)
    assert raw.size == 48 * 48 * 3


def test_flythrough_run_scripted(cheap_pipeline, monkeypatch):
    from raytrace_tpu.apps import flythrough

    # Inject the cheap pipeline by patching the constructor the app uses.
    monkeypatch.setattr(
        "raytrace_tpu.apps.flythrough.Pipeline", lambda **kw: cheap_pipeline
    )
    frame, avg, mx = flythrough.run(
        ["0", "0", "60", "1.5708", "-0.3", "0.6"],
        frames=3,
        width=48,
        height=48,
        script=[(0, "press", "w"), (2, "release", "w")],
        quiet=True,
    )
    assert frame.shape == (48, 48, 3)
    assert np.isfinite(frame).all()


def test_flythrough_edit_key_places_block(cheap_pipeline, monkeypatch):
    """The scripted/live 'b' key writes a box ahead of the camera through
    Pipeline.edit_box and the next frame shows it.  Static camera + seed
    reset make the no-edit run bit-reproducible, so the difference is the
    edit, not noise."""
    from raytrace_tpu.apps import flythrough

    def make(**kw):
        cheap_pipeline.uniforms.seed = 0
        return cheap_pipeline

    monkeypatch.setattr("raytrace_tpu.apps.flythrough.Pipeline", make)
    cam = ["0", "0", "60", "1.5708", "-0.3", "0.6"]
    common = dict(frames=2, width=48, height=48, quiet=True)
    base, *_ = flythrough.run(cam, script=[], **common)
    again, *_ = flythrough.run(cam, script=[], **common)
    np.testing.assert_array_equal(base, again)  # determinism control
    edited, *_ = flythrough.run(cam, script=[(1, "press", "b")], **common)
    assert not np.array_equal(base, edited)


def test_terminal_input_hold_release(monkeypatch):
    """TerminalInput.pump: a received key is held for hold_frames frames,
    then released (terminals deliver key-down only; key-repeat refreshes)."""
    from raytrace_tpu.apps.flythrough import TerminalInput
    from raytrace_tpu.engine.controls import ControlSet

    ti = object.__new__(TerminalInput)  # skip the tty-mode __init__
    ti._hold = {k: 0 for k in TerminalInput.KEYS}
    ti._hold_frames = 2
    ti.quit = False

    controls = ControlSet()
    controls.add_control("forward", "w")

    pending = ["w"]

    class FakeSelect:
        @staticmethod
        def select(r, w_, x, t):
            return ([1] if pending else [], [], [])

    class FakeStdin:
        @staticmethod
        def read(n):
            return pending.pop(0)

    import select as select_mod
    import sys as sys_mod

    monkeypatch.setattr(select_mod, "select", FakeSelect.select)
    monkeypatch.setattr(sys_mod, "stdin", FakeStdin)

    ti.pump(controls)
    assert controls.is_held("forward")
    controls.tick()
    ti.pump(controls)  # hold frame 2
    assert controls.is_held("forward")
    controls.tick()
    ti.pump(controls)  # expired -> released
    assert not controls.is_held("forward")
    pending.append("\x1b")
    ti.pump(controls)
    assert ti.quit
