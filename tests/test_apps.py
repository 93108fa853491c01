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

    n, dt = run(out_dir=tmp_path, limit=2, pipeline=cheap_pipeline)
    files = sorted(p.name for p in tmp_path.iterdir())
    assert "manifest.json" in files
    assert "view_00000.png" in files and "view_00001.png" in files
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    assert len(manifest) == 2
    assert manifest[0]["file"] == "view_00000.png"
    assert "sun_angle" in manifest[0]


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
