"""Headline-bench harness behavior that must not regress.

The round-2 bench record was lost to a raw traceback when the TPU tunnel
relay died mid-round (BENCH_r02.json rc=1); bench.py now probes the
backend in a killable subprocess, retries with backoff, and emits ONE
structured JSON line on outage.  These tests pin that contract without
touching a real backend.
"""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


def test_outage_emits_structured_json_line(monkeypatch, capsys):
    """Dead tunnel -> one parseable JSON line with error=tpu_unreachable
    and rc=1; never a traceback tail."""
    monkeypatch.setattr(bench, "_probe_backend_once", lambda: False)
    monkeypatch.setattr(bench, "OUTAGE_BUDGET_S", 0.01)
    monkeypatch.setattr(bench, "RETRY_SLEEP_S", 0.01)
    rc = bench.main()
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["error"] == "tpu_unreachable"
    assert rec["metric"] == "path_trace_throughput"


def test_midrun_backend_death_is_structured(monkeypatch, capsys):
    """A backend that dies after the probe succeeds still yields the
    structured line, not a stack trace."""
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: True)

    def boom():
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend"
        )

    monkeypatch.setattr(bench, "_run", boom)
    rc = bench.main()
    assert rc == 1
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["error"] == "tpu_unreachable"
    assert "backend died mid-run" in rec["detail"]


def test_unrelated_runtime_errors_still_raise(monkeypatch):
    """Only backend-unavailability is swallowed into the outage line; real
    bugs must surface."""
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: True)

    def boom():
        raise RuntimeError("shape mismatch somewhere")

    monkeypatch.setattr(bench, "_run", boom)
    try:
        bench.main()
    except RuntimeError as e:
        assert "shape mismatch" in str(e)
    else:
        raise AssertionError("unrelated RuntimeError was swallowed")


@pytest.mark.slow  # real 256^3 worldgen + device slab application (~45 s)
def test_warmup_drain_reaches_move_towards_fixed_point():
    """bench._run converges streaming by draining the streamer directly
    (avoiding a second multi-minute draw_frame compile on the TPU).  That
    is only equivalent to the old N-draw_frame warmup if the drain loop
    reaches the unique move_towards fixed point: afterwards a draw_frame
    step (one request + one setup, pipeline.py draw_frame) must be a
    no-op on the streamer state."""
    from raytrace_tpu.render.streaming import TerrainStreamer

    s = TerrainStreamer(seed=0)
    s.initialize()
    target = (-30.0, 0, 60.0)  # bench camera (x, 0, z)
    for _ in range(24):
        s.request_move_towards(target)
        if not s.setup_next_request():
            break
    lr = s.get_render_offset()
    assert lr[1] == 0  # never recenters along Y (pipeline.rs:175-179)
    # One more draw_frame-style step: state must not move.
    s.request_move_towards(target)
    assert s.setup_next_request() is False
    assert s.get_render_offset() == lr


@pytest.mark.slow  # spawns a real probe subprocess (up to 30 s on a hang)
def test_probe_rejects_cpu_only(monkeypatch):
    """The subprocess probe must NOT count jax's CPU fallback as a usable
    accelerator (a CPU 'bench run' is the hang the probe exists to stop).
    This host has no reachable TPU in test runs, so the real probe either
    times out (relay hang) or sees CPU-only — both must read unreachable."""
    monkeypatch.setattr(bench, "PROBE_TIMEOUT_S", 30)
    assert bench._probe_backend_once() is False
