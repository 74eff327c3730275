"""Outage-proof bench drills (VERDICT r4 #2).

BENCH_r04.json was lost because one transient relay refusal at init killed
the whole run with rc=1 and no output.  These tests drill the three
defenses without a TPU:

- ``_wait_for_backend`` retries a failing backend with backoff and
  succeeds once the backend recovers,
- a crash mid-run still emits a JSON line with every metric measured so
  far (from ``bench_progress.json``) and exits 0,
- ``_flush_progress`` persists partial metrics atomically.
"""

import json
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def test_wait_for_backend_retries_then_succeeds(monkeypatch):
    import jax

    calls = {"n": 0}
    real_devices = jax.devices

    def flaky_devices(*a, **k):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("UNAVAILABLE: backend init refused")
        return real_devices(*a, **k)

    sleeps = []
    monkeypatch.setattr(jax, "devices", flaky_devices)
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    bench._wait_for_backend(max_wait_s=600)
    assert calls["n"] == 3
    # backoff grows 10, 20, ... capped at 60
    assert sleeps == [10.0, 20.0]


def test_wait_for_backend_gives_up_after_window(monkeypatch):
    import jax

    def dead(*a, **k):
        raise RuntimeError("UNAVAILABLE")

    t = {"now": 0.0}
    monkeypatch.setattr(jax, "devices", dead)
    monkeypatch.setattr(bench.time, "time", lambda: t["now"])

    def advance(s):
        t["now"] += s

    monkeypatch.setattr(bench.time, "sleep", advance)
    with pytest.raises(RuntimeError):
        bench._wait_for_backend(max_wait_s=50)


def test_crash_midrun_preserves_partial_metrics(tmp_path, monkeypatch,
                                                capsys):
    monkeypatch.setattr(bench, "PROGRESS_PATH",
                        str(tmp_path / "bench_progress.json"))

    def body():
        out = {"metric": "beam_decode_captions_per_sec", "value": 21788.0,
               "unit": "captions/sec/chip", "vs_baseline": 2801.0}
        bench._flush_progress(out)
        out["train_step_ms_fused"] = 3.21
        bench._flush_progress(out)
        raise RuntimeError("relay died mid-run")

    rc = bench.run_with_recovery(body)
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] == 21788.0
    assert rec["train_step_ms_fused"] == 3.21
    assert "relay died mid-run" in rec["crashed"]


def test_crash_with_nothing_measured_exits_nonzero(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "PROGRESS_PATH",
                        str(tmp_path / "bench_progress.json"))

    def body():
        bench._flush_progress({"metric": "beam_decode_captions_per_sec",
                               "value": None,
                               "unit": "captions/sec/chip",
                               "vs_baseline": None})
        raise RuntimeError("backend never came up")

    assert bench.run_with_recovery(body) == 1


def test_flush_progress_is_readable_json(tmp_path, monkeypatch):
    p = tmp_path / "bench_progress.json"
    monkeypatch.setattr(bench, "PROGRESS_PATH", str(p))
    bench._flush_progress({"a": 1, "b": [1, 2.5, None]})
    assert json.loads(p.read_text()) == {"a": 1, "b": [1, 2.5, None]}
