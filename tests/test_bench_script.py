"""bench.py (the driver's judged entry point) — retry and degradation.

The reference ships no benchmark suite (README.md:15); bench.py is this
rebuild's. The relay occasionally drops sessions mid-run
(FailedPrecondition), so the script retries each tier once and reports
the exact-tier headline even if the turbo rider fails.
"""

import json

import jax
import pytest

import bench
import nbody_tpu.bench_lib as bench_lib


def _fake_result(value=123.0):
    return {
        "metric": "GInteractions/s", "value": value, "unit": "GInter/s",
        "vs_baseline": value / 300.0, "ms_per_step": 1.0,
        "ginter_min": value, "ginter_max": value, "spread_pct": 0.0,
        "compile_plus_warmup_s": 0.1, "finite": True,
    }


def test_bench_retries_once_on_transient(monkeypatch, capsys):
    calls = []

    def flaky(**kw):
        calls.append(kw["impl"])
        if len(calls) == 1:
            raise RuntimeError("FailedPrecondition: session dropped")
        return _fake_result()

    monkeypatch.setattr(bench_lib, "run_benchmark", flaky)
    monkeypatch.setenv("NBODY_BENCH_TURBO", "0")
    assert bench.main() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 123.0
    assert len(calls) == 2          # failed once, retried, succeeded


def test_bench_reports_headline_when_turbo_dies(monkeypatch, capsys):
    def tiered(**kw):
        if kw["impl"] == "pallas_sym_turbo":
            raise RuntimeError("FailedPrecondition: session dropped")
        return _fake_result(307.0)

    monkeypatch.setattr(bench_lib, "run_benchmark", tiered)
    # Force the TPU branch so the turbo rider is attempted on CPU CI.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("NBODY_BENCH_TURBO", "1")
    assert bench.main() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 307.0
    assert "turbo" not in rec
    assert "FailedPrecondition" in rec["turbo_error"]


def test_bench_turbo_rider_rides_along(monkeypatch, capsys):
    def tiered(**kw):
        return _fake_result(
            410.0 if kw["impl"] == "pallas_sym_turbo" else 307.0)

    monkeypatch.setattr(bench_lib, "run_benchmark", tiered)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("NBODY_BENCH_TURBO", "1")
    assert bench.main() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 307.0
    assert rec["turbo"]["value"] == 410.0
