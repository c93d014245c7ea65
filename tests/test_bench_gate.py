"""Run-level bench load gate (r7 judge finding: BENCH_r07 was captured at
load1 10.5 and overstated the write family ~1.7x; the per-entry median/best
retry cannot catch uniformly-loaded repeats, so the RUN must be gated)."""

from __future__ import annotations

import bench


def _patch_loads(monkeypatch, loads):
    seq = list(loads)

    def fake_loadavg():
        return [seq.pop(0) if len(seq) > 1 else seq[0], 0.0, 0.0]

    monkeypatch.setattr(bench, "_loadavg", fake_loadavg)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)


class TestLoadGate:
    def test_quiet_host_passes_immediately(self, monkeypatch):
        _patch_loads(monkeypatch, [0.5])
        gate = bench._load_gate()
        assert not gate["aborted"]
        assert gate["waited_s"] == 0.0
        assert gate["load1_at_gate"] == 0.5

    def test_loaded_host_waits_until_quiet(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD1", "4.0")
        monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_WAIT_S", "900")
        _patch_loads(monkeypatch, [10.5, 8.0, 2.1])
        gate = bench._load_gate()
        assert not gate["aborted"]
        assert gate["waited_s"] > 0
        assert gate["load1_at_gate"] == 10.5
        assert gate["load1_at_gate_pass"] == 2.1

    def test_persistently_loaded_host_aborts(self, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_BENCH_MAX_LOAD1", "4.0")
        monkeypatch.setenv("SPARK_GRAFT_BENCH_LOAD_WAIT_S", "60")
        _patch_loads(monkeypatch, [10.5])
        gate = bench._load_gate()
        assert gate["aborted"]
        assert gate["waited_s"] >= 60
        assert gate["load1_at_gate_pass"] == 10.5

    def test_no_loadavg_means_no_gating(self, monkeypatch):
        monkeypatch.setattr(bench, "_loadavg", lambda: None)
        gate = bench._load_gate()
        assert not gate["aborted"]
        assert gate["load1_at_gate"] is None
