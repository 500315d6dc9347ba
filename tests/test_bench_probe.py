"""bench.py's fail-fast device probe.

The driver runs ``python bench.py`` unattended at round end; through the
axon relay a dead tunnel makes the first device op hang forever (CLAUDE.md
"Environment gotchas"), which would cost the round its recorded benchmark.
The probe bounds that: a child process touches the device and the parent
either proceeds or emits one explanatory JSON line and exits 2.
"""
import json
import sys

import pytest

import bench


def test_probe_times_out_bounded():
    # 0.3 s is below any possible jax import+init time, so this returns
    # (False, ...) deterministically on every platform — healthy or hung —
    # proving the probe cannot itself wedge the caller.
    ok, detail = bench.device_reachable(timeout_s=0.3)
    assert not ok
    assert detail  # explanatory, not empty


def test_deadline_watchdog_aborts_with_json_error():
    # 2 s is below any possible bench completion (compile + the timed
    # blocks are tens of seconds even on CPU), so the watchdog fires
    # deterministically — pinning the mid-run-hang escape hatch. The child
    # must force CPU via jax.config (NOT the env var: the sitecustomize
    # latch beats it — CLAUDE.md) or this test would dispatch real relay
    # work and could wedge a concurrently running chip process.
    import subprocess

    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy, sys; "
            "sys.argv = ['bench.py', '--quick', '--probe-timeout', '0', "
            "'--deadline', '2']; "
            "runpy.run_path('bench.py', run_name='__main__')")
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=120,
                       cwd=bench.REPO)
    assert r.returncode == 3
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert "deadline" in row["error"]


def test_fused_extra_rows_and_crash_guard(monkeypatch, capsys):
    # the default full run appends opportunistic fused-heads rows at 608;
    # a fused-path failure must land in that row's "error" field, never
    # cost the already-measured headline
    calls = []

    def fake_tpu(graph, prms, frames, iters, **kw):
        calls.append(("bf16", frames.shape[1], kw.get("fused_heads")))
        if kw.get("fused_heads"):
            raise RuntimeError("mosaic lowering failed")
        return 100.0, [100.0, 99.0]

    def fake_int8(graph, prms, frames, iters, **kw):
        calls.append(("int8", frames.shape[1], kw.get("fused_heads")))
        return 200.0, [200.0, 199.0]

    monkeypatch.setattr(bench, "measure_tpu", fake_tpu)
    monkeypatch.setattr(bench, "measure_tpu_int8", fake_int8)
    monkeypatch.setattr(bench, "torch_baseline",
                        lambda *a, **k: {"img_s": 1.0, "std": 0.0})
    monkeypatch.setattr(sys, "argv",
                        ["bench.py", "--cfg", "yolov3-tiny.cfg", "--batch",
                         "2", "--deadline", "0", "--probe-timeout", "0"])
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    rows = out["rows"]
    assert out["value"] == 100.0  # headline untouched by the fused failure
    fb = rows["yolov3-tiny@608 batch2 bf16 fused-heads"]
    assert "mosaic lowering failed" in fb["error"] and fb["fused_heads"]
    fq = rows["yolov3-tiny@608 batch2 int8 fused-heads"]
    assert fq["img_s"] == 200.0 and fq["fused_heads"] is True
    # standard rows measured unfused; only the extras passed fused=True
    assert ("bf16", 608, True) in calls and ("bf16", 608, False) in calls


def test_fail_row_preserves_partial_rows():
    import argparse

    ns = argparse.Namespace(cfg="yolov3.cfg", size=None, batch=128,
                            precision="bf16")
    rows = {"yolov3@608 batch128 bf16": {"img_s": 907.0,
                                         "vs_baseline": 1400.0}}
    row = json.loads(bench._fail_row(ns, "wedged", rows=rows))
    # a mid-run wedge after the headline completed still reports it
    assert row["value"] == 907.0 and row["vs_baseline"] == 1400.0
    assert row["rows"] == rows and row["error"] == "wedged"


def _retry_args(**kw):
    import argparse

    ns = argparse.Namespace(probe_timeout=180.0, probe_retry_budget=1800.0,
                            deadline=3600.0)
    vars(ns).update(kw)
    return ns


def test_probe_retry_recovers(monkeypatch):
    # round-4 lesson: a transient relay blip must cost minutes, not the
    # round's whole bench. Two failures then a recovery → ok, with the
    # attempt count surfaced for the driver log.
    import time as _time

    results = iter([(False, "down"), (False, "down"), (True, "axon 1024.0")])
    sleeps = []
    monkeypatch.setattr(bench, "device_reachable",
                        lambda t: next(results))
    monkeypatch.setattr(_time, "sleep", sleeps.append)
    monkeypatch.setattr(bench, "_T0", _time.perf_counter())
    ok, detail = bench._probe_with_retry(_retry_args())
    assert ok and "recovered on probe attempt 3" in detail
    assert sleeps == [30.0, 60.0]  # backoff doubles


def test_probe_retry_gives_up_within_budget(monkeypatch):
    # an always-dead relay still produces the error row, and the loop never
    # schedules an attempt whose worst case (sleep + hung probe) would
    # overrun the budget — the deadline watchdog must keep its headroom
    import time as _time

    calls = []
    monkeypatch.setattr(bench, "device_reachable",
                        lambda t: (calls.append(t) or (False, "down")))
    slept = []
    monkeypatch.setattr(_time, "sleep", slept.append)
    monkeypatch.setattr(bench, "_T0", _time.perf_counter())
    # budget admits the first attempt plus exactly one retry
    # (30 + 180 = 210 <= 230, but the next worst case 60 + 180 = 240 > 230)
    ok, detail = bench._probe_with_retry(
        _retry_args(probe_timeout=180.0, probe_retry_budget=230.0,
                    deadline=0.0))
    assert not ok and "gave up after" in detail
    assert len(calls) == 2 and slept == [30.0]


def test_probe_retry_budget_zero_is_single_attempt(monkeypatch):
    calls = []
    monkeypatch.setattr(bench, "device_reachable",
                        lambda t: (calls.append(t) or (False, "down")))
    ok, _ = bench._probe_with_retry(_retry_args(probe_retry_budget=0.0))
    assert not ok and len(calls) == 1


def test_main_fails_fast_with_json_error(monkeypatch, capsys):
    monkeypatch.setattr(bench, "device_reachable",
                        lambda t: (False, "TPU relay down?"))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quick",
                                      "--probe-retry-budget", "0"])
    with pytest.raises(SystemExit) as e:
        bench.main()
    assert e.value.code == 2
    row = json.loads(capsys.readouterr().out.strip())
    assert row["error"].startswith("device unreachable")
    assert row["value"] == 0.0 and row["unit"] == "img/s"
    # the metric line must key exactly like the success headline
    # (model@size batch precision) so the error row joins BASELINE.json
    assert "yolov3-tiny@416" in row["metric"]
    assert "batch8" in row["metric"] and "bf16" in row["metric"]


def test_latency_row_congestion_semantics():
    """chip_ms_est is the p50-minus-RTT-control split when the control is
    sane, and null + rtt_congested when the control exceeds the dispatch
    (congested relay — a clamped 0.0 would read as 'zero chip time')."""
    lat = [46.0, 46.1, 46.2, 45.9, 46.0]
    row = bench.latency_row(lat, rtt_p50=37.3, batch=1)
    assert row["rtt_congested"] is False
    assert abs(row["chip_ms_est"] - (row["p50_ms"] - 37.3)) < 0.02
    assert row["img_s_sync"] == pytest.approx(1000.0 / row["p50_ms"], rel=0.01)

    row = bench.latency_row(lat, rtt_p50=72.4, batch=1)
    assert row["rtt_congested"] is True
    assert row["chip_ms_est"] is None
