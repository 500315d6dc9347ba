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


def test_main_fails_fast_with_json_error(monkeypatch, capsys):
    monkeypatch.setattr(bench, "device_reachable",
                        lambda t: (False, "TPU relay down?"))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--quick"])
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
