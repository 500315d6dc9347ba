"""Benchmark harness — prints ONE JSON line for the driver.

Tracked metric (BASELINE.json): images/sec/chip @608 batch end-to-end
inference (uint8 frames → on-device preprocess → forward → decode → batched
NMS). ``vs_baseline`` is the ratio against the measured reference-equivalent
PyTorch-CPU pipeline (torch module-list forward + host numpy NMS — the
reference's structure per SURVEY.md §3.1), denominator cached in
``BENCH_TORCH_BASELINE.json`` after first measurement.

Real darknet weights are not downloadable in this environment (zero egress);
both sides run the same synthesized weights — throughput is weight-agnostic.

Usage: python bench.py [--quick] [--batch 32] [--size 608] [--remeasure-baseline]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
BASELINE_CACHE = REPO / "BENCH_TORCH_BASELINE.json"

# rows measured so far this run — the deadline watchdog includes them in its
# error line, so a mid-run wedge (dead relay, bad kernel) never discards the
# rows that DID complete
_PARTIAL = {}
_T0 = time.perf_counter()


def device_reachable(timeout_s: float = 180.0):
    """Bounded device-reachability probe, run in a CHILD process.

    Through the axon relay a dead tunnel makes the first device op hang
    forever — no error, no timeout (CLAUDE.md "Environment gotchas"). If
    that happens inside the driver's end-of-round bench run, the round
    records nothing. Touching the device in a subprocess bounds the hang:
    the child either completes a tiny device op (relay healthy, or jax fell
    back to another platform — bench then measures whatever it would have
    measured anyway) or is killed at ``timeout_s`` and the caller can emit
    an explanatory failure instead of wedging. Returns (ok, detail).
    """
    import subprocess
    import sys

    src = ("import jax\n"
           "d = jax.devices()[0]\n"
           "import jax.numpy as jnp\n"
           "print(d.platform, float(jnp.sum(jnp.ones((8, 128)))))\n")
    try:
        r = subprocess.run([sys.executable, "-c", src], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return False, (f"device probe hung >{timeout_s:.0f}s "
                       f"(TPU relay down?)")
    if r.returncode != 0:
        return False, (r.stderr or "device probe failed").strip()[-400:]
    return True, r.stdout.strip()


def _probe_with_retry(args):
    """Startup probe with bounded retry-with-backoff.

    Round-4 lesson (VERDICT r4 item 1): a single-attempt probe forfeited the
    whole round's driver bench on one transient relay outage, while the
    deadline watchdog would happily have bounded a much longer wait. So:
    keep re-probing with backoff (30 → 60 → 120 → 180 s sleeps) while the
    retry budget allows, leaving headroom under ``--deadline`` for the run
    itself (healthy full runs finish well under 30 min). Per-attempt timeout
    and the error-JSON-on-final-failure semantics are unchanged; a recovered
    relay proceeds into the normal run. Returns (ok, detail).
    """
    ok, detail = device_reachable(args.probe_timeout)
    if ok or args.probe_retry_budget <= 0:
        return ok, detail
    budget = args.probe_retry_budget
    if args.deadline > 0:
        # leave at least 25 min of deadline for the measurement itself
        budget = min(budget, max(0.0, args.deadline - 1500.0))
    attempts, sleep_s = 1, 30.0
    while True:
        elapsed = time.perf_counter() - _T0
        # only start another attempt if its worst case (sleep + a hung
        # probe) still fits in the budget
        if elapsed + sleep_s + args.probe_timeout > budget:
            return False, (f"{detail} (gave up after {attempts} probe "
                           f"attempts over {elapsed:.0f}s)")
        # progress to stderr — stdout is reserved for the driver's JSON line
        import sys
        print(f"probe attempt {attempts} failed ({detail}); retrying in "
              f"{sleep_s:.0f}s", file=sys.stderr, flush=True)
        time.sleep(sleep_s)
        sleep_s = min(sleep_s * 2, 180.0)
        attempts += 1
        ok, detail = device_reachable(args.probe_timeout)
        if ok:
            return ok, f"{detail} (recovered on probe attempt {attempts})"


def _scanned(run, scan):
    """Fuse ``scan`` pipeline steps into one dispatched lax.scan program
    (the Detector(scan=) serving configuration): launch overhead amortizes
    scan×. The per-step scalar sums reduce once more so the sync contract
    (fetch one tiny scalar) is unchanged."""
    if scan <= 1:
        return run
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run_k(params, frames_k):  # (scan, B, H, W, 3) uint8
        def body(carry, fr):
            return carry, run(params, fr)

        _, outs = lax.scan(body, jnp.int32(0), frames_k)
        return jnp.sum(outs[0]), jnp.sum(outs[1])

    return run_k


def auto_top_k(graph, net_hw):
    """The Detector's NMS working-set preset — delegates to the ONE
    policy source (yolov3_tpu/ops/nms.py::auto_top_k) so the bench rows
    mirror the serving default and driver-captured numbers are the
    numbers a Detector user gets; rows record the resolved K when it
    differs from the historical 512. (Thin wrapper, lazily imported —
    bench defers heavy imports until after CLI parsing.)"""
    from yolov3_tpu.ops.nms import auto_top_k as _policy

    return _policy(graph, net_hw)


def measure_tpu(graph, params, frames, iters, prob_thresh=0.05,
                precision=None, scan=1, fused_heads=False, select_group=2,
                top_k=None):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.model import (forward_packed, forward_packed_fused,
                                  fused_heads_eligible)
    from yolov3_tpu.ops.nms import batched_nms_packed
    from yolov3_tpu.ops.preprocess import preprocess

    net_hw = (frames.shape[1], frames.shape[2])
    top_k = auto_top_k(graph, net_hw) if top_k is None else top_k
    fwd = (forward_packed_fused
           if fused_heads and fused_heads_eligible(graph) else forward_packed)

    @jax.jit
    def run(params, frames_u8):
        x = preprocess(frames_u8[..., ::-1], net_hw)
        payload, scores = fwd(graph, params, x,
                              prob_thresh=prob_thresh,
                              precision=precision)
        res = batched_nms_packed(payload, scores, select_group=select_group,
                                 top_k=top_k)
        # reduce to scalars ON DEVICE: fetching full NMS buffers through this
        # environment's TPU relay runs at ~150 KB/s (a tunnel artifact, not
        # chip D2H) and would swamp the measurement; completion of these
        # scalars implies the whole step executed
        return jnp.sum(res.scores), jnp.sum(res.valid)

    run = _scanned(run, scan)
    dev_params = jax.device_put(params)
    # distinct pre-staged input per iteration (defeats any execution
    # memoization; real serving overlaps H2D with compute)
    rng = np.random.default_rng(7)
    shape = (scan, *frames.shape) if scan > 1 else frames.shape
    batches = [jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
               for _ in range(iters)]
    # warmup/compile (block via scalar fetch — block_until_ready is
    # fire-and-forget through the relay)
    float(run(dev_params, batches[0])[0])
    float(run(dev_params, batches[-1])[0])
    # best of 2 timed blocks: a single relay-RTT outlier inside one sync
    # block otherwise drags a whole row 10-20% low (observed on the fast
    # @416 rows at the end of long runs). Per-block rates are returned so
    # the estimator is transparent (ADVICE.md round 2: block[0] alone IS
    # the round-1 single-block estimator — deltas stay comparable).
    blocks = []
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [run(dev_params, b) for b in batches]  # enqueue all (pipelined)
        for o in outs:
            float(o[0])
        dt = time.perf_counter() - t0
        blocks.append(scan * frames.shape[0] * iters / dt)
    return max(blocks), blocks


def measure_tpu_int8(graph, params, frames, iters, prob_thresh=0.05,
                     quantize_heads=False, quantize_stem=False, scan=1,
                     fused_heads=False, select_group=2, block_impl="xla",
                     top_k=None, act_scheme="symmetric"):
    """int8 PTQ path (calibrated on random frames — throughput-only here;
    accuracy calibration uses real images via Darknet.quantize_int8).
    ``quantize_heads`` also int8s the no-BN head projections (round 3;
    parity gates in tests/test_quant.py::test_head_quantization_*);
    ``quantize_stem`` int8s the Cin=3 stem via the exact-u8 input scheme
    (tests/test_quant.py::test_stem_*); ``block_impl="pallas"`` runs the
    residual blocks through the fused VMEM-resident kernel (round 4,
    ops/pallas_block.py); ``act_scheme="asymmetric"`` prices the round-5
    zero-point activation scheme (explicit conv pads + quantize-site adds
    are its only runtime deltas)."""
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.model import fused_heads_eligible
    from yolov3_tpu.ops.nms import batched_nms_packed
    from yolov3_tpu.ops.preprocess import preprocess
    from yolov3_tpu.quant import (calibrate_tensors,
                                  calibrate_tensors_affine,
                                  forward_packed_fused_int8,
                                  forward_packed_int8, quantize_weights)

    net_hw = (frames.shape[1], frames.shape[2])
    top_k = auto_top_k(graph, net_hw) if top_k is None else top_k
    fwd_q = (forward_packed_fused_int8
             if fused_heads and fused_heads_eligible(graph)
             else forward_packed_int8)
    dev_params = jax.device_put(jax.tree.map(jnp.asarray, params))
    rng = np.random.default_rng(3)
    calib = [preprocess(jnp.asarray(
        rng.integers(0, 256, (8, *net_hw, 3), dtype=np.uint8)), net_hw)]
    zeros = None
    if act_scheme == "asymmetric":
        scales, zeros = calibrate_tensors_affine(graph, dev_params, calib,
                                                 precision="bf16")
    else:
        scales = calibrate_tensors(graph, dev_params, calib,
                                   precision="bf16")
    qparams = jax.device_put(quantize_weights(graph, dev_params,
                                              include_heads=quantize_heads,
                                              include_stem=quantize_stem))

    @jax.jit
    def run(qparams, frames_u8):
        x = preprocess(frames_u8[..., ::-1], net_hw)
        payload, scores = fwd_q(
            graph, qparams, scales, x, prob_thresh=prob_thresh,
            precision="bf16", carrier="int8", block_impl=block_impl,
            zeros=zeros)
        res = batched_nms_packed(payload, scores, select_group=select_group,
                                 top_k=top_k)
        return jnp.sum(res.scores), jnp.sum(res.valid)

    run = _scanned(run, scan)
    rng = np.random.default_rng(7)
    shape = (scan, *frames.shape) if scan > 1 else frames.shape
    batches = [jnp.asarray(rng.integers(0, 256, shape, dtype=np.uint8))
               for _ in range(iters)]
    float(run(qparams, batches[0])[0])
    float(run(qparams, batches[-1])[0])
    blocks = []
    for _ in range(2):  # best of 2 blocks (see measure_tpu)
        t0 = time.perf_counter()
        outs = [run(qparams, b) for b in batches]
        for o in outs:
            float(o[0])
        blocks.append(scan * frames.shape[0] * iters
                      / (time.perf_counter() - t0))
    return max(blocks), blocks


def latency_row(lat_ms, rtt_p50, batch):
    """One latency-summary row from per-sample dispatch times.

    The chip-time estimate only means something when the null-program RTT
    control is BELOW the measured dispatch; on congested-relay days the
    control can exceed it (2026-08-20: control 72.4 ms vs b1 dispatch
    40.1 ms) and a clamped 0.0 would read as "zero chip time" — report
    null + a congestion flag instead.
    """
    p50 = float(np.percentile(lat_ms, 50))
    congested = rtt_p50 > p50
    return {
        "p50_ms": round(p50, 2),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 2),
        "chip_ms_est": None if congested else round(p50 - rtt_p50, 2),
        "rtt_congested": congested,
        "img_s_sync": round(batch / p50 * 1e3, 1),
    }


def measure_latency(graph, params, size, batches=(1, 8, 32), n=20,
                    precision="bf16", prob_thresh=0.05, fused_heads=False,
                    select_group=2):
    """Synchronous per-dispatch latency (VERDICT.md round-2 item 9).

    Each sample is one full uint8→NMS dispatch, synced by fetching the
    on-device scalar (the only reliable sync through the relay). The relay's
    round trip is measured separately with a null program under the same
    sync discipline so the table can split e2e latency into ~chip time +
    ~transport; on direct-attached TPU the null column collapses to the
    runtime's ~0.1-1 ms launch cost and e2e ≈ chip time.
    """
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.model import (forward_packed, forward_packed_fused,
                                  fused_heads_eligible)
    from yolov3_tpu.ops.nms import batched_nms_packed
    from yolov3_tpu.ops.preprocess import preprocess

    net_hw = (size, size)
    fwd = (forward_packed_fused
           if fused_heads and fused_heads_eligible(graph) else forward_packed)

    @jax.jit
    def null(x):
        return jnp.sum(x)

    tiny = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    float(null(tiny))
    rtt = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(null(tiny))
        rtt.append((time.perf_counter() - t0) * 1e3)
    rtt_p50 = float(np.percentile(rtt, 50))

    run_params = params
    if precision == "bf16":
        run_params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                                  params)
    dev_params = jax.device_put(run_params)
    rows = {}
    for b in batches:
        @jax.jit
        def run(params, frames_u8):
            x = preprocess(frames_u8[..., ::-1], net_hw)
            payload, scores = fwd(graph, params, x,
                                  prob_thresh=prob_thresh,
                                  precision=precision)
            res = batched_nms_packed(payload, scores,
                                     select_group=select_group)
            return jnp.sum(res.scores), jnp.sum(res.valid)

        rng = np.random.default_rng(7)
        frames = [jnp.asarray(rng.integers(0, 256, (b, size, size, 3),
                                           dtype=np.uint8))
                  for _ in range(n)]
        float(run(dev_params, frames[0])[0])
        float(run(dev_params, frames[-1])[0])
        lat = []
        for f in frames:
            t0 = time.perf_counter()
            float(run(dev_params, f)[0])
            lat.append((time.perf_counter() - t0) * 1e3)
        rows[f"b{b}"] = latency_row(lat, rtt_p50, b)
    return rtt_p50, rows


def measure_torch_cpu(graph, raw, size, batch, iters):
    """Reference-equivalent pipeline: torch forward + host numpy NMS.

    Returns per-iteration stats (mean img/s, run-to-run std, config) so the
    headline ratio carries an error bar (VERDICT.md round-1 weak #3 — a
    2-iter denominator hid ±20% CPU variance).
    """
    import torch

    from tests.test_nms import numpy_reference_nms  # reference-style host NMS
    from tools.torch_ref import TorchDarknet

    model = TorchDarknet(graph).load_raw(raw)
    x = torch.from_numpy(
        np.random.default_rng(0).uniform(0, 1, (batch, 3, size, size))
        .astype(np.float32))
    per_iter = []
    with torch.no_grad():
        model(x)  # warmup
        for _ in range(iters):
            t0 = time.perf_counter()
            det = model(x).numpy()
            for i in range(batch):
                numpy_reference_nms(det[i], 0.05, 0.3)
            per_iter.append(batch / (time.perf_counter() - t0))
    return {
        "img_s": float(np.mean(per_iter)),
        "std": float(np.std(per_iter)),
        "batch": batch,
        "iters": iters,
        "per_iter": [round(v, 4) for v in per_iter],
    }


def torch_baseline(graph, raw, size, batch, iters, remeasure=False):
    """Measured-and-cached reference-CPU denominator for ``graph@size``."""
    key = f"{graph.name}@{size}"
    cache = {}
    if BASELINE_CACHE.exists():
        cache = json.loads(BASELINE_CACHE.read_text())
    entry = cache.get(key)
    if isinstance(entry, (int, float)):  # pre-round-2 schema (bare img/s)
        entry = None
    if entry is None or remeasure:
        entry = measure_torch_cpu(graph, raw, size, batch, iters)
        cache[key] = entry
        BASELINE_CACHE.write_text(json.dumps(cache, indent=1))
    return entry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=None,
                    help="single resolution (default: tracked 608 + 416 rows)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cfg", default="yolov3.cfg")
    ap.add_argument("--quick", action="store_true",
                    help="tiny model, small batch (smoke check)")
    ap.add_argument("--remeasure-baseline", action="store_true")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the timed loop")
    ap.add_argument("--scan", type=int, default=None,
                    help="pipeline steps fused per dispatch (lax.scan — the "
                         "Detector(scan=) serving configuration; launch "
                         "overhead amortizes scan x). Default: auto (4 at "
                         ">=608, 8 below). 1 = the round-1/2 one-dispatch-"
                         "per-step estimator")
    ap.add_argument("--latency", action="store_true",
                    help="measure synchronous per-dispatch latency at "
                         "b1/b8/b32 instead of throughput (one JSON line "
                         "with p50/p90 + chip-vs-transport split)")
    ap.add_argument("--int8-heads", action="store_true",
                    help="quantize the no-BN head projections too on the "
                         "int8 rows (quant.eligible include_heads)")
    ap.add_argument("--int8-stem", action="store_true",
                    help="quantize the Cin=3 stem conv too on the int8 rows "
                         "(exact-u8 input scheme, quant.eligible "
                         "include_stem)")
    ap.add_argument("--act-scheme", choices=("symmetric", "asymmetric"),
                    default="symmetric",
                    help="activation quantization scheme for the int8 rows "
                         "(asymmetric = round-5 zero-point scheme; prices "
                         "its explicit conv pads + quantize-site adds)")
    ap.add_argument("--fuse-blocks", action="store_true",
                    help="run the darknet53 residual blocks through the "
                         "fused VMEM-resident int8 kernel on the int8 rows "
                         "(ops/pallas_block.py; block_impl='pallas')")
    ap.add_argument("--no-variants", action="store_true",
                    help="skip the tiny@416/320/spp variant rows in the "
                         "default run")
    ap.add_argument("--fused-heads", action="store_true",
                    help="run the 1x1 head convs inside the Pallas decode "
                         "kernel (decode_impl='pallas-fused'; the head maps "
                         "never round-trip HBM)")
    ap.add_argument("--select-group", type=int, default=2,
                    help="group-max selection width G (ops/nms.py: exact "
                         "top-k for any G; trades the lax.top_k term N/G*k "
                         "against the final G*k sort — see "
                         "tools/bench_select_group.py for the crossover)")
    ap.add_argument("--precision", choices=("default", "highest", "bf16",
                                            "int8"),
                    default="bf16",
                    help="serving precision (bf16 = production default; int8 "
                         "= PTQ fast path; box parity is checked in tests)")
    ap.add_argument("--probe-timeout", type=float, default=180.0,
                    help="bounded per-attempt device-reachability probe "
                         "before any jax work (a dead relay tunnel otherwise "
                         "hangs the first dispatch forever); 0 disables")
    ap.add_argument("--probe-retry-budget", type=float, default=1800.0,
                    help="keep re-probing an unreachable device for up to "
                         "this many seconds before emitting the error row — "
                         "a short relay blip should cost minutes, not the "
                         "round's whole bench (round-4 lesson: one transient "
                         "outage forfeited BENCH_r04.json). Bounded by "
                         "--deadline minus headroom for the run itself; 0 "
                         "restores single-attempt behavior")
    ap.add_argument("--deadline", type=float, default=5400.0,
                    help="whole-run wall-clock deadline in seconds; if the "
                         "relay dies MID-run the next sync fetch hangs "
                         "forever, so a watchdog aborts with an error line "
                         "(which preserves the rows already measured) "
                         "instead. Default 90 min: the round-5 full matrix "
                         "measured 48 min on a healthy-but-noisy relay day, "
                         "so the old 3600 s left no headroom for a probe "
                         "retry or mid-run congestion; 0 disables")
    args = ap.parse_args()

    if args.select_group < 2:
        # fail at argparse time, not minutes later inside a jitted trace
        # (ops/nms.py's group assert is also stripped under python -O)
        ap.error(f"--select-group must be >= 2 (got {args.select_group})")

    global _T0
    _T0 = time.perf_counter()

    if args.quick:
        args.cfg, args.size, args.batch, args.iters = ("yolov3-tiny.cfg", 416,
                                                       8, 5)

    if args.probe_timeout > 0:
        ok, detail = _probe_with_retry(args)
        if not ok:
            # one honest JSON line the driver can record instead of a hang
            print(_fail_row(args, f"device unreachable: {detail}"))
            raise SystemExit(2)

    timer = None
    if args.deadline > 0:
        import os
        import threading

        def _expire():
            # stdout may hold a partial line; the driver reads the LAST line
            print("\n" + _fail_row(args,
                                   f"bench exceeded {args.deadline:.0f}s "
                                   f"deadline (relay died mid-run?)",
                                   rows=dict(_PARTIAL)),
                  flush=True)
            os._exit(3)

        timer = threading.Timer(args.deadline, _expire)
        timer.daemon = True
        timer.start()
    # cancel on EVERY exit: an armed timer would os._exit(3) any host
    # process that called main() in-process (e.g. the test suite) an hour
    # later
    try:
        _run(args)
    finally:
        if timer is not None:
            timer.cancel()


def _fail_row(args, error, rows=None):
    """Failure JSON line keyed like the success headline — the metric name
    must carry the ``@size`` segment or the driver records the error under
    a key that joins nothing in BASELINE.json. ``rows`` (the _PARTIAL dict)
    preserves everything measured before the failure; if the headline row
    completed, its rate becomes the reported value."""
    size = args.size or 608
    out = {
        "metric": f"images/sec/chip {Path(args.cfg).stem}@{size} "
                  f"batch{args.batch} {args.precision} e2e inference",
        "value": 0.0,
        "unit": "img/s",
        "vs_baseline": 0.0,
        "error": error,
    }
    if rows:
        out["rows"] = rows
        first = next((r for r in rows.values() if "img_s" in r), None)
        if first:  # insertion order: the headline row is measured first
            out["value"] = first["img_s"]
            out["vs_baseline"] = first.get("vs_baseline", 0.0)
    return json.dumps(out)


def _run(args):
    from tools.bench_clock import enable_compile_cache

    enable_compile_cache()

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import fold_raw, random_raw

    graph = load_graph(REPO / "models" / args.cfg)
    raw = random_raw(graph, seed=0)
    # push objectness biases negative so post-threshold candidate counts are
    # trained-weights realistic — otherwise ~half of all anchors pass 0.05
    # and the reference's data-dependent Python NMS is unfairly swamped
    per_anchor = 5 + graph.yolo_nodes[0].classes
    for node in graph.conv_nodes:
        if not node.batch_normalize:
            raw[node.index]["bias"][4::per_anchor] = -6.0
    params = fold_raw(raw)

    precision = None if args.precision == "default" else args.precision
    run_params = params
    if precision == "bf16":
        import jax.numpy as jnp

        run_params = {k: {n: np.asarray(v, dtype=jnp.bfloat16)
                          for n, v in p.items()} for k, p in params.items()}

    if args.latency:
        import sys

        lat_size = args.size or 608
        lat_prec = args.precision if args.precision in ("bf16",
                                                        "highest") else "bf16"
        # knob provenance (CLAUDE.md): a latency row must measure and
        # record the knobs it was asked for, not silently drop them
        if args.scan is not None and args.scan > 1:
            print("warning: --scan ignored in --latency mode (each sample "
                  "is ONE synchronous dispatch by definition)",
                  file=sys.stderr)
        lat_fused = False
        if args.fused_heads:
            from yolov3_tpu.model import fused_heads_eligible

            lat_fused = fused_heads_eligible(graph)
            if not lat_fused:
                print(f"warning: --fused-heads requested but {graph.name} "
                      f"is not eligible; latency rows measure the UNFUSED "
                      f"path", file=sys.stderr)
        rtt_p50, lrows = measure_latency(graph, params, lat_size,
                                         precision=lat_prec,
                                         fused_heads=lat_fused,
                                         select_group=args.select_group)
        out = {
            "metric": f"latency p50 {graph.name}@{lat_size} batch1 "
                      f"{lat_prec} e2e inference",
            "value": lrows["b1"]["p50_ms"],
            "unit": "ms",
            # None when the relay was congested (rtt_congested in the row)
            "vs_baseline": lrows["b1"]["chip_ms_est"],
            "relay_rtt_p50_ms": round(rtt_p50, 2),
            "rows": lrows,
        }
        if args.fused_heads:
            out["fused_heads"] = lat_fused
        if args.select_group != 2:
            out["select_group"] = args.select_group
        print(json.dumps(out))
        return

    def scan_for(size):
        # auto scan depth: enough steps per dispatch to amortize launch
        # overhead without ballooning the staged-input footprint
        if args.scan is not None:
            return max(1, args.scan)
        return 4 if size >= 608 else 8

    def measure_at(size, prec, prms, fused=None):
        fused = args.fused_heads if fused is None else fused
        scan = scan_for(size)
        frames = np.random.default_rng(1).integers(
            0, 256, (args.batch, size, size, 3), dtype=np.uint8)
        # scale iteration count with expected step speed: fast rows (smaller
        # resolution, int8) otherwise amortize too little of the relay's
        # fixed dispatch cost and read 20-30% low with run-to-run swings
        iters = args.iters * max(1, round((608 / size) ** 2))
        if scan > 1:
            # each dispatch now carries scan batches — shrink the dispatch
            # count so the pre-staged input footprint stays constant
            iters = max(2, round(iters / scan))
        if prec == "int8":
            blocks_impl = "pallas" if args.fuse_blocks else "xla"
            return measure_tpu_int8(graph, prms, frames, iters,
                                    quantize_heads=args.int8_heads,
                                    quantize_stem=args.int8_stem,
                                    scan=scan, fused_heads=fused,
                                    select_group=args.select_group,
                                    block_impl=blocks_impl,
                                    act_scheme=args.act_scheme)
        return measure_tpu(graph, prms, frames, iters, precision=prec,
                           scan=scan, fused_heads=fused,
                           select_group=args.select_group)

    # BASELINE.json's tracked metric names BOTH @608 and @416 — default run
    # measures both; --size pins one. The headline row is the first size.
    sizes = [args.size] if args.size else [608, 416]
    torch_iters = 1 if args.quick else max(5, args.iters // 2)

    # provenance: rows must record the knobs that shaped them (CLAUDE.md —
    # perf claims come from measured runs with the configuration stated).
    # --fused-heads silently falls back when the cfg is ineligible; say so.
    fused_active = False
    if args.fused_heads:
        from yolov3_tpu.model import fused_heads_eligible

        fused_active = fused_heads_eligible(graph)
        if not fused_active:
            import sys

            print(f"warning: --fused-heads requested but {graph.name} is "
                  f"not eligible (see model.fused_heads_eligible); rows "
                  f"measure the UNFUSED path", file=sys.stderr)

    def knob_fields(row, prec):
        if args.fused_heads:
            row["fused_heads"] = fused_active
        if args.fuse_blocks and prec == "int8":
            # block_impl only exists on the int8 path (quant walk) — a
            # bf16 row stamped fuse_blocks would claim a knob that never
            # shaped it (provenance rule above)
            row["fuse_blocks"] = True
        if args.act_scheme != "symmetric" and prec == "int8":
            row["act_scheme"] = args.act_scheme
        if args.select_group != 2:
            row["select_group"] = args.select_group
        return row

    # rows accumulate in the module-level _PARTIAL so the deadline watchdog
    # can preserve everything measured before a mid-run wedge
    _PARTIAL.clear()
    rows = _PARTIAL
    headline = None
    for size in sizes:
        if args.profile and size == sizes[0]:
            import jax

            with jax.profiler.trace(args.profile):
                tpu_ips, blocks = measure_at(size, precision, run_params)
        else:
            tpu_ips, blocks = measure_at(size, precision, run_params)
        base = torch_baseline(graph, raw, size, batch=min(args.batch, 4),
                              iters=torch_iters,
                              remeasure=args.remeasure_baseline)
        row = knob_fields({
            "img_s": round(tpu_ips, 2),
            "blocks": [round(b, 2) for b in blocks],
            "scan": scan_for(size),
            "vs_baseline": round(tpu_ips / base["img_s"], 2),
            "baseline_img_s": round(base["img_s"], 4),
            "baseline_std": round(base["std"], 4),
        }, args.precision)
        rows[f"{graph.name}@{size} batch{args.batch} {args.precision}"] = row
        if headline is None:
            headline = (size, tpu_ips, base["img_s"])

    # int8 PTQ row (production fast path; parity gated in tests/test_quant.py)
    if precision == "bf16" and args.size is None and not args.quick:
        for size in sizes:
            ips, blocks = measure_at(size, "int8", params)
            base = torch_baseline(graph, raw, size, batch=min(args.batch, 4),
                                  iters=torch_iters)
            rows[f"{graph.name}@{size} batch{args.batch} int8"] = knob_fields({
                "img_s": round(ips, 2),
                "blocks": [round(b, 2) for b in blocks],
                "scan": scan_for(size),
                "vs_baseline": round(ips / base["img_s"], 2),
            }, "int8")

    # Opportunistic fused-block row (round 4, VERDICT item 1): the fused
    # int8 residual-block kernel's e2e delta, measured in the driver's own
    # run. Crash-guarded like the fused-head rows below.
    if (precision == "bf16" and args.size is None and not args.quick
            and not args.fuse_blocks):
        # only meaningful when the graph HAS residual blocks — otherwise
        # block_impl="pallas" compiles the identical program (the fused
        # plan is empty) and the row would claim a fusion that measured
        # nothing, at a resolution (608) the graph isn't otherwise benched
        # at (tiny has no shortcut nodes)
        has_blocks = any(n.kind == "shortcut" for n in graph.nodes)
        elapsed = time.perf_counter() - _T0
        if (has_blocks
                and (args.deadline <= 0 or elapsed < args.deadline * 0.6)):
            key = f"{graph.name}@608 batch{args.batch} int8 fuse-blocks"
            try:  # the whole row incl. its baseline: never cost the headline
                base = torch_baseline(graph, raw, 608,
                                      batch=min(args.batch, 4),
                                      iters=torch_iters)
                frames = np.random.default_rng(1).integers(
                    0, 256, (args.batch, 608, 608, 3), dtype=np.uint8)
                iters = max(2, round(args.iters / scan_for(608)))
                ips, blocks = measure_tpu_int8(
                    graph, params, frames, iters,
                    quantize_heads=args.int8_heads,
                    quantize_stem=args.int8_stem, scan=scan_for(608),
                    select_group=args.select_group, block_impl="pallas")
                rows[key] = {
                    "img_s": round(ips, 2),
                    "blocks": [round(b, 2) for b in blocks],
                    "scan": scan_for(608),
                    "vs_baseline": round(ips / base["img_s"], 2),
                    "fuse_blocks": True,
                }
            except Exception as e:  # never cost the headline
                rows[key] = {"error": f"{type(e).__name__}: {e}"[:300],
                             "fuse_blocks": True}

    # Variant rows (round 4, VERDICT item 4): the tiny/320/spp numbers that
    # evidence the scanned-dispatch story, captured in the driver's own run
    # instead of only builder-run BASELINE.md tables. Budget-gated so a slow
    # run cannot push the whole bench past the deadline watchdog.
    if (precision == "bf16" and args.size is None and not args.quick
            and args.cfg == "yolov3.cfg" and not args.no_variants):
        variants = [("yolov3-tiny.cfg", 416, ("bf16", "int8")),
                    ("yolov3.cfg", 320, ("bf16",)),
                    ("yolov3-spp.cfg", 608, ("bf16", "int8"))]
        for vcfg, vsize, vprecs in variants:
            elapsed = time.perf_counter() - _T0
            if args.deadline > 0 and elapsed > args.deadline * 0.75:
                rows[f"variants-skipped {vcfg}@{vsize}"] = {
                    "error": "deadline budget exhausted"}
                continue
            try:  # setup incl. the torch baseline: never cost the headline
                vgraph = load_graph(REPO / "models" / vcfg)
                vraw = random_raw(vgraph, seed=0)
                vpa = 5 + vgraph.yolo_nodes[0].classes
                for node in vgraph.conv_nodes:
                    if not node.batch_normalize:
                        vraw[node.index]["bias"][4::vpa] = -6.0
                vparams = fold_raw(vraw)
                vbase = torch_baseline(vgraph, vraw, vsize,
                                       batch=min(args.batch, 4),
                                       iters=torch_iters)
                frames = np.random.default_rng(1).integers(
                    0, 256, (args.batch, vsize, vsize, 3), dtype=np.uint8)
            except Exception as e:
                rows[f"variants-failed {vcfg}@{vsize}"] = {
                    "error": f"{type(e).__name__}: {e}"[:300]}
                continue
            vscan = scan_for(vsize)
            viters = max(2, round(args.iters * max(1, round(
                (608 / vsize) ** 2)) / vscan))
            for vprec in vprecs:
                key = f"{vgraph.name}@{vsize} batch{args.batch} {vprec}"
                try:
                    if vprec == "int8":
                        ips, blocks = measure_tpu_int8(
                            vgraph, vparams, frames, viters, scan=vscan,
                            select_group=args.select_group)
                    else:
                        import jax.numpy as jnp

                        vrun = {k: {n: np.asarray(v, dtype=jnp.bfloat16)
                                    for n, v in pp.items()}
                                for k, pp in vparams.items()}
                        ips, blocks = measure_tpu(
                            vgraph, vrun, frames, viters, precision="bf16",
                            scan=vscan, select_group=args.select_group)
                    rows[key] = {
                        "img_s": round(ips, 2),
                        "blocks": [round(b, 2) for b in blocks],
                        "scan": vscan,
                        "vs_baseline": round(ips / vbase["img_s"], 2),
                    }
                    vk = auto_top_k(vgraph, (vsize, vsize))
                    if vk != 512:  # preset provenance (serving default)
                        rows[key]["top_k"] = vk
                except Exception as e:  # never cost the headline
                    rows[key] = {"error": f"{type(e).__name__}: {e}"[:300]}

    # Opportunistic fused-head rows (the round-3 open question): the fused
    # decode (decode_impl="pallas-fused") was built during a relay outage
    # and its on-chip delta is unmeasured — measure it as EXTRA rows in the
    # driver's own run so the answer lands in BENCH_r0N.json. Crash-guarded:
    # the kernel has never been Mosaic-compiled on real hardware, and a
    # failure here must not cost the measured headline; a WEDGE (hang, not
    # exception) is covered by the deadline watchdog, which preserves the
    # rows above via _PARTIAL.
    if (precision == "bf16" and args.size is None and not args.quick
            and not args.fused_heads):
        from yolov3_tpu.model import fused_heads_eligible

        # budget thresholds are monotone across the extra-row blocks
        # (fuse-blocks 0.6 → variants 0.75 → here 0.8 → latency 0.85) so
        # earlier blocks can't silently starve later ones; a skip leaves
        # an explicit row, matching the variants-skipped convention
        elapsed = time.perf_counter() - _T0
        in_budget = args.deadline <= 0 or elapsed < args.deadline * 0.8
        if fused_heads_eligible(graph) and not in_budget:
            rows[f"{graph.name}@608 fused-heads skipped"] = {
                "error": "deadline budget exhausted"}
        elif fused_heads_eligible(graph):
            for prec, prms in (("bf16", run_params), ("int8", params)):
                key = f"{graph.name}@608 batch{args.batch} {prec} fused-heads"
                try:  # incl. the baseline: never cost the headline
                    base = torch_baseline(graph, raw, 608,
                                          batch=min(args.batch, 4),
                                          iters=torch_iters)
                    ips, blocks = measure_at(608, prec, prms, fused=True)
                    rows[key] = {
                        "img_s": round(ips, 2),
                        "blocks": [round(b, 2) for b in blocks],
                        "scan": scan_for(608),
                        "vs_baseline": round(ips / base["img_s"], 2),
                        "fused_heads": True,
                    }
                except Exception as e:  # never cost the headline
                    rows[key] = {"error": f"{type(e).__name__}: {e}"[:300],
                                 "fused_heads": True}

    # Latency summary row (round-4, VERDICT round-3 item 4): the
    # synchronous per-dispatch numbers, captured in the driver's own run
    # (previously only via the separate --latency mode). Budget-gated and
    # crash-guarded like the extra rows above.
    if precision == "bf16" and args.size is None and not args.quick:
        elapsed = time.perf_counter() - _T0
        if args.deadline <= 0 or elapsed < args.deadline * 0.85:
            try:
                rtt_p50, lrows = measure_latency(
                    graph, params, 608, batches=(1, 8), n=12,
                    select_group=args.select_group)
                rows["latency yolov3@608 bf16"] = {
                    "relay_rtt_p50_ms": round(rtt_p50, 2), **lrows}
            except Exception as e:  # never cost the headline
                rows["latency yolov3@608 bf16"] = {
                    "error": f"{type(e).__name__}: {e}"[:300]}
        else:
            rows["latency yolov3@608 bf16"] = {
                "error": "deadline budget exhausted"}

    size, tpu_ips, torch_ips = headline
    print(json.dumps({
        "metric": f"images/sec/chip {graph.name}@{size} batch{args.batch} "
                  f"{args.precision} e2e inference",
        "value": round(tpu_ips, 2),
        "unit": "img/s",
        "vs_baseline": round(tpu_ips / torch_ips, 2),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
