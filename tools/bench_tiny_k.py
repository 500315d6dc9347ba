"""tiny-class NMS working-set sweep: K ∈ {512, 256, 128, 64} on-chip.

Round-4 measurement (VERDICT round-3 item 5): with dispatch amortized by
``Detector(scan=8)``, tiny@416's ~10 ms device step carries ~4 ms of NMS
tail (selection + suppression at the default K=512) — noise at 608, ~40% of
the step at tiny scale. This tool measures, per K:

* **throughput**: the full uint8→NMS int8 serving step at tiny@416 b128
  scan=8 (the exact BASELINE.md headline program), via ``bench.py``'s
  hardened measurement machinery (``measure_tpu_int8(top_k=K)``);
* **semantics**: the >K truncation contract (ops/nms.py: when more than K
  candidates pass the serving threshold, exactly the K highest-scoring
  enter suppression; otherwise results are IDENTICAL for any K). The audit
  runs the packed NMS at each K on batches at two candidate regimes —
  realistic-sparse (objectness bias −6, the bench default) and adversarial-
  dense (bias −2) — and reports per-image pre-NMS candidate counts, the
  fraction of images where K truncates, and detection-set equality vs
  K=512 on the untruncated images (must be exact; the truncated ones are
  allowed to differ by contract).

Run on the real chip:  python tools/bench_tiny_k.py [--batch 128 --scan 8]
Prints one JSON line per K plus an audit line per regime.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def all_k_detection_sets(graph, qparams, scales, frames_u8, prob_thresh,
                         ks):
    """One forward pass, then NMS at every K CO-COMPILED in one program
    (per-K recompiles would re-expose the comparison to cross-program
    requant-tie noise — see tools/probe_block.py's verdict). Returns
    per-image pre-NMS candidate counts and, per K, per-image survivor sets
    keyed by the exact (box tlbr, class) tuples — identical candidates in
    one program produce bit-identical boxes, so set equality is exact."""
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.ops.nms import batched_nms_packed
    from yolov3_tpu.ops.preprocess import preprocess
    from yolov3_tpu.quant import forward_packed_int8

    net_hw = (frames_u8.shape[1], frames_u8.shape[2])

    @jax.jit
    def run(q, f):
        x = preprocess(f[..., ::-1], net_hw)
        payload, scores = forward_packed_int8(
            graph, q, scales, x, prob_thresh=prob_thresh,
            precision="bf16", carrier="int8")
        outs = {k: batched_nms_packed(payload, scores, top_k=k)
                for k in ks}
        return scores, outs

    scores, outs = run(qparams, frames_u8)
    pre = (np.asarray(scores) > 0).sum(axis=1)
    sets = {}
    for k, res in outs.items():
        vn = np.asarray(res.valid)
        bn = np.asarray(res.boxes, np.float64)
        cn = np.asarray(res.classes)
        sets[k] = [{(tuple(bn[b, j]), int(cn[b, j]))
                    for j in np.nonzero(vn[b])[0]}
                   for b in range(frames_u8.shape[0])]
    return pre, sets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="yolov3-tiny.cfg",
                    help="model cfg under models/ — the tool generalizes "
                         "to any graph (round 4: also run the full model "
                         "at 608, where selection+suppression at K=512 is "
                         "~5 ms of the 94 ms int8 step)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--prob-thresh", type=float, default=0.05)
    ap.add_argument("--ks", type=int, nargs="+", default=[512, 256, 128, 64])
    ap.add_argument("--dense-threshes", type=float, nargs="+",
                    default=[0.072, 0.080, 0.085, 0.090],
                    help="extra audit thresholds for the dense regime — "
                         "tuned to walk the random-weight score cluster's "
                         "upper tail so per-image candidate counts land "
                         "inside the K range (tiny defaults; sweep around "
                         "them for other graphs if every row reads "
                         "all-truncated or all-empty)")
    ap.add_argument("--audit-only", action="store_true",
                    help="skip the throughput sweep, run only the "
                         "truncation-contract audit")
    args = ap.parse_args()

    from bench import measure_tpu_int8
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import fold_raw, random_raw

    repo = Path(__file__).parent.parent
    graph = load_graph(repo / "models" / args.config)
    vpa = 5 + graph.yolo_nodes[0].classes

    def make_params(obj_bias):
        raw = random_raw(graph, seed=0)
        for node in graph.conv_nodes:
            if not node.batch_normalize:
                raw[node.index]["bias"][4::vpa] = obj_bias
        return fold_raw(raw)

    params = make_params(-6.0)  # bench-default realistic-sparse regime
    frames = np.random.default_rng(1).integers(
        0, 256, (args.batch, args.size, args.size, 3), dtype=np.uint8)

    for k in ([] if args.audit_only else args.ks):
        ips, blocks = measure_tpu_int8(graph, params, frames, args.iters,
                                       prob_thresh=args.prob_thresh,
                                       scan=args.scan, top_k=k)
        print(json.dumps({"row": f"{graph.name}@{args.size} int8 b{args.batch} "
                                 f"scan{args.scan} K={k}",
                          "img_s": round(ips, 1),
                          "blocks": [round(b, 1) for b in blocks]}),
              flush=True)

    # truncation-contract audit at both candidate regimes
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.ops.preprocess import preprocess
    from yolov3_tpu.quant import calibrate_tensors, quantize_weights

    # regimes × thresholds: the bias shifts the whole candidate-count
    # distribution (sparse ≈ 0, dense ≈ all 2535), and the threshold sweep
    # inside the dense regime walks counts down through the K range so at
    # least one row lands mid-range — where "untruncated images must be
    # set-identical across K" actually has bite (an all-truncated or
    # all-empty row checks the contract vacuously).
    audit_frames = np.asarray(frames[:16])
    for regime, obj_bias, threshes in (
            ("sparse(bias-6)", -6.0, (args.prob_thresh,)),
            ("dense(bias-2)", -2.0,
             # the random-weight score cluster sits just above 0.05 (all
             # 2520+ pass at 0.05, ~1165 at 0.072, none at 0.10); these
             # walk the cluster's upper tail so per-image counts land
             # inside the K range and the equality check has bite
             (args.prob_thresh, *args.dense_threshes))):
        p = make_params(obj_bias)
        dev = jax.device_put(jax.tree.map(jnp.asarray, p))
        rng = np.random.default_rng(3)
        calib = [preprocess(jnp.asarray(rng.integers(
            0, 256, (8, args.size, args.size, 3), dtype=np.uint8)),
            (args.size, args.size))]
        scales = calibrate_tensors(graph, dev, calib, precision="bf16")
        qp = jax.device_put(quantize_weights(graph, dev))
        for thresh in threshes:
            pre, sets = all_k_detection_sets(graph, qp, scales,
                                             audit_frames, thresh,
                                             sorted(args.ks))
            ref_sets = sets[max(args.ks)]
            out = {"audit": regime, "prob_thresh": thresh,
                   "pre_nms_per_image":
                       [int(v) for v in np.percentile(pre, [0, 50, 100])],
                   }
            for k in sorted(args.ks):
                if k == max(args.ks):
                    continue
                untrunc = [b for b in range(len(sets[k])) if pre[b] <= k]
                eq = all(sets[k][b] == ref_sets[b] for b in untrunc)
                out[f"K={k}"] = {"truncated_images": int((pre > k).sum()),
                                 "untruncated_images": len(untrunc),
                                 "untruncated_equal": bool(eq)}
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
