"""int8 error-budget probe: which rounding dominates the eval-harness gap?

The pinned synthetic eval (tests/test_eval_regression.py harness) scores the
int8 carrier pipeline at mAP50_95 ≈ 0.915 (with bias correction) vs the fp32
GT's 1.0. Before building any further accuracy machinery (asymmetric
activation quantization, weight-scale search, AdaRound), measure where the
error actually lives by fake-quantizing ONE factor at a time in an otherwise
fp32 pipeline:

* ``weights``:   conv weights → per-channel int8 grid (sw·round(w/sw)),
                 activations exact;
* ``acts-sym``:  conv inputs → per-tensor SYMMETRIC int8 fake-quant
                 (s·clip(round(x/s), ±127)), weights exact;
* ``acts-asym``: conv inputs → per-tensor ASYMMETRIC uint8 fake-quant
                 (zero-point at the calibrated min, 255 steps across
                 [min, max] — what a zero-point scheme could deliver at
                 best), weights exact.

Run on CPU (no chip needed):  python tools/probe_quant_error.py
"""
from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))

from eval_coco import evaluate  # noqa: E402
from gen_eval_golden import (CFG, NET_HW, SEED, detections_to_dicts,  # noqa: E402
                             make_frames)

from yolov3_tpu.graph import load_graph  # noqa: E402
from yolov3_tpu.model import Darknet  # noqa: E402
from yolov3_tpu.ops.nms import batched_nms_compact  # noqa: E402
from yolov3_tpu.ops.preprocess import preprocess  # noqa: E402
from yolov3_tpu.quant import (_calibration_walk, eligible,  # noqa: E402
                              quantize_weights)
from yolov3_tpu.weights import random_raw, write_weights  # noqa: E402

REPO = Path(__file__).parent.parent
FIXTURE = REPO / "tests" / "data" / "eval_golden.json"


def calibrate_minmax(graph, params, batches):
    """Per-tensor (min, max) of every node output over the calibration set
    (the asymmetric analogue of calibrate_tensors' absmax)."""
    def stats_pass(params, x):
        acc = {}

        def visit(node, inp, out):
            f = out.astype(jnp.float32)
            acc[node.index] = (jnp.min(f), jnp.max(f))

        _calibration_walk(graph, params, x, None, visit)
        return acc

    run = jax.jit(stats_pass)
    agg = {}
    for x in batches:
        for i, (lo, hi) in run(params, jnp.asarray(x)).items():
            plo, phi = agg.get(i, (np.inf, -np.inf))
            agg[i] = (min(plo, float(lo)), max(phi, float(hi)))
    return agg


def fake_quant_forward(graph, params, x, mode, minmax, qparams):
    """fp32 compact forward with ONE factor fake-quantized per eligible conv."""
    idx = {n.index for n in graph.conv_nodes if eligible(graph, n)}

    fq_params = params
    if mode == "weights":
        fq_params = dict(params)
        for i in idx:
            qp = qparams[i]
            w_dq = np.asarray(qp["wq"], np.float32) * np.asarray(qp["sw"])
            fq_params[i] = {"w": jnp.asarray(w_dq), "b": params[i]["b"]}

    def maybe_fq(node, t):
        if mode == "none" or mode == "weights" or node.index not in idx:
            return t
        lo, hi = minmax[node.inputs[0]]
        f = t.astype(jnp.float32)
        if mode == "acts-sym":
            s = max(abs(lo), abs(hi), 1e-6) / 127.0
            return jnp.clip(jnp.round(f / s), -127, 127) * s
        if mode == "acts-asym":
            s = max(hi - lo, 1e-6) / 255.0
            return jnp.clip(jnp.round((f - lo) / s), 0, 255) * s + lo
        raise ValueError(mode)

    # graph walk mirroring model.forward_features at the GT's fp32
    # precision="highest", with the conv-input fake-quant hook
    from yolov3_tpu.model import (_PRECISIONS, _conv, _maxpool,
                                  _upsample_nearest)
    needed = graph.needed_outputs
    cache, heads, prev = {}, [], x
    for node in graph.nodes:
        if node.kind == "convolutional":
            p = fq_params[node.index]
            out = _conv(maybe_fq(node, prev), p["w"], p["b"], node,
                        _PRECISIONS["highest"], "xla")
        elif node.kind == "maxpool":
            out = _maxpool(prev, node)
        elif node.kind == "upsample":
            out = _upsample_nearest(prev, node.stride)
        elif node.kind == "shortcut":
            out = prev + cache[node.inputs[1]]
            if node.activation == "leaky":
                out = jnp.where(out > 0, out, 0.1 * out)
        elif node.kind == "route":
            srcs = [prev if i == node.index - 1 else cache[i]
                    for i in node.inputs]
            out = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, -1)
        elif node.kind == "yolo":
            heads.append(prev)
            out = prev
        else:
            raise ValueError(node.kind)
        if node.index in needed:
            cache[node.index] = out
        prev = out
    from yolov3_tpu.ops.decode import decode_compact
    heads = [h.astype(jnp.float32) for h in heads]
    yolo = graph.yolo_nodes
    return decode_compact(heads, [n.anchors for n in yolo],
                          list(graph.head_strides()), yolo[0].classes)


def main():
    fx = json.loads(FIXTURE.read_text())
    gt = {int(i): {int(c): np.asarray(b, np.float64) for c, b in per.items()}
          for i, per in fx["gt"].items()}
    g = load_graph(CFG)
    wpath = Path(tempfile.mkdtemp()) / "probe.weights"
    write_weights(wpath, g, random_raw(g, seed=SEED))
    net = Darknet(CFG, precision="highest")
    net.load_weights(wpath)
    params = net.params
    frames = make_frames(fx["seed"], n=fx["n_images"], hw=fx["img_hw"],
                         cell=fx["cell"])
    # the GT Detector consumed these frames as BGR (detect_batch's cv2
    # convention) — swap here so the probe sees the identical input tensor
    frames = frames[..., ::-1]
    batches = [preprocess(jnp.asarray(frames[i:i + 8]), NET_HW)
               for i in range(0, len(frames), 8)]
    minmax = calibrate_minmax(g, params, batches)
    qparams = quantize_weights(g, params)
    x = jnp.concatenate(batches, axis=0)

    from yolov3_tpu.inference import Detection

    hw = fx["img_hw"]
    for mode in ("none", "weights", "acts-sym", "acts-asym"):
        b, s, c = jax.jit(
            lambda p, xx, m=mode: fake_quant_forward(g, p, xx, m, minmax,
                                                     qparams))(params, x)
        # mirror the GT Detector's working set exactly: auto top_k preset
        # (256 at tiny@192's candidate count) and the max_results=128 cap —
        # an uncapped survivor set adds hundreds of low-score FPs per image
        # and floors mAP regardless of quantization
        r = batched_nms_compact(b, s, c, prob_thresh=fx["prob_thresh"],
                                iou_thresh=fx["iou_thresh"], top_k=256,
                                max_results=128)
        results = []
        for i in range(len(frames)):
            m = np.asarray(r.valid[i])
            # image == net size here: net coords ARE source coords; clip
            # like the Detector's unmap does
            results.append(Detection(
                bbox_tlbr=np.clip(np.asarray(r.boxes[i])[m], 0, hw),
                class_prob=np.asarray(r.scores[i])[m],
                class_idx=np.asarray(r.classes[i])[m]))
        res = evaluate(detections_to_dicts(results), gt)
        print(f"{mode:10s}: mAP50 {res['mAP50']:.4f} "
              f"mAP50_95 {res['mAP50_95']:.4f}", flush=True)


if __name__ == "__main__":
    main()
