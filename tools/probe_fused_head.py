"""Probe: what does head-conv-FUSED packed decode save over the unfused
packed path on the bf16 serving pipeline?

The unfused path writes each (B, g, g, C_pad) head map from the XLA 1x1
conv and immediately re-reads it in the opaque Pallas decode custom call
(~745 MB/step of round-trip traffic across the three heads at 608/b128).
The fused kernel (ops/pallas_decode.py::decode_packed_head_fused_pallas)
runs the projection as an in-kernel MXU dot instead, so the head map never
exists in HBM. Measures, on the differential scan clock:

  pre-head walk                      (common prefix)
  pre-head walk + XLA head convs     (what fusion removes, part 1)
  full walk + packed pallas decode   (current serving path)
  pre-head walk + fused decode       (new path)

    python tools/probe_fused_head.py [--cfg yolov3.cfg] [--size 608]
                                     [--batch 128] [--lens 8,40]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from tools.bench_clock import enable_compile_cache, timeit_scanned
from yolov3_tpu.graph import load_graph
from yolov3_tpu.ops.preprocess import preprocess
from yolov3_tpu.weights import fold_raw, random_raw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov3.cfg")
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lens", default="8,40")
    ap.add_argument("--prob-thresh", type=float, default=0.05)
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8-carrier fused path")
    args = ap.parse_args()
    enable_compile_cache()
    lens = tuple(int(v) for v in args.lens.split(","))

    from yolov3_tpu.model import (forward_features, forward_packed,
                                  forward_packed_fused,
                                  fused_heads_eligible, pad_head_params)

    g = load_graph(Path(__file__).parent.parent / "models" / args.cfg)
    assert fused_heads_eligible(g), args.cfg
    params = jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16),
        pad_head_params(g, fold_raw(random_raw(g, 0)))))
    net_hw = (args.size, args.size)
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.integers(
        0, 256, (args.batch, *net_hw, 3), dtype=np.uint8))
    x0 = jax.jit(lambda f: preprocess(f[..., ::-1], net_hw))(frames)
    float(jnp.sum(x0[0, :1, :1]))

    def t(label, fn):
        dt = timeit_scanned(fn, (x0,), reps=args.reps, lens=lens)
        print(f"{label:40s}: {dt * 1e3:8.2f} ms", flush=True)
        return dt

    pre = t("bf16 pre-head walk", lambda xc: tuple(forward_features(
        g, params, xc, precision="bf16", stop_before_heads=True)))
    full = t("bf16 full walk (heads only)", lambda xc: tuple(
        forward_features(g, params, xc, precision="bf16")))
    print(f"    -> XLA head convs cost: {(full - pre) * 1e3:+.2f} ms",
          flush=True)
    unfused = t("full walk + packed pallas decode",
                lambda xc: forward_packed(g, params, xc,
                                          prob_thresh=args.prob_thresh,
                                          precision="bf16"))
    fused = t("pre-head walk + FUSED decode",
              lambda xc: forward_packed_fused(g, params, xc,
                                              prob_thresh=args.prob_thresh,
                                              precision="bf16"))
    print(f"    -> fused decode delta over pre-walk: "
          f"{(fused - pre) * 1e3:+.2f} ms (unfused head+decode: "
          f"{(unfused - pre) * 1e3:+.2f} ms)", flush=True)
    print(f"    -> FUSION SAVES: {(unfused - fused) * 1e3:+.2f} ms/step",
          flush=True)

    if not args.int8:
        return
    # ---- int8 carrier path (the serving flagship) ----
    from yolov3_tpu.quant import (calibrate_tensors,
                                  forward_features_int8_carrier,
                                  forward_packed_fused_int8,
                                  forward_packed_int8, quantize_weights)

    fparams = jax.tree.map(jnp.asarray, fold_raw(random_raw(g, 0)))
    calib = [preprocess(jnp.asarray(rng.integers(
        0, 256, (8, *net_hw, 3), dtype=np.uint8)), net_hw)]
    scales = calibrate_tensors(g, fparams, calib, precision="bf16")
    qparams = jax.device_put(quantize_weights(g, fparams))

    pre_i = t("int8-carrier pre-head walk",
              lambda xc: tuple(forward_features_int8_carrier(
                  g, qparams, scales, xc, "bf16", stop_before_heads=True)))
    unfused_i = t("int8 walk + packed pallas decode",
                  lambda xc: forward_packed_int8(
                      g, qparams, scales, xc, prob_thresh=args.prob_thresh,
                      precision="bf16", carrier="int8"))
    fused_i = t("int8 pre-walk + FUSED decode",
                lambda xc: forward_packed_fused_int8(
                    g, qparams, scales, xc, prob_thresh=args.prob_thresh,
                    precision="bf16", carrier="int8"))
    print(f"    -> int8 fused head+decode delta over pre-walk: "
          f"{(fused_i - pre_i) * 1e3:+.2f} ms (unfused: "
          f"{(unfused_i - pre_i) * 1e3:+.2f} ms)", flush=True)
    print(f"    -> int8 FUSION SAVES: {(unfused_i - fused_i) * 1e3:+.2f} "
          f"ms/step", flush=True)


if __name__ == "__main__":
    main()
