"""Analytic HBM-traffic + MXU lower bounds per stage of the int8 carrier walk.

For each node of the graph, counts the activation bytes each op must move
(int8 carrier: conv reads its int8 input once, writes its int8/bf16 output
once; shortcut reads two operands, writes one; route reads all, writes one;
weights are negligible at b128) and the MXU MACs. Converts to time at the
v5e's ~819 GB/s HBM and 394 TOPS int8 / 197 TF/s bf16 peaks and groups by
the same downsample-boundary marks as tools/profile_int8.py — the per-mark
``max(bw, mxu)`` column is the speed-of-light floor to compare the measured
marginals against (a stage at its floor is intrinsic; a stage well above it
is headroom).

    python tools/traffic_model.py [--cfg yolov3.cfg] [--size 608] [--batch 128]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from yolov3_tpu.graph import load_graph
from yolov3_tpu.quant import eligible

HBM_GBPS = 819.0
INT8_TOPS = 394.0
BF16_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov3.cfg")
    ap.add_argument("--size", type=int, default=608)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--int8-heads", action="store_true")
    args = ap.parse_args()

    g = load_graph(Path(__file__).parent.parent / "models" / args.cfg)
    b = args.batch

    # per-node output spatial size and carrier byte width
    hw = {}
    bytes_out = {}
    cur = (args.size, args.size)
    in_hw = {}
    for n in g.nodes:
        src = n.inputs[0]
        cur = (args.size, args.size) if src < 0 else hw[src]
        in_hw[n.index] = cur
        if n.kind in ("convolutional", "maxpool") and n.stride > 1:
            cur = (cur[0] // n.stride, cur[1] // n.stride)
        elif n.kind == "upsample":
            cur = (cur[0] * n.stride, cur[1] * n.stride)
        elif n.kind == "shortcut":
            cur = hw[n.inputs[1]]
        hw[n.index] = cur
        # int8 carrier: quantized-conv outputs and pass-through forwards are
        # 1 B/elem; bf16 otherwise. Approximate with the eligibility rule.
        if n.kind == "convolutional":
            q = eligible(g, n, args.int8_heads)
            bytes_out[n.index] = 1 if q else 2
        else:
            src_b = [bytes_out[i] for i in n.inputs if i >= 0]
            bytes_out[n.index] = min(src_b) if src_b else 2

    def elems(idx):
        h, w = hw[idx]
        return b * h * w * g.nodes[idx].out_channels

    rows = []
    for n in g.nodes:
        src = n.inputs[0]
        c_in = g.in_channels if src < 0 else g.nodes[src].out_channels
        read = sum(elems(i) * bytes_out[i] for i in n.inputs if i >= 0)
        if src < 0:
            read = b * args.size * args.size * 3 * 4  # f32 preprocessed in
        write = elems(n.index) * bytes_out[n.index]
        macs = 0.0
        peak = INT8_TOPS
        if n.kind == "convolutional":
            h, w = hw[n.index]
            macs = b * h * w * n.out_channels * c_in * n.size * n.size
            peak = (INT8_TOPS if eligible(g, n, args.int8_heads)
                    else BF16_TFLOPS)
        elif n.kind == "yolo":
            read = write = 0
        bw_ms = (read + write) / HBM_GBPS / 1e6
        mxu_ms = 2 * macs / peak / 1e9
        rows.append((n.index, n.kind, bw_ms, mxu_ms))

    # group by the profiler's marks
    marks, seen = [], set()
    for n in g.nodes:
        if (n.kind == "convolutional" and n.stride > 1
                and n.downsample not in seen):
            seen.add(n.downsample)
            marks.append(n.index + 1)
    marks.append(len(g.nodes))

    print(f"{'stage':16s} {'bw-floor':>9s} {'mxu-floor':>9s} {'sol':>9s}")
    lo = 0
    tot_bw = tot_mxu = tot_sol = 0.0
    for hi in marks:
        bw = sum(r[2] for r in rows if lo <= r[0] < hi)
        mxu = sum(r[3] for r in rows if lo <= r[0] < hi)
        # per-op max(bw, mxu) is the honest floor (ops serialize)
        sol = sum(max(r[2], r[3]) for r in rows if lo <= r[0] < hi)
        print(f"[{lo:3d}:{hi:3d})        {bw:8.2f}  {mxu:8.2f}  {sol:8.2f}")
        tot_bw += bw
        tot_mxu += mxu
        tot_sol += sol
        lo = hi
    print(f"{'TOTAL':16s} {tot_bw:8.2f}  {tot_mxu:8.2f}  {tot_sol:8.2f}  (ms)")


if __name__ == "__main__":
    main()
