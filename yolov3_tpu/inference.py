"""Inference pipeline + detect entry points (reference L3/L5, SURVEY.md §1).

Mirrors ``yolov3/inference.py`` from the reference: ``inference()`` returning
per-image ``(bbox_tlbr, class_prob, class_idx)`` in original-image pixels
(SURVEY.md §2.7 output contract), plus ``detect_image``, ``detect_directory``
(batched, BASELINE config #3), ``detect_in_video`` and ``detect_in_cam``.

TPU-native structure: preprocess → forward → decode → NMS compile into **one
jitted executable per (batch, source-resolution, net-resolution) bucket** —
frames cross host→device as raw uint8, a single device program runs per step,
and only the ≤top-K survivors come back. The reference instead does host
preprocessing, a Python module-loop forward, a D2H copy of every detection,
and per-class Python NMS loops per frame (SURVEY.md §3.1).

Host threads handle capture/drawing exactly like the reference's
getter/shower design; JAX async dispatch overlaps device compute with them.
"""
from __future__ import annotations

import logging
import time
from collections import OrderedDict
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("yolov3_tpu")

import jax
import jax.numpy as jnp

from .model import Darknet, forward_compact
from .ops.nms import batched_nms_compact, batched_nms_packed, pack_results
from .ops.preprocess import preprocess
from .utils.boxes import unletterbox_tlbr, unstretch_tlbr

# one tiny executable per result shape; shared across Detectors
_pack_jit = jax.jit(pack_results)


@dataclass
class Detection:
    """Per-image detection result in original-image pixel coordinates."""

    bbox_tlbr: np.ndarray  # (n, 4) float32
    class_prob: np.ndarray  # (n,) float32  (objectness × class prob)
    class_idx: np.ndarray  # (n,) int32


class Detector:
    """Jit-cached end-to-end detector over a :class:`~yolov3_tpu.model.Darknet`.

    One compiled executable per (batch, src_hw) bucket; executables are cached
    for the life of the detector — a video stream compiles exactly once.
    """

    def __init__(self, net: Darknet, prob_thresh: float = 0.05,
                 iou_thresh: float = 0.3, resize_mode: str = "letterbox",
                 top_k: Optional[int] = None, bgr: bool = True,
                 net_hw: Optional[Tuple[int, int]] = None, mesh=None,
                 nms_impl: str = "xla", decode_impl: str = "pallas",
                 max_results: int = 128, scan: int = 1,
                 partition: str = "data", select_group: int = 2,
                 block_impl: str = "xla"):
        self.net = net
        self.prob_thresh = float(prob_thresh)
        self.iou_thresh = float(iou_thresh)
        self.resize_mode = resize_mode
        # NMS working-set size. None = auto preset (resolved below, after
        # net_hw is known): 512 for the full models, 256 for tiny-class
        # graphs — with dispatch amortized by scan, selection+suppression
        # at K=512 is ~40% of tiny@416's ~10 ms device step, and the K
        # sweep (tools/bench_tiny_k.py, on-chip 2026-08-19) measured
        # 12684 → 14924 img/s int8 going 512 → 256 (15829 at K=128 for
        # callers who pass it explicitly). Semantics are bounded by the >K
        # truncation contract (ops/nms.py): results differ ONLY when more
        # than K candidates pass the serving threshold — 256 is >10% of a
        # tiny graph's entire 2535-candidate space.
        self._top_k_arg = top_k
        if top_k is not None and int(top_k) < 1:
            # a zero-candidate NMS working set fails minutes later inside a
            # jitted slice with an opaque shape error
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        self.bgr = bgr
        self.nms_impl = nms_impl
        # fused Pallas compact-decode is the serving default: consumes the
        # heads in their native lane layout (the XLA decode's 85-lane
        # relayout costs ~5 ms/step at 608/b128), bit-exact detection sets
        self.decode_impl = decode_impl
        # block_impl="pallas": int8-carrier residual blocks run through the
        # fused VMEM-resident kernel (ops/pallas_block.py — 1×1→3×3→shortcut
        # in one pass, bit-identical to the unfused walk); no-op on float
        # and bf16-carrier paths
        if block_impl not in ("xla", "pallas"):
            raise ValueError(f"unknown block_impl {block_impl!r} "
                             "(expected 'xla' or 'pallas')")
        self.block_impl = block_impl
        # post-NMS output compaction: K=512 slots of NMS working set shrink
        # to the top max_results survivors before leaving the device
        self.max_results = int(max_results)
        # group-max selection width (ops/nms.py::_select_pairmax): results
        # are bit-identical for any G >= 2; G trades the dominant lax.top_k
        # term (∝ N/G·k) against the final G·k sort —
        # tools/bench_select_group.py finds the measured crossover
        self.select_group = int(select_group)
        if self.select_group < 2:
            raise ValueError(f"select_group must be >= 2, got {select_group}")
        # scan > 1 fuses that many pipeline steps into ONE dispatched
        # lax.scan program: launch overhead amortizes scan× — decisive for
        # models whose device step is faster than the dispatch interval
        # (tiny@416: ~10 ms step vs ~30 ms dispatch ⇒ 2.3–3× e2e,
        # tools/bench_scan.py). Throughput knob only: per-call latency grows
        # to scan × step.
        self.scan = int(scan)
        if self.scan < 1:
            raise ValueError(f"scan must be >= 1, got {scan}")
        if self.scan > 1 and mesh is not None and partition != "data":
            # scan is a throughput knob; spatial partitioning is the
            # latency mode — the combination has no use case
            raise ValueError("scan > 1 requires partition='data' on a mesh")
        self.net_hw = tuple(net_hw) if net_hw else net.net_size
        max_stride = max(net.graph.head_strides())
        if any(v <= 0 or v % max_stride for v in self.net_hw):
            # a non-multiple resolution fails deep in the traced route
            # concat with an opaque shape error (grid sizes round
            # differently per stride); darknet has the same constraint
            raise ValueError(f"net_hw {self.net_hw} must be positive "
                             f"multiples of the net's max stride "
                             f"({max_stride})")
        if self._top_k_arg is None:
            from .ops.nms import auto_top_k
            self.top_k = auto_top_k(net.graph, self.net_hw)
        else:
            self.top_k = int(self._top_k_arg)
        if not 0.0 <= self.prob_thresh < 1.0:
            raise ValueError(f"prob_thresh must be in [0, 1), got "
                             f"{prob_thresh}")
        if not 0.0 <= self.iou_thresh <= 1.0:
            raise ValueError(f"iou_thresh must be in [0, 1], got "
                             f"{iou_thresh}")
        # multi-chip: partition="data" is batch-DP (throughput — params
        # replicate once, batches shard on their leading axis, zero
        # steady-state collectives; SURVEY.md §2.15); partition="spatial"
        # row-shards EACH image over the mesh (latency — halo-exchange
        # convs + channel-pair tail, parallel/spatial.py)
        if partition not in ("data", "spatial"):
            raise ValueError(f"unknown partition {partition!r}")
        self.partition = partition
        self.mesh = mesh
        if mesh is not None:
            if net.params is None:
                raise RuntimeError(
                    "Detector(mesh=...) needs loaded weights — call "
                    "net.load_weights()/set_params() before constructing")
            if partition == "spatial":
                from .parallel.sharding import replicate
                from .parallel.spatial import SPACE_AXIS

                if tuple(mesh.axis_names) != (SPACE_AXIS,):
                    raise ValueError(
                        "partition='spatial' needs a make_spatial_mesh() "
                        f"mesh (axis {SPACE_AXIS!r}), got {mesh.axis_names}")
                if self.net.quantized:
                    # measured basis: int8 is *slower* than bf16 at
                    # latency-class batch sizes (79 vs 66 ms serving p50 at
                    # b<=14, BASELINE.md round-4 serving table) — the int8
                    # tier is a throughput knob, and spatial partitioning
                    # is the latency mode; the combination has no use case
                    raise ValueError(
                        "int8 + spatial partitioning is out of scope "
                        "(parallel/spatial.py — bf16/fp32 only; int8 is a "
                        "throughput tier, measured slower than bf16 at "
                        "latency-class batches — BASELINE.md round-4)")
                self.net.params = jax.device_put(self.net.params,
                                                 replicate(mesh))
            else:
                from .parallel.sharding import DATA_AXIS, shard_params

                if tuple(mesh.axis_names) != (DATA_AXIS,):
                    raise ValueError(
                        "partition='data' needs a make_mesh() mesh (axis "
                        f"{DATA_AXIS!r}), got {mesh.axis_names}")
                self.net.params = shard_params(self.net.params, mesh)
                if self.net.quantized:
                    self.net.qparams = shard_params(self.net.qparams, mesh)
        # LRU-bounded: quantized entries close over their qparams, so an
        # unbounded cache would pin every superseded int8 param set across
        # re-quantizations (round-2 review); 16 covers realistic
        # (batch, shape) working sets with headroom
        self._pipelines: "OrderedDict[Tuple, callable]" = OrderedDict()
        self._pipeline_capacity = 16
        # Per-call stage attribution (seconds), written as ONE dict
        # assignment after each synchronous detect call: serve.py exposes it
        # via /stats and /metrics so the host/transport/device split that
        # tools/bench_serve.py measured externally (round 4: ~85% of the
        # concurrent cycle in the relay transport) is observable in
        # production too. Keys: preprocess_s (host letterbox, detect_mixed
        # only), h2d_s (host→device staging), dispatch_s (async enqueue of
        # the compiled program — NOT device compute), device_fetch_s (wait
        # for the device step + the packed-result D2H). Readers must read
        # from the thread that ran the call (serve's handler/batcher do).
        self.last_stage_s: Optional[Dict[str, float]] = None

    def _pipeline(self, batch: int, src_hw: Tuple[int, int],
                  bgr: Optional[bool] = None):
        bgr = self.bgr if bgr is None else bgr
        # quantized pipelines close over qparams/act_scales at build time, so
        # the cache key carries the quantization state's identity: quantizing
        # (or re-quantizing) the net after pipelines were built rebuilds them
        # instead of serving stale params (VERDICT.md round-1 weak #5). The
        # cached closure keeps its qparams alive, so id() cannot be reused
        # while the entry exists.
        qstate = id(self.net.qparams) if self.net.quantized else None
        key = (batch, src_hw, bgr, qstate)
        if key in self._pipelines:
            self._pipelines.move_to_end(key)
            return self._pipelines[key]
        log.info("compiling pipeline: batch=%d src=%s net=%s mode=%s "
                 "precision=%s", batch, src_hw, self.net_hw, self.resize_mode,
                 self.net.precision or "default")

        graph = self.net.graph
        net_hw = self.net_hw
        mode = self.resize_mode
        prob, iou, top_k = self.prob_thresh, self.iou_thresh, self.top_k
        precision = self.net.precision
        conv_impl = self.net.conv_impl
        nms_impl = self.nms_impl
        select_group = self.select_group
        block_impl = self.block_impl
        decode_impl = self.decode_impl
        if decode_impl == "pallas-fused":
            # head-conv-fused decode: float paths + the int8-carrier path
            # (the bf16-carrier int8 walk keeps the unfused form; spatial
            # partitioning shards the head convs themselves)
            from .model import fused_heads_eligible

            q_ok = (not self.net.quantized
                    or getattr(self.net, "qcarrier", "bf16") == "int8")
            if (not q_ok or self.partition == "spatial"
                    or not fused_heads_eligible(graph)):
                log.warning("head-fused decode not applicable here (%s); "
                            "falling back to decode_impl='pallas'",
                            "bf16-carrier int8" if not q_ok else
                            "spatial" if self.partition == "spatial"
                            else "graph shape")
                decode_impl = "pallas"
        if decode_impl in ("pallas", "pallas-fused"):
            from .ops.pallas_decode import supported as _pallas_decode_ok

            if not _pallas_decode_ok([n.anchors for n in graph.yolo_nodes]):
                log.warning("pallas decode supports <=4 anchors/head; "
                            "falling back to decode_impl='xla'")
                decode_impl = "xla"
        max_results = self.max_results

        if self.mesh is not None and self.partition == "spatial":
            from .parallel.spatial import spatial_pipeline

            if self.net.quantized:  # quantized AFTER construction
                raise ValueError("int8 + spatial partitioning is out of "
                                 "scope (parallel/spatial.py)")
            if conv_impl != "xla":
                log.warning("spatial partitioning does not support "
                            "conv_impl=%r; convs run via XLA", conv_impl)
            run = spatial_pipeline(graph, self.mesh, net_hw=net_hw,
                                   prob_thresh=prob, iou_thresh=iou,
                                   top_k=top_k, mode=mode,
                                   precision=precision, bgr=bgr,
                                   nms_impl=nms_impl,
                                   decode_impl=decode_impl,
                                   max_results=max_results,
                                   select_group=select_group)
            return self._finalize(key, run)

        if self.mesh is not None:
            from .parallel.sharding import sharded_pipeline

            if self.net.quantized:
                run_q = sharded_pipeline(graph, self.mesh, net_hw=net_hw,
                                         prob_thresh=prob, iou_thresh=iou,
                                         top_k=top_k, mode=mode,
                                         precision=precision, bgr=bgr,
                                         act_scales=self.net.act_scales,
                                         act_zeros=getattr(self.net,
                                                           "act_zeros",
                                                           None),
                                         carrier=getattr(self.net, "qcarrier",
                                                         "bf16"),
                                         nms_impl=nms_impl,
                                         decode_impl=decode_impl,
                                         max_results=max_results,
                                         scan=self.scan,
                                         select_group=select_group,
                                         block_impl=block_impl)
                qparams = self.net.qparams
                run = lambda params, frames: run_q(qparams, frames)  # noqa: E731
            else:
                run = sharded_pipeline(graph, self.mesh, net_hw=net_hw,
                                       prob_thresh=prob, iou_thresh=iou,
                                       top_k=top_k, mode=mode,
                                       precision=precision, bgr=bgr,
                                       conv_impl=conv_impl,
                                       nms_impl=nms_impl,
                                       decode_impl=decode_impl,
                                       max_results=max_results,
                                       scan=self.scan,
                                       select_group=select_group)
            # the scan (if any) runs INSIDE the sharded program; results
            # come back (scan, B, ...) and _unpack merges them host-side
            return self._cache_pipeline(key, run)

        if self.net.quantized:
            from .quant import forward_compact_int8

            qparams, act_scales = self.net.qparams, self.net.act_scales
            carrier = getattr(self.net, "qcarrier", "bf16")
            act_zeros = getattr(self.net, "act_zeros", None)
            if block_impl == "pallas" and act_zeros:
                log.warning("fused residual blocks implement the symmetric "
                            "quantization contract only; asymmetric "
                            "activations fall back to block_impl='xla'")

            @jax.jit
            def run_q(qparams, frames_u8):
                if bgr:
                    frames_u8 = frames_u8[..., ::-1]
                x = preprocess(frames_u8, net_hw, mode=mode)
                if decode_impl in ("pallas", "pallas-fused"):
                    # fused packed path: candidate records emitted by the
                    # decode kernel, zero relayouts before NMS selection;
                    # "pallas-fused" additionally runs the 1×1 head convs
                    # inside the kernel (int8 carrier only, gated above)
                    from .quant import (forward_packed_fused_int8,
                                        forward_packed_int8)

                    fwd = (forward_packed_fused_int8
                           if decode_impl == "pallas-fused"
                           else forward_packed_int8)
                    payload, scores = fwd(
                        graph, qparams, act_scales, x, prob_thresh=prob,
                        precision=precision or "bf16", carrier=carrier,
                        block_impl=block_impl, zeros=act_zeros)
                    return batched_nms_packed(payload, scores,
                                              iou_thresh=iou, top_k=top_k,
                                              impl=nms_impl,
                                              max_results=max_results,
                                              select_group=select_group)
                boxes, scores, classes = forward_compact_int8(
                    graph, qparams, act_scales, x,
                    precision=precision or "bf16", decode_impl=decode_impl,
                    carrier=carrier, block_impl=block_impl,
                    zeros=act_zeros)
                return batched_nms_compact(boxes, scores, classes,
                                           prob_thresh=prob, iou_thresh=iou,
                                           top_k=top_k, impl=nms_impl,
                                           max_results=max_results,
                                           select_group=select_group)

            run = lambda params, frames: run_q(qparams, frames)  # noqa: E731
            return self._finalize(key, run)

        @jax.jit
        def run(params, frames_u8):
            if bgr:
                frames_u8 = frames_u8[..., ::-1]  # BGR→RGB on device
            x = preprocess(frames_u8, net_hw, mode=mode)
            if decode_impl in ("pallas", "pallas-fused"):
                # fused packed path: decode kernel emits the candidate
                # records + thresholded scores; NMS selection consumes them
                # with zero relayouts (ops/pallas_decode.py,
                # nms.batched_nms_packed); "pallas-fused" additionally runs
                # the 1×1 head convs inside the kernel (the head maps never
                # round-trip HBM)
                from .model import forward_packed, forward_packed_fused

                fwd = (forward_packed_fused if decode_impl == "pallas-fused"
                       else forward_packed)
                payload, scores = fwd(graph, params, x,
                                      prob_thresh=prob,
                                      precision=precision,
                                      conv_impl=conv_impl)
                return batched_nms_packed(payload, scores, iou_thresh=iou,
                                          top_k=top_k, impl=nms_impl,
                                          max_results=max_results,
                                          select_group=select_group)
            # compact path: decode + score/class reduction fuse with the
            # heads; the (B, N, 5+C) tensor never reaches HBM
            boxes, scores, classes = forward_compact(graph, params, x,
                                                     precision=precision,
                                                     conv_impl=conv_impl,
                                                     decode_impl=decode_impl)
            return batched_nms_compact(boxes, scores, classes,
                                       prob_thresh=prob, iou_thresh=iou,
                                       top_k=top_k, impl=nms_impl,
                                       max_results=max_results,
                                       select_group=select_group)

        return self._finalize(key, run)

    def _finalize(self, key, run):
        """Wrap the per-batch pipeline in the scan runner when configured,
        then cache it. The scanned program takes a (scan, B, H, W, 3) uint8
        stack and returns results with the leading axes merged back to
        (scan·B, ...), so every caller sees the unscanned output contract."""
        if self.scan > 1:
            base = run

            @jax.jit
            def run(params, frames_k):
                def body(carry, fr):
                    return carry, base(params, fr)

                _, res = jax.lax.scan(body, jnp.int32(0), frames_k)
                return jax.tree.map(
                    lambda a: a.reshape((-1, *a.shape[2:])), res)

        return self._cache_pipeline(key, run)

    def _cache_pipeline(self, key, run):
        # Pack the NMSResult into ONE device array before it leaves the
        # pipeline (ops/nms.pack_results): _unpack then pays a single D2H
        # transfer instead of four (boxes/scores/classes/valid), which is
        # four launch round trips on any transport — and through this
        # environment's relay was ~90 ms of the measured ~178 ms sequential
        # serving request (round 4, tools/bench_serve.py). The pack runs as
        # its OWN tiny jitted program (not an outer jit over ``run``): the
        # quantized/mesh pipelines close over their params, and re-tracing
        # them under a wrapper jit would embed the weights as constants.
        base = run

        def packed(params, frames):
            return _pack_jit(base(params, frames))

        self._pipelines[key] = packed
        while len(self._pipelines) > self._pipeline_capacity:
            self._pipelines.popitem(last=False)
        return packed

    def _unpack(self, res, src_hw: Optional[Tuple[int, int]]
                ) -> List[Detection]:
        """Materialize packed device results (ops/nms.pack_results layout):
        unpack ≤K survivors per image and rescale to source coordinates
        (all same-shape sources). ``src_hw=None`` skips rescaling (boxes
        stay in net-input pixels). ONE np.asarray = ONE device→host
        transfer per batch — the earlier four-field NMSResult fetch paid
        four round trips (measured ~30 ms each through this environment's
        relay; four transfer setups on any transport)."""
        arr = np.asarray(res)
        if arr.ndim == 4:
            # scanned-on-mesh results arrive (scan, B, R, 6) — the batch
            # axis stays sharded on-device (zero-collective contract), so
            # the merge back to (scan·B, ...) happens here in host numpy;
            # the C-order reshape reproduces the frame order k·B + b exactly
            arr = arr.reshape(-1, *arr.shape[2:])
        boxes = arr[..., :4]
        scores = arr[..., 4]
        classes = arr[..., 5].astype(np.int32)
        valid = scores > 0.0
        unmap = unletterbox_tlbr if self.resize_mode == "letterbox" else unstretch_tlbr
        out: List[Detection] = []
        for i in range(valid.shape[0]):
            m = valid[i]
            out.append(Detection(
                bbox_tlbr=(boxes[i][m] if src_hw is None
                           else unmap(boxes[i][m], src_hw, self.net_hw)),
                class_prob=scores[i][m],
                class_idx=classes[i][m],
            ))
        return out

    def _build_canvases(self, frames: Sequence[np.ndarray]) -> np.ndarray:
        """Host-letterbox arbitrary-size frames into one (B, net_h, net_w, 3)
        RGB uint8 batch via the C++ loader."""
        from . import native

        if self.resize_mode != "letterbox":
            return np.concatenate(
                [native.stretch_batch_native(f[None], self.net_hw,
                                             swap_rb=self.bgr)
                 for f in frames])
        return native.letterbox_mixed_native(frames, self.net_hw,
                                             swap_rb=self.bgr)

    def _unmap_one(self, det: Detection, src_hw: Tuple[int, int]) -> Detection:
        """Rescale a net-coordinate Detection to one source image's pixels."""
        unmap = unletterbox_tlbr if self.resize_mode == "letterbox" else unstretch_tlbr
        return Detection(bbox_tlbr=unmap(det.bbox_tlbr, src_hw, self.net_hw),
                         class_prob=det.class_prob, class_idx=det.class_idx)

    def _stage_batch(self, frames: np.ndarray):
        """Host batch → device array: on a mesh, pad the batch up to a
        shardable size and shard its leading axis; with ``scan > 1``, pad to
        a multiple of scan and stage as a (scan, B/scan, ...) stack (the
        scanned program merges results back, so callers still index by the
        original order). Returns (device_frames, per_step_batch, real_batch)."""
        if frames.dtype != np.uint8:
            # the pipeline contract is uint8 frames (the on-device
            # preprocess divides by 255); a float frame would be silently
            # truncated to uint8 first — all-zero images, garbage results
            raise TypeError(f"frames must be uint8 (got {frames.dtype}); "
                            f"pass raw cv2/camera frames, not normalized "
                            f"floats")
        b = frames.shape[0]
        n_real = b
        if self.scan > 1:
            k = self.scan
            # on a data mesh the per-step batch must also shard: pad to a
            # multiple of scan×mesh and shard the stack's axis 1
            unit = k * (self.mesh.size if self.mesh is not None else 1)
            if b % unit:
                pad = unit - b % unit
                frames = np.concatenate(
                    [frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)])
                b += pad
            stack = frames.reshape(k, b // k, *frames.shape[1:])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                from .parallel.sharding import DATA_AXIS

                stack = jax.device_put(
                    jnp.asarray(stack),
                    NamedSharding(self.mesh,
                                  PartitionSpec(None, DATA_AXIS)))
                return stack, b // k, n_real
            return jnp.asarray(stack), b // k, n_real
        if self.mesh is not None and self.partition == "spatial":
            # every chip sees the full (small) batch; rows shard inside
            from .parallel.sharding import replicate

            return (jax.device_put(jnp.asarray(frames),
                                   replicate(self.mesh)), b, n_real)
        if self.mesh is not None:
            from .parallel.sharding import batch_sharding

            n_dev = self.mesh.size
            if b % n_dev:  # pad to a shardable batch, drop pad results
                pad = n_dev - b % n_dev
                frames = np.concatenate(
                    [frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)])
                b += pad
            device_frames = jax.device_put(jnp.asarray(frames),
                                           batch_sharding(self.mesh, 4))
        else:
            device_frames = jnp.asarray(frames)
        return device_frames, b, n_real

    def detect_batch(self, frames: np.ndarray) -> List[Detection]:
        """Detect in a batch of same-shape HWC uint8 frames (BGR by default,
        matching cv2 / the reference's input convention)."""
        frames = np.ascontiguousarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        if frames.shape[0] == 0:
            return []
        h, w = frames.shape[1:3]
        t0 = time.perf_counter()
        device_frames, b, n_real = self._stage_batch(frames)
        t1 = time.perf_counter()
        res = self._pipeline(b, (h, w))(self.net.params, device_frames)
        t2 = time.perf_counter()
        out = self._unpack(res, (h, w))[:n_real]
        self.last_stage_s = {"h2d_s": t1 - t0, "dispatch_s": t2 - t1,
                             "device_fetch_s": time.perf_counter() - t2}
        return out

    def detect_mixed(self, frames: Sequence[np.ndarray]) -> List[Detection]:
        """Detect in a list of arbitrarily-sized HWC uint8 frames.

        Uses the C++ host loader (``yolov3_tpu.native``) to letterbox every
        image into ONE fixed-shape uint8 batch, so heterogeneous directories
        hit a single compiled executable instead of one per source shape.
        Falls back to per-shape device pipelines if the native library is
        unavailable.
        """
        from . import native

        if len(frames) == 0:
            return []
        for f in frames:
            if np.asarray(f).dtype != np.uint8:
                raise TypeError(f"frames must be uint8 (got "
                                f"{np.asarray(f).dtype}); pass raw "
                                f"cv2/camera frames, not normalized floats")

        if not native.available():
            # group same-shape frames into real batches (order preserved):
            # the old per-frame fallback ran batch-1 pipelines, so callers
            # that pad to a fixed batch (serve.MicroBatcher) compiled and
            # warmed executables that were never used (round-2 review).
            # Each group pads to the next power of two so mixed-shape
            # traffic compiles at most log2(max_batch) executables per
            # shape instead of one per observed group size (follow-up
            # review: arbitrary group sizes churned ~60s compiles).
            out: List[Optional[Detection]] = [None] * len(frames)
            groups: Dict[Tuple[int, ...], List[int]] = {}
            for i, f in enumerate(frames):
                groups.setdefault(tuple(f.shape), []).append(i)
            for idxs in groups.values():
                batch = np.stack([frames[i] for i in idxs])
                padded = 1 << (len(idxs) - 1).bit_length()
                if padded > len(idxs):
                    pad = np.zeros((padded - len(idxs), *batch.shape[1:]),
                                   batch.dtype)
                    batch = np.concatenate([batch, pad])
                dets = self.detect_batch(batch)
                for i, d in zip(idxs, dets):
                    out[i] = d
            return out
        t0 = time.perf_counter()
        canvases = self._build_canvases(frames)
        pre_s = time.perf_counter() - t0
        src_hws = [f.shape[:2] for f in frames]
        out = self.detect_preletterboxed(canvases, src_hws)
        self.last_stage_s = {"preprocess_s": pre_s,
                             **(self.last_stage_s or {})}
        return out

    def detect_preletterboxed(self, canvases: np.ndarray,
                              src_hws: Sequence[Tuple[int, int]]
                              ) -> List[Detection]:
        """Run the device pipeline on host-preprocessed RGB uint8 canvases
        already at net resolution; rescale each result to its own source."""
        canvases = np.ascontiguousarray(canvases)
        t0 = time.perf_counter()
        device_frames, b, n_real = self._stage_batch(canvases)
        t1 = time.perf_counter()
        run = self._pipeline(b, self.net_hw, bgr=False)
        res = run(self.net.params, device_frames)
        t2 = time.perf_counter()
        dets = self._unpack(res, None)[:n_real]  # net coords
        out = [self._unmap_one(d, hw) for d, hw in zip(dets, src_hws)]
        self.last_stage_s = {"h2d_s": t1 - t0, "dispatch_s": t2 - t1,
                             "device_fetch_s": time.perf_counter() - t2}
        return out

    def warmup(self, batch: int, src_hw: Tuple[int, int],
               host_preprocessed: bool = False) -> "Detector":
        """Pre-compile + execute the pipeline for a (batch, source-shape)
        bucket before traffic arrives (first compile is tens of seconds on
        TPU; serving should not pay it on the first request)."""
        shape_hw = self.net_hw if host_preprocessed else src_hw
        frames = np.zeros((batch, *shape_hw, 3), dtype=np.uint8)
        if host_preprocessed:
            self.detect_preletterboxed(frames, [src_hw] * batch)
        else:
            self.detect_batch(frames)
        return self

    def __call__(self, frames) -> List[Detection]:
        return self.detect_batch(np.asarray(frames))


class PipelinedDetector:
    """Async-dispatch serving wrapper: keeps up to ``depth`` batches in
    flight on the device, materializing results in submission order.

    JAX dispatch is asynchronous — ``submit()`` enqueues the device step and
    returns immediately; results are pulled only when the pipeline is full
    (or on ``flush()``), so host work (decode, drawing, I/O) overlaps device
    compute. This is the generalized form of the video loop's overlap
    (SURVEY.md §7 phase 4) for any streaming source.
    """

    def __init__(self, detector: Detector, depth: int = 2):
        self.detector = detector
        self.depth = max(1, int(depth))
        self._inflight: List[Tuple[Tuple[int, int], object]] = []

    def submit(self, frames: np.ndarray) -> List[List[Detection]]:
        """Enqueue one same-shape uint8 batch; returns any batches that
        completed to keep the in-flight depth bounded (oldest first)."""
        frames = np.ascontiguousarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        if frames.shape[0] == 0:
            return []
        h, w = frames.shape[1:3]
        device_frames, b, n_real = self.detector._stage_batch(frames)
        run = self.detector._pipeline(b, (h, w))
        res = run(self.detector.net.params, device_frames)
        self._inflight.append(((h, w), n_real, res))
        done: List[List[Detection]] = []
        while len(self._inflight) > self.depth:
            done.append(self._materialize(self._inflight.pop(0)))
        return done

    def _materialize(self, item) -> List[Detection]:
        src_hw, n_real, res = item
        return self.detector._unpack(res, src_hw)[:n_real]

    def flush(self) -> List[List[Detection]]:
        """Materialize everything still in flight (submission order)."""
        done = [self._materialize(item) for item in self._inflight]
        self._inflight.clear()
        return done


# process-level Detector cache for the one-shot API: calling inference() in
# a loop (the reference's own usage pattern, SURVEY.md §3.2) must not
# recompile per call (VERDICT.md round-1 weak #7). Entries hold a strong ref
# to their net, so id() keys cannot be recycled while cached. LRU-bounded
# (round-2 review): each entry pins a full param set plus executables, so a
# threshold sweep through this API must evict, not grow without bound.
_ONESHOT_DETECTORS: "OrderedDict[Tuple, Detector]" = OrderedDict()
_ONESHOT_CAPACITY = 8


def inference(net: Darknet, images, prob_thresh: float = 0.05,
              nms_iou_thresh: float = 0.3, resize_mode: str = "letterbox"
              ) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Reference-compatible one-shot API (``yolov3/inference.py::inference``,
    SURVEY.md §1 L3): BGR frame(s) in → per-image
    ``(bbox_tlbr, class_prob, class_idx)`` tuples in source-image pixels.

    Detectors (and their jit caches) are reused per (net, thresholds,
    mode) — repeated calls in a loop hit one compiled executable. For full
    control (batching, mesh, pipelining) use :class:`Detector` directly."""
    key = (id(net), float(prob_thresh), float(nms_iou_thresh), resize_mode)
    det = _ONESHOT_DETECTORS.get(key)
    if det is None or det.net is not net:
        det = Detector(net, prob_thresh=prob_thresh,
                       iou_thresh=nms_iou_thresh, resize_mode=resize_mode)
        _ONESHOT_DETECTORS[key] = det
        while len(_ONESHOT_DETECTORS) > _ONESHOT_CAPACITY:
            _ONESHOT_DETECTORS.popitem(last=False)
    else:
        _ONESHOT_DETECTORS.move_to_end(key)
    results = det.detect_batch(np.asarray(images))
    return [(r.bbox_tlbr, r.class_prob, r.class_idx) for r in results]


# ---------------------------------------------------------------------------
# Entry points (reference L5, SURVEY.md §2.10 / §3.1–3.3)
# ---------------------------------------------------------------------------

def detect_image(detector: Detector, image_path, class_names=None,
                 output_path=None, show: bool = True, verbose: bool = False):
    """Single-image detect (reference CLI ``--image`` path, SURVEY.md §3.1)."""
    import cv2

    frame = cv2.imread(str(image_path))
    if frame is None:
        raise FileNotFoundError(f"could not read image {image_path}")
    t0 = time.perf_counter()
    (result,) = detector.detect_batch(frame)
    if verbose:
        print(f"{image_path}: {len(result.bbox_tlbr)} detections "
              f"in {(time.perf_counter() - t0) * 1e3:.1f} ms")
    from .utils.drawing import draw_boxes

    draw_boxes(frame, result, class_names=class_names)
    if output_path:
        cv2.imwrite(str(output_path), frame)
    if show:
        cv2.imshow("yolov3-tpu", frame)
        cv2.waitKey(0)
    return result


def detect_directory(detector: Detector, dir_path, batch_size: int = 32,
                     class_names=None, output_dir=None, verbose: bool = False,
                     extensions=(".jpg", ".jpeg", ".png", ".bmp")):
    """Batched directory inference (BASELINE config #3).

    Images are bucketed by source resolution so every bucket hits one compiled
    executable; within a bucket, frames stream through in ``batch_size``
    chunks with the final chunk zero-padded (static batch shape) and the pad
    results dropped. Decode of image i+1 overlaps device compute of batch i
    via JAX async dispatch.
    """
    import cv2

    paths = sorted(p for p in Path(dir_path).iterdir()
                   if p.suffix.lower() in extensions)
    if not paths:
        return {}

    # threaded decode with a bounded window: cv2.imread releases the GIL so
    # reads overlap, but only ~4 batches of frames are resident at once
    # (a 10k-image 1080p directory must not materialize ~60 GB up front)
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=8)
    window = max(4 * batch_size, 64)

    def decoded_iter():
        pending = []
        it = iter(paths)
        try:
            for p in it:
                pending.append((p, pool.submit(cv2.imread, str(p))))
                if len(pending) >= window:
                    q, fut = pending.pop(0)
                    yield q, fut.result()
            for q, fut in pending:
                yield q, fut.result()
        finally:
            pool.shutdown(wait=False)

    results: Dict[str, Detection] = {}
    t0 = time.perf_counter()
    n_images = 0

    from . import native as native_mod

    def emit(chunk, dets):
        nonlocal n_images
        for (p, frame), det in zip(chunk, dets):
            results[p.name] = det
            n_images += 1
            if output_dir:
                from .utils.drawing import draw_boxes

                draw_boxes(frame, det, class_names=class_names)
                cv2.imwrite(str(Path(output_dir) / p.name), frame)

    if native_mod.available():
        # C++ host letterbox assembles arbitrary shapes into fixed-shape
        # uint8 batches -> one compiled executable total, streaming order.
        # Submissions pipeline (depth 2): host decode + letterbox of chunk
        # i+1 overlap device compute of chunk i.
        in_flight: List[Tuple[List, List, object]] = []

        def submit(chunk):
            frames = [f for _, f in chunk]
            canvases = detector._build_canvases(frames)
            if len(chunk) < batch_size:
                # zero-pad the final partial chunk to the full batch shape:
                # reuses the one warm (batch_size, net_hw) executable
                # instead of compiling a remainder-sized one (the docstring
                # has promised this all along — round-2 review)
                pad = np.zeros((batch_size - len(chunk), *canvases.shape[1:]),
                               canvases.dtype)
                canvases = np.concatenate([canvases, pad])
            device_frames, b, n_real = detector._stage_batch(canvases)
            run = detector._pipeline(b, detector.net_hw, bgr=False)
            res = run(detector.net.params, device_frames)
            in_flight.append((chunk, [f.shape[:2] for f in frames], res))
            while len(in_flight) > 2:
                drain()

        def drain():
            chunk, src_hws, res = in_flight.pop(0)
            dets = detector._unpack(res, None)[:len(chunk)]  # net coords
            emit(chunk, [detector._unmap_one(d, hw)
                         for d, hw in zip(dets, src_hws)])

        chunk: List[Tuple[Path, np.ndarray]] = []
        for p, frame in decoded_iter():
            if frame is None:
                continue
            chunk.append((p, frame))
            if len(chunk) == batch_size:
                submit(chunk)
                chunk = []
        if chunk:
            submit(chunk)
        while in_flight:
            drain()
    else:
        # pure-device fallback: bucket incrementally by source shape, flush
        # each bucket as it fills (memory ≤ #shapes × batch_size frames)
        buckets: Dict[Tuple[int, int], List[Tuple[Path, np.ndarray]]] = {}
        for p, frame in decoded_iter():
            if frame is None:
                continue
            bucket = buckets.setdefault(frame.shape[:2], [])
            bucket.append((p, frame))
            if len(bucket) == batch_size:
                frames = np.stack([f for _, f in bucket])
                emit(bucket, detector.detect_batch(frames))
                buckets[frame.shape[:2]] = []
        for shape_hw, bucket in buckets.items():
            if not bucket:
                continue
            frames = np.stack([f for _, f in bucket])
            if len(bucket) < batch_size:
                # final partial bucket: pad to the (possibly already warm)
                # full batch shape; emit() zips against the real bucket so
                # pad results drop
                pad = np.zeros((batch_size - len(bucket), *frames.shape[1:]),
                               frames.dtype)
                frames = np.concatenate([frames, pad])
            emit(bucket, detector.detect_batch(frames))
    if verbose:
        dt = time.perf_counter() - t0
        print(f"{n_images} images in {dt:.2f}s "
              f"({n_images / dt:.1f} img/s incl. host I/O)")
    return results


def detect_in_video(detector: Detector, filepath, class_names=None,
                    output_path=None, show: bool = False,
                    show_fps: bool = False, frame_batch: int = 1,
                    pipeline_depth: int = 1, verbose: bool = False):
    """Video-file streaming pipeline (BASELINE config #4; reference
    ``detect_in_video``, SURVEY.md §3.3 — every frame processed, optional
    annotated output video).

    TPU-native structure (SURVEY.md §7 phase 4): a capture thread decodes
    ahead into a bounded queue; the main thread assembles ``frame_batch``
    frames, dispatches the device step **asynchronously** (JAX async
    dispatch), and materializes batch i's results only once
    ``pipeline_depth`` newer batches are enqueued — device compute overlaps
    host decode/draw/encode. cv2 releases the GIL inside native calls, so
    the threads genuinely overlap. ``pipeline_depth`` mirrors
    ``detect_in_cam``'s flag: deeper pipelines hide more dispatch latency
    (useful on this environment's ~25-30 ms relay round trip) at the cost of
    ``depth × frame_batch`` frames of extra output lag; 0 = fully
    synchronous.
    """
    import queue as queue_mod
    import threading

    import cv2

    from .utils.drawing import draw_boxes
    from .utils.profiling import FPSCounter, StageTimers

    cap = cv2.VideoCapture(str(filepath))
    if not cap.isOpened():
        raise FileNotFoundError(f"could not open video {filepath}")
    fps_in = cap.get(cv2.CAP_PROP_FPS) or 30.0
    timers = StageTimers()

    frame_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(4 * frame_batch, 8))
    stop = threading.Event()

    def _reader():
        # the reader OWNS the capture: cv2.VideoCapture is not thread-safe,
        # so release() must not race a concurrent read() from another thread
        try:
            while not stop.is_set():
                ok, frame = cap.read()
                if not ok:
                    break
                while not stop.is_set():
                    try:
                        frame_q.put(frame, timeout=0.1)
                        break
                    except queue_mod.Full:
                        continue
        finally:
            cap.release()
            try:
                frame_q.put_nowait(None)  # EOF sentinel (best effort)
            except queue_mod.Full:
                pass

    reader = threading.Thread(target=_reader, daemon=True)
    reader.start()

    def _next_frame():
        """Queue get that can't deadlock if the reader died with a full
        queue (sentinel drop): poll with the reader's liveness as backstop."""
        while True:
            try:
                return frame_q.get(timeout=0.25)
            except queue_mod.Empty:
                if not reader.is_alive():
                    return None

    writer = None
    fps = FPSCounter()
    shower = None
    if show:
        from .utils.video import VideoShower

        shower = VideoShower().start()

    def _drain(frames, res):
        nonlocal writer, n
        dets = detector._unpack(res, (frames[0].shape[0], frames[0].shape[1]))
        for frame, det in zip(frames, dets):
            draw_boxes(frame, det, class_names=class_names)
            fps.tick()
            if show_fps:
                fps.overlay(frame)
            if writer is None and output_path:
                writer = cv2.VideoWriter(
                    str(output_path), cv2.VideoWriter_fourcc(*"mp4v"),
                    fps_in, (frame.shape[1], frame.shape[0]))
            if writer is not None:
                writer.write(frame)
            if shower is not None:
                shower.frame = frame
            n += 1

    n = 0
    depth = max(0, int(pipeline_depth))
    in_flight: List[Tuple[List[np.ndarray], object]] = []  # oldest first
    try:
        eof = False
        while not eof:
            frames: List[np.ndarray] = []
            while len(frames) < frame_batch:
                item = _next_frame()
                if item is None:
                    eof = True
                    break
                frames.append(item)
            if frames:
                with timers.stage("dispatch"):
                    batch = np.stack(frames)
                    h, w = batch.shape[1:3]
                    # _stage_batch, not a bare jnp.asarray: a mesh-backed
                    # Detector needs the batch padded to a shardable size
                    # (round-2 review — frame_batch=1 on an 8-chip mesh
                    # crashed the shard_map divisibility check)
                    device_frames, b, _ = detector._stage_batch(batch)
                    run = detector._pipeline(b, (h, w))
                    res = run(detector.net.params, device_frames)  # async
                in_flight.append((frames, res))
                while len(in_flight) > depth:
                    with timers.stage("drain+draw+encode"):
                        _drain(*in_flight.pop(0))  # i while i+depth computes
        while in_flight:
            _drain(*in_flight.pop(0))
    finally:
        stop.set()  # reader releases the capture itself (it owns it)
        if writer is not None:
            writer.release()
        if shower is not None:
            shower.stop()
    if verbose:
        print(f"processed {n} frames at {fps.fps():.1f} FPS")
        if timers.totals:
            print(f"per-batch stages: {timers.report()}")
    return n


def detect_in_cam(detector: Detector, cam_id=0, class_names=None,
                  show_fps: bool = False, output_path=None,
                  show: bool = True, max_frames: Optional[int] = None,
                  pipeline_depth: int = 0,
                  output_fps: Optional[float] = None):
    """Real-time webcam loop (reference ``detect_in_cam``, SURVEY.md §3.2):
    getter thread (latest-frame-wins, deliberately dropping frames) → device
    pipeline → shower thread. ``cam_id`` may be a device index or any
    cv2-openable source (file/URL); ``show=False`` runs headless;
    ``max_frames`` bounds the loop (tests/capture sessions).

    ``pipeline_depth > 0`` routes frames through a :class:`PipelinedDetector`
    keeping that many frames in flight on the device: each displayed frame
    lags the camera by ``depth`` frames, but device dispatch overlaps host
    draw/show — on this environment's relay (~25-30 ms per round trip,
    CLAUDE.md) the synchronous loop is latency-bound and pipelining recovers
    most of it. 0 = reference-faithful synchronous loop."""
    import cv2

    from .utils.drawing import draw_boxes
    from .utils.profiling import FPSCounter
    from .utils.video import VideoGetter, VideoShower

    getter = VideoGetter(cam_id).start()
    shower = VideoShower(window_name="yolov3-tpu").start() if show else None
    fps = FPSCounter()
    writer = None
    warmup: List[np.ndarray] = []  # frames held until the writer opens
    n_done = 0
    pipe = (PipelinedDetector(detector, depth=pipeline_depth)
            if pipeline_depth > 0 else None)
    pending: List[np.ndarray] = []  # source frames awaiting pipelined results

    def emit(frame, det):
        nonlocal n_done, writer
        draw_boxes(frame, det, class_names=class_names)
        fps.tick()
        if show_fps:
            fps.overlay(frame)
        if output_path:
            # write incrementally (round-2 review: buffering every frame
            # until exit grows RAM without bound on long captures).
            # ``output_fps=None``: buffer only a short warmup, then open
            # the writer at the MEASURED loop rate (latest-frame-wins
            # makes the true rate unknowable upfront) and flush the buffer.
            if writer is None:
                warmup.append(frame)
                if output_fps is not None or len(warmup) >= 10                         or (max_frames is not None
                            and n_done + 1 >= max_frames):
                    rate = (float(output_fps) if output_fps is not None
                            else fps.fps())
                    h, w = frame.shape[:2]
                    writer = cv2.VideoWriter(
                        str(output_path), cv2.VideoWriter_fourcc(*"mp4v"),
                        max(rate, 1.0), (w, h))
                    for f in warmup:
                        writer.write(f)
                    warmup.clear()
            else:
                writer.write(frame)
        if shower is not None:
            shower.frame = frame
        n_done += 1

    try:
        while (not getter.stopped
               and (shower is None or not shower.stopped)
               and (max_frames is None or n_done < max_frames)):
            frame = getter.frame
            if frame is None:
                time.sleep(0.005)
                continue
            frame = frame.copy()
            if pipe is None:
                (det,) = detector.detect_batch(frame)
                emit(frame, det)
            else:
                done = pipe.submit(frame)
                pending.append(frame)
                for dets in done:
                    emit(pending.pop(0), dets[0])
        if pipe is not None:
            for dets in pipe.flush():
                if max_frames is not None and n_done >= max_frames:
                    break
                emit(pending.pop(0), dets[0])
    except KeyboardInterrupt:
        pass
    finally:
        getter.stop()
        if shower is not None:
            shower.stop()
        if writer is None and warmup and output_path:
            # loop ended before the warmup threshold: flush at measured rate
            h, w = warmup[0].shape[:2]
            writer = cv2.VideoWriter(str(output_path),
                                     cv2.VideoWriter_fourcc(*"mp4v"),
                                     max(fps.fps(), 1.0), (w, h))
            for f in warmup:
                writer.write(f)
        if writer is not None:
            writer.release()
    return n_done
