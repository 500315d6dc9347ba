"""Batch-data-parallel sharding (SURVEY.md §2.15).

The reference is strictly single-process/single-device; the only parallelism
this workload needs (and the one BASELINE config #3 exercises) is **data
parallelism over the batch axis**. TPU-native recipe: one ``Mesh`` with a
``data`` axis, params replicated, activations sharded on batch —
``jax.jit`` + ``NamedSharding`` lets XLA place each image's whole pipeline
(preprocess → convs → decode → NMS) on its shard's chip with **zero
collectives in steady state** (detections come back already per-image; there
is nothing to all-reduce in inference). Cross-chip traffic only happens at
the host→device scatter of the input batch, which rides ICI after the first
transfer.

YOLOv3 is ~62 M params (≈248 MB fp32, ≈124 MB bf16) — it fits trivially in
one chip's HBM, so memory never forces model parallelism (SURVEY.md
§2.15); for LATENCY-bound serving, where DP cannot help, ``spatial.py``
shards single images over the mesh instead (halo-exchange rows + channel
pairs). On a single-device mesh every sharding below degrades to identity,
so the same code path runs 1-chip and N-chip.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # public location since jax 0.8 (kw: check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax (kw: check_rep)
    from jax.experimental.shard_map import shard_map

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the batch axis. Defaults to all visible devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} visible")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate the (small) param pytree onto every mesh device."""
    rep = replicate(mesh)
    return jax.device_put(params, rep)


def sharded_pipeline(graph, mesh: Mesh, net_hw: Tuple[int, int],
                     prob_thresh: float = 0.05, iou_thresh: float = 0.3,
                     top_k: int = 512, mode: str = "letterbox",
                     precision: Optional[str] = None, bgr: bool = True,
                     act_scales=None, act_zeros=None,
                     carrier: str = "bf16",
                     conv_impl: str = "xla",
                     nms_impl: str = "xla", decode_impl: str = "pallas",
                     max_results: int = 0, scan: int = 1,
                     select_group: int = 2, block_impl: str = "xla"):
    """Build the batch-DP end-to-end detect step, jitted over ``mesh``.

    Returns ``run(params, frames_u8)``: uint8 (B, H, W, 3) sharded on batch →
    NMSResult pytree sharded on batch. B must be divisible by mesh size.
    Pass ``act_scales`` (and int8 qparams as ``params``) for the quantized
    path.

    ``scan > 1`` is the multi-chip throughput configuration: the input is a
    (scan, B, H, W, 3) stack sharded on axis 1, and each chip runs a
    ``lax.scan`` of ``scan`` full steps over its local slice inside ONE
    dispatched program (launch overhead amortizes scan×, exactly as in the
    single-chip ``Detector(scan=)``). Results come back as a (scan, B, ...)
    pytree still sharded on axis 1 — the batch axis never crosses chips, so
    the zero-collective contract is preserved; callers merge the two
    leading axes host-side (``Detector._unpack`` does).
    """
    from ..model import forward_compact
    from ..ops.nms import batched_nms_compact
    from ..ops.pallas_decode import supported as _pallas_decode_ok
    from ..ops.preprocess import preprocess

    if decode_impl == "pallas-fused":
        from ..model import fused_heads_eligible

        # head-fused decode is per-chip local exactly like the packed path;
        # float paths + the int8-carrier path (bf16-carrier stays unfused)
        if ((act_scales is not None and carrier != "int8")
                or not fused_heads_eligible(graph)):
            decode_impl = "pallas"
    if (decode_impl in ("pallas", "pallas-fused")
            and not _pallas_decode_ok([n.anchors for n in graph.yolo_nodes])):
        decode_impl = "xla"  # >4 anchors/head: kernel layout cap

    data_in = batch_sharding(mesh, 4)
    out_spec = NamedSharding(mesh, P(DATA_AXIS))

    def step(params, frames_u8):
        if bgr:
            frames_u8 = frames_u8[..., ::-1]
        x = preprocess(frames_u8, net_hw, mode=mode)
        if decode_impl in ("pallas", "pallas-fused"):
            # fused packed path (see inference.py): per-chip local, so it
            # shards over batch exactly like the compact path
            from ..ops.nms import batched_nms_packed

            if act_scales is not None:
                from ..quant import (forward_packed_fused_int8,
                                     forward_packed_int8)

                fwd_q = (forward_packed_fused_int8
                         if decode_impl == "pallas-fused"
                         else forward_packed_int8)
                payload, scores = fwd_q(
                    graph, params, act_scales, x, prob_thresh=prob_thresh,
                    precision=precision or "bf16", carrier=carrier,
                    block_impl=block_impl, zeros=act_zeros)
            else:
                from ..model import forward_packed, forward_packed_fused

                fwd = (forward_packed_fused
                       if decode_impl == "pallas-fused" else forward_packed)
                payload, scores = fwd(graph, params, x,
                                      prob_thresh=prob_thresh,
                                      precision=precision,
                                      conv_impl=conv_impl)
            return batched_nms_packed(payload, scores,
                                      iou_thresh=iou_thresh, top_k=top_k,
                                      impl=nms_impl, max_results=max_results,
                                      select_group=select_group)
        if act_scales is not None:
            from ..quant import forward_compact_int8

            boxes, scores, classes = forward_compact_int8(
                graph, params, act_scales, x, precision=precision or "bf16",
                decode_impl=decode_impl, carrier=carrier,
                block_impl=block_impl, zeros=act_zeros)
        else:
            boxes, scores, classes = forward_compact(graph, params, x,
                                                     precision=precision,
                                                     conv_impl=conv_impl,
                                                     decode_impl=decode_impl)
        return batched_nms_compact(boxes, scores, classes,
                                   prob_thresh=prob_thresh,
                                   iou_thresh=iou_thresh, top_k=top_k,
                                   impl=nms_impl, max_results=max_results,
                                   select_group=select_group)

    # shard_map, not bare GSPMD propagation: the serving fast path embeds
    # Pallas kernels (decode) that lower to custom calls with no SPMD
    # partitioning rule — under plain jit+NamedSharding, GSPMD would have
    # to replicate them (all-gathering the batch-sharded heads onto every
    # chip), silently breaking the zero-collective DP contract on real
    # multi-chip meshes (round-2 review). shard_map runs the WHOLE step
    # per-shard on its local batch slice, so every op — XLA or Mosaic — is
    # chip-local by construction and the only cross-chip traffic is the
    # input scatter.
    if scan > 1:
        def step_scanned(params, frames_stack):
            def body(carry, fr):
                return carry, step(params, fr)

            _, res = jax.lax.scan(body, jnp.int32(0), frames_stack)
            return res

        mapped = shard_map(
            step_scanned, mesh=mesh,
            in_specs=(P(), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS),
            check_rep=False,
        )
        stack_in = NamedSharding(mesh, P(None, DATA_AXIS))
        stack_out = NamedSharding(mesh, P(None, DATA_AXIS))
        return jax.jit(
            mapped,
            in_shardings=(replicate(mesh), stack_in),
            out_shardings=jax.tree.map(lambda _: stack_out,
                                       _nms_result_struct()),
        )

    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    return jax.jit(
        mapped,
        in_shardings=(replicate(mesh), data_in),
        out_shardings=jax.tree.map(lambda _: out_spec, _nms_result_struct()),
    )


def _nms_result_struct():
    """Pytree prototype matching NMSResult's structure for out_shardings."""
    from ..ops.nms import NMSResult

    return NMSResult(boxes=0, scores=0, classes=0, valid=0)
