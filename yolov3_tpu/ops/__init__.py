"""TPU compute ops: YOLO head decode, batched NMS, on-device preprocessing.

Each op ships a plain-``jnp`` reference implementation (XLA-fused, used for
parity tests and CPU CI) and, where profiling justifies it, a Pallas TPU kernel
selected via an ``impl=`` switch.
"""
from .decode import decode_head, decode_all  # noqa: F401
