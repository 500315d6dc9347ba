"""tpu-yolov3: a TPU-native YOLOv3 inference framework (JAX/XLA/Pallas).

Capability-parity rebuild of ``nrsyed/pytorch-yolov3`` (see SURVEY.md):
Darknet ``.cfg`` → static graph → single jitted XLA computation, bit-exact
``.weights`` loading with BN folding, on-device letterbox + decode + batched
class-aware NMS, and image / directory / video / webcam entry points.
"""
from .config import parse_config, parse_config_text
from .graph import Graph, Node, load_graph, lower
from .model import Darknet, forward, forward_features
from .weights import load_weights

__version__ = "0.1.0"

__all__ = [
    "parse_config", "parse_config_text", "Graph", "Node", "load_graph",
    "lower", "Darknet", "forward", "forward_features", "load_weights",
    "__version__",
]
