"""Self-contained demo: build a model, synthesize weights, detect, draw.

No downloads needed — runs entirely from the repo (random weights, random
image), exercising the same code paths real weights use:

    python examples/demo.py [--precision bf16] [--cfg yolov3-tiny.cfg]
"""
import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov3-tiny.cfg")
    ap.add_argument("--precision", default=None,
                    choices=(None, "default", "highest", "bf16"))
    ap.add_argument("--out", default="demo_out.jpg")
    args = ap.parse_args()

    import cv2

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.utils.drawing import draw_boxes, load_class_names
    from yolov3_tpu.weights import random_raw, write_weights

    cfg = REPO / "models" / args.cfg
    graph = load_graph(cfg)
    print(graph.summary())

    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        print("\nsynthesizing random weights (real ones: models/get_weights.sh)")
        write_weights(f.name, graph, random_raw(graph, seed=0))
        net = Darknet(cfg, precision=args.precision).load_weights(f.name)

    detector = Detector(net, prob_thresh=0.35)
    frame = np.random.default_rng(0).integers(0, 256, (480, 640, 3),
                                              dtype=np.uint8)
    (result,) = detector.detect_batch(frame)
    names = load_class_names(REPO / "models" / "coco.names")
    print(f"\n{len(result.bbox_tlbr)} detections "
          f"(random weights → random boxes):")
    for box, prob, cls in list(zip(result.bbox_tlbr, result.class_prob,
                                   result.class_idx))[:10]:
        print(f"  {names[int(cls)]:20s} {prob:.3f} "
              f"({box[0]:.0f},{box[1]:.0f},{box[2]:.0f},{box[3]:.0f})")

    draw_boxes(frame, result, class_names=names)
    cv2.imwrite(args.out, frame)
    print(f"\nannotated image written to {args.out}")


if __name__ == "__main__":
    main()
