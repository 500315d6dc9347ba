"""mAP metric tests (tools/eval_coco.py) on constructed cases with known AP,
plus an end-to-end run of the eval harness on a synthetic COCO dataset."""
import json

import numpy as np

from tools.eval_coco import (average_precision, box_iou_matrix, evaluate,
                             match_detections, run_model_on_coco)


def test_iou_matrix_basics():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    iou = box_iou_matrix(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detector_ap_is_one():
    gt = {0: {0: np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)}}
    det = {0: {0: (np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
                   np.array([0.9, 0.8]))}}
    res = evaluate(det, gt)
    assert res["mAP50"] == 1.0
    assert res["mAP50_95"] == 1.0


def test_no_detections_ap_zero():
    gt = {0: {0: np.array([[0, 0, 10, 10]], np.float32)}}
    res = evaluate({}, gt)
    assert res["mAP50"] == 0.0


def test_false_positives_reduce_precision():
    gt = {0: {0: np.array([[0, 0, 10, 10]], np.float32)}}
    # one perfect hit at high score, one far-away FP at higher score
    det = {0: {0: (np.array([[50, 50, 60, 60], [0, 0, 10, 10]], np.float32),
                   np.array([0.95, 0.9]))}}
    res = evaluate(det, gt)
    # recall reaches 1.0 but precision at that recall is 0.5
    assert 0.4 < res["mAP50"] < 0.6


def test_localization_quality_separates_thresholds():
    gt = {0: {0: np.array([[0, 0, 100, 100]], np.float32)}}
    det = {0: {0: (np.array([[0, 0, 100, 80]], np.float32),  # IoU = 0.8
                   np.array([0.9]))}}
    res = evaluate(det, gt)
    assert res["mAP50"] == 1.0          # passes 0.5/0.75 thresholds
    assert 0.5 < res["mAP50_95"] < 0.75  # fails at ≥0.85 thresholds


def test_greedy_matching_one_gt_per_det():
    gt_boxes = np.array([[0, 0, 10, 10]], np.float32)
    det_boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    matched = match_detections(det_boxes, np.array([0.9, 0.8]), gt_boxes, 0.5)
    assert matched.tolist() == [True, False]  # second det can't re-match


def test_ap_handles_empty_class():
    assert np.isnan(average_precision(np.zeros(0), np.zeros(0, bool), 0))
    assert average_precision(np.zeros(0), np.zeros(0, bool), 3) == 0.0


def test_run_model_on_coco_end_to_end(tmp_path, cfg_paths):
    """The full eval harness: synthetic COCO json + images + random weights
    → finite mAP numbers without crashing (sparse category ids, mixed
    image sizes, iscrowd skipping)."""
    import cv2

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import random_raw, write_weights

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=12))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i, (h, w) in enumerate([(240, 320), (300, 300)]):
        name = f"im{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        images.append({"id": 100 + i, "file_name": name,
                       "height": h, "width": w})
        annotations.append({"id": i * 2, "image_id": 100 + i,
                            "category_id": 18,  # sparse COCO ids
                            "bbox": [10, 10, 80, 60], "iscrowd": 0})
        annotations.append({"id": i * 2 + 1, "image_id": 100 + i,
                            "category_id": 3,
                            "bbox": [50, 50, 40, 40], "iscrowd": 1})  # skip
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 3, "name": "car"},
                           {"id": 18, "name": "dog"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(coco))

    res = run_model_on_coco(img_dir, ann_path, cfg_paths["yolov3-tiny"],
                            wpath, prob_thresh=0.3, batch_size=2)
    assert 0.0 <= res["mAP50"] <= 1.0
    assert 0.0 <= res["mAP50_95"] <= res["mAP50"] + 1e-9


def test_run_model_on_coco_int8(tmp_path, cfg_paths):
    """quantize_int8=N evaluates the int8-carrier serving tier: PTQ
    calibration on the first N eval images, finite mAP out — the accuracy
    harness for the int8 speed numbers."""
    import cv2

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import random_raw, write_weights

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=12))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 256, (200, 200, 3), dtype=np.uint8))
    ann = {"images": [{"id": 1, "file_name": "a.jpg", "height": 200,
                       "width": 200}],
           "annotations": [{"id": 1, "image_id": 1, "category_id": 7,
                            "bbox": [10, 10, 80, 60], "iscrowd": 0}],
           "categories": [{"id": 7, "name": "truck"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    res = run_model_on_coco(img_dir, ann_path, cfg_paths["yolov3-tiny"],
                            wpath, prob_thresh=0.3, batch_size=1,
                            quantize_int8=1)
    assert 0.0 <= res["mAP50"] <= 1.0
    assert np.isfinite(res["mAP50_95"])


def test_truncation_audit_auto_triggers(tmp_path, cfg_paths):
    """Round-2 verdict next #5: with a top_k small enough to saturate
    (random weights pass thousands of candidates at 0.05), the auto audit
    re-runs the saturated images at 2x top_k and reports the mAP delta in
    the result instead of advising a manual re-run."""
    import cv2

    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import random_raw, write_weights

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=21))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
    ann = {"images": [{"id": 5, "file_name": "a.jpg", "height": 240,
                       "width": 320}],
           "annotations": [{"id": 1, "image_id": 5, "category_id": 1,
                            "bbox": [10, 10, 80, 60], "iscrowd": 0}],
           "categories": [{"id": 1, "name": "person"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    res = run_model_on_coco(img_dir, ann_path, cfg_paths["yolov3-tiny"],
                            wpath, prob_thresh=0.05, batch_size=1, top_k=4)
    assert res["saturated_images"] >= 1  # K=4 must saturate on random weights
    audit = res["audit"]
    assert audit["top_k"] == 8
    assert audit["sample_images"] == 1
    assert np.isfinite(audit["mAP50_delta"])
    assert np.isfinite(audit["mAP50_95_delta"])


def test_eval_cli_main(tmp_path, cfg_paths, capsys, monkeypatch):
    """tools/eval_coco.py CLI entry prints the mAP JSON line."""
    import cv2

    from tools import eval_coco
    from yolov3_tpu.graph import load_graph
    from yolov3_tpu.weights import random_raw, write_weights

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=13))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"),
                np.random.default_rng(0).integers(0, 256, (240, 320, 3),
                                                  dtype=np.uint8))
    ann = {"images": [{"id": 1, "file_name": "a.jpg", "height": 240,
                       "width": 320}],
           "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                            "bbox": [10, 10, 50, 50], "iscrowd": 0}],
           "categories": [{"id": 1, "name": "person"}]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    monkeypatch.setattr("sys.argv", [
        "eval_coco.py", "--images", str(img_dir),
        "--annotations", str(ann_path), "--config", cfg_paths["yolov3-tiny"],
        "--weights", str(wpath), "--prob-thresh", "0.3", "--batch-size", "2"])
    eval_coco.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert "mAP50" in out and "mAP50_95" in out


def test_multi_class_macro_average():
    gt = {0: {0: np.array([[0, 0, 10, 10]], np.float32),
              1: np.array([[20, 20, 30, 30]], np.float32)}}
    det = {0: {0: (np.array([[0, 0, 10, 10]], np.float32), np.array([0.9])),
               1: (np.array([[90, 90, 99, 99]], np.float32), np.array([0.9]))}}
    res = evaluate(det, gt)
    assert abs(res["mAP50"] - 0.5) < 1e-6  # class 0 AP=1, class 1 AP=0
def test_score_detections_file_offline(tmp_path):
    """Offline scoring (--detections): a --save-json-style results file
    (file-name image ids, contiguous category ids, COCO xywh boxes) scores
    against a COCO annotation file without running the model; perfect
    detections → mAP 1.0; unknown image ids are counted, not dropped
    silently; sparse COCO category ids work via category_ids="coco"."""
    from tools.eval_coco import score_detections_file

    ann = {
        "categories": [{"id": 1}, {"id": 3}, {"id": 7}],  # sparse ids
        "images": [{"id": 10, "file_name": "a.jpg"},
                   {"id": 11, "file_name": "b.jpg"}],
        "annotations": [
            {"image_id": 10, "category_id": 3, "bbox": [5, 5, 20, 10]},
            {"image_id": 11, "category_id": 7, "bbox": [0, 0, 8, 8]},
            {"image_id": 11, "category_id": 7, "bbox": [40, 40, 6, 12],
             "iscrowd": 1},  # crowd: excluded from GT
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    # contiguous ids (sorted sparse [1,3,7] → 0,1,2), file-name image ids
    dets = [
        {"image_id": "a.jpg", "category_id": 1, "bbox": [5, 5, 20, 10],
         "score": 0.9},
        {"image_id": "b.jpg", "category_id": 2, "bbox": [0, 0, 8, 8],
         "score": 0.8},
        {"image_id": "missing.jpg", "category_id": 0, "bbox": [0, 0, 1, 1],
         "score": 0.5},
    ]
    det_path = tmp_path / "dets.json"
    det_path.write_text(json.dumps(dets))
    res = score_detections_file(det_path, ann_path)
    assert res["mAP50"] == 1.0 and res["mAP50_95"] == 1.0
    assert res["skipped_entries"] == 1

    # official-results convention: numeric image ids + sparse category ids
    dets_coco = [
        {"image_id": 10, "category_id": 3, "bbox": [5, 5, 20, 10],
         "score": 0.9},
        {"image_id": 11, "category_id": 7, "bbox": [0, 0, 8, 8],
         "score": 0.8},
        {"image_id": 11, "category_id": 99, "bbox": [0, 0, 1, 1],
         "score": 0.5},  # unknown sparse id
    ]
    det_path.write_text(json.dumps(dets_coco))
    res = score_detections_file(det_path, ann_path, category_ids="coco")
    assert res["mAP50"] == 1.0
    assert res["skipped_entries"] == 1

    # a false positive on an annotated image drags AP below 1
    dets_fp = dets[:2] + [{"image_id": "a.jpg", "category_id": 1,
                           "bbox": [100, 100, 5, 5], "score": 0.95}]
    det_path.write_text(json.dumps(dets_fp))
    res = score_detections_file(det_path, ann_path)
    assert res["mAP50"] < 1.0


def test_save_json_roundtrips_through_offline_scoring(tmp_path):
    """The CLI's --save-json output scores 1.0 against GT synthesized from
    the same detections — the exporter and the offline scorer agree on the
    bbox convention (tlbr → xywh → tlbr)."""
    from tools.eval_coco import score_detections_file
    from yolov3_tpu.inference import Detection
    from yolov3_tpu.utils.export import save_detections_json

    rng = np.random.default_rng(0)
    results, ann_images, ann_list = {}, [], []
    for k in range(3):
        tl = rng.uniform(0, 100, (4, 2))
        wh = rng.uniform(5, 50, (4, 2))
        boxes = np.concatenate([tl, tl + wh], axis=1).astype(np.float32)
        cls = rng.integers(0, 5, 4)
        results[f"img{k}.jpg"] = Detection(
            bbox_tlbr=boxes,
            class_prob=rng.uniform(0.3, 1.0, 4).astype(np.float32),
            class_idx=cls.astype(np.int32))
        ann_images.append({"id": k, "file_name": f"img{k}.jpg"})
        for b, c in zip(boxes, cls):
            ann_list.append({"image_id": k, "category_id": int(c) + 1,
                             "bbox": [float(b[0]), float(b[1]),
                                      float(b[2] - b[0]),
                                      float(b[3] - b[1])]})
    det_path = tmp_path / "dets.json"
    save_detections_json(det_path, results)
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps({
        "categories": [{"id": i + 1} for i in range(5)],
        "images": ann_images, "annotations": ann_list}))
    res = score_detections_file(det_path, ann_path)
    assert res["skipped_entries"] == 0
    assert res["mAP50"] == 1.0 and res["mAP50_95"] == 1.0
