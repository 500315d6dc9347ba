"""End-to-end smoke tests over the CLI + entry points (SURVEY.md §4.5):
each BASELINE config as a scriptable flow on CPU with synthetic weights.
"""
import os

import numpy as np
import pytest

from yolov3_tpu.graph import load_graph
from yolov3_tpu.weights import random_raw, write_weights


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory, cfg_paths):
    g = load_graph(cfg_paths["yolov3-tiny"])
    path = tmp_path_factory.mktemp("w") / "tiny.weights"
    write_weights(path, g, random_raw(g, seed=42))
    return str(path)


@pytest.fixture(scope="module")
def sample_images(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("imgs")
    shapes = [(480, 640), (480, 640), (480, 640), (720, 405)]
    paths = []
    for i, (h, w) in enumerate(shapes):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = d / f"img{i}.jpg"
        cv2.imwrite(str(p), img)
        paths.append(str(p))
    return str(d), paths


def _cli(args):
    from yolov3_tpu.__main__ import main

    return main(args)


def test_cli_single_image(tiny_weights, sample_images, cfg_paths, models_dir,
                          tmp_path, capsys):
    out = tmp_path / "out.jpg"
    rc = _cli(["--image", sample_images[1][0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--class-names", os.path.join(models_dir, "coco.names"),
               "--no-show", "--output", str(out), "--verbose",
               "--prob-thresh", "0.3"])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    captured = capsys.readouterr().out
    assert "detections" in captured


def test_cli_directory_batched(tiny_weights, sample_images, cfg_paths,
                               tmp_path, capsys):
    """Mixed-resolution directory: bucket-by-shape + tail-padding path."""
    out_dir = tmp_path / "annotated"
    rc = _cli(["--image-dir", sample_images[0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--batch-size", "2",  # 3 same-shape images -> full chunk + padded tail
               "--no-show", "--output", str(out_dir),
               "--prob-thresh", "0.3"])
    assert rc == 0
    assert "4 images" in capsys.readouterr().out
    assert len(list(out_dir.iterdir())) == 4


def test_cli_video_file(tiny_weights, cfg_paths, tmp_path, capsys):
    import cv2

    src = tmp_path / "in.avi"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (320, 240))
    rng = np.random.default_rng(1)
    for _ in range(6):
        w.write(rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
    w.release()

    out = tmp_path / "out.avi"
    rc = _cli(["--video", str(src),
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--no-show", "--output", str(out), "--show-fps",
               "--frame-batch", "2", "--prob-thresh", "0.3"])
    assert rc == 0
    assert "processed 6 frames" in capsys.readouterr().out
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    cap.release()


def test_cli_video_pipeline_depth(tiny_weights, cfg_paths, tmp_path, capsys):
    """--pipeline-depth on the video path: deeper in-flight window must
    still process and write every frame in order (round-2 verdict next #4)."""
    import cv2

    src = tmp_path / "in.avi"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (320, 240))
    rng = np.random.default_rng(2)
    for _ in range(7):
        w.write(rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
    w.release()

    out = tmp_path / "out.avi"
    rc = _cli(["--video", str(src),
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--no-show", "--output", str(out),
               "--frame-batch", "2", "--pipeline-depth", "3",
               "--prob-thresh", "0.3"])
    assert rc == 0
    assert "processed 7 frames" in capsys.readouterr().out
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    cap.release()


def test_cli_video_scan(tiny_weights, cfg_paths, tmp_path, capsys):
    """--scan on the VIDEO path (round-3 verdict item 6): detect_in_video
    routes through Detector._stage_batch/_pipeline, so a scan-configured
    detector stacks each frame batch as (scan, B/scan, ...) and runs it as
    one multi-step dispatch — every frame must still come back, in order,
    including the padded final batch."""
    import cv2

    src = tmp_path / "in.avi"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                        (320, 240))
    rng = np.random.default_rng(3)
    for _ in range(7):
        w.write(rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
    w.release()

    out = tmp_path / "out.avi"
    rc = _cli(["--video", str(src),
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--no-show", "--output", str(out),
               "--frame-batch", "2", "--scan", "2",
               "--prob-thresh", "0.3"])
    assert rc == 0
    assert "processed 7 frames" in capsys.readouterr().out
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    cap.release()


def test_cli_profile_flag_writes_trace(tiny_weights, sample_images, cfg_paths,
                                       tmp_path, capsys):
    """--profile captures a jax.profiler trace around the run (SURVEY.md
    §5.1; works on CPU and through the TPU relay — see PARITY_CHECKLIST)."""
    trace_dir = tmp_path / "trace"
    rc = _cli(["--image", sample_images[1][0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--no-show", "--prob-thresh", "0.3",
               "--profile", str(trace_dir)])
    assert rc == 0
    assert "profiler trace written" in capsys.readouterr().out
    files = [p for p in trace_dir.rglob("*") if p.is_file()]
    assert files, "profiler trace directory is empty"


def test_cli_multi_resolution_override(tiny_weights, sample_images, cfg_paths,
                                       tmp_path):
    """--net-size 320 re-jits the same params at another resolution."""
    rc = _cli(["--image", sample_images[1][0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--net-size", "320", "--no-show",
               "--output", str(tmp_path / "o.jpg")])
    assert rc == 0


def test_cli_rejects_multiple_sources(tiny_weights, sample_images, cfg_paths):
    with pytest.raises(SystemExit):
        _cli(["--image", "a.jpg", "--video", "b.mp4",
              "--config", cfg_paths["yolov3-tiny"], "--weights", tiny_weights])


def test_cli_unknown_device_one_line_error(tiny_weights, sample_images,
                                           cfg_paths):
    """--device with an unknown platform exits with one line (and must not
    initialize other platforms first — `cpu:0` on the axon-latched host
    used to init/hang on the relay before ever picking CPU)."""
    import jax

    before = jax.config.jax_platforms
    try:
        with pytest.raises(SystemExit, match="--device"):
            _cli(["--image", sample_images[1][0],
                  "--config", cfg_paths["yolov3-tiny"],
                  "--weights", tiny_weights, "--device", "nosuch:0",
                  "--no-show"])
    finally:
        # the CLI pins jax_platforms before failing; restore for the rest
        # of the in-process suite
        jax.config.update("jax_platforms", before)


def test_cli_bad_net_size_one_line_error(tiny_weights, sample_images,
                                         cfg_paths):
    """A --net-size that isn't a stride multiple is a user error: one-line
    SystemExit, not a ValueError traceback from inside Detector."""
    with pytest.raises(SystemExit, match="max stride"):
        _cli(["--image", sample_images[1][0],
              "--config", cfg_paths["yolov3-tiny"],
              "--weights", tiny_weights, "--net-size", "100", "--no-show"])


def test_cli_missing_weights_file(sample_images, cfg_paths):
    with pytest.raises(FileNotFoundError):
        _cli(["--image", sample_images[1][0],
              "--config", cfg_paths["yolov3-tiny"],
              "--weights", "/nonexistent/w.weights", "--no-show"])


def test_cli_missing_image(tiny_weights, cfg_paths):
    with pytest.raises(FileNotFoundError, match="could not read image"):
        _cli(["--image", "/nonexistent/img.jpg",
              "--config", cfg_paths["yolov3-tiny"],
              "--weights", tiny_weights, "--no-show"])


def test_cli_wrong_weights_for_cfg(tiny_weights, sample_images, cfg_paths):
    """tiny weights against the full yolov3 cfg → clear census error."""
    with pytest.raises(ValueError, match="exhausted|mismatch"):
        _cli(["--image", sample_images[1][0],
              "--config", cfg_paths["yolov3"],
              "--weights", tiny_weights, "--no-show"])


def test_cli_device_flag_cpu(tiny_weights, sample_images, cfg_paths, tmp_path):
    rc = _cli(["--image", sample_images[1][0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights, "--device", "cpu:0",
               "--no-show", "--output", str(tmp_path / "d.jpg"),
               "--prob-thresh", "0.35"])
    assert rc == 0 and (tmp_path / "d.jpg").exists()


def test_cam_loop_headless_with_file_source(tiny_weights, cfg_paths, tmp_path):
    """Webcam loop driven by a file 'camera', headless (no shower thread);
    exits on EOF; frame-dropping (latest-wins) means processed ≤ total."""
    import cv2

    from yolov3_tpu.inference import Detector, detect_in_cam
    from yolov3_tpu.model import Darknet

    src = tmp_path / "cam.avi"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                        (320, 240))
    rng = np.random.default_rng(4)
    for _ in range(30):
        w.write(rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
    w.release()

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    out = tmp_path / "cam_out.avi"
    n = detect_in_cam(det, str(src), show=False, output_path=str(out),
                      show_fps=True, max_frames=50)
    assert 1 <= n <= 30
    assert out.exists()


def test_detector_jit_cache_reuse(tiny_weights, cfg_paths):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3)
    frames = np.zeros((2, 240, 320, 3), dtype=np.uint8)
    det.detect_batch(frames)
    det.detect_batch(frames)
    assert len(det._pipelines) == 1  # same bucket -> one executable
    det.detect_batch(np.zeros((1, 480, 640, 3), dtype=np.uint8))
    assert len(det._pipelines) == 2


def test_detector_empty_and_extreme_inputs(tiny_weights, cfg_paths):
    """Degenerate inputs are handled, not crashed on: empty batch/list →
    [] (previously a ZeroDivisionError / an opaque C++-loader rc=-1), and
    1-pixel / extreme-aspect frames letterbox without error."""
    from yolov3_tpu.inference import Detector, PipelinedDetector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    assert det.detect_batch(np.zeros((0, 160, 160, 3), np.uint8)) == []
    assert det.detect_mixed([]) == []
    assert PipelinedDetector(det).submit(
        np.zeros((0, 160, 160, 3), np.uint8)) == []
    rng = np.random.default_rng(0)
    extreme = [rng.integers(0, 256, (1, 1, 3), dtype=np.uint8),
               rng.integers(0, 256, (2, 600, 3), dtype=np.uint8),
               rng.integers(0, 256, (600, 2, 3), dtype=np.uint8)]
    assert len(det.detect_mixed(extreme)) == 3
    # float frames would be silently truncated to uint8 (all-zero images,
    # garbage detections) — the contract is raw uint8; fail loudly
    with pytest.raises(TypeError, match="uint8"):
        det.detect_batch(np.zeros((1, 160, 160, 3), np.float32))
    with pytest.raises(TypeError, match="uint8"):
        det.detect_mixed([np.zeros((160, 160, 3), np.float32)])
    # degenerate construction / calibration fail at the call site, not
    # minutes later inside a jitted trace (or silently)
    with pytest.raises(ValueError, match="top_k"):
        Detector(net, top_k=0)
    with pytest.raises(ValueError, match="calibration"):
        net.quantize_int8([])
    with pytest.raises(TypeError, match="uint8"):
        net.quantize_int8([np.zeros((160, 160, 3), np.float32)])
    # non-multiple-of-stride resolutions fail deep in the traced route
    # concat otherwise; darknet has the same /32 constraint
    with pytest.raises(ValueError, match="max stride"):
        Detector(net, net_hw=(100, 100))
    Detector(net, net_hw=(160, 96))  # non-square but /32: valid
    with pytest.raises(ValueError, match="iou_thresh"):
        Detector(net, iou_thresh=-0.5)
    with pytest.raises(ValueError, match="prob_thresh"):
        Detector(net, prob_thresh=2.0)


def test_detect_mixed_matches_detect_batch(tiny_weights, cfg_paths):
    """Host-native mixed-shape path ≈ pure-device path (±1 LSB resize)."""
    from yolov3_tpu import native
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    if not native.available():
        pytest.skip("native loader unavailable")
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.35)
    rng = np.random.default_rng(8)
    frames = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8),
              rng.integers(0, 256, (300, 300, 3), dtype=np.uint8)]
    mixed = det.detect_mixed(frames)
    singles = [det.detect_batch(f)[0] for f in frames]
    for m, s in zip(mixed, singles):
        # host resize rounds ±1 LSB vs device fp32 → tiny score shifts can
        # flip borderline candidates; survivor counts must agree closely AND
        # every *confident* device detection (score comfortably above the
        # 0.35 threshold) must be matched box-for-box in the host-native
        # path: same class, IoU>0.9, score within 0.02
        n = min(len(m.bbox_tlbr), len(s.bbox_tlbr))
        assert n > 0
        assert abs(len(m.bbox_tlbr) - len(s.bbox_tlbr)) <= max(2, n // 5)
        # "confident" = the highest-scoring detections (most stable under
        # ±1 LSB resize noise); synthetic-weight scores cluster near the
        # threshold so a fixed absolute bar would be empty
        k = min(3, len(s.class_prob))
        confident = np.argsort(s.class_prob)[::-1][:k]
        assert len(confident) > 0
        for box, prob, cls in zip(s.bbox_tlbr[confident],
                                  s.class_prob[confident],
                                  s.class_idx[confident]):
            same_cls = m.class_idx == cls
            assert same_cls.any(), f"class {cls} lost in mixed path"
            cand = m.bbox_tlbr[same_cls]
            ix1 = np.maximum(cand[:, :2], box[:2])
            ix2 = np.minimum(cand[:, 2:], box[2:])
            inter = np.prod(np.clip(ix2 - ix1, 0, None), axis=1)
            area = (np.prod(cand[:, 2:] - cand[:, :2], axis=1)
                    + np.prod(box[2:] - box[:2]) - inter)
            iou = inter / np.maximum(area, 1e-9)
            j = int(np.argmax(iou))
            assert iou[j] > 0.9, f"confident box unmatched (best IoU {iou[j]:.3f})"
            assert abs(m.class_prob[same_cls][j] - prob) < 0.02


def test_pipelined_detector(tiny_weights, cfg_paths):
    """PipelinedDetector: bounded in-flight depth, ordered results, and
    identical output to the synchronous path."""
    from yolov3_tpu.inference import Detector, PipelinedDetector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    pipe = PipelinedDetector(det, depth=2)

    rng = np.random.default_rng(9)
    batches = [rng.integers(0, 256, (2, 240, 320, 3), dtype=np.uint8)
               for _ in range(5)]
    collected = []
    for b in batches:
        collected.extend(pipe.submit(b))
        assert len(pipe._inflight) <= 2
    collected.extend(pipe.flush())
    assert len(pipe._inflight) == 0
    assert len(collected) == 5

    sync = [det.detect_batch(b) for b in batches]
    for got, want in zip(collected, sync):
        for g_det, w_det in zip(got, want):
            np.testing.assert_array_equal(g_det.class_idx, w_det.class_idx)
            np.testing.assert_allclose(g_det.bbox_tlbr, w_det.bbox_tlbr,
                                       atol=1e-4)


def test_detector_scan_matches_unscanned(tiny_weights, cfg_paths):
    """Detector(scan=K) fuses K pipeline steps into one lax.scan dispatch;
    results must be identical to the per-batch program, including when the
    input needs padding up to a multiple of scan."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    base = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    scanned = Detector(net, prob_thresh=0.3, net_hw=(160, 160), scan=3)

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (6, 240, 320, 3), dtype=np.uint8)
    want = [d for i in range(3)
            for d in base.detect_batch(frames[2 * i:2 * i + 2])]
    got = scanned.detect_batch(frames)
    assert len(got) == 6
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.class_idx, w.class_idx)
        np.testing.assert_allclose(g.class_prob, w.class_prob, atol=1e-5)
        np.testing.assert_allclose(g.bbox_tlbr, w.bbox_tlbr, atol=1e-3)

    # non-divisible batch: 5 frames pad to 6 on-device, pad results dropped
    got5 = scanned.detect_batch(frames[:5])
    assert len(got5) == 5
    for g, w in zip(got5, want[:5]):
        np.testing.assert_array_equal(g.class_idx, w.class_idx)
        np.testing.assert_allclose(g.bbox_tlbr, w.bbox_tlbr, atol=1e-3)


def test_detector_scan_quantized(tiny_weights, cfg_paths):
    """The scan wrapper composes with the int8 fast path."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    rng = np.random.default_rng(13)
    calib = [rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
             for _ in range(2)]
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    net.quantize_int8(calib, net_hw=(160, 160))
    base = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    scanned = Detector(net, prob_thresh=0.3, net_hw=(160, 160), scan=2)
    frames = rng.integers(0, 256, (4, 160, 160, 3), dtype=np.uint8)
    want = [d for i in range(2)
            for d in base.detect_batch(frames[2 * i:2 * i + 2])]
    got = scanned.detect_batch(frames)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g.class_idx, w.class_idx)
        np.testing.assert_allclose(g.bbox_tlbr, w.bbox_tlbr, atol=1e-3)


def test_detector_scan_validation(tiny_weights, cfg_paths):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.parallel.sharding import make_mesh

    from yolov3_tpu.parallel.spatial import make_spatial_mesh

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    with pytest.raises(ValueError, match="scan"):
        Detector(net, scan=0)
    # scan composes with a DATA mesh (test_sharding.py::test_detector_scan_
    # on_mesh); with the spatial latency mode it has no use case
    with pytest.raises(ValueError, match="partition='data'"):
        Detector(net, scan=2, mesh=make_spatial_mesh(2),
                 partition="spatial")
    assert Detector(net, scan=2, mesh=make_mesh(1)).scan == 2


def test_cli_scan_directory(tiny_weights, sample_images, cfg_paths, capsys):
    """--scan on the batched directory path (the throughput serving shape)."""
    rc = _cli(["--image-dir", sample_images[0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--batch-size", "4", "--scan", "2",
               "--no-show", "--prob-thresh", "0.3"])
    assert rc == 0
    assert "images" in capsys.readouterr().out


def test_cli_spatial_partition(tiny_weights, sample_images, cfg_paths,
                               tmp_path, capsys):
    """--spatial N: single-image latency mode over the virtual mesh."""
    out = tmp_path / "out.jpg"
    rc = _cli(["--image", sample_images[1][0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--net-size", "160", "--spatial", "4",
               "--no-show", "--output", str(out), "--verbose",
               "--prob-thresh", "0.3"])
    assert rc == 0
    assert out.exists()
    assert "detections" in capsys.readouterr().out


def test_cli_spatial_too_many_devices(tiny_weights, sample_images, cfg_paths):
    with pytest.raises(SystemExit, match="--spatial 64"):
        _cli(["--image", sample_images[1][0],
              "--config", cfg_paths["yolov3-tiny"],
              "--weights", tiny_weights, "--spatial", "64", "--no-show"])


def test_detector_warmup(tiny_weights, cfg_paths):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    det.warmup(2, (240, 320))
    assert len(det._pipelines) == 1
    det.warmup(4, (480, 640), host_preprocessed=True)
    assert len(det._pipelines) == 2
    # a real request on the warmed bucket adds no executable
    det.detect_batch(np.zeros((2, 240, 320, 3), dtype=np.uint8))
    assert len(det._pipelines) == 2


def test_inference_reference_api(tiny_weights, cfg_paths):
    """inference(net, frame) returns (bbox_tlbr, class_prob, class_idx)."""
    from yolov3_tpu.inference import inference
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    frame = np.random.default_rng(3).integers(0, 256, (480, 640, 3),
                                              dtype=np.uint8)
    results = inference(net, frame, prob_thresh=0.3)
    assert len(results) == 1
    bbox, prob, cls = results[0]
    assert bbox.ndim == 2 and bbox.shape[1] == 4
    assert prob.shape == cls.shape == (bbox.shape[0],)
    assert (bbox[:, 0] <= bbox[:, 2]).all() or bbox.shape[0] == 0
    # boxes are in source-image coordinates
    if bbox.shape[0]:
        assert bbox[:, 2].max() <= 640 and bbox[:, 3].max() <= 480


def test_cam_loop_pipelined(tiny_weights, cfg_paths, tmp_path):
    """Cam loop with pipeline_depth>0: same detection semantics as the
    synchronous loop, all submitted frames accounted for (VERDICT.md
    round-1 #10)."""
    import cv2

    from yolov3_tpu.inference import Detector, detect_in_cam
    from yolov3_tpu.model import Darknet

    src = tmp_path / "cam_p.avi"
    w = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                        (320, 240))
    rng = np.random.default_rng(11)
    for _ in range(24):
        w.write(rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
    w.release()

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    out = tmp_path / "cam_p_out.avi"
    n = detect_in_cam(det, str(src), show=False, output_path=str(out),
                      pipeline_depth=2, max_frames=40)
    assert 1 <= n <= 24
    assert out.exists()


def test_detector_mesh_requires_loaded_params(cfg_paths):
    """Detector(mesh=) on an unloaded net raises a clear error instead of
    crashing inside shard_params (VERDICT.md round-1 weak #5)."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.parallel.sharding import make_mesh

    net = Darknet(cfg_paths["yolov3-tiny"])  # no load_weights
    with pytest.raises(RuntimeError, match="load_weights"):
        Detector(net, mesh=make_mesh(1))


def test_detector_requantize_rebuilds_pipeline(tiny_weights, cfg_paths):
    """Quantizing (or re-quantizing) the net after a pipeline was built must
    rebuild the pipeline, not serve stale closed-over qparams."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (1, 240, 320, 3), dtype=np.uint8)
    det.detect_batch(frames)
    assert len(det._pipelines) == 1

    calib = [rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
             for _ in range(2)]
    net.quantize_int8(calib, net_hw=(160, 160))
    q1 = det.detect_batch(frames)  # must rebuild with the quantized path
    assert len(det._pipelines) == 2

    net.quantize_int8(calib[:1], net_hw=(160, 160))  # re-quantize
    q2 = det.detect_batch(frames)
    assert len(det._pipelines) == 3
    assert len(q1) == len(q2) == 1


def test_inference_oneshot_reuses_detector(tiny_weights, cfg_paths):
    """Repeated inference() calls hit one cached Detector/jit executable."""
    from yolov3_tpu import inference as inf_mod
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    rng = np.random.default_rng(9)
    frame = rng.integers(0, 256, (1, 240, 320, 3), dtype=np.uint8)
    n_before = len(inf_mod._ONESHOT_DETECTORS)
    r1 = inf_mod.inference(net, frame, prob_thresh=0.3)
    r2 = inf_mod.inference(net, frame, prob_thresh=0.3)
    assert len(inf_mod._ONESHOT_DETECTORS) == n_before + 1
    det = inf_mod._ONESHOT_DETECTORS[(id(net), 0.3, 0.3, "letterbox")]
    assert len(det._pipelines) == 1
    np.testing.assert_array_equal(r1[0][0], r2[0][0])


def test_detect_mixed_groups_shapes_without_native(tiny_weights, cfg_paths,
                                                   monkeypatch):
    """detect_mixed's non-native fallback batches same-shape frames
    together (order preserved) and matches detect_batch results."""
    from yolov3_tpu import native
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    rng = np.random.default_rng(11)
    a = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8) for _ in range(3)]
    b = [rng.integers(0, 256, (64, 96, 3), dtype=np.uint8) for _ in range(2)]
    frames = [a[0], b[0], a[1], b[1], a[2]]  # interleaved shapes

    monkeypatch.setattr(native, "available", lambda: False)
    mixed = det.detect_mixed(frames)
    assert len(mixed) == 5
    # order/content parity with per-shape detect_batch
    ra = det.detect_batch(np.stack(a))
    rb = det.detect_batch(np.stack(b))
    expect = [ra[0], rb[0], ra[1], rb[1], ra[2]]
    for m, e in zip(mixed, expect):
        np.testing.assert_array_equal(m.class_idx, e.class_idx)
        np.testing.assert_allclose(m.bbox_tlbr, e.bbox_tlbr, atol=1e-4)


def test_oneshot_cache_is_lru_bounded(tiny_weights, cfg_paths):
    """The one-shot inference() Detector cache evicts beyond capacity."""
    from yolov3_tpu import inference as inf_mod
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    frame = np.random.default_rng(3).integers(
        0, 256, (64, 96, 3), dtype=np.uint8)
    inf_mod._ONESHOT_DETECTORS.clear()
    for i in range(inf_mod._ONESHOT_CAPACITY + 3):
        inf_mod.inference(net, frame, prob_thresh=0.3 + i * 0.01)
    assert len(inf_mod._ONESHOT_DETECTORS) == inf_mod._ONESHOT_CAPACITY


def test_detect_directory_pads_final_chunk_to_one_executable(
        tiny_weights, cfg_paths, tmp_path, monkeypatch):
    """A directory whose count is not a batch_size multiple must NOT
    compile a second remainder-sized pipeline (round-2 fix: the final
    chunk/bucket is zero-padded to batch_size)."""
    import cv2

    from yolov3_tpu import native
    from yolov3_tpu.inference import Detector, detect_directory
    from yolov3_tpu.model import Darknet

    rng = np.random.default_rng(7)
    for i in range(5):  # 5 % 4 != 0
        cv2.imwrite(str(tmp_path / f"img{i}.png"),
                    rng.integers(0, 256, (96, 128, 3), dtype=np.uint8))

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    monkeypatch.setattr(native, "available", lambda: False)
    results = detect_directory(det, tmp_path, batch_size=4)
    assert len(results) == 5
    batch_keys = {key[0] for key in det._pipelines}
    assert batch_keys == {4}, f"extra executables compiled: {batch_keys}"


def test_top_k_auto_preset_policy(tiny_weights, cfg_paths):
    """Detector(top_k=None) resolves the NMS working set from the graph's
    candidate space (round-4 serving preset, measured in
    tools/bench_tiny_k.py): 256 when num_detections(net_hw) <= 4096
    (tiny-class graphs), 512 otherwise; an explicit top_k always wins."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet

    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(tiny_weights)
    assert net.graph.num_detections(416, 416) == 2535  # tiny-class
    assert Detector(net).top_k == 256
    assert Detector(net, net_hw=(416, 416)).top_k == 256
    # tiny@608: 5415 candidates — above the preset bound, full K
    assert Detector(net, net_hw=(608, 608)).top_k == 512
    assert Detector(net, top_k=128).top_k == 128  # explicit override
    g = load_graph(cfg_paths["yolov3"])
    assert g.num_detections(608, 608) == 22743  # full model: never preset


def test_cli_quantize_int8_percentile(tiny_weights, sample_images, cfg_paths,
                                      models_dir, tmp_path, capsys):
    """The --quantize-int8 CLI path end-to-end, including the round-5
    --calib-method/--calib-percentile knobs: calibrate on a directory,
    detect with the int8 tier, write the output image."""
    out = tmp_path / "out_q.jpg"
    rc = _cli(["--image", sample_images[1][0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--class-names", os.path.join(models_dir, "coco.names"),
               "--no-show", "--output", str(out), "--verbose",
               "--net-size", "160",
               "--quantize-int8", sample_images[0],
               "--calib-method", "percentile", "--calib-percentile", "99.5"])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    assert "int8-quantized" in capsys.readouterr().out

def test_cli_quant_state_cache(tiny_weights, sample_images, cfg_paths,
                               models_dir, tmp_path, capsys):
    """--quant-state cache semantics end-to-end: first run calibrates and
    saves the state; second run loads it WITHOUT --quantize-int8 and
    produces the identical detections; a missing state file without a
    calibration dir is a one-line user error."""
    qs = tmp_path / "tiny.quant.npz"
    base = ["--image", sample_images[1][0],
            "--config", cfg_paths["yolov3-tiny"],
            "--weights", tiny_weights,
            "--class-names", os.path.join(models_dir, "coco.names"),
            "--no-show", "--verbose", "--net-size", "160",
            "--quant-state", str(qs)]
    rc = _cli(base + ["--quantize-int8", sample_images[0],
                      "--output", str(tmp_path / "o1.jpg")])
    assert rc == 0 and qs.exists()
    out1 = capsys.readouterr().out
    assert "saved int8 quantization state" in out1

    rc = _cli(base + ["--output", str(tmp_path / "o2.jpg")])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "loaded int8 quantization state" in out2
    # identical detection lines (the printed table includes boxes+scores)
    det1 = [ln for ln in out1.splitlines() if "tlbr=" in ln]
    det2 = [ln for ln in out2.splitlines() if "tlbr=" in ln]
    assert det1 and det1 == det2

    with pytest.raises(SystemExit, match="file not found"):
        _cli(["--image", sample_images[1][0],
              "--config", cfg_paths["yolov3-tiny"],
              "--weights", tiny_weights, "--no-show",
              "--quant-state", str(tmp_path / "nope.npz")])

def test_cli_save_json(tiny_weights, sample_images, cfg_paths, models_dir,
                       tmp_path, capsys):
    """--save-json end-to-end on the directory path: every printed
    detection lands in the JSON with image ids, contiguous category ids,
    names, and COCO xywh boxes inside the source frame; stream sources
    reject the flag with a one-line error."""
    import json

    out = tmp_path / "dets.json"
    rc = _cli(["--image-dir", sample_images[0],
               "--config", cfg_paths["yolov3-tiny"],
               "--weights", tiny_weights,
               "--class-names", os.path.join(models_dir, "coco.names"),
               "--no-show", "--net-size", "160",
               "--prob-thresh", "0.3", "--save-json", str(out)])
    assert rc == 0
    assert "wrote" in capsys.readouterr().out
    dets = json.loads(out.read_text())
    assert dets, "expected detections at prob 0.3 with synthetic weights"
    names = {os.path.basename(p) for p in sample_images[1]}
    for d in dets:
        assert d["image_id"] in names
        assert 0 <= d["category_id"] < 80 and d["category_name"]
        x, y, w, h = d["bbox"]
        assert w >= 0 and h >= 0 and 0 <= d["score"] <= 1

    with pytest.raises(SystemExit, match="save-json needs"):
        _cli(["--video", "whatever.mp4",
              "--config", cfg_paths["yolov3-tiny"],
              "--weights", tiny_weights, "--no-show",
              "--save-json", str(out)])
