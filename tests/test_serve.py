"""HTTP serving endpoint tests: detect round-trip, health/stats, error paths."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from yolov3_tpu.graph import load_graph
from yolov3_tpu.weights import random_raw, write_weights


@pytest.fixture(scope="module")
def server(tmp_path_factory, cfg_paths):
    import cv2

    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.serve import serve

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path_factory.mktemp("w") / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=30))
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))

    srv = serve(det, class_names=["c%d" % i for i in range(80)],
                host="127.0.0.1", port=0, warmup_hw=(240, 320))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_detect_roundtrip(server):
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    status, body = _post(server + "/detect", buf.tobytes())
    assert status == 200
    assert body["image_hw"] == [240, 320]
    assert body["latency_ms"] > 0
    for d in body["detections"]:
        assert len(d["bbox_tlbr"]) == 4
        assert 0.0 <= d["score"] <= 1.0
        assert d["class_name"].startswith("c")


def test_healthz_and_stats(server):
    with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(server + "/stats", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["mean_latency_ms"] > 0


def test_metrics_prometheus_text():
    """_Stats.prometheus: cumulative le-bucket semantics, +Inf consistency,
    error/batch counters — checked on deterministic recorded values."""
    from yolov3_tpu.serve import _Stats

    st = _Stats()
    st.record(0.03)
    st.record(0.04)
    st.record(6.0)  # beyond the last finite bucket -> +Inf only
    st.record_error()
    st.record_batch(4)
    st.record_batch(4)
    st.record_stages({"decode_s": 0.002, "device_fetch_s": 0.05})
    st.record_stages({"decode_s": 0.004})
    text = st.prometheus(queue_depth=3)
    lines = dict(ln.rsplit(" ", 1) for ln in text.splitlines()
                 if ln and not ln.startswith("#"))
    assert lines["yolov3_requests_total"] == "3"
    assert lines["yolov3_errors_total"] == "1"
    assert lines['yolov3_request_latency_seconds_bucket{le="0.025"}'] == "0"
    assert lines['yolov3_request_latency_seconds_bucket{le="0.05"}'] == "2"
    assert lines['yolov3_request_latency_seconds_bucket{le="5.0"}'] == "2"
    assert lines['yolov3_request_latency_seconds_bucket{le="+Inf"}'] == "3"
    assert float(lines["yolov3_request_latency_seconds_sum"]) == \
        pytest.approx(6.07)
    assert lines["yolov3_request_latency_seconds_count"] == "3"
    assert lines['yolov3_device_batches_total{size="4"}'] == "2"
    assert lines["yolov3_queue_depth"] == "3"
    # per-stage summary (sum/count pairs, VERDICT r4 item 6)
    assert float(lines['yolov3_stage_seconds_sum{stage="decode_s"}']) == \
        pytest.approx(0.006)
    assert lines['yolov3_stage_seconds_count{stage="decode_s"}'] == "2"
    assert lines['yolov3_stage_seconds_count{stage="device_fetch_s"}'] == "1"
    # and the /stats JSON form agrees
    summary = st.stage_summary()
    assert summary["decode_s"] == {"mean_ms": 3.0, "count": 2}
    assert summary["device_fetch_s"]["count"] == 1


def test_metrics_endpoint(server):
    with urllib.request.urlopen(server + "/metrics", timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    lines = dict(ln.rsplit(" ", 1) for ln in text.splitlines()
                 if ln and not ln.startswith("#"))
    assert int(lines["yolov3_requests_total"]) >= 1
    # single-threaded mode: every device batch is one request
    assert int(lines['yolov3_device_batches_total{size="1"}']) >= 1
    # no batcher -> no queue to report
    assert "yolov3_queue_depth" not in lines
    # histogram total equals the request counter
    assert lines['yolov3_request_latency_seconds_bucket{le="+Inf"}'] \
        == lines["yolov3_request_latency_seconds_count"]


def test_stats_stage_timings(server):
    """The server reports the per-request stage split (VERDICT r4 item 6):
    decode on the handler plus the Detector's h2d/dispatch/device_fetch
    attribution — the transport/device split tools/bench_serve.py measured
    externally, now observable from /stats and /metrics."""
    import cv2

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    status, _ = _post(server + "/detect", buf.tobytes())
    assert status == 200
    with urllib.request.urlopen(server + "/stats", timeout=10) as r:
        stats = json.loads(r.read())
    stages = stats["stages"]
    for key in ("decode_s", "h2d_s", "dispatch_s", "device_fetch_s"):
        assert stages[key]["count"] >= 1
        assert stages[key]["mean_ms"] >= 0.0
    # single-threaded mode: requests and device batches are 1:1
    assert stages["decode_s"]["count"] == stages["device_fetch_s"]["count"]
    with urllib.request.urlopen(server + "/metrics", timeout=10) as r:
        text = r.read().decode()
    assert 'yolov3_stage_seconds_sum{stage="decode_s"}' in text
    assert 'yolov3_stage_seconds_count{stage="device_fetch_s"}' in text


def test_bad_payload_is_400(server):
    status, body = _post(server + "/detect", b"this is not an image")
    assert status == 400
    assert "decode" in body["error"]


def test_unknown_path_404(server):
    status, _ = _post(server + "/nope", b"x")
    assert status == 404


def test_serve_cli_bad_net_size(tmp_path, cfg_paths):
    """serve's CLI reports bad knob values as a one-line SystemExit (same
    convention as the main CLI), not a ValueError traceback."""
    from yolov3_tpu.serve import main

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=32))
    with pytest.raises(SystemExit, match="max stride"):
        main(["--weights", str(wpath),
              "--config", str(cfg_paths["yolov3-tiny"]),
              "--net-size", "100"])


def test_serve_cli_top_k_plumbed(tmp_path, cfg_paths):
    """--top-k / --max-results (round 4) flow into the Detector: a bad
    top_k surfaces as the Detector's one-line knob validation, proving the
    flag reaches the constructor rather than being silently dropped."""
    from yolov3_tpu.serve import main

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=32))
    with pytest.raises(SystemExit, match="top_k"):
        main(["--weights", str(wpath),
              "--config", str(cfg_paths["yolov3-tiny"]),
              "--top-k", "0"])


@pytest.fixture(scope="module")
def batched_server(tmp_path_factory, cfg_paths):
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.serve import serve

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path_factory.mktemp("w2") / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=31))
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    srv = serve(det, host="127.0.0.1", port=0, warmup_hw=(240, 320),
                batch_window_s=0.02, max_batch=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.batcher.stop()


def test_microbatched_concurrent_requests(batched_server):
    """8 concurrent clients through the micro-batcher: all succeed and the
    batcher coalesced them (server stays correct under concurrency)."""
    import cv2
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(1)

    def one(i):
        img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        return _post(batched_server + "/detect", buf.tobytes())

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, range(8)))
    assert all(status == 200 for status, _ in results)
    assert all("detections" in body for _, body in results)


def test_microbatched_bad_payload(batched_server):
    status, body = _post(batched_server + "/detect", b"garbage")
    assert status == 400


def test_microbatched_metrics(batched_server):
    """After the concurrent burst: coalesced batch sizes and the queue-depth
    gauge show up in /metrics."""
    with urllib.request.urlopen(batched_server + "/metrics", timeout=10) as r:
        text = r.read().decode()
    lines = dict(ln.rsplit(" ", 1) for ln in text.splitlines()
                 if ln and not ln.startswith("#"))
    assert "yolov3_queue_depth" in lines
    coalesced = {int(k.split('"')[1]): int(v) for k, v in lines.items()
                 if k.startswith("yolov3_device_batches_total")}
    # 8 requests through a max_batch=4 window: every recorded batch is
    # 1..4 requests and they sum to the request counter
    assert coalesced and all(1 <= s <= 4 for s in coalesced)
    assert sum(s * n for s, n in coalesced.items()) \
        == int(lines["yolov3_requests_total"])

def test_microbatched_stage_timings(batched_server):
    """Micro-batched mode: per-request queue_wait_s plus the Detector's
    batch-level stage split show up in /stats (batch-level observations
    can't outnumber per-request ones — requests coalesce)."""
    with urllib.request.urlopen(batched_server + "/stats", timeout=10) as r:
        stats = json.loads(r.read())
    stages = stats["stages"]
    assert stages["queue_wait_s"]["count"] >= 1
    assert stages["decode_s"]["count"] >= 1
    assert stages["device_fetch_s"]["count"] >= 1
    assert stages["device_fetch_s"]["count"] <= stages["queue_wait_s"]["count"]


def test_graceful_drain_mid_batch(tmp_path_factory, cfg_paths):
    """SIGTERM lands while requests sit mid-batch in the micro-batcher's
    window: every accepted request is answered 200, then the socket closes
    (VERDICT.md round-1 #7; SURVEY.md §5.3 posture)."""
    import signal
    import socket
    import cv2
    from concurrent.futures import ThreadPoolExecutor

    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.serve import install_graceful_shutdown, serve

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path_factory.mktemp("w3") / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=33))
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    # long window (300 ms) + big max_batch: the batch is guaranteed to be
    # still OPEN (mid-batch) when the signal fires
    srv = serve(det, host="127.0.0.1", port=0, warmup_hw=(240, 320),
                batch_window_s=0.3, max_batch=8)
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    old_term = signal.getsignal(signal.SIGTERM)
    old_int = signal.getsignal(signal.SIGINT)
    try:
        drained = install_graceful_shutdown(srv)

        rng = np.random.default_rng(2)
        ok, buf = cv2.imencode(
            ".jpg", rng.integers(0, 256, (240, 320, 3), dtype=np.uint8))
        assert ok

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [pool.submit(_post, url + "/detect", buf.tobytes())
                    for _ in range(4)]
            time.sleep(0.1)  # requests accepted, batch window still open
            signal.raise_signal(signal.SIGTERM)
            results = [f.result(timeout=60) for f in futs]

        assert all(status == 200 for status, _ in results)
        assert all("detections" in body for _, body in results)
        assert drained.wait(timeout=30)
        thread.join(timeout=10)
        assert not thread.is_alive()
        # socket released: a new connection must fail
        with pytest.raises(OSError):
            socket.create_connection(
                ("127.0.0.1", srv.server_address[1]), timeout=2)
    finally:
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)


def test_multi_shape_warmup(tmp_path_factory, cfg_paths):
    """serve(warmup_hw=[...]) pre-compiles one pipeline per source shape."""
    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.serve import serve

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path_factory.mktemp("w4") / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=34))
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160))
    srv = serve(det, host="127.0.0.1", port=0,
                warmup_hw=[(240, 320), (120, 160)])
    n = len(det._pipelines)
    assert n >= 1  # host-preprocessed warmups share the net-shape pipeline
    srv.server_close()


def test_serve_on_mesh(tmp_path, cfg_paths):
    """serve with a batch-DP mesh Detector (--devices N): single-image
    requests pad to the mesh and round-trip identically to 1-device."""
    import cv2

    from yolov3_tpu.inference import Detector
    from yolov3_tpu.model import Darknet
    from yolov3_tpu.parallel.sharding import make_mesh
    from yolov3_tpu.serve import serve

    g = load_graph(cfg_paths["yolov3-tiny"])
    wpath = tmp_path / "t.weights"
    write_weights(wpath, g, random_raw(g, seed=30))
    net = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
    det = Detector(net, prob_thresh=0.3, net_hw=(160, 160),
                   mesh=make_mesh(4))

    srv = serve(det, class_names=["c%d" % i for i in range(80)],
                host="127.0.0.1", port=0, warmup_hw=(240, 320))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        status, body = _post(url + "/detect", buf.tobytes())
        assert status == 200
        assert "detections" in body
        # same request against a 1-device Detector: identical answers
        net1 = Darknet(cfg_paths["yolov3-tiny"]).load_weights(wpath)
        det1 = Detector(net1, prob_thresh=0.3, net_hw=(160, 160))
        decoded = cv2.imdecode(buf, cv2.IMREAD_COLOR)
        r1 = det1.detect_batch(decoded[None])[0]
        assert len(body["detections"]) == len(r1.class_prob)
    finally:
        srv.shutdown()
