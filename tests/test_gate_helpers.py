"""The on-chip fused-head gate's comparison helper
(tools/tpu_check.py::_packed_paths_close) pins its own semantics here:
tolerance-aware, threshold-straddler-aware candidate comparison between two
float paths that differ only in accumulation order. A wrong gate either
blocks a correct kernel on the chip (false alarm on a straddler or an
argmax near-tie) or waves a broken one through (real divergence read as
noise) — both failure modes get a case below, including the bulk failure
shapes: a systematic one-sided threshold shift and a corrupted class lane.
"""
import numpy as np

from tools.tpu_check import _packed_paths_close

THRESH = 0.3


def _payload(scores, idx=None, boxes=None, cls=None):
    """(B=1, N, 8) record from score/class/index/box lanes."""
    n = len(scores)
    p = np.zeros((1, n, 8), np.float32)
    p[0, :, :4] = np.arange(4 * n, dtype=np.float32).reshape(n, 4) \
        if boxes is None else boxes
    p[0, :, 4] = scores
    if cls is not None:
        p[0, :, 5] = cls
    p[0, :, 6] = np.arange(n) if idx is None else idx
    return p, np.asarray([scores], np.float32)


def test_identical_paths_match():
    p, s = _payload([0.9, 0.0, 0.45])
    ok, st = _packed_paths_close(p, s, p.copy(), s.copy(),
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert ok and st["straddlers"] == 0 and st["score_mism"] == 0


def test_threshold_straddler_allowed():
    # one side zeroed its lane-4 in-kernel, the other kept a score a hair
    # above the threshold — float noise between the two accumulation orders
    p0, s0 = _payload([0.9, 0.0, 0.45])
    p1, s1 = _payload([0.9, THRESH + 1e-4, 0.45])
    ok, st = _packed_paths_close(p0, s0, p1, s1,
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert ok and st["straddlers"] == 1


def test_systematic_threshold_shift_rejected():
    # EVERY candidate near the threshold zeroed on exactly one side — each
    # mismatch individually looks like a straddler, but the bulk count
    # blows the noise budget (max(8, 0.5% of kept)): that shape is a biased
    # threshold compare in one path, not accumulation noise
    n = 30
    p0, s0 = _payload([0.0] * n)
    p1, s1 = _payload([THRESH + 1e-4] * n)
    ok, st = _packed_paths_close(p0, s0, p1, s1,
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert not ok
    assert st["straddlers"] == n and st["straddlers"] > st["budget"]


def test_real_score_divergence_rejected():
    # 0 vs 0.8 is not a straddler — the kept side is nowhere near the
    # threshold, so one path dropped a real detection
    p0, s0 = _payload([0.9, 0.0, 0.45])
    p1, s1 = _payload([0.9, 0.8, 0.45])
    ok, st = _packed_paths_close(p0, s0, p1, s1,
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert not ok
    # the diagnostic separates real mismatches from straddlers — a failure
    # must never be labeled as benign threshold noise
    assert st["score_mism"] == 1 and st["straddlers"] == 0


def test_above_threshold_drift_rejected():
    # both sides kept the candidate but the scores disagree beyond atol —
    # not a straddler (min != 0), a numeric bug
    p0, s0 = _payload([0.9, 0.5, 0.45])
    p1, s1 = _payload([0.9, 0.6, 0.45])
    ok, _ = _packed_paths_close(p0, s0, p1, s1,
                                prob_thresh=THRESH, score_atol=1e-4)
    assert not ok


def test_index_lane_mismatch_rejected():
    p0, s0 = _payload([0.9, 0.0, 0.45])
    p1, s1 = _payload([0.9, 0.0, 0.45], idx=[0, 1, 7])
    ok, _ = _packed_paths_close(p0, s0, p1, s1,
                                prob_thresh=THRESH, score_atol=1e-4)
    assert not ok


def test_index_lane_checked_only_where_kept():
    # lane 6 of a candidate BOTH sides zeroed is unconstrained scratch
    p0, s0 = _payload([0.9, 0.0, 0.45], idx=[0, 5, 2])
    p1, s1 = _payload([0.9, 0.0, 0.45], idx=[0, 9, 2])
    ok, _ = _packed_paths_close(p0, s0, p1, s1,
                                prob_thresh=THRESH, score_atol=1e-4)
    assert ok


def test_class_argmax_near_tie_flip_allowed():
    # a single class flip on a kept candidate is an argmax near-tie between
    # accumulation orders — within the noise budget, not a failure
    p0, s0 = _payload([0.9, 0.8, 0.45], cls=[3, 7, 1])
    p1, s1 = _payload([0.9, 0.8, 0.45], cls=[3, 12, 1])
    ok, st = _packed_paths_close(p0, s0, p1, s1,
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert ok and st["class_flips"] == 1


def test_class_lane_corruption_rejected():
    # scores/boxes/indices all agree but most class ids differ — a broken
    # in-kernel class argmax (score = sigmoid(obj)*sigmoid(max cls) is
    # unchanged by WHICH class wins, so only the class lane shows it)
    n = 20
    scores = [0.9] * n
    p0, s0 = _payload(scores, cls=list(range(n)))
    p1, s1 = _payload(scores, cls=[(c + 1) % 80 for c in range(n)])
    ok, st = _packed_paths_close(p0, s0, p1, s1,
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert not ok
    assert st["class_flips"] == n and st["class_flips"] > st["budget"]


def test_class_lane_unconstrained_at_straddlers():
    # a straddler never survives selection — its class lane is scratch
    p0, s0 = _payload([0.9, 0.0, 0.45], cls=[3, 5, 1])
    p1, s1 = _payload([0.9, THRESH + 1e-4, 0.45], cls=[3, 9, 1])
    ok, st = _packed_paths_close(p0, s0, p1, s1,
                                 prob_thresh=THRESH, score_atol=1e-4)
    assert ok and st["class_flips"] == 0 and st["straddlers"] == 1


def test_box_tolerance_is_per_path():
    boxes = np.arange(12, dtype=np.float32).reshape(3, 4)
    p0, s0 = _payload([0.9, 0.0, 0.45], boxes=boxes)
    p1, s1 = _payload([0.9, 0.0, 0.45], boxes=boxes + 0.4)  # bf16-scale px
    tight, _ = _packed_paths_close(p0, s0, p1, s1, prob_thresh=THRESH,
                                   score_atol=1e-4, box_atol=5e-3)
    loose, _ = _packed_paths_close(p0, s0, p1, s1, prob_thresh=THRESH,
                                   score_atol=1e-4, box_atol=0.75)
    assert not tight and loose
