"""Rotated NMS and static decode tests, incl. a host-reference cross-check."""

import numpy as np
import jax.numpy as jnp
import pytest

from dafne_tpu.geometry.quads import sort_quadrilateral
from dafne_tpu.ops.nms import rotated_nms
from dafne_tpu.ops.postprocess import DecodeSpec, decode_detections
from dafne_tpu.models.head import compute_locations
from dafne_tpu.utils import polyiou_np


def _box(x0, y0, x1, y1):
    return [x0, y0, x1, y0, x1, y1, x0, y1]


def _nms_ref(corners, scores, classes, valid, thresh, merge=((5, 4),)):
    """Greedy reference NMS in float64 numpy."""
    cls = classes.copy()
    for s, d in merge:
        cls[cls == s] = d
    order = np.argsort(-np.where(valid, scores, -np.inf), kind="stable")
    keep = np.zeros(len(scores), bool)
    kept = []
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in kept:
            if cls[i] == cls[j] and polyiou_np.iou_poly(corners[i], corners[j]) > thresh:
                ok = False
                break
        if ok:
            keep[i] = True
            kept.append(i)
    return keep


def test_nms_basic_suppression():
    corners = jnp.asarray(
        [_box(0, 0, 10, 10), _box(1, 1, 11, 11), _box(50, 50, 60, 60)],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([0, 0, 0], jnp.int32)
    valid = jnp.ones(3, bool)
    keep = np.asarray(rotated_nms(corners, scores, classes, valid, 0.1))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_class_aware():
    corners = jnp.asarray([_box(0, 0, 10, 10), _box(1, 1, 11, 11)], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    keep = np.asarray(
        rotated_nms(corners, scores, jnp.asarray([0, 1], jnp.int32), jnp.ones(2, bool), 0.1)
    )
    np.testing.assert_array_equal(keep, [True, True])


def test_nms_vehicle_class_merge():
    # classes 4 and 5 are merged for NMS (nms.py:77-79)
    corners = jnp.asarray([_box(0, 0, 10, 10), _box(1, 1, 11, 11)], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    keep = np.asarray(
        rotated_nms(corners, scores, jnp.asarray([4, 5], jnp.int32), jnp.ones(2, bool), 0.1)
    )
    np.testing.assert_array_equal(keep, [True, False])


def test_nms_greedy_chain():
    # A(0.9) suppresses B(0.8); C(0.7) overlaps B but not A -> C survives
    corners = jnp.asarray(
        [_box(0, 0, 10, 10), _box(5, 0, 15, 10), _box(11, 0, 21, 10)], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.zeros(3, jnp.int32)
    keep = np.asarray(rotated_nms(corners, scores, classes, jnp.ones(3, bool), 0.3))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_invalid_slots():
    corners = jnp.asarray([_box(0, 0, 10, 10), _box(0, 0, 10, 10)], jnp.float32)
    scores = jnp.asarray([0.9, 0.95])
    valid = jnp.asarray([True, False])
    keep = np.asarray(
        rotated_nms(corners, scores, jnp.zeros(2, jnp.int32), valid, 0.1)
    )
    np.testing.assert_array_equal(keep, [True, False])


def test_nms_vs_host_reference_random():
    rng = np.random.RandomState(3)
    n = 40
    cx, cy = rng.uniform(10, 90, n), rng.uniform(10, 90, n)
    w, h = rng.uniform(5, 30, n), rng.uniform(5, 30, n)
    ang = rng.uniform(0, np.pi, n)
    corners = []
    for i in range(n):
        base = np.array(
            [[-w[i] / 2, -h[i] / 2], [w[i] / 2, -h[i] / 2],
             [w[i] / 2, h[i] / 2], [-w[i] / 2, h[i] / 2]]
        )
        c, s = np.cos(ang[i]), np.sin(ang[i])
        rot = base @ np.array([[c, s], [-s, c]])
        corners.append((rot + [cx[i], cy[i]]).reshape(8))
    corners = np.asarray(corners, np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    classes = rng.randint(0, 3, n).astype(np.int32)
    valid = np.ones(n, bool)

    got = np.asarray(
        rotated_nms(
            jnp.asarray(corners), jnp.asarray(scores), jnp.asarray(classes),
            jnp.asarray(valid), 0.3,
        )
    )
    want = _nms_ref(corners.astype(np.float64), scores, classes, valid, 0.3)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _synthetic_level(n, h, w, c, boxes, stride):
    """Head outputs with one confident detection per given (bi, y, x, cls, corners)."""
    logits = np.full((n, h, w, c), -8.0, np.float32)
    corners = np.zeros((n, h, w, 8), np.float32)
    ctrness = np.full((n, h, w, 1), 4.0, np.float32)
    for bi, yy, xx, cls, cor in boxes:
        logits[bi, yy, xx, cls] = 4.0
        loc = np.array([xx * stride + stride // 2, yy * stride + stride // 2])
        corners[bi, yy, xx] = (np.asarray(cor) - np.tile(loc, 4)) / stride
    return jnp.asarray(logits), jnp.asarray(corners), jnp.asarray(ctrness)


def test_decode_roundtrip():
    n, h, w, c, stride = 2, 16, 16, 3, 8
    want_box = _box(20, 20, 60, 44)
    logits, corners, ctrness = _synthetic_level(
        n, h, w, c, [(0, 4, 4, 1, want_box), (1, 8, 8, 2, _box(40, 40, 90, 70))], stride
    )
    spec = DecodeSpec(
        strides=(stride,), num_classes=c, pre_nms_topk=100, post_nms_topk=10,
        nms_max_candidates=64,
    )
    locs = [compute_locations(h, w, stride)]
    out = decode_detections(
        {"logits": [logits], "corners": [corners], "ctrness": [ctrness]}, locs, spec
    )
    assert out["scores"].shape == (2, 10)
    v0 = np.asarray(out["valid"][0])
    assert v0[0] and not v0[1:].any()  # exactly one detection in image 0
    got = np.asarray(out["corners"][0, 0])
    want_sorted = np.asarray(sort_quadrilateral(jnp.asarray(want_box, jnp.float32)[None]))[0]
    np.testing.assert_allclose(got, want_sorted, atol=1e-3)
    assert out["classes"][0, 0] == 1
    # score = sqrt(cls * ctr)
    want_score = np.sqrt(1 / (1 + np.exp(-4.0)) * 1 / (1 + np.exp(-4.0)))
    assert float(out["scores"][0, 0]) == pytest.approx(want_score, abs=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["hboxes"][0, 0]), [20, 20, 60, 44], atol=1e-3
    )


def test_decode_duplicate_suppressed_and_scaling():
    n, h, w, c, stride = 1, 16, 16, 2, 8
    box = _box(20, 20, 60, 44)
    # same box predicted at two adjacent locations -> NMS keeps one
    logits, corners, ctrness = _synthetic_level(
        n, h, w, c, [(0, 4, 4, 0, box), (0, 4, 5, 0, box)], stride
    )
    spec = DecodeSpec(strides=(stride,), num_classes=c, pre_nms_topk=100,
                      post_nms_topk=10, nms_max_candidates=64)
    locs = [compute_locations(h, w, stride)]
    out = decode_detections(
        {"logits": [logits], "corners": [corners], "ctrness": [ctrness]},
        locs, spec, scale_xy=jnp.asarray([[2.0, 0.5]]),
    )
    v = np.asarray(out["valid"][0])
    assert v.sum() == 1
    np.testing.assert_allclose(
        np.asarray(out["hboxes"][0, 0]), [40, 10, 120, 22], atol=1e-3
    )


def test_decode_ctr_not_in_score_unmixes():
    """CENTERNESS_USE_IN_SCORE=False: NMS ordering still uses sqrt(cls*ctr)
    (the reference always mixes, dafne_outputs.py:819-829) but the reported
    score reverts to the pure class confidence via s^2/ctr
    (dota_evaluation.py:134-137)."""
    n, h, w, c, stride = 1, 16, 16, 3, 8
    logits, corners, ctrness = _synthetic_level(
        n, h, w, c, [(0, 4, 4, 1, _box(20, 20, 60, 44))], stride
    )
    spec = DecodeSpec(
        strides=(stride,), num_classes=c, pre_nms_topk=100, post_nms_topk=10,
        nms_max_candidates=64, ctr_in_score=False,
    )
    locs = [compute_locations(h, w, stride)]
    out = decode_detections(
        {"logits": [logits], "corners": [corners], "ctrness": [ctrness]}, locs, spec
    )
    cls_prob = 1 / (1 + np.exp(-4.0))
    assert float(out["scores"][0, 0]) == pytest.approx(cls_prob, abs=1e-4)
    # masked slots stay exactly zero
    assert float(np.asarray(out["scores"])[0, 1:].max()) == 0.0


def test_grouped_nms_equals_global():
    """Per-class-group NMS must equal the global class-aware greedy whenever
    no group's candidates exceed its budget (exact decomposition)."""
    import numpy as np
    import jax.numpy as jnp

    from dafne_tpu.ops.nms import rotated_nms, rotated_nms_grouped

    rng = np.random.RandomState(5)
    n = 600
    cx, cy = rng.uniform(50, 950, (2, n))
    w, h = rng.uniform(10, 120, (2, n))
    th = rng.uniform(0, np.pi, n)
    dx = np.stack([-w, w, w, -w], 1) / 2
    dy = np.stack([-h, -h, h, h], 1) / 2
    c, s = np.cos(th)[:, None], np.sin(th)[:, None]
    quads = np.stack(
        [cx[:, None] + dx * c - dy * s, cy[:, None] + dx * s + dy * c], 2
    ).reshape(n, 8).astype(np.float32)
    # clusters of near-duplicates so suppression actually triggers
    quads[n // 2:] = quads[: n // 2] + rng.uniform(-4, 4, (n // 2, 8)).astype(
        np.float32
    )
    scores = jnp.asarray(rng.uniform(0.05, 1.0, n).astype(np.float32))
    classes = jnp.asarray(rng.randint(0, 15, n).astype(np.int32))
    valid = jnp.ones(n, bool)

    for merge in (((5, 4),), ()):
        keep_global = np.asarray(
            rotated_nms(jnp.asarray(quads), scores, classes, valid, 0.1, merge)
        )
        keep_grouped = np.asarray(
            rotated_nms_grouped(
                jnp.asarray(quads), scores, classes, valid, 0.1, merge,
                num_classes=15, group_k=256, min_total=0,
            )
        )
        np.testing.assert_array_equal(keep_grouped, keep_global)


def test_grouped_nms_no_class_starvation():
    """A scene dominated by one class must not push other classes' boxes
    past a global cap: grouped NMS keeps the minority class detections."""
    import numpy as np
    import jax.numpy as jnp

    from dafne_tpu.ops.nms import rotated_nms_grouped

    rng = np.random.RandomState(9)
    n_major, n_minor = 500, 8
    boxes = []
    for i in range(n_major + n_minor):
        x0 = rng.uniform(0, 950)
        y0 = rng.uniform(0, 950)
        boxes.append([x0, y0, x0 + 20, y0, x0 + 20, y0 + 20, x0, y0 + 20])
    quads = jnp.asarray(np.asarray(boxes, np.float32))
    # majority class scores all HIGHER than the minority's
    scores = jnp.asarray(
        np.concatenate([
            rng.uniform(0.5, 1.0, n_major),
            rng.uniform(0.1, 0.2, n_minor),
        ]).astype(np.float32)
    )
    classes = jnp.asarray(
        np.concatenate([np.zeros(n_major), np.ones(n_minor)]).astype(np.int32)
    )
    valid = jnp.ones(n_major + n_minor, bool)
    keep = np.asarray(
        rotated_nms_grouped(
            quads, scores, classes, valid, 0.1, (), num_classes=2,
            group_k=64, min_total=0,
        )
    )
    # all 8 minority boxes are disjoint -> all survive despite low rank
    assert keep[n_major:].sum() == n_minor
