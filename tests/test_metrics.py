"""Metrics vs their sklearn/torch oracles (utils.py:30-77,166-178,248-262)."""

import numpy as np
import pytest

from vision_transformer_cam_tpu.utils import metrics


def test_average_precision_matches_sklearn():
    from sklearn.metrics import average_precision_score
    rng = np.random.default_rng(0)
    for _ in range(50):
        y = (rng.random(20) < 0.3).astype(np.float32)
        if y.sum() == 0:
            y[rng.integers(20)] = 1
        s = rng.random(20)
        np.testing.assert_allclose(metrics.average_precision(y, s),
                                   average_precision_score(y, s), atol=1e-12)


def test_average_precision_with_ties():
    from sklearn.metrics import average_precision_score
    y = np.array([1, 0, 1, 0, 1, 1, 0, 0])
    s = np.array([0.9, 0.9, 0.5, 0.5, 0.5, 0.1, 0.1, 0.0])
    np.testing.assert_allclose(metrics.average_precision(y, s),
                               average_precision_score(y, s), atol=1e-12)


def test_reference_smoke_value():
    """The reference's own __main__ sanity check (utils.py:265-270)."""
    labels = np.array([1, 0, 1, 0, 0, 0])
    outputs = np.array([0.98, 0.3, 0.86, 0.85, 0.36, 0.48])
    from sklearn.metrics import average_precision_score
    np.testing.assert_allclose(metrics.average_precision(labels, outputs),
                               average_precision_score(labels, outputs))


def test_compute_mAP_skips_empty():
    labels = np.array([[0, 0, 0], [1, 0, 1]])
    outputs = np.array([[0.1, 0.2, 0.3], [0.9, 0.1, 0.8]])
    ap = metrics.compute_mAP(labels, outputs)
    assert len(ap) == 1 and ap[0] == 1.0


def test_f1_matches_sklearn():
    from sklearn.metrics import f1_score
    rng = np.random.default_rng(1)
    for _ in range(30):
        y = (rng.random(20) < 0.4).astype(int)
        p = (rng.random(20) < 0.4).astype(int)
        if (2 * (y & p).sum() + (~y.astype(bool) & p.astype(bool)).sum()
                + (y.astype(bool) & ~p.astype(bool)).sum()) == 0:
            continue
        np.testing.assert_allclose(metrics.f1_multihot(y, p),
                                   f1_score(y, p), atol=1e-12)


def test_topk_multihot():
    pred = np.array([[0.1, 0.9, 0.5, 0.3]])
    out = metrics.topk_multihot(pred, [2], 4)
    np.testing.assert_array_equal(out, [[0, 1, 1, 0]])


def test_confusion_matrix_matches_reference_semantics():
    """Same bincount construction as utils.py:35-45, including dropping GT
    pixels outside [0, n)."""
    cm = metrics.ConfusionMatrix(num_classes=20)
    rng = np.random.default_rng(2)
    gt = rng.integers(0, 21, size=1000)
    gt[::17] = 255  # VOC ignore pixels must be dropped
    pred = rng.integers(0, 21, size=1000)
    cm.update(gt, pred)

    n = 21
    k = (gt >= 0) & (gt < n)
    expect = np.bincount(n * gt[k] + pred[k], minlength=n * n).reshape(n, n)
    np.testing.assert_array_equal(cm.mat, expect)

    acc_global, acc, iu = cm.compute()
    assert 0 <= acc_global <= 1
    assert 0 <= cm.get_mIOU() <= 100


def test_confusion_matrix_perfect_prediction():
    cm = metrics.ConfusionMatrix(num_classes=2)
    gt = np.array([0, 1, 2, 0, 1, 2])
    cm.update(gt, gt)
    assert cm.get_mIOU() == 100.0
