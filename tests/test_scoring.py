"""Disambiguation math goldens (eval_utils.py:32-56, ned_task.py:25-46)."""

import numpy as np

from bootleg_spark.functions.embedding import (
    featurize_texts,
    featurize_tokens,
    masked_class_logsoftmax,
    score_batch,
)


def test_masked_logsoftmax_matches_manual():
    pred = np.array([[1.0, 2.0, 3.0]])
    mask = np.array([[True, True, False]])
    out = masked_class_logsoftmax(pred, mask)
    # masked slot gets log(1e-45) ≈ -103.6; softmax over first two
    expected = np.log(np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum())
    assert np.allclose(out[0, :2], expected)
    assert out[0, 2] < -80


def test_masked_logsoftmax_temperature():
    pred = np.array([[2.0, 4.0]])
    mask = np.array([[True, True]])
    hot = masked_class_logsoftmax(pred, mask, temp=2.0)
    expected = np.log(np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum())
    assert np.allclose(hot[0], expected)


def test_score_batch_argmax_and_mask():
    ctx = np.array([[1.0, 0.0], [0.0, 1.0]])
    ent = np.array(
        [
            [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]],
            [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]],
        ]
    )
    mask = np.array([[True, True, False], [True, True, False]])
    probs, arg = score_batch(ctx, ent, mask)
    assert arg.tolist() == [0, 1]
    assert np.allclose(probs.sum(axis=1), 1.0)
    assert (probs[:, 2] == 0).all()  # padded slot exactly zero


def test_featurize_deterministic_and_normalized():
    a = featurize_tokens(["spark", "join"], 64)
    b = featurize_tokens(["spark", "join"], 64)
    assert np.array_equal(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-12
    m = featurize_texts(["spark join", ""], 64)
    assert np.array_equal(m[0], a)
    assert np.array_equal(m[1], np.zeros(64))
