"""Native (C++/ctypes) data-pipeline parity with numpy. The framework must
work with or without the compiled library; these tests assert availability
(the toolchain is part of the supported environment) plus exact parity."""

import numpy as np
import pytest

from tinynn_autograd_tpu import native


def test_native_available():
    assert native.available(), "g++ build of the native data loader failed"


def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randn(1000, 37).astype(np.float32)
    idx = rng.randint(0, 1000, 513)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rows_fallback_dtypes():
    rng = np.random.RandomState(1)
    src = rng.randn(100, 5)  # float64 -> numpy fallback path
    idx = rng.randint(0, 100, 50)
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_one_hot_matches_numpy():
    labels = np.array([0, 3, 9, 3, 1])
    np.testing.assert_array_equal(
        native.one_hot(labels, 10), np.eye(10, dtype=np.float32)[labels])


def test_permutation_deterministic_and_valid():
    p1 = native.permutation(1000, seed=42)
    p2 = native.permutation(1000, seed=42)
    p3 = native.permutation(1000, seed=43)
    np.testing.assert_array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
    assert sorted(p1.tolist()) == list(range(1000))


def test_batch_iterator_uses_native_path():
    from tinynn_autograd_tpu.utils.data_iterator import BatchIterator

    rng = np.random.RandomState(2)
    x = rng.randn(257, 12).astype(np.float32)
    y = rng.randn(257, 3).astype(np.float32)
    np.random.seed(0)
    batches = list(BatchIterator(batch_size=64)(x, y))
    assert len(batches) == 5
    # shuffled union must equal the dataset
    all_x = np.concatenate([b.inputs for b in batches])
    np.testing.assert_allclose(
        np.sort(all_x.ravel()), np.sort(x.ravel()), rtol=1e-6)


def test_one_hot_rejects_out_of_range_labels():
    with pytest.raises(IndexError):
        native.one_hot(np.array([0, 3, 10]), 10)
    with pytest.raises(IndexError):
        native.one_hot(np.array([-1, 2]), 10)


def test_gather_rows_rejects_out_of_range_indices():
    src = np.zeros((5, 4), np.float32)
    with pytest.raises(IndexError):
        native.gather_rows(src, np.array([0, 5]))
