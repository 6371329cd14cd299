"""Dataset loading: the REAL-file branch of load_mnist (VERDICT r2 item 8).

The sandbox has zero egress, so the real mnist.pkl.gz can never download
here — this fixture fabricates a minimal file in mnielsen's exact format
(gzip'd pickle of ((x, y), (x, y), (x, y)) with float32 [n, 784] images
and int labels, loaded with encoding="latin1"; reference behavior:
/root/reference/examples/mnist/run.py:31-42) so the parsing/concat branch
executes. Drop the genuine file in data/ to train on real MNIST (README
"Data")."""

import gzip
import os
import pickle

import numpy as np
import pytest

from tinynn_autograd_tpu.utils.datasets import (
    load_mnist, one_hot, synthetic_mnist,
)


def _write_fixture(path, n_train=8, n_valid=4, n_test=6):
    rng = np.random.RandomState(0)

    def split(n, lo):
        x = rng.rand(n, 784).astype(np.float32)
        y = np.arange(lo, lo + n) % 10
        return x, y

    payload = (split(n_train, 0), split(n_valid, 1), split(n_test, 2))
    with gzip.open(path, "wb") as f:
        # protocol 2 matches the historical py2-era file; the loader reads
        # with encoding="latin1" exactly like the reference
        pickle.dump(payload, f, protocol=2)
    return payload


def test_load_mnist_parses_mnielsen_format(tmp_path):
    data_dir = str(tmp_path)
    payload = _write_fixture(os.path.join(data_dir, "mnist.pkl.gz"))
    (tx, ty), (ex, ey) = load_mnist(data_dir=data_dir,
                                    allow_synthetic=False,
                                    strict_sizes=False)
    # train = train + valid folded together (the reference's 50k/10k usage)
    assert tx.shape == (12, 784) and tx.dtype == np.float32
    assert ty.shape == (12,) and ty.dtype == np.int64
    np.testing.assert_allclose(tx[:8], payload[0][0])
    np.testing.assert_allclose(tx[8:], payload[1][0])
    np.testing.assert_array_equal(ty, np.concatenate([payload[0][1],
                                                      payload[1][1]]))
    assert ex.shape == (6, 784) and ey.shape == (6,)
    np.testing.assert_allclose(ex, payload[2][0])
    np.testing.assert_array_equal(ey, payload[2][1])


def test_load_mnist_raises_without_file_when_synthetic_disallowed(tmp_path):
    with pytest.raises(Exception):
        load_mnist(data_dir=str(tmp_path / "missing"),
                   allow_synthetic=False)


def test_synthetic_mnist_contract():
    (tx, ty), (ex, ey) = synthetic_mnist(n_train=64, n_test=32)
    assert tx.shape == (64, 784) and tx.dtype == np.float32
    assert tx.min() >= 0.0 and tx.max() <= 1.0
    assert ty.shape == (64,) and set(np.unique(ty)) <= set(range(10))
    oh = one_hot(ty)
    assert oh.shape == (64, 10)
    np.testing.assert_array_equal(oh.argmax(-1), ty)
