"""Coverage for the smaller API surfaces: Tensor conveniences, schedulers,
timer/profiler, iterator edges, checkpoint-resume continuation, DP save."""

import os
import time

import numpy as np
import pytest

import jax.numpy as jnp

from tinynn_autograd_tpu import Tensor, as_tensor
from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam
from tinynn_autograd_tpu.nn.scheduler import WarmupCosineLR
from tinynn_autograd_tpu.utils.data_iterator import BatchIterator
from tinynn_autograd_tpu.utils.profiler import StepTimer
from tinynn_autograd_tpu.utils.seeder import random_seed
from tinynn_autograd_tpu.utils.timer import Timer


def test_tensor_conveniences():
    t = Tensor([[1.0, 2.0], [3.0, 4.0]], requires_grad=True)
    assert t.ndim == 2 and t.size == 4
    assert t.tolist() == [[1, 2], [3, 4]]
    assert Tensor(5.0).item() == 5.0
    d = t.detach()
    assert not d.requires_grad and d.dependency == []
    m = t.mean()
    m.backward()
    np.testing.assert_allclose(np.asarray(t.grad), np.full((2, 2), 0.25))
    c = t.astype(jnp.bfloat16)
    assert c.dtype == jnp.bfloat16
    assert as_tensor(t) is t
    assert repr(t).startswith("Tensor(shape=")
    assert len(t) == 2
    # comparisons return raw boolean arrays
    assert (t > 2.0).tolist() == [[False, False], [True, True]]
    # r-variants
    assert (2.0 - Tensor([1.0])).tolist() == [1.0]
    assert (2.0 / Tensor([4.0])).tolist() == [0.5]
    assert (2.0 ** Tensor([2.0])).tolist() == [4.0]


def test_backward_on_non_grad_tensor_raises():
    with pytest.raises(AssertionError):
        Tensor([1.0]).backward()


def test_seeder_validation():
    with pytest.raises(ValueError):
        random_seed(-1)
    with pytest.raises(ValueError):
        random_seed(2 ** 32)


def test_timer_accumulates():
    t = Timer("t")
    t.start()
    time.sleep(0.02)
    t.stop()
    t.start()
    time.sleep(0.02)
    t.pause()
    t.stop()
    assert t.count == 2
    assert t.duration >= 0.04
    t.report()
    t.reset()
    assert t.count == 0


def test_step_timer():
    st = StepTimer()
    with st.span(10):
        out = jnp.ones(()) * 2
    st.block_on(out)
    assert st.n == 10
    assert st.steps_per_sec > 0
    assert st.ms_per_step >= 0


def test_warmup_cosine_schedule():
    s = WarmupCosineLR(lr=1.0, warmup_steps=10, decay_steps=110, alpha=0.0)
    assert float(s(jnp.asarray(5))) == pytest.approx(0.5)
    assert float(s(jnp.asarray(10))) == pytest.approx(1.0, abs=1e-6)
    assert float(s(jnp.asarray(110))) == pytest.approx(0.0, abs=1e-6)


def test_batch_iterator_no_shuffle_order():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    y = x.copy()
    batches = list(BatchIterator(batch_size=4, shuffle=False)(x, y))
    assert [b.inputs[0, 0] for b in batches] == [0.0, 4.0, 8.0]
    assert batches[-1].inputs.shape == (2, 1)  # ragged tail kept
    batches = list(BatchIterator(batch_size=4, shuffle=False,
                                 drop_last=True)(x, y))
    assert len(batches) == 2


def test_epoch_smaller_than_batch_raises():
    random_seed(0)
    model = Model(Net([Dense(4, num_in=3)]), SoftmaxCrossEntropyLoss(),
                  Adam())
    x = np.ones((4, 3), np.float32)
    y = np.eye(4, dtype=np.float32)
    with pytest.raises(ValueError):
        model.train_epoch(x, y, batch_size=16)


def test_checkpoint_resume_continues_training(tmp_path):
    random_seed(7)
    rng = np.random.RandomState(0)
    x = rng.randn(32, 6).astype(np.float32)
    y = np.eye(3, dtype=np.float32)[rng.randint(0, 3, 32)]

    m1 = Model(Net([Dense(8, num_in=6), ReLU(), Dense(3, num_in=8)]),
               SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    for _ in range(5):
        m1.train_step(x, y)
    path = os.path.join(tmp_path, "ck.pkl")
    m1.save(path)

    random_seed(8)
    m2 = Model(Net([Dense(8, num_in=6), ReLU(), Dense(3, num_in=8)]),
               SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    m2.load(path)
    # optimizer state restored: step counter continues
    assert int(m2._opt_state["t"]) == 5
    l1 = float(m1.train_step(x, y))
    l2 = float(m2.train_step(x, y))
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-7)


def test_dp_save(tmp_path):
    from tinynn_autograd_tpu.parallel import DataParallel, make_mesh

    random_seed(9)
    m = Model(Net([Dense(8, num_in=4), ReLU(), Dense(2, num_in=8)]),
              SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    dp = DataParallel(m, mesh=make_mesh(8))
    rng = np.random.RandomState(0)
    x = rng.randn(16, 4).astype(np.float32)
    y = np.eye(2, dtype=np.float32)[rng.randint(0, 2, 16)]
    dp.train_step(x, y)
    path = os.path.join(tmp_path, "dp.pkl")
    dp.save(path)
    assert os.path.exists(path)


def test_transpose_negative_axes_grad():
    # regression: the VJP must normalize negative axes before inverting the
    # permutation (argsort on raw negatives picks a garbage order)
    from tinynn_autograd_tpu import ops

    rng = np.random.RandomState(0)
    for axes in [(-1, 0, 1), (0, -1, -2), (-2, -3, -1)]:
        x = rng.randn(2, 3, 4).astype(np.float32)
        t = Tensor(x, requires_grad=True)
        out = ops.transpose(t, axes)
        np.testing.assert_allclose(np.asarray(out.data), x.transpose(axes))
        g = rng.randn(*out.shape).astype(np.float32)
        out.backward(Tensor(g))
        norm = [a % 3 for a in axes]
        expect = g.transpose(np.argsort(norm))
        np.testing.assert_allclose(np.asarray(t.grad), expect, rtol=1e-6)


def test_prefetch_iterator_matches_plain_iterator():
    from tinynn_autograd_tpu.utils.data_iterator import (
        BatchIterator, PrefetchIterator,
    )

    rng = np.random.RandomState(3)
    x = rng.randn(100, 5).astype(np.float32)
    y = rng.randn(100, 2).astype(np.float32)
    np.random.seed(7)
    plain = list(BatchIterator(batch_size=32, shuffle=True)(x, y))
    np.random.seed(7)
    pre = list(PrefetchIterator(batch_size=32, shuffle=True)(x, y))
    assert len(plain) == len(pre) == 4
    for a, b in zip(plain, pre):
        np.testing.assert_array_equal(a.inputs, b.inputs)
        np.testing.assert_array_equal(a.targets, b.targets)


def test_prefetch_iterator_propagates_worker_errors():
    from tinynn_autograd_tpu.utils.data_iterator import PrefetchIterator

    class Boom:
        def __call__(self, inputs, targets):
            yield from ()
            raise RuntimeError("boom")

    # generator that raises after exhaustion
    def bad_iter(inputs, targets):
        yield inputs
        raise RuntimeError("boom")

    class Wrap:
        __call__ = staticmethod(bad_iter)

    it = PrefetchIterator(iterator=Wrap())
    with pytest.raises(RuntimeError):
        list(it(np.zeros(3), np.zeros(3)))


def test_prefetch_iterator_abandoned_early_releases_worker():
    import threading

    from tinynn_autograd_tpu.utils.data_iterator import PrefetchIterator

    rng = np.random.RandomState(0)
    x = rng.randn(640, 4).astype(np.float32)
    yv = rng.randn(640, 2).astype(np.float32)
    before = threading.active_count()
    for _ in range(3):
        gen = PrefetchIterator(batch_size=32, shuffle=False)(x, yv)
        next(gen)
        gen.close()  # abandon with many batches left
    time.sleep(0.5)
    assert threading.active_count() <= before + 1
