"""Checkpoint/resume for the model-parallel wrappers (VERDICT r2 item 2).

Every wrapper saves in the plain Model format with FULL host-layout arrays
(shards gathered), so a checkpoint taken mid-training loads into a fresh
wrapper of the same kind AND into a plain single-device Model — and both
continue training identically to an uninterrupted run (the reference
save/load contract, /root/reference/core/model.py:18-35, extended to every
training front-end)."""

import os

import numpy as np

from tinynn_autograd_tpu.models import build_deep_mlp, build_tiny_transformer
from tinynn_autograd_tpu.nn.layers import Dense, MoE, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam
from tinynn_autograd_tpu.parallel import (
    ContextParallel, DataParallel, ExpertParallel, TensorParallel, make_mesh,
)
from tinynn_autograd_tpu.parallel.pipeline_parallel import PipelineParallel
from tinynn_autograd_tpu.utils.seeder import random_seed


def _cls_data(n, din, classes, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, din).astype(np.float32)
    y = np.eye(classes, dtype=np.float32)[rng.randint(0, classes, n)]
    return x, y


def _resume_roundtrip(make_model, make_wrapper, x, y, tmp_path,
                      steps=3, rtol=1e-4, atol=1e-6):
    """Train `steps`, save, resume into (a) a fresh wrapper and (b) a plain
    Model; both must match step `steps+1` of an uninterrupted wrapper run.
    Adam makes the check bite: a dropped moment/step counter shifts the
    bias-correction schedule and the next update."""
    # uninterrupted run
    ref = make_wrapper(make_model(1))
    ref_losses = [float(ref.train_step(x, y)) for _ in range(steps + 1)]

    # interrupted run: save after `steps`
    w1 = make_wrapper(make_model(1))
    for _ in range(steps):
        w1.train_step(x, y)
    path = os.path.join(tmp_path, "ckpt.pkl")
    w1.save(path)

    # (a) resume into a fresh wrapper built from a DIFFERENT init
    w2 = make_wrapper(make_model(2))
    w2.load(path)
    l_wrapper = float(w2.train_step(x, y))
    np.testing.assert_allclose(l_wrapper, ref_losses[steps],
                               rtol=rtol, atol=atol)

    # (b) resume into a plain single-device Model
    m3 = make_model(2)
    m3.load(path)
    l_model = float(m3.train_step(x, y))
    np.testing.assert_allclose(l_model, ref_losses[steps],
                               rtol=rtol, atol=atol)
    return ref, w2, m3


def test_tensor_parallel_checkpoint_resume(tmp_path):
    def make_model(seed):
        random_seed(seed)
        net = Net([Dense(32, num_in=8), ReLU(), Dense(16, num_in=32),
                   ReLU(), Dense(4, num_in=16)])
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))

    x, y = _cls_data(32, 8, 4)
    ref, w2, m3 = _resume_roundtrip(
        make_model, lambda m: TensorParallel(
            m, mesh=make_mesh(8, axis_name="model")),
        x, y, tmp_path)
    # resumed-wrapper params equal the uninterrupted run's
    for a, b in zip(w2.gather_params(), ref.gather_params()):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-6)


def test_pipeline_parallel_checkpoint_resume(tmp_path):
    def make_model(seed):
        random_seed(seed)
        net = build_deep_mlp(num_in=16, depth=10, width=32, num_out=4)
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))

    x, y = _cls_data(32, 16, 4)
    _resume_roundtrip(
        make_model, lambda m: PipelineParallel(
            m, mesh=make_mesh(8, axis_name="pp"), microbatches=8),
        x, y, tmp_path)


def test_context_parallel_checkpoint_resume(tmp_path):
    def make_model(seed):
        random_seed(seed)
        net = build_tiny_transformer(vocab=16, seq_len=16, dim=32, heads=4,
                                     depth=2, num_out=16)
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))

    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (32, 16))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    _resume_roundtrip(
        make_model, lambda m: ContextParallel(
            m, mesh=make_mesh(8, axis_name="ctx")),
        x, y, tmp_path, rtol=3e-4)


def test_expert_parallel_checkpoint_resume(tmp_path):
    def make_model(seed):
        random_seed(seed)
        net = Net([Dense(32, num_in=16), ReLU(),
                   MoE(num_experts=8, dim=32, hidden=64),
                   Dense(8, num_in=32)])
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))

    x, y = _cls_data(64, 16, 8)
    _resume_roundtrip(
        make_model, lambda m: ExpertParallel(
            m, mesh=make_mesh(8, axis_name="expert")),
        x, y, tmp_path, rtol=3e-4)


def test_data_parallel_checkpoint_resume(tmp_path):
    def make_model(seed):
        random_seed(seed)
        net = Net([Dense(32, num_in=8), ReLU(), Dense(4, num_in=32)])
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))

    x, y = _cls_data(32, 8, 4)
    _resume_roundtrip(
        make_model, lambda m: DataParallel(
            m, mesh=make_mesh(8, axis_name="data")),
        x, y, tmp_path)


def test_data_parallel_predict_is_sharded():
    # VERDICT r2 weak item 3: DataParallel.predict claimed mesh-sharded
    # inference but delegated to single-device predict
    random_seed(7)
    net = Net([Dense(32, num_in=8), ReLU(), Dense(4, num_in=32)])
    model = Model(net, SoftmaxCrossEntropyLoss(), Adam(lr=1e-2))
    dp = DataParallel(model, mesh=make_mesh(8, axis_name="data"))

    x, y = _cls_data(64, 8, 4)
    dp.train_step(x, y)

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    staged = dp.stage(x)
    out = dp.predict(staged)
    # output parity with single-device predict
    np.testing.assert_allclose(
        out.numpy(), model.predict(x).numpy(), rtol=1e-5, atol=1e-6)
    # and the output really is batch-sharded over the mesh
    raw = out.data
    assert isinstance(raw, jax.Array)
    assert raw.sharding.is_equivalent_to(
        NamedSharding(dp.mesh, P("data")), raw.ndim)
    assert raw.addressable_shards[0].data.shape[0] == x.shape[0] // 8

    # non-divisible batch falls back to single-device predict
    out_odd = dp.predict(x[:5])
    np.testing.assert_allclose(
        out_odd.numpy(), model.predict(x[:5]).numpy(), rtol=1e-5, atol=1e-6)
