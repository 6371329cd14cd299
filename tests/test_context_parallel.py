"""Ring attention (ContextParallel) on the simulated 8-device mesh: K/V
chunks rotate over ppermute, softmax runs over ring-ordered score blocks,
and the tape's collective VJPs generate the backward ring — training must
match single-device exactly."""

import numpy as np
import pytest

from tinynn_autograd_tpu.models import build_tiny_transformer
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.parallel import ContextParallel, make_mesh
from tinynn_autograd_tpu.utils.seeder import random_seed


def _model(seed, opt, seq_len=16, causal=False, heads=4):
    random_seed(seed)
    net = build_tiny_transformer(vocab=16, seq_len=seq_len, dim=32,
                                 heads=heads, depth=2, num_out=16,
                                 causal=causal)
    return Model(net, SoftmaxCrossEntropyLoss(), opt)


def _data(n=32, seq_len=16):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (n, seq_len))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    return x, y


def test_ring_attention_matches_single_device():
    x, y = _data()
    cp = ContextParallel(_model(1, SGD(lr=0.1)),
                         mesh=make_mesh(8, axis_name="ctx"))
    ref = _model(1, SGD(lr=0.1))
    for _ in range(4):
        np.testing.assert_allclose(float(cp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)
    for layer_cp, layer_ref in zip(cp.gather_params(), ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_cp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_ring_attention_adam_converges():
    x, y = _data(64)
    cp = ContextParallel(_model(2, Adam(1e-2)),
                         mesh=make_mesh(8, axis_name="ctx"))
    losses = [float(cp.train_step(x, y)) for _ in range(30)]
    assert losses[-1] < losses[0] * 0.5


def test_ring_attention_smaller_mesh():
    x, y = _data(16)
    cp = ContextParallel(_model(3, SGD(lr=0.1)),
                         mesh=make_mesh(4, axis_name="ctx"))
    ref = _model(3, SGD(lr=0.1))
    for _ in range(2):
        np.testing.assert_allclose(float(cp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)


def test_ring_attention_validations():
    x12, y12 = _data(16, seq_len=12)
    bad = ContextParallel(_model(5, SGD(lr=0.1), seq_len=12),
                          mesh=make_mesh(8, axis_name="ctx"))
    with pytest.raises(ValueError):
        bad.train_step(x12, y12)  # 12 % 8 != 0


def test_ulysses_attention_matches_single_device():
    """Ulysses mode: all_to_all re-shards seq<->heads — a pure permutation,
    so forward values are bit-exact; params drift only by the grad-psum
    reduction order."""
    x, y = _data()

    def mk(seed):
        random_seed(seed)
        net = build_tiny_transformer(vocab=16, seq_len=16, dim=32, heads=8,
                                     depth=2, num_out=16)
        return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))

    u = ContextParallel(mk(1), mesh=make_mesh(8, axis_name="ctx"),
                        mode="ulysses")
    ref = mk(1)
    for _ in range(4):
        np.testing.assert_allclose(float(u.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)
    for layer_u, layer_ref in zip(u.gather_params(), ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(layer_u[k],
                                       np.asarray(layer_ref[k]),
                                       rtol=3e-4, atol=1e-5)


def test_ulysses_rejects_indivisible_heads():
    x, y = _data()
    bad = ContextParallel(_model(6, SGD(lr=0.1)),  # heads=4, mesh=8
                          mesh=make_mesh(8, axis_name="ctx"),
                          mode="ulysses")
    with pytest.raises(ValueError):
        bad.train_step(x, y)


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_causal_context_parallel_matches_single_device(mode):
    """Causal masking under CP: ring masks blocks by global position,
    Ulysses masks the gathered full-length rows — both must reproduce the
    single-device causal model."""
    x, y = _data()
    cp = ContextParallel(_model(7, SGD(lr=0.1), causal=True, heads=8),
                         mesh=make_mesh(8, axis_name="ctx"), mode=mode)
    ref = _model(7, SGD(lr=0.1), causal=True, heads=8)
    for _ in range(3):
        np.testing.assert_allclose(float(cp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)



# ------------------------------------------- round 5: dropout under CP

@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_cp_dropout_trains(mode):
    """CP trains transformers WITH dropout (round 5; previously rejected):
    residual + attention-probability dropout, device-folded masks."""
    random_seed(21)
    net = build_tiny_transformer(vocab=16, seq_len=16, dim=32, heads=8,
                                 depth=2, num_out=16, dropout=0.1,
                                 attn_dropout=0.1)
    from tinynn_autograd_tpu.nn.model import Model as _M

    cp = ContextParallel(_M(net, SoftmaxCrossEntropyLoss(), Adam(1e-2)),
                         mesh=make_mesh(8, axis_name="ctx"), mode=mode)
    x, y = _data(64)
    losses = [float(cp.train_step(x, y)) for _ in range(30)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.6
    # masks refresh per step (stochastic loss sequence)
    assert len({round(l, 6) for l in losses[:10]}) > 3


def test_cp_replicated_dropout_layer_trains():
    """A plain Dropout layer OUTSIDE the block chain runs replicated: all
    devices must apply the identical mask (shared rep key) — training
    stays finite and converges."""
    from tinynn_autograd_tpu.nn.layers import (
        Dense, Dropout, GlobalAvgPool1D, TransformerBlock,
    )
    from tinynn_autograd_tpu.nn.net import Net
    from tinynn_autograd_tpu.nn.model import Model as _M

    random_seed(22)
    net = Net([
        Dense(32, num_in=8),
        TransformerBlock(dim=32, num_heads=4, seed=5),
        GlobalAvgPool1D(), Dropout(0.2), Dense(4, num_in=32),
    ])
    cp = ContextParallel(_M(net, SoftmaxCrossEntropyLoss(), Adam(1e-2)),
                         mesh=make_mesh(8, axis_name="ctx"))
    rng = np.random.RandomState(0)
    x = rng.randn(16, 16, 8).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 16)]
    losses = [float(cp.train_step(x, y)) for _ in range(25)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8


# -------------------------------------------------------------- LlamaBlock


def _llama_cp_model(seed, opt, heads=8, kv_heads=4, depth=2):
    from tinynn_autograd_tpu.models import build_tiny_llama

    random_seed(seed)
    net = build_tiny_llama(vocab=16, dim=32, heads=heads,
                           kv_heads=kv_heads, depth=depth)
    return Model(net, SoftmaxCrossEntropyLoss(), opt)


def _llama_cp_data(n=16, seq_len=16):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (n, seq_len))
    y = np.eye(16, dtype=np.float32)[(x + 1) % 16]
    return x, y


@pytest.mark.parametrize("mode", ["ring", "ring_exact", "ulysses"])
def test_cp_llama_matches_single_device(mode):
    """Llama under every CP mode: RoPE at global positions rides the ring
    (rotations applied before the chunks circulate); GQA K/V stay at Hkv
    heads end-to-end in blockwise ring mode (mha loops query groups per
    hop, the reverse ring carries the unrepeated dK/dV). Causal LM —
    must train identically to single-device."""
    x, y = _llama_cp_data()
    # ulysses needs kv_heads % mesh == 0 -> mesh 4, kv 4; ring modes too
    cp = ContextParallel(_llama_cp_model(1, SGD(lr=0.1)),
                         mesh=make_mesh(4, axis_name="ctx"), mode=mode)
    ref = _llama_cp_model(1, SGD(lr=0.1))
    for _ in range(3):
        np.testing.assert_allclose(float(cp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=5e-5, atol=1e-6)
    for layer_cp, layer_ref in zip(cp.gather_params(), ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_cp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_cp_llama_mqa_ring():
    """MQA (1 kv head) through the blockwise ring: the ring traffic is
    1/H of the repeated form; parity must hold."""
    x, y = _llama_cp_data()
    cp = ContextParallel(_llama_cp_model(2, SGD(lr=0.1), heads=4,
                                         kv_heads=1, depth=1),
                         mesh=make_mesh(4, axis_name="ctx"))
    ref = _llama_cp_model(2, SGD(lr=0.1), heads=4, kv_heads=1, depth=1)
    for _ in range(3):
        np.testing.assert_allclose(float(cp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=5e-5, atol=1e-6)


def test_cp_llama_ulysses_rejects_indivisible_kv():
    x, y = _llama_cp_data()
    cp = ContextParallel(_llama_cp_model(3, SGD(lr=0.1), heads=8,
                                         kv_heads=2),
                         mesh=make_mesh(4, axis_name="ctx"),
                         mode="ulysses")
    with pytest.raises(ValueError, match="kv heads"):
        cp.train_step(x, y)


def test_cp_llama_dropout_trains():
    from tinynn_autograd_tpu.models import build_tiny_llama

    random_seed(88)
    net = build_tiny_llama(vocab=16, dim=32, heads=8, kv_heads=4,
                           depth=1, dropout=0.1, attn_dropout=0.1)
    cp = ContextParallel(Model(net, SoftmaxCrossEntropyLoss(),
                               SGD(lr=0.1)),
                         mesh=make_mesh(4, axis_name="ctx"))
    x, y = _llama_cp_data()
    losses = [float(cp.train_step(x, y)) for _ in range(6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
