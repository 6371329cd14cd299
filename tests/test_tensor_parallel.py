"""Tensor parallelism on the simulated 8-device mesh: sharded training must
match single-device training numerically (same init, same data), since the
math is identical up to all-reduce ordering."""

import numpy as np
import pytest

from tinynn_autograd_tpu.nn.layers import Dense, Dropout, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.parallel import TensorParallel, make_mesh
from tinynn_autograd_tpu.utils.seeder import random_seed


def _mlp(seed, opt):
    random_seed(seed)
    # hidden widths divisible by 8 -> (col,row) sharded pairs; final 4 runs
    # replicated
    net = Net([Dense(32, num_in=8), ReLU(), Dense(16, num_in=32), ReLU(),
               Dense(4, num_in=16)])
    return Model(net, SoftmaxCrossEntropyLoss(), opt)


def _data(n=32):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 8).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, n)]
    return x, y


def test_tp_matches_single_device_training():
    x, y = _data()
    m_tp = _mlp(1, SGD(lr=0.1))
    m_ref = _mlp(1, SGD(lr=0.1))

    tp = TensorParallel(m_tp, mesh=make_mesh(8, axis_name="model"))
    for _ in range(4):
        tp_loss = float(tp.train_step(x, y))
        ref_loss = float(m_ref.train_step(x, y))
        np.testing.assert_allclose(tp_loss, ref_loss, rtol=2e-4, atol=1e-6)

    gathered = tp.gather_params()
    for layer_tp, layer_ref in zip(gathered, m_ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_tp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_tp_adam_converges():
    x, y = _data(64)
    tp = TensorParallel(_mlp(2, Adam(lr=1e-2)),
                        mesh=make_mesh(8, axis_name="model"))
    losses = [float(tp.train_step(x, y)) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.5


def test_tp_predict_matches_model():
    x, y = _data(16)
    m = _mlp(3, SGD(lr=0.1))
    tp = TensorParallel(m, mesh=make_mesh(8, axis_name="model"))
    # before any training: TP forward == plain forward
    out_tp = tp.predict(x).numpy()
    out_ref = m.predict(x).numpy()
    np.testing.assert_allclose(out_tp, out_ref, rtol=2e-4, atol=1e-5)


def test_tp_shard_layout():
    m = _mlp(4, SGD(lr=0.1))
    tp = TensorParallel(m, mesh=make_mesh(8, axis_name="model"))
    x, y = _data(8)
    tp.train_step(x, y)
    # layers: Dense32(col) ReLU Dense16(row) ReLU Dense4(rep)
    assert tp._layout == ["col", "row", "rep"]
    # col weight shard: full rows, 1/8 of columns per device
    w0 = tp._params[0]["w"]
    assert w0.shape == (8, 32)
    assert w0.addressable_shards[0].data.shape == (8, 4)
    w1 = tp._params[2]["w"]
    assert w1.addressable_shards[0].data.shape == (4, 16)


def test_hybrid_dp_tp_matches_single_device():
    # 2x4 mesh: 2-way data parallel x 4-way tensor parallel; must still
    # reproduce single-device training (grads pmean over data, psum over
    # model)
    from tinynn_autograd_tpu.parallel.mesh import make_mesh_2d

    x, y = _data(32)
    random_seed(6)
    net = Net([Dense(32, num_in=8), ReLU(), Dense(16, num_in=32), ReLU(),
               Dense(4, num_in=16)])
    m_h = Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))
    m_ref = _toy_copy(6)

    mesh = make_mesh_2d((2, 4), axis_names=("data", "model"))
    tp = TensorParallel(m_h, mesh=mesh, axis_name="model", data_axis="data")
    for _ in range(3):
        h_loss = float(tp.train_step(x, y))
        r_loss = float(m_ref.train_step(x, y))
        np.testing.assert_allclose(h_loss, r_loss, rtol=3e-4, atol=1e-6)

    gathered = tp.gather_params()
    for layer_tp, layer_ref in zip(gathered, m_ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_tp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def _toy_copy(seed):
    random_seed(seed)
    net = Net([Dense(32, num_in=8), ReLU(), Dense(16, num_in=32), ReLU(),
               Dense(4, num_in=16)])
    return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))


def test_tp_trains_with_dropout_layer():
    """Round 5: TP supports stochastic layers (previously rejected). A
    plain Dropout runs on model-axis-replicated activations with the SAME
    mask on every device (shared rep key)."""
    random_seed(5)
    net = Net([Dense(16, num_in=8), Dropout(0.3), Dense(4, num_in=16)])
    m = Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-2))
    tp = TensorParallel(m, mesh=make_mesh(8, axis_name="model"))
    x, y = _data(32)
    losses = [float(tp.train_step(x, y)) for _ in range(30)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8
    # masks refresh per step
    assert len({round(l, 6) for l in losses[:10]}) > 3


def test_tp_multi_pair_matches_single_device():
    """Regression: with MULTIPLE stacked (col,row) Megatron pairs, the
    col-layer input cotangent is a per-device PARTIAL sum and must be
    all-reduced (the Megatron "f" operator, ops.replicate_grad_) — the
    round-1 implementation silently trained stacked pairs on partial
    gradients (losses diverged by ~1e-2 within 3 steps)."""
    def mk(seed):
        random_seed(seed)
        net = Net([Dense(32, num_in=8), ReLU(), Dense(24, num_in=32),
                   ReLU(), Dense(32, num_in=24), ReLU(),
                   Dense(16, num_in=32), ReLU(), Dense(4, num_in=16)])
        return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))

    x, y = _data(32)
    tp = TensorParallel(mk(1), mesh=make_mesh(8, axis_name="model"))
    ref = mk(1)
    assert tp is not None
    for _ in range(4):
        np.testing.assert_allclose(float(tp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)
    gathered = tp.gather_params()
    for layer_tp, layer_ref in zip(gathered, ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_tp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def _transformer_model(seed, heads=8):
    from tinynn_autograd_tpu.models import build_tiny_transformer

    random_seed(seed)
    net = build_tiny_transformer(vocab=16, seq_len=8, dim=32, heads=heads,
                                 depth=2, num_out=16)
    return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))


def _token_data(n=32):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (n, 8))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    return x, y


def test_tp_transformer_matches_single_device():
    """Megatron head-sharded attention + col/row MLP: the whole transformer
    trains identically to single-device (embedding/positional params run
    as replicated traced leaves)."""
    x, y = _token_data()
    tp = TensorParallel(_transformer_model(1),
                        mesh=make_mesh(8, axis_name="model"))
    ref = _transformer_model(1)
    for _ in range(4):
        np.testing.assert_allclose(float(tp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)
    gathered = tp.gather_params()
    for layer_tp, layer_ref in zip(gathered, ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_tp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_tp_transformer_shard_layout():
    x, y = _token_data(8)
    tp = TensorParallel(_transformer_model(2),
                        mesh=make_mesh(8, axis_name="model"))
    tp.train_step(x, y)
    # block layer index 2 (emb, pos, block, block, pool, dense)
    blk = tp._params[2]
    assert blk["wq"].shape == (32, 32)
    assert blk["wq"].addressable_shards[0].data.shape == (32, 4)  # col
    assert blk["wo"].addressable_shards[0].data.shape == (4, 32)  # row
    assert blk["w1"].addressable_shards[0].data.shape == (32, 16)  # col
    assert blk["w2"].addressable_shards[0].data.shape == (16, 32)  # row
    assert blk["g1"].addressable_shards[0].data.shape == (1, 32)  # rep
    # embedding table replicated
    emb = tp._params[0]["w"]
    assert emb.addressable_shards[0].data.shape == (16, 32)


def test_tp_transformer_rejects_bad_head_count():
    x, y = _token_data(8)
    tp = TensorParallel(_transformer_model(3, heads=4),  # 4 % 8 != 0
                        mesh=make_mesh(8, axis_name="model"))
    with pytest.raises(ValueError):
        tp.train_step(x, y)


def test_tp_transformer_sequence_parallel_matches_single_device():
    """Megatron-SP: sequence-sharded activations between blocks with
    all-gather/reduce-scatter conjugate transitions must train identically
    to single-device (and to plain TP)."""
    from tinynn_autograd_tpu.models import build_tiny_transformer

    def mk(seed):
        random_seed(seed)
        net = build_tiny_transformer(vocab=16, seq_len=16, dim=32, heads=8,
                                     depth=2, num_out=16)
        return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))

    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (32, 16))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    sp = TensorParallel(mk(1), mesh=make_mesh(8, axis_name="model"),
                        sequence_parallel=True)
    ref = mk(1)
    for _ in range(4):
        np.testing.assert_allclose(float(sp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)
    gathered = sp.gather_params()
    for layer_tp, layer_ref in zip(gathered, ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_tp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_tp_sequence_parallel_rejects_indivisible_seq():
    def mk():
        random_seed(2)
        from tinynn_autograd_tpu.models import build_tiny_transformer

        net = build_tiny_transformer(vocab=16, seq_len=12, dim=32, heads=8,
                                     depth=1, num_out=16)
        return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))

    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (16, 12))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    sp = TensorParallel(mk(), mesh=make_mesh(8, axis_name="model"),
                        sequence_parallel=True)
    with pytest.raises(ValueError):
        sp.train_step(x, y)  # 12 % 8 != 0


def test_tp_no_tracer_leak_into_predict_and_save(tmp_path):
    """Regression: after a TP train_step the live layers must hold CONCRETE
    params again (tracers leaked before, breaking predict/save)."""
    import os

    x, y = _token_data(16)
    tp = TensorParallel(_transformer_model(9),
                        mesh=make_mesh(8, axis_name="model"))
    tp.train_step(x, y)
    out = tp.model.predict(x[:4])
    assert np.isfinite(np.asarray(out.data)).all()
    path = os.path.join(str(tmp_path), "tp.pkl")
    tp.model.save(path)
    assert os.path.exists(path)


def test_tp_mixed_dense_and_block_layout():
    """Dense pairing must not span a TransformerBlock (feature-sharded
    activations would hit the block's full-width norms)."""
    from tinynn_autograd_tpu.nn.layers import TransformerBlock

    def mk(seed):
        random_seed(seed)
        net = Net([Dense(32, num_in=16), ReLU(),
                   TransformerBlock(32, 8),
                   Dense(4, num_in=32)])
        return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))

    rng = np.random.RandomState(0)
    x = rng.randn(8, 6, 16).astype(np.float32)
    # classify from the pooled... keep it simple: feed 3-D through Dense
    # (batched) + block; loss over mean-pooled features needs a pool; use
    # block output position 0 via a plain Dense head after flatten? —
    # simplest: train on the per-position logits reshaped
    tp = TensorParallel(mk(1), mesh=make_mesh(8, axis_name="model"))
    ref = mk(1)
    y = np.eye(4, dtype=np.float32)[rng.randint(0, 4, 8 * 6)]

    # manual loss over flattened positions using predict-style forward is
    # overkill; train_step with 3-D x and [N*T, C] y isn't the Model
    # contract — instead just check the layout is per-run ("rep", "rep")
    tp._plan_layout()
    assert tp._layout == ["rep", "rep"]


# ------------------------------------------- round 5: dropout under TP/SP

def _dropout_transformer(seed, heads=8, sp=False):
    from tinynn_autograd_tpu.models import build_tiny_transformer

    random_seed(seed)
    net = build_tiny_transformer(vocab=16, seq_len=16, dim=32, heads=heads,
                                 depth=2, num_out=16, dropout=0.1,
                                 attn_dropout=0.1)
    return Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-2))


@pytest.mark.parametrize("sp", [False, True])
def test_tp_transformer_dropout_trains(sp):
    """TransformerBlock dropout under plain TP (replicated residual sites,
    head-sharded attention masks) and Megatron-SP (sequence-sharded
    residual sites) — trains, finite, stochastic per step."""
    tp = TensorParallel(_dropout_transformer(31),
                        mesh=make_mesh(8, axis_name="model"),
                        sequence_parallel=sp)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (64, 16))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    losses = [float(tp.train_step(x, y)) for _ in range(30)]
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.6
    assert len({round(l, 6) for l in losses[:10]}) > 3


def test_tp_dropout_keeps_replicated_params_in_sync():
    """THE replication invariant under dropout: after training steps with
    per-device attention masks, every replicated param leaf (norm scales,
    biases) must hold IDENTICAL values on all devices — the f/psum
    conjugates make the replicated-param grads total, so decorrelated
    head masks must not desynchronize them."""
    from jax.sharding import PartitionSpec as P

    tp = TensorParallel(_dropout_transformer(32),
                        mesh=make_mesh(8, axis_name="model"))
    rng = np.random.RandomState(1)
    x = rng.randint(0, 16, (32, 16))
    y = np.eye(16, dtype=np.float32)[x[:, 0]]
    for _ in range(3):
        tp.train_step(x, y)
    checked = 0
    for li, layer_tree in enumerate(tp._params):
        for name, arr in layer_tree.items():
            if tp._specs[li][name] != P():
                continue  # sharded leaf: shards differ by design
            shards = [np.asarray(s.data) for s in arr.addressable_shards]
            for s in shards[1:]:
                np.testing.assert_array_equal(
                    s, shards[0],
                    err_msg="replicated leaf %d/%s diverged across "
                            "devices under dropout" % (li, name))
            checked += 1
    assert checked > 0


# -------------------------------------------------------------- LlamaBlock


def _llama_model(seed, heads=8, kv_heads=4, depth=2):
    from tinynn_autograd_tpu.models import build_tiny_llama

    random_seed(seed)
    net = build_tiny_llama(vocab=16, dim=32, heads=heads,
                           kv_heads=kv_heads, depth=depth)
    return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))


def _llama_data(n=16, t=8):
    rng = np.random.RandomState(0)
    x = rng.randint(0, 16, (n, t))
    y = np.eye(16, dtype=np.float32)[(x + 1) % 16]
    return x, y


def test_tp_llama_matches_single_device():
    """Megatron head-sharded GQA llama: wk/wv column shards are BY KV
    HEAD, so each query head's kv head stays local (group 2 on a 4-mesh);
    RoPE/RMSNorm/SwiGLU all on local shards. Must train identically to
    single-device."""
    x, y = _llama_data()
    tp = TensorParallel(_llama_model(1),
                        mesh=make_mesh(4, axis_name="model"))
    ref = _llama_model(1)
    for _ in range(4):
        np.testing.assert_allclose(float(tp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=5e-5, atol=1e-6)
    gathered = tp.gather_params()
    for layer_tp, layer_ref in zip(gathered, ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_tp[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_tp_llama_sequence_parallel_matches_single_device():
    x, y = _llama_data(n=16, t=8)
    sp = TensorParallel(_llama_model(2),
                        mesh=make_mesh(4, axis_name="model"),
                        sequence_parallel=True)
    ref = _llama_model(2)
    for _ in range(3):
        np.testing.assert_allclose(float(sp.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=5e-5, atol=1e-6)


def test_tp_llama_shard_layout():
    x, y = _llama_data(8)
    tp = TensorParallel(_llama_model(3),
                        mesh=make_mesh(4, axis_name="model"))
    tp.train_step(x, y)
    # net: (emb, block, block, rmsnorm, dense)
    blk = tp._params[1]
    assert blk["wq"].shape == (32, 32)
    assert blk["wq"].addressable_shards[0].data.shape == (32, 8)  # 2 q heads
    assert blk["wk"].shape == (32, 16)  # 4 kv heads * hd 4
    assert blk["wk"].addressable_shards[0].data.shape == (32, 4)  # 1 kv head
    assert blk["wo"].addressable_shards[0].data.shape == (8, 32)  # row
    assert blk["w1"].addressable_shards[0].data.shape == (32, 22)  # col (88/4)
    assert blk["w3"].addressable_shards[0].data.shape == (32, 22)  # col
    assert blk["w2"].addressable_shards[0].data.shape == (22, 32)  # row
    assert blk["g1"].addressable_shards[0].data.shape == (1, 32)   # rep


def test_tp_llama_rejects_indivisible_kv_heads():
    x, y = _llama_data(8)
    tp = TensorParallel(_llama_model(4, heads=8, kv_heads=2),
                        mesh=make_mesh(4, axis_name="model"))
    with pytest.raises(ValueError, match="kv heads"):
        tp.train_step(x, y)


def test_tp_llama_dropout_trains():
    from tinynn_autograd_tpu.models import build_tiny_llama

    random_seed(77)
    net = build_tiny_llama(vocab=16, dim=32, heads=8, kv_heads=4,
                           depth=1, dropout=0.1, attn_dropout=0.1)
    tp = TensorParallel(Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1)),
                        mesh=make_mesh(4, axis_name="model"))
    x, y = _llama_data(8)
    losses = [float(tp.train_step(x, y)) for _ in range(6)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
