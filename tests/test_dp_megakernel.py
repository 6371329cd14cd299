"""Data-parallel megakernel (VERDICT r3 item 5): the fused-epoch Pallas
kernel with an IN-KERNEL RDMA gradient ring (pltpu.make_async_remote_copy),
validated on the simulated mesh via Pallas's distributed TPU interpret mode
(which simulates remote DMAs, semaphores and barriers on CPU, with race
detection). Parity oracle: single-device training on the shard-composed
global batches — ring-sum/n of shard gradients == gradient of the
global-mean loss.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from tinynn_autograd_tpu.nn.layers import Dense, ReLU
from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
from tinynn_autograd_tpu.nn.model import Model
from tinynn_autograd_tpu.nn.net import Net
from tinynn_autograd_tpu.nn.optimizer import SGD, Adam
from tinynn_autograd_tpu.parallel import DataParallel, make_mesh
from tinynn_autograd_tpu.utils.seeder import random_seed

N_DEV = 4


def test_ring_all_reduce_mechanism():
    """The RDMA ring in isolation: an 8-device all-reduce of distinct
    per-device values through 2-slot comm buffers must equal the sum."""
    n = 8
    mesh = make_mesh(n, axis_name="data")

    def ring_kernel(x_ref, o_ref, comm, send_sem, recv_sem):
        my = jax.lax.axis_index("data")
        right = jax.lax.rem(my + 1, n)
        left = jax.lax.rem(my + n - 1, n)
        bar = pltpu.get_barrier_semaphore()
        comm[0] = x_ref[...]
        o_ref[...] = x_ref[...]
        for step in range(n - 1):
            src, dst = step % 2, (step + 1) % 2
            # per-hop neighbor barrier: flow control so a fast sender
            # can't overwrite a slot its neighbor hasn't consumed
            for nb in (left, right):
                pltpu.semaphore_signal(
                    bar, inc=1, device_id=nb,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(bar, 2)
            rdma = pltpu.make_async_remote_copy(
                src_ref=comm.at[src], dst_ref=comm.at[dst],
                send_sem=send_sem.at[src], recv_sem=recv_sem.at[dst],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma.start()
            rdma.wait()
            o_ref[...] += comm[dst]

    def allreduce(x):
        return pl.pallas_call(
            ring_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2,) + x.shape, x.dtype),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, collective_id=0),
            interpret=pltpu.InterpretParams(),
        )(x)

    x = jnp.arange(n * 8 * 128, dtype=jnp.float32).reshape(n, 8, 128)
    f = jax.jit(jax.shard_map(allreduce, mesh=mesh, in_specs=P("data"),
                              out_specs=P("data"), check_vma=False))
    out = np.asarray(f(x))
    want = np.asarray(x).sum(axis=0)
    for i in range(n):
        np.testing.assert_allclose(out[i], want, rtol=1e-6)


def _data(n, din=8, dout=4, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, din).astype(np.float32)
    y = np.eye(dout, dtype=np.float32)[rng.randint(0, dout, n)]
    return x, y


def _model(seed, opt):
    random_seed(seed)
    net = Net([Dense(16, num_in=8), ReLU(), Dense(4, num_in=16)])
    return Model(net, SoftmaxCrossEntropyLoss(), opt)


def _compose_batches(x, y, n_dev, local_batch, n_steps):
    """Global batch b of the DP epoch = concat over devices of each
    device's b-th local slice (shuffle=False ordering)."""
    per_x = np.split(x, n_dev)
    per_y = np.split(y, n_dev)
    out = []
    for s in range(n_steps):
        xb = np.concatenate(
            [d[s * local_batch:(s + 1) * local_batch] for d in per_x])
        yb = np.concatenate(
            [d[s * local_batch:(s + 1) * local_batch] for d in per_y])
        out.append((xb, yb))
    return out


def _run_parity(opt_dp, opt_ref, n_epochs=2, rtol=2e-4):
    n_dev = N_DEV
    local_batch, n_steps = 4, 2
    n = n_dev * local_batch * n_steps
    x, y = _data(n)

    dp = DataParallel(_model(0, opt_dp), mesh=make_mesh(n_dev))
    losses = np.asarray(dp.train_epochs(
        x, y, n_epochs=n_epochs, batch_size=n_dev * local_batch,
        shuffle=False, fused=True))
    assert losses.shape == (n_epochs, n_steps)

    ref = _model(0, opt_ref)
    for ep in range(n_epochs):
        for s, (xb, yb) in enumerate(
                _compose_batches(x, y, n_dev, local_batch, n_steps)):
            ref_loss = float(ref.train_step(xb, yb))
            np.testing.assert_allclose(
                losses[ep, s], ref_loss, rtol=rtol, atol=1e-6,
                err_msg="epoch %d step %d" % (ep, s))

    for layer_dp, layer_ref in zip(dp._params, ref._params):
        for k in layer_dp:
            np.testing.assert_allclose(
                np.asarray(layer_dp[k]), np.asarray(layer_ref[k]),
                rtol=rtol, atol=1e-5)


def test_dp_megakernel_parity_sgd():
    _run_parity(SGD(lr=0.1), SGD(lr=0.1))


def test_dp_megakernel_parity_adam():
    _run_parity(Adam(lr=1e-2), Adam(lr=1e-2))


def test_dp_megakernel_with_dropout_trains():
    """Smoke: the DP megakernel's dropout path (counter-hash stand-in under
    the distributed interpreter; per-device seeds folded with axis index)
    produces finite, decreasing losses."""
    from tinynn_autograd_tpu.nn.layers import Dropout

    n_dev, local_batch, n_steps = 4, 4, 2
    n = n_dev * local_batch * n_steps
    x, y = _data(n)
    random_seed(5)
    net = Net([Dense(16, num_in=8), ReLU(), Dropout(0.25),
               Dense(4, num_in=16)])
    dp = DataParallel(Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.2)),
                      mesh=make_mesh(n_dev))
    losses = np.asarray(dp.train_epochs(
        x, y, n_epochs=6, batch_size=n_dev * local_batch, shuffle=False,
        fused=True))
    assert np.all(np.isfinite(losses))
    assert losses[-1].mean() < losses[0].mean()


def test_dp_megakernel_rejects_ineligible():
    """fused=True on a model the megakernel can't run must raise, not
    silently fall back."""
    import pytest

    from tinynn_autograd_tpu.nn.layers import BatchNorm

    random_seed(3)
    net = Net([Dense(16, num_in=8), BatchNorm(dim=16), Dense(4, num_in=16)])
    dp = DataParallel(Model(net, SoftmaxCrossEntropyLoss(), SGD(lr=0.1)),
                      mesh=make_mesh(N_DEV))
    x, y = _data(N_DEV * 8)
    with pytest.raises(ValueError, match="not eligible"):
        dp.train_epochs(x, y, n_epochs=1, batch_size=N_DEV * 4,
                        shuffle=False, fused=True)
