"""Pipeline parallelism: GPipe-style staged training over a mesh axis.

The deep-MLP body is partitioned into S contiguous stages, one per mesh
device; microbatches flow through the pipeline with activations handed to
the next stage by ``ppermute`` over ICI. The key design point: NO separate
backward schedule is written. ``ppermute`` and ``psum`` are tape primitives
with hand VJPs (ops/primitives.py), so the ordinary reverse tape walk
re-routes every cotangent across the same links in reverse — the backward
pipeline falls out of the autodiff.

SPMD layout
-----------
- body weights: stacked [S, k, W, W] (k layers per stage), sharded on the
  leading stage axis -> each device holds its own stage slice;
- input projection + classifier head: replicated; their compute is masked
  to the first/last stage, so their gradients live on one device and are
  psum-replicated before the optimizer;
- schedule: ticks t = 0 .. M+S-2; at tick t device s works on microbatch
  t-s (bubble positions compute on zeros and are masked out of the loss, so
  no gradient flows through them);
- loss: sum of per-microbatch losses on the last stage, psum-broadcast.

Scope (round 1): uniform Dense/activation bodies (the deep-MLP family,
driver config #3); microbatch count M >= S recommended to keep bubbles
small.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import tinynn_autograd_tpu.ops as ops
from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.nn.layers import Activation, Dense
from tinynn_autograd_tpu.parallel.mesh import make_mesh


class PipelineParallel:
    """Usage::

        net = build_deep_mlp(num_in=64, depth=18, width=128, num_out=10)
        model = Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-3))
        pp = PipelineParallel(model, mesh=make_mesh(8, axis_name="pp"),
                              microbatches=8)
        loss = pp.train_step(x, y)    # global batch, replicated
    """

    def __init__(self, model, mesh=None, n_stages=None, axis_name="pp",
                 microbatches=8):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh(
            n_stages, axis_name)
        self.axis_name = axis_name
        self.n_stages = int(self.mesh.devices.size)
        self.microbatches = microbatches
        self._params = None
        self._opt_state = None
        self._step_fn = None

    @property
    def net(self):
        return self.model.net

    # ---------------------------------------------------------- partition

    def _partition(self):
        """Split net.layers into (proj_layers, body groups, head_layers).

        body = the square (W x W) Dense layers between the first and last
        Dense, each carrying its trailing activation layers; must divide
        evenly into n_stages stages.
        """
        layers = self.net.layers
        dense_idx = [i for i, l in enumerate(layers) if isinstance(l, Dense)]
        if len(dense_idx) < 3:
            raise ValueError("pipeline needs at least proj + body + head")
        for l in layers:
            if not isinstance(l, (Dense, Activation)):
                raise ValueError(
                    "PipelineParallel supports Dense/Activation stacks; "
                    "got %s" % l.name)

        first, last = dense_idx[0], dense_idx[-1]
        proj = layers[: dense_idx[1]]          # first dense + its acts
        head = layers[last:]                   # last dense (+ trailing acts)
        body_units = []                        # (dense, [acts]) groups
        for a, b in zip(dense_idx[1:-1], dense_idx[2:]):
            body_units.append(layers[a:b])

        widths = {tuple(u[0].shapes["w"]) for u in body_units}
        if len(widths) != 1:
            raise ValueError("body Dense layers must share one shape, got %s"
                             % widths)
        w_shape = widths.pop()
        if w_shape[0] != w_shape[1]:
            raise ValueError("body Dense layers must be square, got %s"
                             % (w_shape,))
        if len(body_units) % self.n_stages:
            raise ValueError(
                "%d body layers don't divide into %d stages"
                % (len(body_units), self.n_stages))
        return proj, body_units, head, w_shape[0]

    def _shard_params(self):
        proj, body_units, head, width = self._partition()
        self._proj_layers = proj
        self._head_layers = head
        self._acts_per_unit = [u[1:] for u in body_units[: len(body_units)
                                                         // self.n_stages]]
        k = len(body_units) // self.n_stages

        def stacked(name):
            arrs = [u[0].params[name].data for u in body_units]
            return jnp.stack(arrs).reshape(
                (self.n_stages, k) + arrs[0].shape)

        sharding = NamedSharding(self.mesh, P(self.axis_name))
        rep = NamedSharding(self.mesh, P())
        params = {
            "body": {
                "w": jax.device_put(stacked("w"), sharding),
                "b": jax.device_put(stacked("b"), sharding),
            },
            "proj": {
                i: {n: jax.device_put(l.params[n].data, rep)
                    for n in l.params}
                for i, l in enumerate(proj) if isinstance(l, Dense)
            },
            "head": {
                i: {n: jax.device_put(l.params[n].data, rep)
                    for n in l.params}
                for i, l in enumerate(head) if isinstance(l, Dense)
            },
        }
        self._k = k
        self._width = width
        return params

    # -------------------------------------------------------------- build

    def _run_segment(self, layers, params_for_segment, h):
        """Replicated proj/head segment forward on Tensor h; returns
        (output, dict of param Tensors for grad collection)."""
        tensors = {}
        for i, layer in enumerate(layers):
            if isinstance(layer, Dense):
                w = Tensor(params_for_segment[i]["w"], requires_grad=True)
                b = Tensor(params_for_segment[i]["b"], requires_grad=True)
                tensors[i] = {"w": w, "b": b}
                h = h @ w + b
            else:
                h = layer.forward(h)
        return h, tensors

    def _build(self, mb_size):
        loss_fn = self.model.loss
        optimizer = self.model.optimizer
        axis = self.axis_name
        S = self.n_stages
        M = self.microbatches
        k = self._k
        width = self._width
        acts_per_unit = self._acts_per_unit
        proj_layers = self._proj_layers
        head_layers = self._head_layers
        ring = [(i, (i + 1) % S) for i in range(S)]

        def local_step(params, opt_state, x, y):
            # local stage slice [1, k, W, W] -> Tensors carrying the tape
            body_w = Tensor(params["body"]["w"][0], requires_grad=True)
            body_b = Tensor(params["body"]["b"][0], requires_grad=True)

            idx = jax.lax.axis_index(axis)
            is_first = (idx == 0)
            is_last = (idx == S - 1)

            def stage(h):
                for j in range(k):
                    h = h @ body_w[j] + body_b[j]
                    for act in acts_per_unit[j]:
                        h = act.forward(h)
                return h

            h_carry = Tensor(jnp.zeros((mb_size, width), jnp.float32))
            loss_total = None
            proj_tensors = head_tensors = None

            for t in range(M + S - 1):
                x_mb = x[min(t, M - 1)]
                h0, ptens = self._run_segment(
                    proj_layers, params["proj"], Tensor(x_mb))
                if proj_tensors is None:
                    proj_tensors = []
                proj_tensors.append(ptens)
                h_in = ops.where(is_first, h0, h_carry)
                h_out = stage(h_in)

                m_out = t - (S - 1)
                if 0 <= m_out < M:
                    logits, htens = self._run_segment(
                        head_layers, params["head"], h_out)
                    if head_tensors is None:
                        head_tensors = []
                    head_tensors.append(htens)
                    per = loss_fn.loss(logits, Tensor(y[m_out]))
                    masked = ops.where(is_last, per,
                                       Tensor(jnp.zeros((), jnp.float32)))
                    loss_total = masked if loss_total is None \
                        else loss_total + masked

                if t < M + S - 2:
                    h_carry = ops.ppermute_(h_out, axis, ring)

            loss_mean = loss_total / M
            loss_rep = ops.psum_(loss_mean, axis)  # nonzero on last stage only
            loss_rep.backward()

            def seg_grads(tensor_list, seg_params):
                # sum tape grads over all ticks; replicate via psum (each
                # segment's compute is masked to one stage)
                out = {}
                for i in seg_params:
                    gw = sum(t[i]["w"].grad for t in tensor_list)
                    gb = sum(t[i]["b"].grad for t in tensor_list)
                    out[i] = {"w": jax.lax.psum(gw, axis),
                              "b": jax.lax.psum(gb, axis)}
                return out

            grads = {
                "body": {"w": body_w.grad[None], "b": body_b.grad[None]},
                "proj": seg_grads(proj_tensors, params["proj"]),
                "head": seg_grads(head_tensors, params["head"]),
            }

            steps, new_opt = optimizer.update(grads, params, opt_state)
            new_params = jax.tree.map(lambda p, s: p + s, params, steps)
            return new_params, new_opt, loss_rep.data

        param_specs = {
            "body": {"w": P(axis), "b": P(axis)},
            "proj": jax.tree.map(lambda _: P(), dict(self._spec_template("proj"))),
            "head": jax.tree.map(lambda _: P(), dict(self._spec_template("head"))),
        }
        opt_spec = {
            "t": P(),
            "slots": {name: param_specs
                      for name in optimizer.slot_names},
        }
        sharded = jax.shard_map(
            local_step, mesh=self.mesh,
            in_specs=(param_specs, opt_spec, P(), P()),
            out_specs=(param_specs, opt_spec, P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1))

    def _spec_template(self, seg):
        return {i: {n: 0 for n in leafs}
                for i, leafs in self._params[seg].items()}

    # ---------------------------------------------------------- train API

    def train_step(self, x, y):
        """One pipelined fused step on a replicated global batch (size must
        divide by ``microbatches``). Returns the mean loss."""
        x = jnp.asarray(x.data if isinstance(x, Tensor) else x)
        y = jnp.asarray(y.data if isinstance(y, Tensor) else y)
        if not self.net.is_init:
            self.net.init(x.shape)
        M = self.microbatches
        if x.shape[0] % M:
            raise ValueError("batch %d not divisible by %d microbatches"
                             % (x.shape[0], M))
        mb = x.shape[0] // M
        xm = x.reshape((M, mb) + x.shape[1:])
        ym = y.reshape((M, mb) + y.shape[1:])

        if self._params is None:
            self._params = self._shard_params()
        if self._opt_state is None:
            self._opt_state = self.model.optimizer.init_state(self._params)
        if self._step_fn is None:
            self.net.set_phase("TRAIN")
            self._step_fn = self._build(mb)

        rep = NamedSharding(self.mesh, P())
        xm = jax.device_put(xm, rep)
        ym = jax.device_put(ym, rep)
        self._params, self._opt_state, loss = self._step_fn(
            self._params, self._opt_state, xm, ym)
        return loss

    def gather_params(self):
        """Host copies: {body: [S,k,...] stacked arrays, proj/head dicts}."""
        return jax.tree.map(np.asarray, self._params)
