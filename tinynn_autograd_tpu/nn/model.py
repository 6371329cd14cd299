"""Model: net + loss + optimizer facade (reference surface: core/model.py).

Two training paths:

1. The reference-compatible eager loop — ``zero_grad -> forward -> loss ->
   backward -> step`` with ``step()`` collecting ``param.grad`` and applying
   ``param += step`` (reference: core/model.py:45-68). Every op dispatches to
   the device eagerly; correct, but each op is its own dispatch.

2. ``train_step(x, y)`` — the TPU path. The FIRST call traces forward + tape
   backward + optimizer update into ONE jitted XLA program with param and
   optimizer-state buffers donated across steps (functional update replacing
   the reference's in-place ``__iadd__``, reference: core/model.py:58-61).
   Subsequent calls are a single device dispatch with zero host round trips;
   the loss comes back as an (unsynced) device scalar.

Checkpointing (``save``/``load``) serializes a host-side pytree of params,
optimizer state, and the step counter, with a real shape-compatibility check
(the reference's check reads a nonexistent attribute and its pickle'd tape
closures can't serialize at all — reference: core/model.py:18-35).
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from tinynn_autograd_tpu.core.tensor import Tensor
from tinynn_autograd_tpu.utils import seeder


class Model:

    def __init__(self, net, loss, optimizer):
        self.net = net
        self.loss = loss
        self.optimizer = optimizer

        self._phase = "TRAIN"
        self._opt_state = None
        self._jitted = {}     # phase/kind -> compiled fn
        self._base_key = None

    # ------------------------------------------------------------- forward

    def forward(self, inputs):
        return self.net.forward(inputs)

    def predict(self, inputs):
        """Jit-compiled inference forward (cached per phase)."""
        inputs = jnp.asarray(inputs)
        self._ensure_init(inputs.shape)
        key = ("predict", self._phase)
        if key not in self._jitted:
            def fwd(params, x):
                self.net.bind_params(params)
                out = self.net.forward(Tensor(x))
                return out.data

            self._jitted[key] = jax.jit(fwd)
        tree = self._params if self._params is not None else self.net.params_tree()
        out = self._jitted[key](tree, inputs)
        self.net.bind_params(tree)  # clear tracer-backed params from tracing
        return Tensor(out)

    # ------------------------------------------------- fused TPU train step

    def _ensure_init(self, input_shape):
        if not self.net.is_init:
            self.net.init(input_shape)

    def _rebind_concrete(self):
        """After a traced call, layers may hold tracer-backed Tensors from
        bind_params; restore the live concrete params."""
        if self._params is not None:
            self.net.bind_params(self._params)

    @property
    def _params(self):
        return getattr(self, "_params_cache", None)

    @_params.setter
    def _params(self, v):
        self._params_cache = v

    def train_step(self, x, y):
        """One fused optimization step; returns the loss as a device scalar
        (no host sync — wrap in float() to block)."""
        x = jnp.asarray(x.data if isinstance(x, Tensor) else x)
        y = jnp.asarray(y.data if isinstance(y, Tensor) else y)
        self._ensure_init(x.shape)

        if self._params is None:
            self._params = self.net.params_tree()
        if self._opt_state is None:
            self._opt_state = self.optimizer.init_state(self._params)
        if self._base_key is None:
            self._base_key = seeder.next_key()

        if self._phase != "TRAIN":
            self.set_phase("TRAIN")

        key = ("train_step",)
        if key not in self._jitted:
            self.net.set_phase("TRAIN")
            self._jitted[key] = jax.jit(
                self._step_core(), donate_argnums=(0, 1))

        self._params, self._opt_state, loss = self._jitted[key](
            self._params, self._opt_state, x, y
        )
        self._rebind_concrete()
        return loss

    def _step_core(self):
        """The pure fused step: forward + tape backward + optimizer update.
        Shared by the per-step jit, the scanned epoch, and (with a psum
        spliced in) the data-parallel path."""
        net, loss_fn, optimizer = self.net, self.loss, self.optimizer
        base_key = self._base_key

        def step_fn(params, opt_state, xb, yb):
            net.bind_params(params)
            rng = jax.random.fold_in(base_key, opt_state["t"])
            pred = net.forward(Tensor(xb), rng=rng)
            loss_t = loss_fn.loss(pred, Tensor(yb))
            loss_t.backward()
            grads = net.collect_grads()
            steps, new_opt_state = optimizer.update(grads, params, opt_state)
            new_params = jax.tree.map(lambda p, s: p + s, params, steps)
            return new_params, new_opt_state, loss_t.data

        return step_fn

    def stage(self, x, y=None):
        """Move data into device HBM once; returns device array(s). Feed the
        result to ``train_epoch`` so epochs run with ZERO host->device
        traffic (the usual bottleneck when the host link is slow)."""
        x = jnp.asarray(x.data if isinstance(x, Tensor) else x)
        if y is None:
            return jax.device_put(x)
        y = jnp.asarray(y.data if isinstance(y, Tensor) else y)
        return jax.device_put(x), jax.device_put(y)

    def train_epoch(self, x_all, y_all, batch_size=128, shuffle=True):
        """One full epoch as ONE device dispatch: an on-device shuffle
        (jax.random.permutation gather at HBM bandwidth) followed by
        ``lax.scan`` of the fused train step over the batched dataset.

        This is the TPU-native replacement for the reference's per-batch
        Python loop (reference: examples/mnist/run.py:76-84): no per-step
        dispatch, no per-step host<->device transfer — the interconnect sees
        one launch per epoch. The ragged tail (n % batch_size) is dropped,
        like BatchIterator(drop_last=True).

        Returns the per-step loss trace as a device array [n_steps].
        """
        x_all = jnp.asarray(x_all.data if isinstance(x_all, Tensor) else x_all)
        y_all = jnp.asarray(y_all.data if isinstance(y_all, Tensor) else y_all)
        self._ensure_init((batch_size,) + x_all.shape[1:])

        if self._params is None:
            self._params = self.net.params_tree()
        if self._opt_state is None:
            self._opt_state = self.optimizer.init_state(self._params)
        if self._base_key is None:
            self._base_key = seeder.next_key()
        if self._phase != "TRAIN":
            self.set_phase("TRAIN")

        n = x_all.shape[0]
        n_steps = n // batch_size
        key = ("train_epoch", batch_size, bool(shuffle), n)
        if key not in self._jitted:
            self.net.set_phase("TRAIN")
            step_fn = self._step_core()

            def epoch_fn(params, opt_state, xs, ys, rng):
                if shuffle:
                    perm = jax.random.permutation(rng, n)[: n_steps * batch_size]
                else:
                    perm = jnp.arange(n_steps * batch_size)
                xb = xs[perm].reshape((n_steps, batch_size) + xs.shape[1:])
                yb = ys[perm].reshape((n_steps, batch_size) + ys.shape[1:])

                def body(carry, batch):
                    params, opt_state = carry
                    params, opt_state, loss = step_fn(
                        params, opt_state, batch[0], batch[1])
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), (xb, yb))
                return params, opt_state, losses

            self._jitted[key] = jax.jit(epoch_fn, donate_argnums=(0, 1))

        epoch_rng = seeder.next_key()
        self._params, self._opt_state, losses = self._jitted[key](
            self._params, self._opt_state, x_all, y_all, epoch_rng)
        self._rebind_concrete()
        return losses

    def evaluate_batch(self, x, y, evaluator):
        """Jitted TEST-phase forward + argmax for classification eval."""
        preds = self.predict(x)
        pred_idx = np.argmax(preds.numpy(), axis=1)
        targets = y.numpy() if isinstance(y, Tensor) else np.asarray(y)
        return evaluator.evaluate(pred_idx, targets)

    # ------------------------------------------- reference-style eager step

    def step(self):
        """Collect grads, compute optimizer steps, apply in place
        (reference contract: core/model.py:45-61)."""
        self._invalidate_fused()
        params = self.net.get_parameters()
        all_grads = [
            {k: v.grad for k, v in param.items()} for param in params
        ]
        steps = self.optimizer.compute_step(all_grads, params)
        for step, param in zip(steps, params):
            for k in param.keys():
                param[k] += step[k]

    def zero_grad(self):
        for param in self.net.get_parameters():
            for p in param.values():
                if p is not None:
                    p.zero_grad()

    def _invalidate_fused(self):
        """Eager mutation makes the cached fused-step params stale."""
        self._params = None

    # ----------------------------------------------------------- checkpoint

    def save(self, path):
        params_host = jax.tree.map(np.asarray, self.net.params_tree())
        opt_state_host = (
            jax.tree.map(np.asarray, self._opt_state)
            if self._opt_state is not None else None
        )
        payload = {
            "format": "tinynn_tpu_ckpt_v1",
            "params": params_host,
            "opt_state": opt_state_host,
            "layer_names": [l.name for l in self.net.layers],
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        print("Model saved in %s." % path)

    def load(self, path):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        params = payload["params"]
        # shape compatibility check (the reference intended this but reads a
        # nonexistent attribute, reference: core/model.py:27-31)
        if not self.net.is_init:
            current = [
                {k: v for k, v in getattr(l, "shapes", {}).items()}
                for l in self.net.layers
            ]
        else:
            current = [
                {k: tuple(v.shape) for k, v in l.params.items() if v is not None}
                for l in self.net.layers
            ]
        if len(params) != len(self.net.layers):
            raise ValueError(
                "Incompatible architecture: %d layers in checkpoint vs %d "
                "defined." % (len(params), len(self.net.layers)))
        for i, (saved, layer) in enumerate(zip(params, self.net.layers)):
            have = current[i]
            for k, arr in saved.items():
                want = have.get(k)
                want = tuple(want) if want is not None else None
                if want is not None and None not in want and want != tuple(arr.shape):
                    raise ValueError(
                        "Incompatible architecture at layer %d (%s/%s): "
                        "%s in checkpoint vs %s defined."
                        % (i, layer.name, k, tuple(arr.shape), want))
        # install
        for layer, saved in zip(self.net.layers, params):
            for k, arr in saved.items():
                layer.params[k] = Tensor(jnp.asarray(arr), requires_grad=True)
            if hasattr(layer, "_is_init") and saved:
                layer._is_init = True
                if "w" in saved:
                    layer.shapes["w"] = list(np.asarray(saved["w"]).shape)
        if payload.get("opt_state") is not None:
            self._opt_state = jax.tree.map(jnp.asarray, payload["opt_state"])
            self.optimizer.load_state_dict(self._opt_state)
        self._params = None
        self._jitted.pop(("train_step",), None)
        print("Restored model from %s." % path)

    # ---------------------------------------------------------------- phase

    def get_phase(self):
        return self._phase

    def set_phase(self, phase):
        assert phase in ("TRAIN", "TEST")
        self.net.set_phase(phase)
        self._phase = phase
