"""Megakernel optimizer-component probe (VERDICT r3 item 2).

The fused-epoch megakernel's wall model needs the measured IRREDUCIBLE
in-kernel optimizer cost: a Pallas kernel with the same sequential
(n_steps,) grid and the same MNIST-MLP leaf shapes resident in VMEM
scratch, executing ONLY the per-leaf optimizer update each step (fake
gradients g = 1e-3 * p, one elementwise pass — identical across
optimizers, so deltas isolate the slot math/traffic). The dependency
chain through the param scratch prevents dead-code elimination; the final
step flushes params out.

Wall(opt) = chain+stream bound (~4 us, FLOOR_PROBE round 3)
            + (t_probe(opt) - t_probe(sgd))    [the slot component]
with t_probe(sgd) itself reported for reference (its update is one AXPY).

Usage (real TPU): python bench_mega_probe.py  -> MEGA_PROBE.json
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REPEATS = 3
N_STEPS = 20000

# the flagship MNIST MLP's leaves (784-200-100-70-30-10 Dense w + b)
LEAF_SHAPES = [(784, 200), (1, 200), (200, 100), (1, 100),
               (100, 70), (1, 70), (70, 30), (1, 30), (30, 10), (1, 10)]


def build_probe(optimizer, n_steps=N_STEPS):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    slot_names = optimizer.slot_names
    n_leaves = len(LEAF_SHAPES)
    n_slots = len(slot_names)

    def kernel(*refs):
        t0_ref = refs[0]
        param_in = refs[1:1 + n_leaves]
        slot_in = refs[1 + n_leaves:1 + n_leaves + n_slots * n_leaves]
        param_out = refs[1 + n_leaves + n_slots * n_leaves:
                         1 + 2 * n_leaves + n_slots * n_leaves]
        scratch = refs[1 + 2 * n_leaves + n_slots * n_leaves:]
        param_scr = scratch[:n_leaves]
        slot_scr = scratch[n_leaves:]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for src, dst in zip(param_in, param_scr):
                dst[...] = src[...]
            for src, dst in zip(slot_in, slot_scr):
                dst[...] = src[...]

        t = t0_ref[0, 0] + i
        lr = optimizer._lr_at(t)
        for j in range(n_leaves):
            p = param_scr[j][...]
            g = p * 1e-3  # fake gradient: one elementwise pass
            slots = {n: slot_scr[s * n_leaves + j][...]
                     for s, n in enumerate(slot_names)}
            step, new = optimizer.step_leaf(g, lr, t, slots, salt=j)
            param_scr[j][...] = p + step
            for s, n in enumerate(slot_names):
                slot_scr[s * n_leaves + j][...] = new[n]

        @pl.when(i == n_steps - 1)
        def _fin():
            for src, dst in zip(param_scr, param_out):
                dst[...] = src[...]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)]
    in_specs += [const(s) for s in LEAF_SHAPES]
    in_specs += [const(s) for _ in range(n_slots) for s in LEAF_SHAPES]
    call = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32)
                   for s in LEAF_SHAPES],
        out_specs=[const(s) for s in LEAF_SHAPES],
        scratch_shapes=[pltpu.VMEM(s, jnp.float32) for s in LEAF_SHAPES]
        + [pltpu.VMEM(s, jnp.float32)
           for _ in range(n_slots) for s in LEAF_SHAPES],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    @jax.jit
    def run(t0, params, slots):
        outs = call(t0, *params, *slots)
        return outs[0][0, 0]  # readback anchor

    return run


def main():
    import jax
    import jax.numpy as jnp

    from tinynn_autograd_tpu.nn import optimizer as opt

    print(json.dumps({"backend": jax.default_backend(),
                      "n_steps": N_STEPS}), flush=True)
    out = {}
    rng = np.random.RandomState(0)
    params = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
              for s in LEAF_SHAPES]
    for name, o in [("sgd", opt.SGD(1e-2)),
                    ("momentum", opt.Momentum(1e-2)),
                    ("rmsprop", opt.RMSProp(1e-3)),
                    ("adam", opt.Adam(1e-3))]:
        slots = [jnp.zeros(s, jnp.float32)
                 for _ in o.slot_names for s in LEAF_SHAPES]
        run = build_probe(o)
        t0 = jnp.ones((1, 1), jnp.int32)
        float(run(t0, params, slots))  # compile + warmup
        times = []
        for _ in range(REPEATS):
            s0 = time.perf_counter()
            float(run(t0, params, slots))
            times.append((time.perf_counter() - s0) / N_STEPS * 1e6)
        out["mega_opt_%s_us_per_step" % name] = round(
            statistics.median(times), 3)
        print(json.dumps({"probe": name,
                          "us_per_step": out["mega_opt_%s_us_per_step"
                                             % name]}), flush=True)
    base = out["mega_opt_sgd_us_per_step"]
    for name in ("momentum", "rmsprop", "adam"):
        out["mega_opt_%s_delta_vs_sgd_us" % name] = round(
            out["mega_opt_%s_us_per_step" % name] - base, 3)
    with open("MEGA_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote MEGA_PROBE.json")


if __name__ == "__main__":
    main()
