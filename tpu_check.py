"""TPU-hardware smoke checks (VERDICT r2 item 7): exercises the code paths
the CPU suite can only cover via interpret-mode stand-ins, on the real chip,
and writes TPUCHECK_r{N}.json.

Checks:
1. pltpu PRNG dropout statistics — a minimal Pallas kernel applies the
   REAL ``pltpu.prng_seed / prng_random_bits`` branch of ``ops.dropout_``
   (primitives.py dropout_) to a ones tensor: the zero fraction must match
   the rate, survivors must carry exactly the 1/(1-p) inverted-dropout
   scale, and different seeds must give different masks.
2. Dropout-enabled fused-epoch megakernel — an MLP with Dropout trains via
   ``train_epochs(fused=True)`` (the hardware pltpu branch, not the
   counter-hash interpret stand-in): losses finite and decreasing, and the
   run differs from a rate=0 twin (proving masks are actually applied
   in-kernel).

Usage (real TPU):  python tpu_check.py [--round N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def check_pltpu_dropout_stats(results):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from tinynn_autograd_tpu.core.tensor import Tensor
    from tinynn_autograd_tpu.ops.primitives import dropout_

    shape = (256, 256)
    rate = 0.5

    def kernel(seed_ref, out_ref):
        x = Tensor(jnp.ones(shape, jnp.float32), requires_grad=False)
        out = dropout_(x, rate, ("pltpu_seed", seed_ref[0]))
        out_ref[...] = out.data

    run = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
    )

    masks = {}
    for seed in (1, 2):
        out = np.asarray(run(jnp.array([seed], jnp.int32)))
        n = out.size
        zero_frac = float((out == 0.0).mean())
        survivors = out[out != 0.0]
        scale = 1.0 / (1.0 - rate)
        # binomial std of the zero fraction at n=65536 is ~0.002
        assert abs(zero_frac - rate) < 0.02, zero_frac
        assert np.allclose(survivors, scale), (survivors.min(),
                                               survivors.max())
        masks[seed] = out != 0.0
        results["pltpu_dropout_seed%d" % seed] = {
            "n": n, "zero_frac": round(zero_frac, 5),
            "survivor_scale": float(survivors[0]) if survivors.size else None,
        }
    differ = float((masks[1] != masks[2]).mean())
    assert differ > 0.3, differ   # independent masks differ on ~50% of cells
    results["pltpu_dropout_mask_seed_divergence"] = round(differ, 4)
    print("pltpu dropout stats: ok (zero_frac within 2e-2, scale exact, "
          "seed divergence %.3f)" % differ)


def check_megakernel_dropout_e2e(results):
    import jax

    from tinynn_autograd_tpu.nn.layers import Dense, Dropout, ReLU
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn.net import Net
    from tinynn_autograd_tpu.nn.optimizer import Adam
    from tinynn_autograd_tpu.utils.datasets import one_hot, synthetic_mnist
    from tinynn_autograd_tpu.utils.seeder import random_seed

    assert jax.default_backend() == "tpu", (
        "tpu_check must run on the real TPU; backend=%s"
        % jax.default_backend())

    (tx, ty), (ex, ey) = synthetic_mnist(n_train=12800, n_test=2000)
    ty_oh = one_hot(ty)

    def build(rate):
        random_seed(0)
        net = Net([Dense(200, num_in=784), ReLU(), Dropout(rate),
                   Dense(100, num_in=200), ReLU(), Dropout(rate),
                   Dense(10, num_in=100)])
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-3))

    losses = {}
    for rate in (0.0, 0.3):
        m = build(rate)
        x_dev, y_dev = m.stage(tx, ty_oh)
        # fused=True forces the megakernel; on TPU dropout inside it uses
        # the hardware PRNG branch
        trace = np.asarray(m.train_epochs(x_dev, y_dev, n_epochs=5,
                                          batch_size=128, fused=True))
        assert np.isfinite(trace).all()
        assert trace[-1, -1] < trace[0, 0] * 0.5, trace[[0, -1], [0, -1]]
        losses[rate] = trace
        from tinynn_autograd_tpu.nn.evaluator import AccEvaluator

        acc = m.evaluate_batch(ex, ey, AccEvaluator)["accuracy"]
        results["megakernel_dropout_rate%.1f" % rate] = {
            "first_loss": float(trace[0, 0]),
            "final_loss": float(trace[-1, -1]),
            "test_acc": round(float(acc), 4),
        }
        print("megakernel rate=%.1f: loss %.4f -> %.4f, acc %.4f"
              % (rate, trace[0, 0], trace[-1, -1], acc))

    # identical init/seeds: only the dropout masks distinguish the runs
    assert not np.allclose(losses[0.0], losses[0.3]), (
        "dropout had no effect inside the megakernel")
    results["megakernel_dropout_changes_training"] = True


def check_flash_dropout_hw(results):
    """Round-5 check: flash-attention in-kernel dropout on the real chip.

    The keep mask is a counter hash of the absolute (head, q, k) index
    (ops/attention.py _tile_keep_mask) that the Pallas kernels and the XLA
    fallback regenerate INDEPENDENTLY — so same-seed Pallas-vs-XLA parity
    on hardware proves the in-kernel replay (fwd and both bwd kernels,
    incl. the dk/dv kernel's transposed orientation) drops exactly the
    same cells the fallback does. Covers both kernel regimes: gridded
    (t=2048 — t=1024 routes to the whole-plane single kernel since the
    round-5 envelope widening) and single-grid-step (t=512)."""
    import jax.numpy as jnp

    from tinynn_autograd_tpu.ops import attention

    rng = np.random.RandomState(0)
    rate, seed = 0.15, 7
    for (b, h, t, d) in ((2, 4, 2048, 64), (4, 4, 512, 64)):
        tag = "b%dh%dt%dd%d" % (b, h, t, d)
        q, k, v, do = (jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
                       for _ in range(4))
        tol = 2e-3 * np.sqrt(t / 128.0)

        def fwd(impl, r=rate, s=seed):
            return attention.mha_fwd(q, k, v, causal=True, impl=impl,
                                     dropout_rate=r, dropout_seed=s)

        o_p, lse_p = fwd("pallas")
        o_x, lse_x = fwd("xla")
        fwd_err = float(jnp.max(jnp.abs(o_p - o_x)))
        assert fwd_err < tol, (tag, fwd_err)

        g_p = attention.mha_bwd(q, k, v, o_p, lse_p, do, causal=True,
                                impl="pallas", dropout_rate=rate,
                                dropout_seed=seed)
        g_x = attention.mha_bwd(q, k, v, o_x, lse_x, do, causal=True,
                                impl="xla", dropout_rate=rate,
                                dropout_seed=seed)
        bwd_errs = [float(jnp.max(jnp.abs(a - b_))) for a, b_ in
                    zip(g_p, g_x)]
        # grads are O(sqrt(t)) bigger than activations; scale the gate
        gscale = max(float(jnp.max(jnp.abs(g))) for g in g_x)
        assert max(bwd_errs) < 5 * tol * max(1.0, gscale), (tag, bwd_errs)

        o_p0, _ = fwd("pallas", r=0.0)
        effect = float(jnp.max(jnp.abs(o_p - o_p0)))
        assert effect > 1e-2, (tag, effect)      # masks actually applied
        o_p2, _ = fwd("pallas", s=seed + 1)
        seed_div = float(jnp.max(jnp.abs(o_p - o_p2)))
        assert seed_div > 1e-2, (tag, seed_div)  # seed changes the masks

        results["flash_dropout_" + tag] = {
            "fwd_err_vs_xla_same_seed": round(fwd_err, 6),
            "bwd_err_vs_xla_same_seed": [round(e, 6) for e in bwd_errs],
            "dropout_effect": round(effect, 4),
            "seed_divergence": round(seed_div, 4),
        }
        print("flash dropout %s: fwd err %.2e, bwd errs %s (replay ok)"
              % (tag, fwd_err, ["%.2e" % e for e in bwd_errs]))


def check_llama_window_hw(results):
    """Final round-5 check: native GQA and sliding-window attention on
    the real chip.

    GQA: mha_fwd/mha_bwd with K/V at Hkv < H heads (grouped kernel calls
    against the shared K/V) must match the same kernels on repeated K/V —
    hardware proof that the group/head index mapping survives Mosaic
    compilation in both kernel regimes (t=1024 whole-plane, t=2048
    gridded). Window: banded Pallas vs banded XLA parity (fwd + all three
    grads — exercises the two-sided tile skip + DMA clamps on real
    hardware), plus band-effect sanity (window != full causal)."""
    import jax.numpy as jnp

    from tinynn_autograd_tpu.ops import attention

    rng = np.random.RandomState(1)
    for (b, h, hkv, t, d) in ((2, 8, 2, 1024, 64), (1, 8, 4, 2048, 64)):
        tag = "t%d" % t
        tol = 2e-3 * np.sqrt(t / 128.0)
        q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
        k = jnp.asarray(rng.randn(b, hkv, t, d).astype(np.float32))
        v = jnp.asarray(rng.randn(b, hkv, t, d).astype(np.float32))
        do = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))

        # --- GQA: grouped kernels vs repeated-KV kernels ---------------
        o_g, lse_g = attention.mha_fwd(q, k, v, causal=True, impl="pallas")
        krep = jnp.repeat(k, h // hkv, axis=1)
        vrep = jnp.repeat(v, h // hkv, axis=1)
        o_r, lse_r = attention.mha_fwd(q, krep, vrep, causal=True,
                                       impl="pallas")
        gqa_err = float(jnp.max(jnp.abs(o_g - o_r)))
        assert gqa_err < tol, (tag, gqa_err)
        dg = attention.mha_bwd(q, k, v, o_g, lse_g, do, causal=True,
                               impl="pallas")
        dr = attention.mha_bwd(q, krep, vrep, o_r, lse_r, do, causal=True,
                               impl="pallas")
        group = h // hkv
        dk_want = dr[1].reshape(b, hkv, group, t, d).sum(2)
        dv_want = dr[2].reshape(b, hkv, group, t, d).sum(2)
        gscale = max(float(jnp.max(jnp.abs(x))) for x in dr)
        gqa_bwd = max(float(jnp.max(jnp.abs(dg[0] - dr[0]))),
                      float(jnp.max(jnp.abs(dg[1] - dk_want))),
                      float(jnp.max(jnp.abs(dg[2] - dv_want))))
        assert gqa_bwd < 5 * tol * max(1.0, gscale), (tag, gqa_bwd)

        # --- sliding window: banded kernels vs banded fallback ---------
        w = t // 4
        kw = dict(causal=True, window=w)
        ow_p, lw_p = attention.mha_fwd(q, k, v, impl="pallas", **kw)
        ow_x, lw_x = attention.mha_fwd(q, k, v, impl="xla", **kw)
        win_err = float(jnp.max(jnp.abs(ow_p - ow_x)))
        assert win_err < tol, (tag, win_err)
        gw_p = attention.mha_bwd(q, k, v, ow_p, lw_p, do, impl="pallas",
                                 **kw)
        gw_x = attention.mha_bwd(q, k, v, ow_x, lw_x, do, impl="xla", **kw)
        win_bwd = max(float(jnp.max(jnp.abs(a - b_)))
                      for a, b_ in zip(gw_p, gw_x))
        wscale = max(float(jnp.max(jnp.abs(x))) for x in gw_x)
        assert win_bwd < 5 * tol * max(1.0, wscale), (tag, win_bwd)
        band_effect = float(jnp.max(jnp.abs(ow_p - o_g)))
        assert band_effect > 1e-2, (tag, band_effect)

        results["llama_window_" + tag] = {
            "gqa_fwd_err_vs_repeated_kv": round(gqa_err, 6),
            "gqa_bwd_err_vs_repeated_kv": round(gqa_bwd, 6),
            "window_fwd_err_vs_xla": round(win_err, 6),
            "window_bwd_err_vs_xla": round(win_bwd, 6),
            "band_effect": round(band_effect, 4),
        }
        print("llama/window %s: gqa %.2e/%.2e, window %.2e/%.2e (ok)"
              % (tag, gqa_err, gqa_bwd, win_err, win_bwd))


def check_remat_accum_hw(results):
    """Round-5 check: activation rematerialization + gradient accumulation
    on the real chip.

    A 4-block transformer (attn="tape" so the [B,H,T,T] score planes are
    the dominant activations) trains one jitted step three ways — plain,
    Remat-per-block, and Remat + accum_steps=4 — and must produce the
    same loss (no dropout, shared init seeds). XLA's own memory analysis
    of the two compiled steps then certifies the point of remat: the
    checkpointed program's temp allocation (live activations) must come
    in well under the plain tape's."""
    import jax.numpy as jnp

    from tinynn_autograd_tpu.nn.layers import Dense, Flatten, Remat, \
        TransformerBlock
    from tinynn_autograd_tpu.nn.losses import SoftmaxCrossEntropyLoss
    from tinynn_autograd_tpu.nn.model import Model
    from tinynn_autograd_tpu.nn.net import Net
    from tinynn_autograd_tpu.utils.seeder import random_seed

    b, t, dim, heads, depth, nout = 8, 512, 256, 4, 4, 16
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(b, t, dim).astype(np.float32))
    y = jnp.asarray(np.eye(nout, dtype=np.float32)[
        rng.randint(0, nout, b)])

    def build(wrap):
        from tinynn_autograd_tpu.nn.optimizer import Adam
        blocks = [TransformerBlock(dim, heads, causal=True, seed=50 + i,
                                   attn="tape")
                  for i in range(depth)]
        if wrap:
            blocks = [Remat(blk) for blk in blocks]
        net = Net(blocks + [Flatten(), Dense(nout, num_in=t * dim,
                                             seed=99)])
        return Model(net, SoftmaxCrossEntropyLoss(), Adam(1e-3))

    random_seed(0)
    losses, temps = {}, {}
    for tag, wrap, accum in (("plain", False, 1), ("remat", True, 1),
                             ("remat_accum4", True, 4)):
        m = build(wrap)
        losses[tag] = float(m.train_step(x, y, accum_steps=accum))
        key = ("train_step", accum, m._config_fingerprint())
        an = m._jitted[key].lower(
            m._params, m._opt_state, m._buffers, x, y).compile() \
            .memory_analysis()
        temps[tag] = int(getattr(an, "temp_size_in_bytes", 0))

    assert abs(losses["remat"] - losses["plain"]) < 1e-3, losses
    assert abs(losses["remat_accum4"] - losses["plain"]) < 1e-3, losses
    ratio = temps["plain"] / max(temps["remat"], 1)
    # 4 blocks x 2 score planes [8,4,512,512] f32 = ~33 MB each live in
    # the plain tape; remat keeps ~one block's worth. Recorded, not
    # asserted: buffer-assignment accounting is backend-specific (the CPU
    # backend reports NO saving even for jax.checkpoint on an equivalent
    # chain — measured while building this check), so the number is the
    # artifact and the loss parity above is the hard gate.
    stats = {"losses": {k: round(v, 5) for k, v in losses.items()},
             "temp_bytes": temps,
             "plain_over_remat_temp_ratio": round(ratio, 2),
             "temp_saving_confirmed": bool(ratio > 1.5)}
    results["remat_accum"] = stats
    print("remat/accum hw: losses %s, temp bytes %s (plain/remat %.2fx)"
          % (stats["losses"], temps, ratio))


def check_recurrent_kernels_hw(results):
    """Round-5 check: the in-kernel Pallas recurrences (LSTM + GRU,
    ops/recurrent_kernel.py) on the real chip — value AND all-cotangent
    parity of the auto-dispatched pallas path vs the forced XLA-scan path
    at a bench-like shape, plus a chained timing of both (fwd+bwd through
    the tape primitive) so the dependent-matmul-wall claim is measured,
    not extrapolated."""
    import time

    import jax
    import jax.numpy as jnp

    from tinynn_autograd_tpu.core.tensor import Tensor
    from tinynn_autograd_tpu.ops.recurrent import gru_scan_, lstm_scan_

    rng = np.random.RandomState(1)
    B, T, D, H = 64, 128, 64, 256
    for name, scan_fn, g in (("lstm", lstm_scan_, 4), ("gru", gru_scan_, 3)):
        x = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
        wx = jnp.asarray(0.2 * rng.randn(D, g * H).astype(np.float32))
        wh = jnp.asarray(0.2 * rng.randn(H, g * H).astype(np.float32))
        b = jnp.asarray(0.1 * rng.randn(1, g * H).astype(np.float32))
        cot = jnp.asarray(rng.randn(B, T, H).astype(np.float32))

        def grads(impl, x=x, wx=wx, wh=wh, b=b, cot=cot, fn=scan_fn):
            tx, twx, twh, tb = (Tensor(x, requires_grad=True),
                                Tensor(wx, requires_grad=True),
                                Tensor(wh, requires_grad=True),
                                Tensor(b, requires_grad=True))
            out = fn(tx, twx, twh, tb, impl=impl)
            out.backward(Tensor(cot))
            return out.data, tx.grad, twx.grad, twh.grad, tb.grad

        res_p = jax.jit(lambda: grads("pallas"))()
        res_x = jax.jit(lambda: grads("xla"))()
        # High-precision oracle: on TPU, BOTH the XLA scan and the Mosaic
        # kernel run f32 matmuls as one-pass-bf16 at DEFAULT precision
        # (measured 2026-08-18: the pallas FORWARD matches xla-default
        # bit-exactly, and both sit ~1.2e-2 from an xla-highest run over
        # this T=128 dependent chain; the pallas-vs-xla-default grad gap
        # of ~4e-3 is just different rounding association in the two
        # backward orderings). So the gate compares each against an
        # xla-HIGHEST oracle and requires pallas inside the same
        # precision envelope as xla-default — not the two noisy
        # default-precision paths against each other.
        with jax.default_matmul_precision("highest"):
            res_hi = jax.jit(lambda: grads("xla"))()

        def rel_errs(res, ref):
            return [float(jnp.max(jnp.abs(a - b_))) / max(
                        1.0, float(jnp.max(jnp.abs(b_))))
                    for a, b_ in zip(res, ref)]

        errs = rel_errs(res_p, res_hi)
        errs_x = rel_errs(res_x, res_hi)
        assert max(errs) <= max(2.0 * max(errs_x), 1e-4), (
            name, errs, errs_x)
        # secondary gate: pallas vs xla-default directly. Both run the
        # SAME one-pass-bf16 precision, so they must agree far more
        # tightly than either agrees with the highest oracle (GRU's
        # multiplicative gating amplifies default-precision rounding
        # ~0.46 rel vs highest over the T=128 chain — the envelope gate
        # alone would mask a real math bug of that size)
        errs_pd = rel_errs(res_p, res_x)
        assert max(errs_pd) < 5e-2, (name, errs_pd)

        # chained timing: one dispatch, many dependent fwd+bwd iterations
        def chain(impl, iters=200):
            def body(carry, _):
                xx = carry
                _, dx, _, _, _ = grads(impl, x=xx)
                return xx + 1e-6 * dx, ()

            def run(x0):
                out, _ = jax.lax.scan(body, x0, None, length=iters)
                return out

            r = jax.jit(run)
            float(r(x)[0, 0, 0])                    # compile + warm
            t0 = time.perf_counter()
            float(r(x)[0, 0, 0])                    # timed readback
            return (time.perf_counter() - t0) / iters * 1e6

        us_p = chain("pallas")
        us_x = chain("xla")
        results["recurrent_" + name] = {
            "max_rel_err_vs_xla_highest": round(max(errs), 8),
            "xla_default_rel_err_vs_xla_highest": round(max(errs_x), 8),
            "pallas_rel_err_vs_xla_default": round(max(errs_pd), 8),
            "pallas_us_per_step": round(us_p, 1),
            "xla_us_per_step": round(us_x, 1),
            "speedup": round(us_x / us_p, 2),
        }
        print("recurrent %s: parity %.2e, pallas %.1fus vs xla %.1fus "
              "(%.2fx)" % (name, max(errs), us_p, us_x, us_p and us_x / us_p))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--round", type=int, default=3)
    parser.add_argument("--out", default=None)
    parser.add_argument("--only", default=None,
                        help="comma-separated gate subset (dropout,"
                             "megakernel,flash,llama_window,remat_accum,"
                             "recurrent); merges into an existing --out")
    args = parser.parse_args()

    import jax

    out = args.out or "TPUCHECK_r%02d.json" % args.round
    gates = {
        "dropout": check_pltpu_dropout_stats,
        "megakernel": check_megakernel_dropout_e2e,
        "flash": check_flash_dropout_hw,
        "llama_window": check_llama_window_hw,
        "remat_accum": check_remat_accum_hw,
        "recurrent": check_recurrent_kernels_hw,
    }
    selected = (list(gates) if args.only is None
                else [s.strip() for s in args.only.split(",")])

    results = {}
    if args.only is not None and os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    results["backend"] = jax.default_backend()
    results["device"] = str(jax.devices()[0])
    for name in selected:
        gates[name](results)

    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
