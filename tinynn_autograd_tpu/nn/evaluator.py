"""Offline metric evaluators (reference surface: core/evaluator.py).

Same classmethod ``evaluate(predictions, targets) -> dict`` contract
(reference: core/evaluator.py:6-10). The reference implements accuracy /
explained-variance / MSE / MAE and leaves Precision, Recall, F1, ROC and R2
as ``pass`` stubs (reference: core/evaluator.py:26-50, 110-114) — all are
fully implemented here (macro-averaged for multiclass; ROC-AUC via the
rank-statistic formulation for binary scores).

Divergence: MAEEvaluator returns its value under "mae" (the reference
mislabels it "mse", reference: core/evaluator.py:107); an "mse"-keyed alias
is kept for drop-in compatibility.
"""

import numpy as np


def _to_np(x):
    from tinynn_autograd_tpu.core.tensor import Tensor

    if isinstance(x, Tensor):
        return x.numpy()
    return np.asarray(x)


class BaseEvaluator:

    @classmethod
    def evaluate(cls, predictions, targets):
        raise NotImplementedError("Must specify evaluator.")


class AccEvaluator(BaseEvaluator):

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        total_num = len(predictions)
        hit_num = int(np.sum(predictions == targets))
        return {
            "total_num": total_num,
            "hit_num": hit_num,
            "accuracy": 1.0 * hit_num / total_num,
        }


def _per_class_counts(predictions, targets):
    classes = np.unique(np.concatenate([predictions, targets]))
    tp, fp, fn = {}, {}, {}
    for c in classes:
        tp[c] = int(np.sum((predictions == c) & (targets == c)))
        fp[c] = int(np.sum((predictions == c) & (targets != c)))
        fn[c] = int(np.sum((predictions != c) & (targets == c)))
    return classes, tp, fp, fn


class PrecisionEvaluator(BaseEvaluator):
    """Macro-averaged precision (stubbed ``pass`` in the reference,
    core/evaluator.py:26-30)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        classes, tp, fp, _fn = _per_class_counts(predictions, targets)
        per = {
            int(c): tp[c] / (tp[c] + fp[c]) if (tp[c] + fp[c]) else 0.0
            for c in classes
        }
        return {"precision": float(np.mean(list(per.values()))),
                "per_class": per}


class RecallEvaluator(BaseEvaluator):
    """Macro-averaged recall (stub in reference, core/evaluator.py:33-36)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        classes, tp, _fp, fn = _per_class_counts(predictions, targets)
        per = {
            int(c): tp[c] / (tp[c] + fn[c]) if (tp[c] + fn[c]) else 0.0
            for c in classes
        }
        return {"recall": float(np.mean(list(per.values()))),
                "per_class": per}


class F1Evaluator(BaseEvaluator):
    """Macro F1 (stub in reference, core/evaluator.py:39-43)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        p = PrecisionEvaluator.evaluate(predictions, targets)["per_class"]
        r = RecallEvaluator.evaluate(predictions, targets)["per_class"]
        f1 = {
            c: (2 * p[c] * r[c] / (p[c] + r[c]) if (p[c] + r[c]) else 0.0)
            for c in p
        }
        return {"f1": float(np.mean(list(f1.values()))), "per_class": f1}


class ROCEvaluator(BaseEvaluator):
    """Binary ROC-AUC from scores via the Mann-Whitney rank statistic
    (stub in reference, core/evaluator.py:46-50). ``predictions`` are
    real-valued scores for the positive class; ``targets`` are {0, 1}."""

    @classmethod
    def evaluate(cls, predictions, targets):
        scores, targets = _to_np(predictions).ravel(), _to_np(targets).ravel()
        pos = scores[targets == 1]
        neg = scores[targets == 0]
        if len(pos) == 0 or len(neg) == 0:
            return {"auc": float("nan")}
        order = np.argsort(scores, kind="mergesort")
        ranks = np.empty(len(scores), dtype=np.float64)
        # average ranks for ties
        sorted_scores = scores[order]
        i = 0
        rank_vals = np.arange(1, len(scores) + 1, dtype=np.float64)
        while i < len(scores):
            j = i
            while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
                j += 1
            ranks[order[i:j + 1]] = rank_vals[i:j + 1].mean()
            i = j + 1
        auc = (ranks[targets == 1].sum() - len(pos) * (len(pos) + 1) / 2.0) / (
            len(pos) * len(neg))
        return {"auc": float(auc)}


class EVEvaluator(BaseEvaluator):
    """Explained variance 1 - Var[y - pred] / Var[y], averaged over columns
    with nonzero target variance (reference: core/evaluator.py:53-77)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        assert predictions.shape == targets.shape
        if predictions.ndim == 1:
            predictions = predictions[:, None]
            targets = targets[:, None]
        diff_var = np.var(targets - predictions, axis=0)
        target_var = np.var(targets, axis=0)
        nz = target_var != 0
        ev = float(np.mean(1.0 - diff_var[nz] / target_var[nz]))
        return {"mean_ev": ev}


class MSEEvaluator(BaseEvaluator):
    """1-D: mean squared error; 2-D: mean over rows of per-row SSE
    (reference: core/evaluator.py:80-92)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        assert predictions.shape == targets.shape
        sq = np.square(predictions - targets)
        if predictions.ndim == 1:
            mse = float(np.mean(sq))
        elif predictions.ndim == 2:
            mse = float(np.mean(np.sum(sq, axis=1)))
        else:
            raise ValueError("predictions must have 1 or 2 dims.")
        return {"mse": mse}


class MAEEvaluator(BaseEvaluator):
    """Mean absolute error (reference: core/evaluator.py:95-107; result key
    fixed to "mae", "mse" alias retained)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        assert predictions.shape == targets.shape
        ab = np.abs(predictions - targets)
        if predictions.ndim == 1:
            mae = float(np.mean(ab))
        elif predictions.ndim == 2:
            mae = float(np.mean(np.sum(ab, axis=1)))
        else:
            raise ValueError("predictions must have 1 or 2 dims.")
        return {"mae": mae, "mse": mae}


class R2Evaluator(BaseEvaluator):
    """Coefficient of determination (stub in reference,
    core/evaluator.py:110-114)."""

    @classmethod
    def evaluate(cls, predictions, targets):
        predictions, targets = _to_np(predictions), _to_np(targets)
        assert predictions.shape == targets.shape
        ss_res = float(np.sum(np.square(targets - predictions)))
        ss_tot = float(np.sum(np.square(targets - targets.mean(axis=0))))
        r2 = 1.0 - ss_res / ss_tot if ss_tot else float("nan")
        return {"r2": r2}
