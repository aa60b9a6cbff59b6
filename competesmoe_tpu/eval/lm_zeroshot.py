"""Zero-shot LM downstream evaluation: probability-compare over choices.

Re-design of `moe_pretrain_model/tasks/lm_eval_mixin.py:40-174` and the
`framework/dataset` downstream QA sets: each doc provides a prefix and
candidate continuations; the model scores each (prefix + choice) and the
argmax (optionally length-normalized) is the prediction. Sequence lengths
are rounded up to `pad_quantum` so XLA compiles a handful of shapes
instead of one per example (lm_eval_mixin.py:82-95).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ChoiceDoc:
    prefix_ids: List[int]
    choices_ids: List[List[int]]
    answer: int
    normalize_by_length: bool = False
    # optional group label (e.g. the BLiMP phenomenon); the evaluator
    # reports accuracy/{group} and accuracy/group_average like the
    # reference's ProbabilityCompareTest.plot
    group: Optional[str] = None


class LMZeroShotEvaluator:
    """Scores choice docs with a jitted length-bucketed loglikelihood fn."""

    def __init__(self, model, params, pad_quantum: int = 64,
                 max_len: int = 1024):
        self.model = model
        self.params = params if "params" in params else {"params": params}
        self.pad_quantum = pad_quantum
        self.max_len = max_len
        self._fns: Dict[int, Callable] = {}

    def _fn_for(self, L: int) -> Callable:
        if L not in self._fns:
            @jax.jit
            def score(params, tokens, choice_mask):
                # tokens [B, L]; mask True where the CHOICE tokens sit
                logits, _ = self.model.apply(params, tokens[:, :-1],
                                             train=False)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                tgt = tokens[:, 1:]
                tok_lp = jnp.take_along_axis(lp, tgt[..., None],
                                             axis=-1)[..., 0]
                m = choice_mask[:, 1:]
                total = jnp.sum(tok_lp * m, axis=-1)
                n = jnp.maximum(jnp.sum(m, axis=-1), 1)
                greedy = jnp.all(
                    jnp.where(m > 0, jnp.argmax(lp, -1) == tgt, True),
                    axis=-1)
                return total, total / n, greedy
            self._fns[L] = score
        return self._fns[L]

    def _quantize(self, n: int) -> int:
        q = self.pad_quantum
        return min(max(q, ((n + q - 1) // q) * q), self.max_len)

    def score_sequences(self, seqs: List[Tuple[List[int], List[int]]]
                        ) -> List[Tuple[float, float, bool]]:
        """seqs: list of (prefix_ids, choice_ids). Returns per-sequence
        (total_lp, mean_lp, is_greedy), batched per quantized length."""
        results: List = [None] * len(seqs)
        buckets: Dict[int, List[int]] = {}
        for i, (p, c) in enumerate(seqs):
            L = self._quantize(len(p) + len(c))
            buckets.setdefault(L, []).append(i)
        for L, idxs in buckets.items():
            toks = np.zeros((len(idxs), L), np.int32)
            mask = np.zeros((len(idxs), L), np.float32)
            for row, i in enumerate(idxs):
                p, c = seqs[i]
                full = (p + c)[:L]
                toks[row, :len(full)] = full
                start = min(len(p), L)
                mask[row, start:len(full)] = 1.0
            total, mean, greedy = self._fn_for(L)(
                self.params, jnp.asarray(toks), jnp.asarray(mask))
            for row, i in enumerate(idxs):
                results[i] = (float(total[row]), float(mean[row]),
                              bool(greedy[row]))
        return results

    def evaluate(self, docs: Iterable[ChoiceDoc]) -> Dict[str, float]:
        """Probability-compare accuracy. A doc counts as correct only if
        the gold option's (length-normalized) logprob is STRICTLY greater
        than every other option's — ties lose, exactly like the
        reference's `ok &= good_lprob > bad_lprob`
        (probability_compare_dataset.py:49-54). With `group` labels set,
        per-group accuracies plus the reference's `group_average` /
        `seq_average` channels are reported."""
        docs = list(docs)
        flat: List[Tuple[List[int], List[int]]] = []
        spans = []
        for d in docs:
            spans.append((len(flat), len(d.choices_ids)))
            for c in d.choices_ids:
                flat.append((d.prefix_ids, c))
        scores = self.score_sequences(flat)
        correct = 0
        groups: Dict[str, List[int]] = {}
        for d, (start, n) in zip(docs, spans):
            vals = [scores[start + j][1 if d.normalize_by_length else 0]
                    for j in range(n)]
            good = vals[d.answer]
            ok = all(good > v for j, v in enumerate(vals) if j != d.answer)
            correct += int(ok)
            if d.group is not None:
                groups.setdefault(d.group, []).append(int(ok))
        res = {"accuracy": correct / max(len(docs), 1),
               "n_docs": len(docs)}
        if groups:
            per_group = {g: sum(v) / len(v) for g, v in groups.items()}
            for g, acc in per_group.items():
                res[f"accuracy/{g}"] = acc
            res["accuracy/group_average"] = (
                sum(per_group.values()) / len(per_group))
            res["accuracy/seq_average"] = res["accuracy"]
        return res


# --- downstream task adapters (dataset -> ChoiceDoc stream) -------------

def binary_sentence_docs(pairs: Sequence[Tuple[List[int], List[int]]]
                         ) -> List[ChoiceDoc]:
    """BLiMP-style: (good_ids, bad_ids) pairs; empty prefix; answer=0."""
    return [ChoiceDoc(prefix_ids=[], choices_ids=[g, b], answer=0)
            for g, b in pairs]


def completion_docs(items: Sequence[Tuple[List[int], List[List[int]], int]],
                    normalize: bool = True) -> List[ChoiceDoc]:
    """HellaSwag/PIQA/ARC-style: (context, endings, answer)."""
    return [ChoiceDoc(prefix_ids=p, choices_ids=cs, answer=a,
                      normalize_by_length=normalize)
            for p, cs, a in items]


def lambada_docs(items: Sequence[Tuple[List[int], List[int]]]
                 ) -> List[ChoiceDoc]:
    """Lambada: the model must put the true last word first among
    {true word} — scored as greedy-match accuracy via single choice."""
    return [ChoiceDoc(prefix_ids=p, choices_ids=[w], answer=0)
            for p, w in items]


def lambada_accuracy(ev: LMZeroShotEvaluator,
                     items: Sequence[Tuple[List[int], List[int]]]
                     ) -> Dict[str, float]:
    """Exact last-word prediction accuracy (greedy match over the target
    tokens), the lm_eval_mixin lambada metric."""
    seqs = [(p, w) for p, w in items]
    scores = ev.score_sequences(seqs)
    acc = sum(1 for (_, _, g) in scores if g) / max(len(scores), 1)
    return {"accuracy": acc, "n_docs": len(scores)}
