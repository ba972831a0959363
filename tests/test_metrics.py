"""Metric correctness on hand-computed cases (trec_eval semantics)."""
import math

import numpy as np
import pytest

from cocodr_tpu.evals.metrics import (
    evaluate_run,
    hole_rate_at_k,
    map_at_k,
    ndcg_at_k,
    recall_at_k,
    recip_rank,
    run_from_topk,
)
from cocodr_tpu.evals.msmarco import compute_mrr, quality_checks


def test_ndcg_hand_case():
    # graded qrels: d1=3, d2=1, d5=2 ; ranking: d2, d9, d1
    qrel = {"d1": 3, "d2": 1, "d5": 2}
    ranked = ["d2", "d9", "d1"]
    dcg = 1 / math.log2(2) + 0 + 3 / math.log2(4)
    idcg = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
    assert ndcg_at_k(ranked, qrel, 10) == pytest.approx(dcg / idcg)
    # perfect ranking -> 1
    assert ndcg_at_k(["d1", "d5", "d2"], qrel, 10) == pytest.approx(1.0)


def test_map_recall_rr():
    qrel = {"a": 1, "b": 1, "c": 1}  # 3 relevant
    ranked = ["x", "a", "y", "b"]
    # AP@10 = (1/2 + 2/4) / 3
    assert map_at_k(ranked, qrel, 10) == pytest.approx((0.5 + 0.5) / 3)
    assert recall_at_k(ranked, qrel, 2) == pytest.approx(1 / 3)
    assert recall_at_k(ranked, qrel, 4) == pytest.approx(2 / 3)
    assert recip_rank(ranked, qrel) == pytest.approx(0.5)
    assert recip_rank(["z", "w"], qrel) == 0.0


def test_hole_rate():
    qrel = {"a": 1, "b": 0}  # b judged non-relevant still counts as judged
    assert hole_rate_at_k(["a", "b", "x", "y"], qrel, 4) == pytest.approx(0.5)


def test_evaluate_run_macro_average():
    qrels = {1: {"a": 1}, 2: {"b": 2}}
    run = {1: ["a", "x"], 2: ["x", "b"], 3: ["zzz"]}  # q3 unjudged: ignored
    m = evaluate_run(run, qrels, recall_ks=(1, 2))
    assert m["num_queries"] == 2
    assert m["recip_rank"] == pytest.approx((1.0 + 0.5) / 2)
    assert m["recall_1"] == pytest.approx(0.5)
    assert m["recall_2"] == pytest.approx(1.0)
    ndcg_q2 = (2 / math.log2(3)) / (2 / math.log2(2))
    assert m["ndcg_cut_10"] == pytest.approx((1.0 + ndcg_q2) / 2)


def test_run_from_topk_self_skip():
    ids = np.array([[0, 1, -1], [2, 0, 1]])
    id_map = {0: "q1", 1: "d1", 2: "d2"}
    run = run_from_topk(["q1", "q2"], ids, id_map=id_map, skip_self=True)
    assert run["q1"] == ["d1"]  # self-match and -1 padding dropped
    assert run["q2"] == ["d2", "q1", "d1"]


def test_msmarco_mrr():
    qrels = {1: [7], 2: [9], 3: [5]}
    run = {1: [7, 8], 2: [1, 2, 9], 3: [4] * 10}
    ok, _ = quality_checks({1: [7, 8]})
    assert ok
    ok, msg = quality_checks({1: [7, 7]})
    assert not ok and "multiple times" in msg
    m = compute_mrr(qrels, run)
    assert m["MRR @10"] == pytest.approx((1.0 + 1 / 3 + 0.0) / 3)
    assert m["QueriesRanked"] == 3


def test_msmarco_mrr_partial_run():
    """Official semantics on a PARTIAL run (msmarco_eval.py:109-139):
    the mean is over ALL qrel queries — queries missing from the run
    contribute 0 to the numerator but stay in the denominator — and
    QueriesRanked counts run queries (including unjudged extras)."""
    qrels = {1: [7], 2: [9], 3: [5], 4: [2]}
    run = {1: [7], 3: [8, 5], 99: [1]}  # qids 2,4 unranked; 99 unjudged
    m = compute_mrr(qrels, run)
    assert m["MRR @10"] == pytest.approx((1.0 + 0.5) / 4)
    assert m["QueriesRanked"] == 3  # len(run), reference :138


def test_msmarco_quality_checks_pad_pid():
    """Pid 0 is the official script's pad value and is exempt from the
    duplicate check (`duplicate_pids - set([0])`, msmarco_eval.py:100-102)."""
    ok, _ = quality_checks({1: [7, 0, 0, 0]})
    assert ok
    ok, _ = quality_checks({1: [7, 7, 0, 0]})
    assert not ok


# ---------------------------------------------------------------------------
# Randomized cross-validation (pytrec_eval is not installable in this image,
# so the next-best check is a second, independently-written implementation:
# array-based, computed from the trec_eval definitions with none of the
# library's code structure). 200 random graded cases per metric.
# ---------------------------------------------------------------------------


def _np_metrics(ranked, qrel, k):
    """Independent array-style scorer: gains vector + cumulative ops."""
    g = np.array([float(qrel.get(d, 0.0)) for d in ranked[:k]])
    discounts = 1.0 / np.log2(np.arange(len(g)) + 2.0)
    ideal = np.sort([v for v in qrel.values() if v > 0])[::-1][:k]
    idcg = float((ideal / np.log2(np.arange(len(ideal)) + 2.0)).sum())
    ndcg = float((g * discounts).sum() / idcg) if idcg > 0 else 0.0

    rel_mask = g > 0
    n_rel = sum(1 for v in qrel.values() if v > 0)
    precs = np.cumsum(rel_mask) / (np.arange(len(g)) + 1.0)
    ap = float(precs[rel_mask].sum() / n_rel) if n_rel else 0.0

    rel_ids = {d for d, v in qrel.items() if v > 0}
    rec = (len(rel_ids & set(ranked[:k])) / len(rel_ids)) if rel_ids else 0.0

    rr = 0.0
    full_mask = np.array([qrel.get(d, 0.0) > 0 for d in ranked])
    if full_mask.any():
        rr = 1.0 / (int(np.argmax(full_mask)) + 1)

    judged = np.array([d in qrel for d in ranked[:k]])
    hole = float((~judged).mean()) if len(judged) else 0.0
    return ndcg, ap, rec, rr, hole


def test_metrics_randomized_cross_validation():
    rng = np.random.RandomState(7)
    for case in range(200):
        n_docs = rng.randint(1, 40)
        docs = [f"d{i}" for i in range(n_docs)]
        # graded judgments over a random subset; sometimes all-zero grades
        judged = rng.choice(docs, size=rng.randint(0, n_docs + 1),
                            replace=False)
        qrel = {d: int(rng.randint(0, 4)) for d in judged}
        ranked = list(rng.permutation(docs)[: rng.randint(1, n_docs + 1)])
        k = int(rng.randint(1, 15))
        ndcg, ap, rec, rr, hole = _np_metrics(ranked, qrel, k)
        assert ndcg_at_k(ranked, qrel, k) == pytest.approx(ndcg, abs=1e-12)
        assert map_at_k(ranked, qrel, k) == pytest.approx(ap, abs=1e-12)
        assert recall_at_k(ranked, qrel, k) == pytest.approx(rec, abs=1e-12)
        assert recip_rank(ranked, qrel) == pytest.approx(rr, abs=1e-12)
        assert hole_rate_at_k(ranked, qrel, k) == pytest.approx(
            hole, abs=1e-12
        )
