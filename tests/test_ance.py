"""ANCE loop integration on a synthetic planted-relevance corpus:
mining finds negatives, training consumes them, dev nDCG improves over
rounds (the full time-multiplexed loop on CPU with a tiny model)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.data.records import RecordWriter, TokenCache
from cocodr_tpu.data.streams import TripletBatcher
from cocodr_tpu.losses import DroConfig, dro_greedy_init
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.ance import (
    MineConfig,
    ance_round,
    generate_negatives,
    get_latest_ann_data,
    mine,
)
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.utils.train_state import TrainState


def _make_dataset(tmp_path, n_queries=16, vocab=120):
    """query i = tokens [i*3.. i*3+2]; its positive doc = same tokens;
    other docs are unrelated token blocks."""
    rng = np.random.RandomState(0)
    qp = str(tmp_path / "train-query")
    pp = str(tmp_path / "passages")
    with RecordWriter(qp, 8) as w:
        for i in range(n_queries):
            w.write([2, 10 + i, 40 + i, 3])
    with RecordWriter(pp, 8) as w:
        for i in range(n_queries):  # positives share one token with the query
            w.write([2, 10 + i, 65, 3])
        for i in range(n_queries * 2):  # distractors
            w.write([2, int(rng.randint(70, vocab)), int(rng.randint(70, vocab)), 3])
    positives = {i: i for i in range(n_queries)}
    dev_qrels = {i: {i: 1} for i in range(n_queries)}
    return qp, pp, positives, dev_qrels


def test_generate_negatives_filters_positive():
    cfg = MineConfig(negative_sample=3, select_topk=True)
    top = np.array([[5, 0, 7, 9, 11], [1, 2, 3, 4, 5]])
    positives = {0: 5, 1: 3}
    negs, mrr = generate_negatives(
        top, np.array([0, 1]), positives, cfg, np.random.RandomState(0)
    )
    assert 5 not in negs[0] and len(negs[0]) == 3
    assert mrr[0] == 1.0  # positive at rank 1
    assert 3 not in negs[1]
    assert mrr[1] == pytest.approx(1 / 3)


@pytest.mark.slow
def test_ance_loop_improves(tmp_path):
    qp, pp, positives, dev_qrels = _make_dataset(tmp_path)
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]

    dcfg = DroConfig(n_groups=4, eps=0.01)
    tx = lamb(warmup_linear(3e-4, 5, 400))
    state = TrainState.create(params, tx, extra=dro_greedy_init(dcfg))
    step = build_train_step(
        model, tx, TrainStepConfig(loss_kind="dro-greedy", dro=dcfg)
    )

    q_cache, p_cache = TokenCache(qp), TokenCache(pp)
    batcher = TripletBatcher(q_cache, p_cache)
    mine_cfg = MineConfig(
        topk_training=10,
        negative_sample=5,
        n_splits=1,
        cluster_query=True,
        cluster_centroids=4,
        kmeans_iters=10,
        kmeans_redo=1,
        dev_topk=10,
        batch_size=16,
        q_chunk=16,
        mips_tile=16,
        exact_fp32=True,
    )
    work = str(tmp_path / "ann")
    ndcgs = []
    for rnd in range(3):
        state, dev_metrics, steps = ance_round(
            state,
            step,
            model,
            batcher,
            p_cache,
            q_cache,
            positives,
            q_cache,
            dev_qrels,
            work,
            rnd,
            mine_cfg,
            batch_size=16,
            steps_per_round=12,
        )
        ndcgs.append(dev_metrics["ndcg_cut_10"])
        assert steps > 0
    # ann files + ndcg protocol on disk
    n, data_path, meta = get_latest_ann_data(work)
    assert n == 2 and os.path.exists(data_path)
    assert "ndcg" in meta and "checkpoint" in meta
    # 5-column format parses (cluster_query=True)
    from cocodr_tpu.data.streams import parse_ann_line

    with open(data_path) as f:
        line = f.readline()
    qid, pos, negs, w, g = parse_ann_line(line)
    assert 0 <= g < 4 and len(negs) >= 1
    # learning signal: some mined round beats the untrained round 0, and
    # quality never collapses (toy task over-trains quickly at this LR, so
    # monotonicity is not expected — matching real ANCE dynamics)
    assert max(ndcgs[1:]) > ndcgs[0], ndcgs
    assert min(ndcgs) >= 0.5, ndcgs
