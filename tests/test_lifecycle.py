"""Round-2 lifecycle behaviors: finetuning dropout, ANCE resume
(kill-and-restart with bit-identical optimizer state), group-nDCG protocol,
robust04 cleanup parity, episode-rewarmup schedule, mesh-sharded search
dispatch, and fresh per-batch encoder noise."""
import os
import re
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.data.records import RecordWriter, TokenCache
from cocodr_tpu.data.streams import TripletBatcher
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.utils.train_state import TrainState


def _tiny_model_state(lr=1e-3):
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    # constant LR: warmup schedules are 0 at step 0, which would zero the
    # first update and mask the dropout difference this file asserts on
    tx = lamb(lambda step: lr)
    return model, tx, TrainState.create(params, tx)


def _triplet_batch(B=4, S=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randint(5, 90, size=(B, S)), jnp.int32)
    ones = jnp.ones((B, S), jnp.int32)
    return {
        "q_ids": mk(), "q_mask": ones,
        "pos_ids": mk(), "pos_mask": ones,
        "neg_ids": mk(), "neg_mask": ones,
    }


@pytest.mark.slow
def test_dropout_stochastic_and_deterministic_paths():
    """Different dropout rngs -> different updates; no rng -> deterministic
    and unchanged across calls (the reference trains warmup/ANCE with
    dropout 0.1, ANCE/model/models.py:194-232 via HF defaults)."""
    model, tx, state = _tiny_model_state()
    step = build_train_step(model, tx, TrainStepConfig(loss_kind="nll"))
    batch = _triplet_batch()

    s_a, _ = step(state, batch, jax.random.PRNGKey(1))
    s_b, _ = step(state, batch, jax.random.PRNGKey(2))
    s_same, _ = step(state, batch, jax.random.PRNGKey(1))
    leaves_a = jax.tree_util.tree_leaves(s_a.params)
    leaves_b = jax.tree_util.tree_leaves(s_b.params)
    leaves_same = jax.tree_util.tree_leaves(s_same.params)
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves_a, leaves_b)
    ), "dropout rngs must change the update"
    for a, c in zip(leaves_a, leaves_same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    d1, m1 = step(state, batch)
    d2, m2 = step(state, batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(d1.params),
        jax.tree_util.tree_leaves(d2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # deterministic loss differs from a dropout loss with prob > 0
    assert float(m1["loss"]) == float(m2["loss"])


def _write_ann_round(work, n, n_queries=8, negs_per=2, seed=0):
    """Minimal miner output: ann_training_data_{n} + ann_ndcg_{n}."""
    import json

    rng = np.random.RandomState(seed + n)
    os.makedirs(work, exist_ok=True)
    with open(os.path.join(work, f"ann_training_data_{n}"), "w") as f:
        for q in range(n_queries):
            negs = ",".join(
                str(int(x)) for x in rng.choice(
                    np.arange(n_queries, 3 * n_queries), negs_per, replace=False
                )
            )
            f.write(f"{q}\t{q}\t{negs}\n")
    with open(os.path.join(work, f"ann_ndcg_{n}"), "w") as f:
        json.dump({"ndcg": 0.1 * (n + 1), "mrr": 0.2, "checkpoint": f"ck{n}"}, f)


@pytest.fixture()
def token_caches(tmp_path):
    qp, pp = str(tmp_path / "tq"), str(tmp_path / "tp")
    with RecordWriter(qp, 8) as w:
        for i in range(8):
            w.write([2, 10 + i, 3])
    with RecordWriter(pp, 8) as w:
        for i in range(24):
            w.write([2, 40 + i, 3])
    return TokenCache(qp), TokenCache(pp)


@pytest.mark.slow
def test_train_loop_kill_and_restart_resumes_identically(
    tmp_path, token_caches
):
    """Consume file 0, 'crash', restart from disk, consume file 1 — the
    final state must be bit-identical to the uninterrupted run (reference
    resume protocol, ANCE/drivers/run_ann.py:150-159,998-1002)."""
    from cocodr_tpu.pipelines.ance import train_loop

    qc, pc = token_caches
    batcher = TripletBatcher(qc, pc)
    work = str(tmp_path / "ann")
    ck_a = str(tmp_path / "ck_a")
    ck_b = str(tmp_path / "ck_b")

    model, tx, state0 = _tiny_model_state()
    step = build_train_step(model, tx, TrainStepConfig(loss_kind="nll"))

    # run A part 1: consume file 0
    _write_ann_round(work, 0)
    state_a = train_loop(
        state0, step, batcher, work, ck_a, batch_size=4,
        max_ann_files=1, steps_per_file=2, resume=False, poll_secs=0.01,
    )
    # snapshot the on-disk state for the restart run
    shutil.copytree(ck_a, ck_b)
    # run A part 2 (uninterrupted continuation): consume file 1 in memory
    _write_ann_round(work, 1)
    state_a2 = train_loop(
        state_a, step, batcher, work, ck_a, batch_size=4,
        max_ann_files=1, steps_per_file=2, resume=False, poll_secs=0.01,
    )
    # ...except the in-memory loop would re-see file 1 only; force seen via
    # resume=False and the fact that only file 1 is newer than its state.

    # run B: fresh process restarts purely from disk
    model_b, tx_b, template = _tiny_model_state()
    step_b = build_train_step(model_b, tx_b, TrainStepConfig(loss_kind="nll"))
    state_b2 = train_loop(
        template, step_b, batcher, work, ck_b, batch_size=4,
        max_ann_files=1, steps_per_file=2, resume=True, poll_secs=0.01,
    )

    assert int(state_a2.step) == int(state_b2.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a2.params),
        jax.tree_util.tree_leaves(state_b2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a2.opt_state),
        jax.tree_util.tree_leaves(state_b2.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_group_ndcg_writer_reader_roundtrip(tmp_path):
    from cocodr_tpu.pipelines.ance import write_group_ndcg
    from cocodr_tpu.utils.misc import read_group_results

    d = str(tmp_path / "results")
    write_group_ndcg(d, "scifact", 0, 0.70, checkpoint="ck0")
    write_group_ndcg(d, "scifact", 3, 0.72, checkpoint="ck3")
    write_group_ndcg(d, "fiqa", 1, 0.30, checkpoint="ck1")
    out = read_group_results(d)
    assert out["scifact"]["ndcg"] == pytest.approx(0.72)  # latest n wins
    assert out["scifact"]["checkpoint"] == "ck3"
    assert out["fiqa"]["ndcg"] == pytest.approx(0.30)
    assert "arguana" not in out


def test_robust04_clean_parity():
    """Char cleanup matches the reference regexes
    (evaluate/data/beir_data.py:282-284 docs, :322-324 queries)."""
    from cocodr_tpu.data.preprocess import (
        _ROBUST04_DOC_KEEP,
        _ROBUST04_QUERY_KEEP,
        _beir_doc_text,
        _robust04_clean,
    )

    raw = "U.S.  Gov't =report (2024)! <b>HTML</b> & x=y?"
    # reference doc path: re.sub(r"[^A-Za-z0-9=(),!?\'\`]"," ") + split/join
    ref_doc = " ".join(re.sub(r"[^A-Za-z0-9=(),!?'`]", " ", raw).split())
    assert _robust04_clean(raw, _ROBUST04_DOC_KEEP) == ref_doc
    assert "=" in _robust04_clean(raw, _ROBUST04_DOC_KEEP)
    # query variant drops '='
    ref_q = " ".join(re.sub(r"[^A-Za-z0-9(),!?'`]", " ", raw).split())
    assert _robust04_clean(raw, _ROBUST04_QUERY_KEEP) == ref_q
    assert "=" not in _robust04_clean(raw, _ROBUST04_QUERY_KEEP)

    # titled docs are never cleaned (beir_data.py:279)
    doc = {"title": "T!tle", "text": "Body <x>"}
    assert _beir_doc_text(doc, clean=True) == "t!tle body <x>"
    # titleless docs are cleaned pre-lowercase
    doc2 = {"title": "", "text": "A<B>=C"}
    assert _beir_doc_text(doc2, clean=True) == "a b =c"


def test_episode_rewarmup_schedule_config():
    from cocodr_tpu.core.configs import OptimizerConfig
    from cocodr_tpu.optim.schedules import episode_rewarmup

    cfg = OptimizerConfig(
        lr=1e-4, warmup_steps=10, total_steps=100,
        schedule="episode-rewarmup", episode_steps=50,
    )
    tx = cfg.build()  # must not raise
    fn = episode_rewarmup(1e-4, 10, 50, 100, floor=0.2)
    # fresh warmup at each episode start
    assert float(fn(0)) == 0.0
    assert float(fn(50)) == 0.0
    # mid-episode: fully warmed, decayed by overall progress
    assert float(fn(30)) == pytest.approx(1e-4 * (1 - 30 / 100))
    # floor holds near the end
    assert float(fn(95)) >= 0.2 * 1e-4 * 0.9  # warmed portion of episode 1


def test_search_topk_sharded_matches_numpy():
    """Mesh-sharded exact search == numpy brute force, including a corpus
    size not divisible by the mesh (padding rows must never surface)."""
    from cocodr_tpu.core.mesh import MeshConfig, create_mesh
    from cocodr_tpu.parallel.topk import search_topk

    mesh = create_mesh(MeshConfig(data=8, model=1))
    rng = np.random.RandomState(0)
    N, D, Q, K = 51, 16, 7, 5  # 51 % 8 != 0 -> exercises the pad mask
    corpus = rng.randn(N, D).astype(np.float32)
    queries = rng.randn(Q, D).astype(np.float32)
    vals, ids = search_topk(
        queries, corpus, K, mesh=mesh, q_chunk=4, tile=8, exact_fp32=True
    )
    scores = queries @ corpus.T
    ref_ids = np.argsort(-scores, axis=1)[:, :K]
    ref_vals = np.take_along_axis(scores, ref_ids, axis=1)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ids, ref_ids)
    assert ids.max() < N


def test_encoder_fresh_noise_per_batch():
    """noise_level > 0 must draw new noise each call (reference samples per
    forward, evaluate/model/models.py:81-89); noise_level=0 is deterministic."""
    from cocodr_tpu.pipelines.encode import Encoder

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask)["params"]

    enc = Encoder(model, params, is_query=True, noise_level=0.5)
    a = np.asarray(enc(ids, mask))
    b = np.asarray(enc(ids, mask))
    assert not np.allclose(a, b), "noise must be fresh per batch"

    enc0 = Encoder(model, params, is_query=True, noise_level=0.0)
    c = np.asarray(enc0(ids, mask))
    d = np.asarray(enc0(ids, mask))
    np.testing.assert_array_equal(c, d)


def test_episode_decay_schedule_config():
    """'episode-decay' = one warmup then max(floor, 1-step/total) — the
    reference's per-episode LR decay without re-warmup (run_ann.py:120-125)."""
    import numpy as np

    from cocodr_tpu.core.configs import OptimizerConfig
    from cocodr_tpu.optim.schedules import episode_decay

    fn = episode_decay(1.0, warmup_steps=10, total_steps=100, floor=0.2)
    assert float(fn(0)) == 0.0
    assert float(fn(10)) == np.float32(0.9)  # warm done, decay 1-10/100
    assert float(fn(50)) == np.float32(0.5)
    assert float(fn(99)) == np.float32(0.2)  # floored

    tx = OptimizerConfig(
        name="adamw", lr=1e-4, warmup_steps=1, total_steps=10,
        schedule="episode-decay",
    ).build()
    assert tx is not None


@pytest.mark.slow
def test_towers_draw_independent_dropout_masks():
    """pos and neg towers on IDENTICAL inputs must differ under dropout —
    the reference's three torch forwards draw independent masks."""
    from cocodr_tpu.pipelines.train_step import _embed_triplet

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 90, (4, 8)),
                      jnp.int32)
    ones = jnp.ones((4, 8), jnp.int32)
    batch = {"q_ids": ids, "q_mask": ones, "pos_ids": ids, "pos_mask": ones,
             "neg_ids": ids, "neg_mask": ones}
    params = model.init(jax.random.PRNGKey(0), ids, ones)["params"]
    q, a, b = _embed_triplet(model, params, batch, jax.random.PRNGKey(5))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # deterministic path: identical inputs -> identical embeddings
    _, a0, b0 = _embed_triplet(model, params, batch, None)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))


def test_sharded_search_pad_duplicates_cannot_evict_hits():
    """Replicate-padding duplicates of the last corpus row (added to
    equalize shard sizes) must not displace real candidates from the final
    shard's local top-k (the local search widens to k + pad)."""
    from cocodr_tpu.core.mesh import MeshConfig, create_mesh
    from cocodr_tpu.parallel.topk import search_topk

    mesh = create_mesh(MeshConfig(data=8, model=1))
    rng = np.random.RandomState(0)
    N, D, K = 51, 16, 3  # pad = 5 duplicate rows in the final shard
    corpus = rng.randn(N, D).astype(np.float32)
    queries = rng.randn(4, D).astype(np.float32)
    corpus[N - 1] = queries[0] * 10  # the duplicated row IS q0's best doc
    vals, ids = search_topk(queries, corpus, K, mesh=mesh, q_chunk=4,
                            tile=8, exact_fp32=True)
    assert (N - 1) in set(ids[0].tolist())
    # and against plain numpy for the whole batch
    ref_ids = np.argsort(-(queries @ corpus.T), axis=1)[:, :K]
    for qi in range(4):
        ref_vals = np.sort((queries @ corpus.T)[qi])[::-1][:K]
        np.testing.assert_allclose(np.sort(vals[qi])[::-1], ref_vals,
                                   rtol=1e-5)
