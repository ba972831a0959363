"""Async ANCE loops (producer/consumer over the file protocol), miner
embedding cache + chunk rotation, multi-vector encode, warmup resume."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.data.records import RecordWriter, TokenCache
from cocodr_tpu.data.streams import TripletBatcher
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.ance import (
    MineConfig,
    checkpoint_params_loader,
    get_latest_ann_data,
    mine,
    mine_loop,
    train_loop,
)
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.utils.train_state import TrainState, save_checkpoint


def _dataset(tmp_path, nq=8):
    qp, pp = str(tmp_path / "q"), str(tmp_path / "p")
    with RecordWriter(qp, 8) as w:
        for i in range(nq):
            w.write([2, 10 + i, 30 + i, 3])
    with RecordWriter(pp, 8) as w:
        for i in range(nq):
            w.write([2, 10 + i, 99, 3])
        for i in range(nq):
            w.write([2, 100 + i, 101, 3])
    return qp, pp, {i: i for i in range(nq)}, {i: {i: 1} for i in range(nq)}


def _model_state(dro=False):
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    tx = lamb(warmup_linear(1e-4, 2, 100))
    state = TrainState.create(params, tx)
    step = build_train_step(model, tx, TrainStepConfig(loss_kind="nll"))
    return model, state, step, tx


@pytest.mark.slow
def test_async_producer_consumer(tmp_path):
    """mine_loop + train_loop coupled only through the filesystem."""
    qp, pp, positives, dev_qrels = _dataset(tmp_path)
    model, state, step, tx = _model_state()
    qc, pc = TokenCache(qp), TokenCache(pp)
    mine_cfg = dict(
        passage_cache=pc,
        train_query_cache=qc,
        train_positives=positives,
        dev_query_cache=qc,
        dev_qrels=dev_qrels,
        cfg=MineConfig(
            topk_training=6, negative_sample=3, n_splits=1, dev_topk=5,
            batch_size=8, q_chunk=8, mips_tile=8, exact_fp32=True,
        ),
    )
    ckpt_dir = str(tmp_path / "ckpts")
    ann_dir = str(tmp_path / "ann")
    save_checkpoint(ckpt_dir, state)  # initial checkpoint for the miner

    # producer: one mining round from the latest checkpoint
    loader = checkpoint_params_loader(ckpt_dir, state)
    mine_loop(
        model, loader, ann_dir, poll_secs=0.01, max_rounds=1, **mine_cfg
    )
    n, data_path, meta = get_latest_ann_data(ann_dir)
    assert n == 0 and meta["checkpoint"].startswith("checkpoint-")

    # consumer: trains on it and writes a new checkpoint
    batcher = TripletBatcher(qc, pc)
    state2 = train_loop(
        state, step, batcher, ann_dir, ckpt_dir, batch_size=8,
        poll_secs=0.01, max_ann_files=1, steps_per_file=3,
    )
    assert int(state2.step) == 3
    # new checkpoint visible to the producer
    name, params = loader()
    assert name == f"checkpoint-{int(state2.step)}"

    # producer mines again from the NEW checkpoint
    mine_loop(model, loader, ann_dir, poll_secs=0.01, max_rounds=1, **mine_cfg)
    n, _, meta = get_latest_ann_data(ann_dir)
    assert n == 1 and meta["checkpoint"] == name


def test_miner_embedding_cache_and_chunking(tmp_path):
    qp, pp, positives, dev_qrels = _dataset(tmp_path)
    model, state, step, tx = _model_state()
    qc, pc = TokenCache(qp), TokenCache(pp)
    emb_dir = str(tmp_path / "embs")
    cfg = MineConfig(
        topk_training=6, negative_sample=3, n_splits=1, dev_topk=5,
        batch_size=8, q_chunk=8, mips_tile=8, exact_fp32=True,
        emb_cache_dir=emb_dir, ann_chunk_factor=2,
    )
    out = str(tmp_path / "ann")
    mine(model, state.params, pc, qc, positives, qc, dev_qrels, out, 0, cfg,
         checkpoint_name="ck-1")
    assert os.path.exists(os.path.join(emb_dir, "corpus_ck-1.npy"))
    # round 0 mines the first half of queries, round 1 the second half
    lines0 = open(os.path.join(out, "ann_training_data_0")).readlines()
    qids0 = {int(l.split("\t")[0]) for l in lines0}
    assert qids0 == {0, 1, 2, 3}
    mine(model, state.params, pc, qc, positives, qc, dev_qrels, out, 1, cfg,
         checkpoint_name="ck-1")
    lines1 = open(os.path.join(out, "ann_training_data_1")).readlines()
    qids1 = {int(l.split("\t")[0]) for l in lines1}
    assert qids1 == {4, 5, 6, 7}


def test_multivector_encode(tmp_path):
    from cocodr_tpu.pipelines.encode import (
        EncodeConfig,
        Encoder,
        encode_cache_multivector,
    )

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_multi_chunk", bert, base_len=8)
    pp = str(tmp_path / "docs")
    with RecordWriter(pp, 16) as w:  # 2 chunks of 8
        w.write([2, 5, 6, 3, 2, 7, 8, 3, 2, 5, 7, 3])  # 12 tokens: both chunks real
        w.write([2, 5, 6, 3])  # only chunk 0 real
    cache = TokenCache(pp)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    enc = Encoder(model, params, is_query=False)
    emb, row2doc = encode_cache_multivector(
        enc, cache, EncodeConfig(batch_size=2), chunk_len=8
    )
    np.testing.assert_array_equal(row2doc, [0, 0, 1])
    assert emb.shape == (3, 768)


@pytest.mark.slow
def test_warmup_resume_fast_forward(tmp_path):
    from cocodr_tpu.pipelines.warmup import WarmupConfig, run_warmup

    transformers = pytest.importorskip("transformers")
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] aa bb cc dd".split()
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vp), do_lower_case=True)

    triples = tmp_path / "triples.tsv"
    triples.write_text("".join(f"aa bb\tcc\tdd\n" for _ in range(20)))

    model, state, step, tx = _model_state()
    cfg = WarmupConfig(
        max_seq_len=8, batch_size=2, num_epochs=1, save_steps=0,
        max_steps=3, log_every=1,
    )
    ck = str(tmp_path / "ck")
    s1 = run_warmup(state, step, str(triples), tok, cfg, ck, resume=False)
    assert int(s1.step) == 3
    # resume: loads step 3, fast-forwards 3 batches, trains up to max_steps 5
    cfg2 = WarmupConfig(
        max_seq_len=8, batch_size=2, num_epochs=1, save_steps=0,
        max_steps=5, log_every=1,
    )
    s2 = run_warmup(state, step, str(triples), tok, cfg2, ck, resume=True)
    assert int(s2.step) == 5


@pytest.mark.slow
def test_mine_multichunk_corpus(tmp_path):
    """Mining over a multi-chunk long-doc corpus: rows map back to docs,
    negatives are doc ids, dev eval dedupes chunks."""
    from cocodr_tpu.pipelines.ance import MineConfig, mine

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_multi_chunk", bert, base_len=8)
    qp, pp = str(tmp_path / "q"), str(tmp_path / "p")
    with RecordWriter(qp, 8) as w:
        for i in range(4):
            w.write([2, 10 + i, 3])
    with RecordWriter(pp, 16) as w:  # 2-chunk docs
        for i in range(8):
            w.write([2, 10 + (i % 4), 5, 3, 2, 20 + i, 6, 3])
    positives = {i: i for i in range(4)}
    dev_qrels = {i: {i: 1} for i in range(4)}
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    out = str(tmp_path / "ann")
    metrics = mine(
        model, params, TokenCache(pp), TokenCache(qp), positives,
        TokenCache(qp), dev_qrels, out, 0,
        MineConfig(topk_training=8, negative_sample=3, n_splits=1,
                   dev_topk=8, batch_size=4, q_chunk=4, mips_tile=8,
                   exact_fp32=True),
    )
    lines = open(os.path.join(out, "ann_training_data_0")).readlines()
    from cocodr_tpu.data.streams import parse_ann_line

    for line in lines:
        qid, pos, negs, w, g = parse_ann_line(line)
        assert all(0 <= n < 8 for n in negs)  # doc ids, not chunk rows
        assert pos not in negs
    assert 0.0 <= metrics["ndcg_cut_10"] <= 1.0


def test_miner_emb_cache_pruning(tmp_path):
    """emb_cache_keep bounds the cache dir to the N newest corpus dumps
    (reference --only_keep_latest_embedding_file bounds the same disk cost
    by overwriting one file, data_gen.py:972-973)."""
    import time

    qp, pp, positives, dev_qrels = _dataset(tmp_path)
    model, state, step, tx = _model_state()
    qc, pc = TokenCache(qp), TokenCache(pp)
    emb_dir = str(tmp_path / "embs")
    cfg = MineConfig(
        topk_training=6, negative_sample=3, n_splits=1, dev_topk=5,
        batch_size=8, q_chunk=8, mips_tile=8, exact_fp32=True,
        emb_cache_dir=emb_dir, emb_cache_keep=2,
    )
    out = str(tmp_path / "ann")
    for i in range(3):
        mine(model, state.params, pc, qc, positives, qc, dev_qrels, out, i,
             cfg, checkpoint_name=f"ck-{i}")
        time.sleep(0.05)  # distinct mtimes for the LRU order
    import glob

    kept = sorted(os.path.basename(f)
                  for f in glob.glob(os.path.join(emb_dir, "corpus_*.npy")))
    assert kept == ["corpus_ck-1.npy", "corpus_ck-2.npy"], kept
