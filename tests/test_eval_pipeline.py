"""End-to-end BEIR eval pipeline on a synthetic task: a planted-relevance
corpus where the correct ranking is known by construction."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.pipelines.eval_beir import BeirEvalConfig, eval_beir

transformers = pytest.importorskip("transformers")


@pytest.fixture()
def tiny_tokenizer(tmp_path):
    vocab = (
        "[PAD] [UNK] [CLS] [SEP] [MASK] alpha beta gamma delta epsilon zeta "
        "eta theta iota kappa".split()
    )
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    return transformers.BertTokenizerFast(vocab_file=str(vp), do_lower_case=True)


def _write_beir_task(tmp_path, n_docs=30):
    """Every doc repeats one vocabulary word; query q_i = that word.
    A bag-of-words-ish encoder should rank doc_i first for q_i."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon",
             "zeta", "eta", "theta", "iota", "kappa"]
    data = tmp_path / "task"
    (data / "qrels").mkdir(parents=True)
    with open(data / "corpus.jsonl", "w") as f:
        for i in range(n_docs):
            w = words[i % len(words)]
            f.write(
                json.dumps({"_id": f"d{i}", "title": "", "text": " ".join([w] * 6)})
                + "\n"
            )
    with open(data / "queries.jsonl", "w") as f:
        for j, w in enumerate(words):
            f.write(json.dumps({"_id": f"q{j}", "text": w}) + "\n")
    with open(data / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for j in range(len(words)):
            for i in range(n_docs):
                if i % len(words) == j:
                    f.write(f"q{j}\td{i}\t1\n")
    return str(data)


def test_eval_beir_end_to_end(tmp_path, tiny_tokenizer):
    data_dir = _write_beir_task(tmp_path)
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    import jax

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]

    metrics = eval_beir(
        model,
        params,
        data_dir,
        str(tmp_path / "work"),
        tiny_tokenizer,
        task="synthetic",
        batch_size=8,
        top_k=30,
        mips_tile=16,
        q_chunk=4,
        query_len=8,
        doc_len=12,
    )
    # random tiny encoder still clusters identical token sequences:
    # doc embeddings for the same word are identical, so all 3 relevant
    # docs score identically and must fill some contiguous ranks.
    assert metrics["num_queries"] == 10
    assert 0.0 <= metrics["ndcg_cut_10"] <= 1.0
    assert metrics["recall_1000"] if "recall_1000" in metrics else True
    # identical embeddings => the relevant trio ties; recall@30 must be 1
    assert metrics["recall_1000" if "recall_1000" in metrics else "recall_100"] == 1.0


def test_eval_beir_idempotent_prepare(tmp_path, tiny_tokenizer):
    data_dir = _write_beir_task(tmp_path)
    from cocodr_tpu.pipelines.eval_beir import prepare_beir_task

    cfg = BeirEvalConfig.for_task("synthetic")
    out = str(tmp_path / "work")
    a = prepare_beir_task(data_dir, out, tiny_tokenizer, cfg)
    b = prepare_beir_task(data_dir, out, tiny_tokenizer, cfg)  # from cache
    assert a[2] == b[2] and a[3] == b[3]


def test_eval_beir_multichunk(tmp_path, tiny_tokenizer):
    """Long-doc multi-chunk model: one vector per chunk, deduped retrieval."""
    data_dir = _write_beir_task(tmp_path, n_docs=20)
    bert = BertConfig.tiny()
    from cocodr_tpu.models.dual_encoder import build_dual_encoder as bde

    model = bde("rdot_nll_multi_chunk", bert, base_len=8)
    import jax

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    metrics = eval_beir(
        model,
        params,
        data_dir,
        str(tmp_path / "work_mc"),
        tiny_tokenizer,
        task="synthetic-mc",
        batch_size=8,
        top_k=20,
        mips_tile=16,
        q_chunk=4,
        query_len=8,
        doc_len=16,  # 2 chunks of base_len 8
        exact_fp32=True,
    )
    assert metrics["num_queries"] == 10
    # dedupe keeps ranking lists valid (no doc repeated)
    assert 0.0 <= metrics["ndcg_cut_10"] <= 1.0


def test_eval_beir_length_buckets_same_metrics(tmp_path, tiny_tokenizer):
    """Bucketed corpus encode (BeirEvalConfig.length_buckets) must not
    change retrieval results, only padding work."""
    data_dir = _write_beir_task(tmp_path, n_docs=20)
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    import jax

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    kw = dict(task="synthetic", batch_size=8, top_k=20, mips_tile=16,
              q_chunk=4, query_len=8, doc_len=12, exact_fp32=True)
    m_plain = eval_beir(model, params, data_dir, str(tmp_path / "w1"),
                        tiny_tokenizer, **kw)
    m_buck = eval_beir(model, params, data_dir, str(tmp_path / "w2"),
                       tiny_tokenizer, length_buckets=(8, 12), **kw)
    for key in ("ndcg_cut_10", "recall_10", "mrr"):
        if key in m_plain:
            assert m_plain[key] == m_buck[key], key


def test_load_top_dev_and_combined_mrr(tmp_path):
    """The reference's top1000.dev rerank mode: candidates parsed into
    offset space, rerank MRR computed from the same embedding pass as the
    full-ranking MRR (warmup/utils/eval_mrr.py:166-229)."""
    import jax

    from cocodr_tpu.data.records import RecordWriter, TokenCache
    from cocodr_tpu.evals.mrr_eval import combined_mrr, load_top_dev

    rng = np.random.RandomState(0)
    qp, pp = str(tmp_path / "q"), str(tmp_path / "p")
    with RecordWriter(qp, 8) as w:
        for i in range(4):
            w.write([2] + rng.randint(5, 14, size=3).tolist() + [3])
    with RecordWriter(pp, 8) as w:
        for i in range(12):
            w.write([2] + rng.randint(5, 14, size=4).tolist() + [3])
    qc, pc = TokenCache(qp), TokenCache(pp)

    # raw-id candidate file -> offset space
    qid2off = {100 + i: i for i in range(4)}
    pid2off = {700 + i: i for i in range(12)}
    top_path = str(tmp_path / "top1000.dev")
    with open(top_path, "w") as f:
        for qid in (100, 101, 102, 103):
            for pid in range(700, 706):  # only the first half as candidates
                f.write(f"{qid}\t{pid}\tquery text\tpassage text\n")
        f.write("999\t700\tunknown qid skipped\n")
    cands = load_top_dev(top_path, qid2off, pid2off)
    assert set(cands) == {0, 1, 2, 3}
    assert cands[0] == list(range(6))

    cfg = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    qrels = {q: [q * 2] for q in range(4)}  # some targets outside candidates
    m = combined_mrr(model, params, qc, pc, qrels, candidates=cands,
                     top_k=10, batch_size=4)
    assert "MRR @10" in m and "rerank_MRR @10" in m
    # rerank over a candidate SUBSET can never beat full ranking on recall
    # of the planted positives outside the subset: q3's target pid 6 is
    # not a candidate, so rerank MRR must not count it
    assert 0.0 <= m["rerank_MRR @10"] <= 1.0

    # with ALL passages as candidates, rerank == full ranking exactly
    all_cands = {q: list(range(12)) for q in range(4)}
    m2 = combined_mrr(model, params, qc, pc, qrels, candidates=all_cands,
                      top_k=10, batch_size=4)
    assert m2["rerank_MRR @10"] == pytest.approx(m2["MRR @10"], abs=1e-9)
