"""Full-stack quality parity on a vendored tiny checkpoint: the complete
tokenize -> encode -> exact-search -> score pipeline must produce the SAME
ranked lists and nDCG@10 as the reference pipeline re-run in torch on the
same fixture (reference eval path: evaluate/data/beir_data.py tokenize,
evaluate/model/models.py BertDot CLS encode, faiss IndexFlatIP search,
evaluate/evaluation/evaluate_beir.py pytrec_eval scoring).

This is the executable stand-in for the hub-checkpoint parity eval
(BASELINE.md 0.461 target) in an environment without network egress:
scripts/parity_eval.py runs the same code path against real checkpoints.
"""
import json
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "hello", "world", "query", "document", "test",
]


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Tiny HF BERT checkpoint + WordPiece tokenizer saved to disk."""
    d = tmp_path_factory.mktemp("ckpt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(d / "vocab.txt"), do_lower_case=True
    )
    tok.save_pretrained(str(d))
    torch.manual_seed(42)
    model = transformers.BertModel(
        transformers.BertConfig(
            vocab_size=len(vocab),
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=32,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    )
    model.eval()
    model.save_pretrained(str(d))
    return str(d)


def _write_task(root, n_docs=24, n_queries=6, seed=3):
    rng = np.random.RandomState(seed)
    data = root / "task"
    (data / "qrels").mkdir(parents=True)
    docs = []
    with open(data / "corpus.jsonl", "w") as f:
        for i in range(n_docs):
            words = [WORDS[w] for w in rng.randint(0, len(WORDS), size=6)]
            title = WORDS[i % len(WORDS)].upper() if i % 3 == 0 else ""
            doc = {"_id": f"d{i}", "title": title, "text": " ".join(words)}
            docs.append(doc)
            f.write(json.dumps(doc) + "\n")
    queries = []
    with open(data / "queries.jsonl", "w") as f:
        for j in range(n_queries):
            words = [WORDS[w] for w in rng.randint(0, len(WORDS), size=3)]
            q = {"_id": f"q{j}", "text": " ".join(words)}
            queries.append(q)
            f.write(json.dumps(q) + "\n")
    with open(data / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for j in range(n_queries):
            for i in rng.choice(n_docs, size=3, replace=False):
                f.write(f"q{j}\td{i}\t1\n")
    return str(data), docs, queries


def _torch_reference_run(checkpoint, docs, queries, doc_len, query_len, k):
    """The reference eval pipeline, re-run in torch/numpy."""
    tok = transformers.BertTokenizerFast.from_pretrained(checkpoint)
    model = transformers.BertModel.from_pretrained(checkpoint)
    model.eval()

    def encode(texts, max_len):
        embs = []
        for t in texts:
            ids = tok.encode(
                t, add_special_tokens=True, max_length=max_len,
                truncation=True,
            )
            input_ids = torch.tensor([ids])
            mask = torch.ones_like(input_ids)
            with torch.no_grad():
                out = model(input_ids=input_ids, attention_mask=mask)
            embs.append(out.last_hidden_state[0, 0].numpy())
        return np.stack(embs)

    # beir_data.py:278-296: (title + ' ' + text).lower(), text.lower() bare
    doc_texts = [
        ((d["title"].rstrip() + " " + d["text"].rstrip())
         if d["title"] else d["text"].rstrip()).lower()
        for d in docs
    ]
    q_texts = [q["text"].rstrip().lower() for q in queries]
    d_emb = encode(doc_texts, doc_len)
    q_emb = encode(q_texts, query_len)
    scores = q_emb @ d_emb.T  # IndexFlatIP
    run = {}
    for j, q in enumerate(queries):
        order = np.argsort(-scores[j])[:k]
        run[q["_id"]] = [
            (f"d{i}", float(scores[j, i])) for i in order
        ]
    return run


def _ndcg10(run, qrels):
    """Independent pytrec_eval-semantics nDCG@10 (log2 discounts)."""
    vals = []
    for qid, ranked in run.items():
        rel = qrels.get(qid, {})
        dcg = sum(
            (2 ** rel.get(did, 0) - 1) / math.log2(r + 2)
            for r, (did, _) in enumerate(ranked[:10])
        )
        ideal = sorted(rel.values(), reverse=True)[:10]
        idcg = sum((2 ** g - 1) / math.log2(r + 2) for r, g in enumerate(ideal))
        vals.append(dcg / idcg if idcg > 0 else 0.0)
    return sum(vals) / len(vals)


def test_full_pipeline_matches_torch_reference(checkpoint, tmp_path):
    data_dir, docs, queries = _write_task(tmp_path)
    k, doc_len, query_len = 20, 16, 12

    ref_run = _torch_reference_run(
        checkpoint, docs, queries, doc_len, query_len, k
    )

    from cocodr_tpu.cli import _load_model_params, _load_tokenizer
    from cocodr_tpu.data.preprocess import load_beir_qrels
    from cocodr_tpu.pipelines.eval_beir import eval_beir

    model, params, _ = _load_model_params(checkpoint, "rdot_nll_condenser")
    tokenizer = _load_tokenizer(checkpoint)
    metrics = eval_beir(
        model,
        params,
        data_dir,
        str(tmp_path / "work"),
        tokenizer,
        task="synthetic",
        batch_size=8,
        top_k=k,
        mips_tile=16,
        q_chunk=4,
        query_len=query_len,
        doc_len=doc_len,
        exact_fp32=True,  # FAISS-bit parity (scripts/parity_eval.py flag)
    )

    qrels = load_beir_qrels(os.path.join(data_dir, "qrels", "test.tsv"))
    ref_ndcg = _ndcg10(ref_run, qrels)
    assert metrics["ndcg_cut_10"] == pytest.approx(ref_ndcg, abs=1e-6)

    # ranked lists: same ids in the same order with matching scores
    from cocodr_tpu.pipelines.encode import EncodeConfig, Encoder, encode_cache
    from cocodr_tpu.data.records import TokenCache
    from cocodr_tpu.parallel.topk import search_topk

    corpus_cache = TokenCache(str(tmp_path / "work" / "passages"))
    query_cache = TokenCache(str(tmp_path / "work" / "queries"))
    ecfg = EncodeConfig(batch_size=8)
    d_emb = encode_cache(Encoder(model, params, is_query=False),
                         corpus_cache, ecfg)
    q_emb = encode_cache(Encoder(model, params, is_query=True),
                         query_cache, ecfg)
    vals, ids = search_topk(q_emb, d_emb, k, q_chunk=4, tile=16,
                            exact_fp32=True)
    from cocodr_tpu.data.records import load_id_map

    d2o = load_id_map(str(tmp_path / "work" / "passages")
                      + ".docid2offset.pickle")
    q2o = load_id_map(str(tmp_path / "work" / "queries")
                      + ".qid2offset.pickle")
    off2d = {v: k_ for k_, v in d2o.items()}
    off2q = {v: k_ for k_, v in q2o.items()}
    for qi in range(len(q_emb)):
        qid = off2q[qi]
        got = [off2d[int(i)] for i in ids[qi]]
        want_scores = dict(ref_run[qid])
        # same retrieved set, per-doc scores equal to fp32 tolerance
        assert set(got) == set(want_scores), qid
        got_scores = {d: float(v) for d, v in zip(got, np.asarray(vals[qi]))}
        for d in got:
            np.testing.assert_allclose(
                got_scores[d], want_scores[d], rtol=2e-6, atol=2e-5
            )
        # our order must be a valid descending order of the TORCH scores up
        # to fp32 summation noise (different BLAS accumulate orders make
        # exact tie order unreproducible even between two faiss builds);
        # any tie-flip that matters for quality is caught by the exact
        # nDCG equality asserted above
        TIE = 1e-4
        for r in range(len(got) - 1):
            assert (want_scores[got[r]]
                    >= want_scores[got[r + 1]] - TIE), (qid, r)
