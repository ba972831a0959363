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
            # hot init: the default 0.02 collapses CLS embeddings to fp32
            # ties (see roberta_head_checkpoint); graded qrels then expose
            # arbitrary tie-order flips as fake nDCG differences
            initializer_range=0.5,
        )
    )
    model.eval()
    model.save_pretrained(str(d))
    return str(d)


def _write_task(root, n_docs=24, n_queries=6, seed=3, graded=False):
    """BEIR-format fixture. graded=True writes trec-style graded judgments
    (grades 0/1/2, like robust04 / trec-covid) instead of binary — zero-grade
    judgments must count for hole rate but not for gain."""
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
        n_judged = 5 if graded else 3
        for j in range(n_queries):
            for i in rng.choice(n_docs, size=n_judged, replace=False):
                grade = int(rng.randint(0, 3)) if graded else 1
                f.write(f"q{j}\td{i}\t{grade}\n")
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
    """Independent nDCG@10 checker with trec_eval `ndcg_cut` semantics:
    LINEAR graded gain (rel_i / log2(i+2)) — NOT the exponential 2^rel-1
    variant — and ideal DCG from the positively-judged grades only. This is
    what pytrec_eval computes (trec_eval m_ndcg_cut.c) and what the
    reference's scores (evaluate_beir.py:105-122) mean."""
    vals = []
    for qid, ranked in run.items():
        rel = qrels.get(qid, {})
        dcg = sum(
            rel.get(did, 0) / math.log2(r + 2)
            for r, (did, _) in enumerate(ranked[:10])
        )
        ideal = sorted((g for g in rel.values() if g > 0), reverse=True)[:10]
        idcg = sum(g / math.log2(r + 2) for r, g in enumerate(ideal))
        vals.append(dcg / idcg if idcg > 0 else 0.0)
    return sum(vals) / len(vals)


@pytest.fixture(scope="module")
def roberta_head_checkpoint(tmp_path_factory):
    """Tiny RobertaDot_NLL_LN-style checkpoint: roberta.* backbone plus the
    reference's `embeddingHead` Linear(hidden->768) + `norm` LayerNorm(768)
    (reference ANCE/model/models.py:305-310), saved with the reference's
    state-dict naming so _load_model_params takes its real code path."""
    d = tmp_path_factory.mktemp("rob_ckpt")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(d / "vocab.txt"), do_lower_case=True
    )
    tok.save_pretrained(str(d))
    torch.manual_seed(7)
    cfg = transformers.RobertaConfig(
        vocab_size=len(vocab),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=0,  # match the WordPiece [PAD] id
        bos_token_id=2,
        eos_token_id=3,
        # default 0.02 init collapses a 2-layer model's CLS to one point:
        # every doc scores within ~1e-4 of every other — pure fp32 ties.
        # A hot init spreads scores over ~1e2 so rank parity is meaningful.
        initializer_range=0.5,
    )
    backbone = transformers.RobertaModel(cfg)
    backbone.eval()
    head = torch.nn.Linear(32, 768)
    norm = torch.nn.LayerNorm(768)
    with torch.no_grad():
        head.weight.mul_(8.0)  # discriminative head (see initializer_range)
        norm.weight.copy_(torch.rand(768) * 1.5 + 0.25)
    sd = {"roberta." + k: v for k, v in backbone.state_dict().items()}
    sd["embeddingHead.weight"] = head.weight.detach()
    sd["embeddingHead.bias"] = head.bias.detach()
    sd["norm.weight"] = norm.weight.detach()
    sd["norm.bias"] = norm.bias.detach()
    torch.save(sd, str(d / "pytorch_model.bin"))
    cfg.save_pretrained(str(d))
    return str(d)


def _torch_rdot_encode(checkpoint, texts, max_len):
    """RobertaDot_NLL_LN.query_emb re-run: roberta CLS -> embeddingHead ->
    norm (reference ANCE/model/models.py:138-143)."""
    tok = transformers.BertTokenizerFast.from_pretrained(checkpoint)
    backbone = transformers.RobertaModel.from_pretrained(checkpoint)
    backbone.eval()
    sd = torch.load(
        os.path.join(checkpoint, "pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    head = torch.nn.Linear(32, 768)
    norm = torch.nn.LayerNorm(768)
    with torch.no_grad():
        head.weight.copy_(sd["embeddingHead.weight"])
        head.bias.copy_(sd["embeddingHead.bias"])
        norm.weight.copy_(sd["norm.weight"])
        norm.bias.copy_(sd["norm.bias"])
    embs = []
    for t in texts:
        ids = tok.encode(
            t, add_special_tokens=True, max_length=max_len, truncation=True
        )
        input_ids = torch.tensor([ids])
        mask = torch.ones_like(input_ids)
        with torch.no_grad():
            out = backbone(input_ids=input_ids, attention_mask=mask)
            emb = norm(head(out.last_hidden_state[0, 0]))
        embs.append(emb.numpy())
    return np.stack(embs)


def test_rdot_nll_head_roberta_pipeline_matches_torch(
    roberta_head_checkpoint, tmp_path
):
    """Full pipeline parity on the rdot_nll registry type: RoBERTa position
    semantics + embeddingHead/norm projection, graded qrels."""
    data_dir, docs, queries = _write_task(tmp_path, graded=True, seed=11)
    k, doc_len, query_len = 20, 16, 12

    doc_texts = [
        ((d["title"].rstrip() + " " + d["text"].rstrip())
         if d["title"] else d["text"].rstrip()).lower()
        for d in docs
    ]
    q_texts = [q["text"].rstrip().lower() for q in queries]
    d_emb = _torch_rdot_encode(roberta_head_checkpoint, doc_texts, doc_len)
    q_emb = _torch_rdot_encode(roberta_head_checkpoint, q_texts, query_len)
    scores = q_emb @ d_emb.T
    ref_run = {}
    for j, q in enumerate(queries):
        order = np.argsort(-scores[j])[:k]
        ref_run[q["_id"]] = [(f"d{i}", float(scores[j, i])) for i in order]

    from cocodr_tpu.cli import _load_model_params, _load_tokenizer
    from cocodr_tpu.data.preprocess import load_beir_qrels
    from cocodr_tpu.pipelines.eval_beir import eval_beir

    model, params, _ = _load_model_params(roberta_head_checkpoint, "rdot_nll")
    assert model.cfg.use_head and "head" in params
    tokenizer = _load_tokenizer(roberta_head_checkpoint)
    metrics = eval_beir(
        model, params, data_dir, str(tmp_path / "work"), tokenizer,
        task="synthetic", batch_size=8, top_k=k, mips_tile=16, q_chunk=4,
        query_len=query_len, doc_len=doc_len, exact_fp32=True,
    )
    qrels = load_beir_qrels(os.path.join(data_dir, "qrels", "test.tsv"))
    assert metrics["ndcg_cut_10"] == pytest.approx(_ndcg10(ref_run, qrels),
                                                   abs=1e-6)


def test_multichunk_pipeline_matches_torch(roberta_head_checkpoint, tmp_path):
    """rdot_nll_multi_chunk parity: per-chunk encode (chunks folded into
    batch), -9999 bias on padded chunks, max-over-chunks doc score
    (reference ANCE/model/models.py:326-357,365-399). The torch side scores
    straight from OUR token records so any divergence is in encode/search/
    dedupe, not tokenization."""
    base_len, C = 8, 2
    doc_len, query_len, k = base_len * C, 12, 1000
    rng = np.random.RandomState(5)
    data = tmp_path / "task"
    (data / "qrels").mkdir(parents=True)
    docs, queries = [], []
    with open(data / "corpus.jsonl", "w") as f:
        for i in range(20):
            n_words = int(rng.randint(3, 14))  # some docs spill into chunk 2
            words = [WORDS[w] for w in rng.randint(0, len(WORDS), size=n_words)]
            doc = {"_id": f"d{i}", "title": "", "text": " ".join(words)}
            docs.append(doc)
            f.write(json.dumps(doc) + "\n")
    with open(data / "queries.jsonl", "w") as f:
        for j in range(5):
            words = [WORDS[w] for w in rng.randint(0, len(WORDS), size=3)]
            q = {"_id": f"q{j}", "text": " ".join(words)}
            queries.append(q)
            f.write(json.dumps(q) + "\n")
    with open(data / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for j in range(5):
            for i in rng.choice(20, size=4, replace=False):
                f.write(f"q{j}\td{i}\t{int(rng.randint(0, 3))}\n")

    from cocodr_tpu.cli import _load_tokenizer
    from cocodr_tpu.data.preprocess import load_beir_qrels
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.models.hf import (
        config_from_hf,
        dual_encoder_params_from_torch,
        load_torch_state_dict,
    )
    from cocodr_tpu.pipelines.eval_beir import (
        BeirEvalConfig,
        evaluate_beir_task,
        prepare_beir_task,
    )

    with open(os.path.join(roberta_head_checkpoint, "config.json")) as f:
        cfg = config_from_hf(json.load(f))
    weights = load_torch_state_dict(
        os.path.join(roberta_head_checkpoint, "pytorch_model.bin")
    )
    model = build_dual_encoder("rdot_nll_multi_chunk", cfg, base_len=base_len)
    params = dual_encoder_params_from_torch(weights, cfg, use_head=True)
    tokenizer = _load_tokenizer(roberta_head_checkpoint)

    bcfg = BeirEvalConfig(
        task="synthetic", query_len=query_len, doc_len=doc_len, top_k=k,
        batch_size=8, mips_tile=16, q_chunk=4, exact_fp32=True,
    )
    corpus_path, query_path, d2o, q2o, qrels = prepare_beir_task(
        str(data), str(tmp_path / "work"), tokenizer, bcfg
    )
    metrics = evaluate_beir_task(
        model, params, corpus_path, query_path, d2o, q2o, qrels, bcfg
    )

    # torch chunk-max reference directly over the same token records
    from cocodr_tpu.data.native import open_token_cache

    corpus_cache = open_token_cache(corpus_path)
    query_cache = open_token_cache(query_path)
    backbone = transformers.RobertaModel.from_pretrained(roberta_head_checkpoint)
    backbone.eval()
    sd = torch.load(
        os.path.join(roberta_head_checkpoint, "pytorch_model.bin"),
        map_location="cpu", weights_only=True,
    )
    head, norm = torch.nn.Linear(32, 768), torch.nn.LayerNorm(768)
    with torch.no_grad():
        head.weight.copy_(sd["embeddingHead.weight"])
        head.bias.copy_(sd["embeddingHead.bias"])
        norm.weight.copy_(sd["norm.weight"])
        norm.bias.copy_(sd["norm.bias"])

    def torch_body_emb(ids, mask):  # [B, C*L] -> [B, C, 768]
        B = ids.shape[0]
        ids_c = torch.tensor(ids.reshape(B * C, base_len))
        mask_c = torch.tensor(mask.reshape(B * C, base_len))
        with torch.no_grad():
            out = backbone(input_ids=ids_c, attention_mask=mask_c)
            emb = norm(head(out.last_hidden_state[:, 0]))
        return emb.reshape(B, C, -1).numpy()

    d_ids, d_mask = corpus_cache.batch_with_mask(np.arange(len(corpus_cache)))
    q_ids, q_mask = query_cache.batch_with_mask(np.arange(len(query_cache)))
    chunk_emb = torch_body_emb(d_ids, d_mask)  # [N, C, 768]
    q_embs = []
    for r in range(len(q_ids)):
        n_real = int(q_mask[r].sum())
        input_ids = torch.tensor(q_ids[r:r + 1, :n_real])
        with torch.no_grad():
            out = backbone(input_ids=input_ids,
                           attention_mask=torch.ones_like(input_ids))
            q_embs.append(norm(head(out.last_hidden_state[0, 0])).numpy())
    q_emb = np.stack(q_embs)
    chunk_first = d_mask.reshape(len(d_ids), C, base_len)[:, :, 0]
    bias = (1.0 - chunk_first.astype(np.float32)) * (-9999.0)
    scores = np.einsum("qd,ncd->qnc", q_emb, chunk_emb) + bias[None]
    doc_scores = scores.max(axis=-1)  # [Q, N] chunk-max

    off2q = {v: k_ for k_, v in q2o.items()}
    ref_run = {}
    for r in range(len(q_emb)):
        order = np.argsort(-doc_scores[r])
        ref_run[off2q[r]] = [(f"d{i}", float(doc_scores[r, i])) for i in order]
    assert metrics["ndcg_cut_10"] == pytest.approx(_ndcg10(ref_run, qrels),
                                                   abs=1e-6)

    # ranked doc lists from the multi-vector index must equal torch chunk-max
    from cocodr_tpu.pipelines.encode import (
        EncodeConfig, Encoder, encode_cache, encode_cache_multivector,
    )
    from cocodr_tpu.parallel.topk import search_topk

    ecfg = EncodeConfig(batch_size=8)
    corpus_emb, row2doc = encode_cache_multivector(
        Encoder(model, params, is_query=False), corpus_cache, ecfg,
        chunk_len=base_len,
    )
    q_emb_ours = encode_cache(Encoder(model, params, is_query=True),
                              query_cache, ecfg)
    vals, ids = search_topk(q_emb_ours, corpus_emb, corpus_emb.shape[0],
                            q_chunk=4, tile=16, exact_fp32=True)
    for r in range(len(q_emb_ours)):
        best = {}
        for v, row in zip(np.asarray(vals[r]), np.asarray(ids[r])):
            doc = int(row2doc[int(row)])
            best.setdefault(doc, float(v))
        want = doc_scores[r]
        for doc, got in best.items():
            np.testing.assert_allclose(got, want[doc], rtol=2e-5, atol=2e-4)
        got_order = sorted(best, key=lambda d: -best[d])
        TIE = 1e-4
        for a, b in zip(got_order, got_order[1:]):
            assert want[a] >= want[b] - TIE


@pytest.mark.parametrize("graded", [False, True], ids=["binary", "graded"])
def test_full_pipeline_matches_torch_reference(checkpoint, tmp_path, graded):
    data_dir, docs, queries = _write_task(tmp_path, graded=graded)
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
