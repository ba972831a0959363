"""Data plane: record format byte-parity with the reference, memmap reader,
streams/sharding, preprocessors with a local tokenizer."""
import json
import os

import numpy as np
import pytest

from cocodr_tpu.data.records import (
    RecordWriter,
    TokenCache,
    load_qrels,
    write_qrels,
)
from cocodr_tpu.data.streams import (
    Triplet,
    TripletBatcher,
    parse_ann_line,
    shard_indices,
    triplets_from_ann_lines,
)


def test_record_format_matches_reference_layout(tmp_path):
    """Byte layout: len (4B big-endian) + int32[max_len] little-endian —
    readable by the reference's EmbeddingCache read path (util.py:341-346)."""
    p = str(tmp_path / "passages")
    with RecordWriter(p, max_len=8) as w:
        w.write([101, 7, 8, 102])
        w.write(list(range(1, 12)))  # truncated to 8

    raw = open(p, "rb").read()
    rec = 4 + 8 * 4
    assert len(raw) == 2 * rec
    # reference decode
    assert int.from_bytes(raw[:4], "big") == 4
    toks = np.frombuffer(raw[4:rec], dtype=np.int32)
    np.testing.assert_array_equal(toks, [101, 7, 8, 102, 0, 0, 0, 0])
    assert int.from_bytes(raw[rec : rec + 4], "big") == 8
    meta = json.load(open(p + "_meta"))
    assert meta == {"type": "int32", "total_number": 2, "embedding_size": 8}

    cache = TokenCache(p)
    ln, toks = cache[0]
    assert ln == 4
    np.testing.assert_array_equal(toks[:4], [101, 7, 8, 102])
    lens, tok = cache.batch([1, 0])
    np.testing.assert_array_equal(lens, [8, 4])
    tok2, mask = cache.batch_with_mask([0])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 0, 0, 0, 0])


def test_ann_line_parsing():
    qid, pos, negs, w, g = parse_ann_line("3\t17\t5,9,11\t0.75\t4\n")
    assert (qid, pos, negs, w, g) == (3, 17, [5, 9, 11], 0.75, 4)
    # 3-column legacy format
    qid, pos, negs, w, g = parse_ann_line("3\t17\t5,9")
    assert (w, g) == (1.0, 0)


def test_triplet_sharding():
    lines = [f"{i}\t{i+100}\t{i+200}" for i in range(10)]
    t_r0 = list(triplets_from_ann_lines(lines, rank=0, world_size=2))
    t_r1 = list(triplets_from_ann_lines(lines, rank=1, world_size=2))
    assert [t.qid for t in t_r0] == [0, 2, 4, 6, 8]
    assert [t.qid for t in t_r1] == [1, 3, 5, 7, 9]
    np.testing.assert_array_equal(shard_indices(10, 1, 4), [1, 5, 9])


def test_triplet_batcher(tmp_path):
    qp = str(tmp_path / "q")
    pp = str(tmp_path / "p")
    with RecordWriter(qp, 4) as w:
        for i in range(3):
            w.write([1, 10 + i, 2])
    with RecordWriter(pp, 6) as w:
        for i in range(6):
            w.write([1, 100 + i, 100 + i, 2])
    b = TripletBatcher(TokenCache(qp), TokenCache(pp))
    batch = b.collate(
        [Triplet(0, 1, 2, weight=0.5, group=3), Triplet(2, 4, 5)]
    )
    assert batch.query_ids.shape == (2, 4)
    assert batch.pos_ids.shape == (2, 6)
    np.testing.assert_array_equal(batch.query_ids[0, :3], [1, 10, 2])
    np.testing.assert_array_equal(batch.pos_ids[1, :4], [1, 104, 104, 2])
    np.testing.assert_array_equal(batch.weights, [0.5, 1.0])
    np.testing.assert_array_equal(batch.groups, [3, 0])


def test_qrels_roundtrip(tmp_path):
    p = str(tmp_path / "qrel.tsv")
    write_qrels(p, [(0, 5, 1), (0, 7, 2), (3, 1, 1)])
    q = load_qrels(p)
    assert q == {0: {5: 1, 7: 2}, 3: {1: 1}}


@pytest.fixture()
def tiny_tokenizer(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = (
        "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jumps over lazy "
        "dog a an ##s hello world query document test".split()
    )
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    return transformers.BertTokenizerFast(
        vocab_file=str(vp), do_lower_case=True
    )


def test_beir_preprocess(tmp_path, tiny_tokenizer):
    from cocodr_tpu.data.preprocess import (
        load_beir_qrels,
        tokenize_beir_corpus,
        tokenize_beir_queries,
    )

    corpus = tmp_path / "corpus.jsonl"
    corpus.write_text(
        json.dumps({"_id": "d1", "title": "The Quick", "text": "brown fox"})
        + "\n"
        + json.dumps({"_id": "d2", "title": "", "text": "lazy dog"})
        + "\n"
    )
    queries = tmp_path / "queries.jsonl"
    queries.write_text(
        json.dumps({"_id": "q1", "text": "quick fox"}) + "\n"
    )
    qrels = tmp_path / "test.tsv"
    qrels.write_text("query-id\tcorpus-id\tscore\nq1\td1\t1\n")

    d_map = tokenize_beir_corpus(
        str(corpus), str(tmp_path / "pass"), tiny_tokenizer, max_len=8
    )
    q_map = tokenize_beir_queries(
        str(queries), str(tmp_path / "qrec"), tiny_tokenizer, max_len=6
    )
    assert d_map == {"d1": 0, "d2": 1}
    assert q_map == {"q1": 0}
    cache = TokenCache(str(tmp_path / "pass"))
    ln, toks = cache[0]
    decoded = tiny_tokenizer.decode(toks[:ln].tolist())
    assert "quick" in decoded and "brown fox" in decoded
    r = load_beir_qrels(str(qrels))
    assert r == {"q1": {"d1": 1}}


def test_msmarco_preprocess(tmp_path, tiny_tokenizer):
    from cocodr_tpu.data.preprocess import (
        rewrite_qrels,
        tokenize_msmarco_passages,
        tokenize_queries,
    )

    coll = tmp_path / "collection.tsv"
    coll.write_text("10\tThe quick brown fox\n20\tlazy dog\n")
    qs = tmp_path / "queries.tsv"
    qs.write_text("7\tquick fox\n")
    qr = tmp_path / "qrels.tsv"
    qr.write_text("7\t0\t20\t1\n")

    pid2off = tokenize_msmarco_passages(
        str(coll), str(tmp_path / "passages"), tiny_tokenizer, 8, lowercase=True
    )
    qid2off = tokenize_queries(
        str(qs), str(tmp_path / "train-query"), tiny_tokenizer, 6
    )
    rows = rewrite_qrels(
        str(qr), str(tmp_path / "train-qrel.tsv"), qid2off, pid2off
    )
    assert pid2off == {10: 0, 20: 1}
    assert rows == [(0, 1, 1)]


def test_prefetch_iterator():
    from cocodr_tpu.data.prefetch import prefetch

    items = list(prefetch(iter(range(10)), depth=3, device_put=False))
    assert items == list(range(10))
    # error propagation
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad(), depth=2, device_put=False)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        list(it)

    # transform hook
    doubled = list(prefetch(iter([1, 2]), depth=1, device_put=False,
                            transform=lambda x: x * 2))
    assert doubled == [2, 4]


def test_encode_length_buckets(tmp_path):
    """Bucketed encode must produce identical embeddings to flat encode."""
    import jax
    import jax.numpy as jnp

    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.pipelines.encode import EncodeConfig, Encoder, encode_cache

    rng = np.random.RandomState(0)
    p = str(tmp_path / "recs")
    with RecordWriter(p, 16) as w:
        for i in range(30):
            n = rng.randint(2, 17)
            w.write(rng.randint(5, 100, size=n).tolist())
    cache = TokenCache(p)
    np.testing.assert_array_equal(cache.lengths(), cache.batch(range(30))[0])

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    enc = Encoder(model, params, is_query=False)
    flat = encode_cache(enc, cache, EncodeConfig(batch_size=8))
    bucketed = encode_cache(
        enc, cache, EncodeConfig(batch_size=8, length_buckets=(8, 16))
    )
    np.testing.assert_allclose(bucketed, flat, atol=2e-5, rtol=1e-4)


def test_parallel_tokenize_byte_identical(tmp_path, tiny_tokenizer):
    """n_workers>1 must produce byte-identical records + the same id map
    (reference multi_file_process, ANCE/utils/util.py:420-436)."""
    from cocodr_tpu.data.preprocess import tokenize_msmarco_passages

    coll = tmp_path / "collection.tsv"
    lines = [f"{i}\tthe quick brown fox jumps over dog number {i}"
             for i in range(37)]
    coll.write_text("\n".join(lines) + "\n")

    m1 = tokenize_msmarco_passages(
        str(coll), str(tmp_path / "serial"), tiny_tokenizer, 12
    )
    m2 = tokenize_msmarco_passages(
        str(coll), str(tmp_path / "par"), tiny_tokenizer, 12, n_workers=4
    )
    assert m1 == m2
    b1 = (tmp_path / "serial").read_bytes()
    b2 = (tmp_path / "par").read_bytes()
    assert b1 == b2
    assert json.loads((tmp_path / "par_meta").read_text())[
        "total_number"] == 37
    assert not list(tmp_path.glob("par.part*"))
