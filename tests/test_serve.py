"""Serving path: text in, ranked external doc ids out."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim.schedules import episode_rewarmup
from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

transformers = pytest.importorskip("transformers")


def test_retrieval_service(tmp_path):
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] alpha beta gamma delta".split()
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vp), do_lower_case=True)

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]

    # corpus embeddings = encoded doc texts through the same model (so the
    # query "alpha" scores its own doc highest by construction)
    texts = ["alpha alpha", "beta beta", "gamma gamma", "delta delta"]
    enc = tok(texts, padding="max_length", truncation=True, max_length=8,
              return_tensors="np")
    corpus_emb = np.asarray(
        model.apply(
            {"params": params},
            jnp.asarray(enc["input_ids"].astype(np.int32)),
            jnp.asarray(enc["attention_mask"].astype(np.int32)),
            method=model.body_emb,
        )
    )

    svc = RetrievalService(
        model, params, tok, corpus_emb, doc_ids=["dA", "dB", "dC", "dD"],
        cfg=ServeConfig(top_k=2, max_query_len=8, max_batch=4,
                        exact_fp32=True),
    )
    scores, ids = svc.search(["alpha alpha", "gamma gamma"])
    assert scores.shape == (2, 2)
    assert ids[0][0] == "dA"
    assert ids[1][0] == "dC"
    # batching pads to a bucket transparently
    scores, ids = svc.search(["beta beta"])
    assert ids[0][0] == "dB"

    # small-batch REPL calls pad to a power-of-two bucket, not max_batch
    assert svc._bucket(1) == 4  # min(8, max_batch=4)
    svc.cfg.max_batch = 64
    assert svc._bucket(1) == 8
    assert svc._bucket(9) == 16
    assert svc._bucket(64) == 64
    assert svc._bucket(65) == 128  # bulk: next max_batch multiple
    assert svc._bucket(130) == 192


def test_episode_rewarmup_schedule():
    fn = episode_rewarmup(1.0, warmup_steps=10, steps_per_episode=100,
                          total_steps=1000)
    assert float(fn(0)) == 0.0
    assert float(fn(10)) == pytest.approx(1.0 * (1 - 10 / 1000))
    assert float(fn(50)) == pytest.approx(1.0 * (1 - 50 / 1000))
    # new episode restarts the warmup
    assert float(fn(100)) == 0.0
    assert float(fn(105)) == pytest.approx(0.5 * (1 - 105 / 1000))
    # floor on the decay: at step 955 (warmup done in-episode), lr = floor
    assert float(fn(955)) == pytest.approx(0.2, abs=1e-6)


def test_episode_decay_stepwise_constant():
    """episode_steps freezes the decay factor for a whole episode — the
    reference computes it once per episode at optimizer build time
    (run_ann.py:120-125)."""
    import numpy as np

    from cocodr_tpu.optim.schedules import episode_decay

    fn = episode_decay(1.0, warmup_steps=1, total_steps=100, floor=0.2,
                       episode_steps=10)
    # within episode 1 (steps 10..19) the factor is fixed at 1-10/100
    vals = [float(fn(s)) for s in range(10, 20)]
    assert all(v == np.float32(0.9) for v in vals), vals
    assert float(fn(20)) == np.float32(0.8)


def test_encoder_jit_cache_across_instances():
    """Two Encoders over the same (model, mesh, tower) share one jitted
    program — mining rebuilds Encoders every round and must not re-trace."""
    import jax.numpy as jnp

    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.pipelines.encode import Encoder

    model = build_dual_encoder("rdot_nll_condenser", BertConfig.tiny())
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    e1 = Encoder(model, params, is_query=False)
    e2 = Encoder(model, params, is_query=False)
    assert e1._fn is e2._fn
    assert e1._fn is not Encoder(model, params, is_query=True)._fn
    ids = jnp.ones((2, 8), jnp.int32)
    np.testing.assert_array_equal(np.asarray(e1(ids, ids)),
                                  np.asarray(e2(ids, ids)))


def test_retrieval_service_sharded_matches_single(tmp_path):
    """Multi-chip serving: RetrievalService(mesh=8-dev) returns the same
    hits as the single-device service, corpus resident-sharded."""
    import transformers

    from cocodr_tpu.core.mesh import MeshConfig, create_mesh
    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] alpha beta gamma delta".split()
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(tmp_path / "vocab.txt"))
    model = build_dual_encoder("rdot_nll_condenser", BertConfig.tiny())
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    rng = np.random.RandomState(0)
    corpus = rng.randn(51, 32).astype(np.float32)  # odd N: pad rows in play
    cfg = ServeConfig(top_k=5, max_batch=4, max_query_len=8,
                      exact_fp32=True)
    single = RetrievalService(model, params, tok, corpus, cfg=cfg)
    mesh = create_mesh(MeshConfig(data=8, model=1))
    sharded = RetrievalService(model, params, tok, corpus, cfg=cfg,
                               mesh=mesh)
    v1, i1 = single.search(["alpha beta", "gamma"])
    v2, i2 = sharded.search(["alpha beta", "gamma"])
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    assert [list(r) for r in i1] == [list(r) for r in i2]


def test_search_stream_matches_search(tmp_path):
    """Pipelined bulk serving returns exactly what per-batch search does."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(50)
    ]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(tmp_path / "vocab.txt")
    )
    cfg = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids)["params"]
    corpus = np.random.default_rng(0).standard_normal(
        (256, cfg.hidden_size)
    ).astype(np.float32)
    svc = RetrievalService(
        model, params, tok, corpus,
        doc_ids=[f"d{i}" for i in range(256)],
        cfg=ServeConfig(top_k=5, max_batch=8, max_query_len=16),
    )
    batches = [[f"w{i} w{(i*3) % 50}" for i in range(j, j + 4)]
               for j in range(0, 12, 4)]
    seq = [svc.search(b) for b in batches]
    piped = list(svc.search_stream(batches, depth=2))
    assert len(seq) == len(piped)
    for (v1, i1), (v2, i2) in zip(seq, piped):
        np.testing.assert_allclose(v1, v2, rtol=1e-5)
        assert i1 == i2


def test_http_server_dynamic_batching(tmp_path):
    """HTTP endpoint: concurrent requests coalesce into fewer device
    dispatches and return exactly what direct search returns."""
    import http.client
    import threading

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(50)
    ]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(tmp_path / "vocab.txt")
    )
    cfg = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids)["params"]
    corpus = np.random.default_rng(0).standard_normal(
        (128, cfg.hidden_size)
    ).astype(np.float32)
    from cocodr_tpu.pipelines.http_serve import make_server
    from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

    svc = RetrievalService(
        model, params, tok, corpus,
        doc_ids=[f"d{i}" for i in range(128)],
        cfg=ServeConfig(top_k=5, max_batch=8, max_query_len=16),
    )
    queries = [f"w{i} w{(i * 3) % 50}" for i in range(12)]
    ref_vals, ref_ids = svc.search(queries)  # also pre-compiles

    server, batcher = make_server(svc, port=0, window_s=0.05)
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["n_docs"] == 128

        results = [None] * len(queries)

        def fire(i):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            c.request(
                "POST", "/search",
                body=json.dumps({"query": queries[i], "k": 5}),
                headers={"Content-Type": "application/json"},
            )
            results[i] = json.loads(c.getresponse().read())
            c.close()

        threads = [
            threading.Thread(target=fire, args=(i,))
            for i in range(len(queries))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, res in enumerate(results):
            got = res["hits"]
            assert [h["id"] for h in got] == list(ref_ids[i])
            np.testing.assert_allclose(
                [h["score"] for h in got], np.asarray(ref_vals[i]),
                rtol=1e-5,
            )
        # coalescing happened: 12 requests, max_batch 8, 50ms window ->
        # strictly fewer dispatches than requests
        assert batcher.batches < batcher.requests == 12

        # multi-query form
        conn.request(
            "POST", "/search",
            body=json.dumps({"queries": queries[:3], "k": 2}),
            headers={"Content-Type": "application/json"},
        )
        multi = json.loads(conn.getresponse().read())["hits"]
        assert len(multi) == 3 and all(len(h) == 2 for h in multi)
        assert [h["id"] for h in multi[0]] == list(ref_ids[0][:2])
        conn.close()
    finally:
        server.shutdown()
        batcher.stop()
        server.server_close()


def test_retrieval_service_ivf_matches_exact(tmp_path):
    """serve --search-method ivf: the IVF service at full probe returns
    the same ranking as the exact service (same encode path, clustered
    index instead of the flat corpus)."""
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] alpha beta gamma delta".split()
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(vp), do_lower_case=True
    )
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    rng = np.random.RandomState(0)
    corpus_emb = rng.randn(600, bert.hidden_size).astype(np.float32)

    cfg_kw = dict(top_k=5, max_query_len=8, max_batch=8)
    exact = RetrievalService(
        model, params, tok, corpus_emb, cfg=ServeConfig(**cfg_kw)
    )
    ivf = RetrievalService(
        model, params, tok, corpus_emb,
        cfg=ServeConfig(ivf=True, ivf_nprobe=10_000, ivf_clusters=8,
                        ivf_block_size=64, **cfg_kw),
    )
    assert ivf.ivf_index is not None and ivf.corpus is None
    queries = ["alpha beta", "gamma", "delta alpha gamma"]
    _, ei = exact.search(queries)
    _, ii = ivf.search(queries)
    for e_row, i_row in zip(ei, ii):
        assert set(e_row) == set(i_row)
    # search_stream works through the IVF path too
    out = list(ivf.search_stream([queries[:2], queries[2:]]))
    assert len(out) == 2 and set(out[0][1][0]) == set(ei[0])


def _tiny_http_service(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(50)
    ]
    (tmp_path / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(tmp_path / "vocab.txt")
    )
    cfg = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, ids)["params"]
    corpus = np.random.default_rng(0).standard_normal(
        (64, cfg.hidden_size)
    ).astype(np.float32)
    from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

    return RetrievalService(
        model, params, tok, corpus,
        cfg=ServeConfig(top_k=5, max_batch=8, max_query_len=16),
    )


def test_http_batcher_splits_group_across_batches(tmp_path):
    """A query group larger than max_batch spans several device
    dispatches (the dispatcher's carry path) and reassembles in order."""
    from cocodr_tpu.pipelines.http_serve import Batcher

    svc = _tiny_http_service(tmp_path)  # max_batch=8
    queries = [f"w{i} w{(i * 7) % 50}" for i in range(20)]
    ref_vals, ref_ids = svc.search(queries)  # also pre-compiles

    b = Batcher(svc, window_s=0.01, depth=2)
    try:
        hits = b.submit_many(queries, 5, timeout=120)
        assert len(hits) == 20
        for i, row in enumerate(hits):
            assert [h["id"] for h in row] == list(ref_ids[i])
            np.testing.assert_allclose(
                [h["score"] for h in row], np.asarray(ref_vals[i]),
                rtol=1e-5,
            )
        # 20 queries at max_batch=8 -> at least ceil(20/8)=3 dispatches
        assert b.batches >= 3 and b.requests == 20
    finally:
        b.stop()


def test_http_server_rejects_oversized_body(tmp_path):
    """Content-Length above the cap -> 413 BEFORE the body is read."""
    import http.client
    import threading

    from cocodr_tpu.pipelines.http_serve import make_server

    svc = _tiny_http_service(tmp_path)
    svc.search(["w1"])  # precompile
    server, batcher = make_server(svc, port=0, max_body_bytes=1024)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        big = json.dumps({"query": "w1 " * 4000, "k": 5})
        assert len(big) > 1024
        c.request("POST", "/search", body=big,
                  headers={"Content-Type": "application/json"})
        r = c.getresponse()
        assert r.status == 413
        assert "exceeds" in json.loads(r.read())["error"]
        # a normal request still works afterwards
        c2 = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        c2.request("POST", "/search",
                   body=json.dumps({"query": "w1", "k": 3}))
        r2 = c2.getresponse()
        assert r2.status == 200
        assert len(json.loads(r2.read())["hits"]) == 3
    finally:
        server.shutdown()
        batcher.stop()
        server.server_close()


def test_http_batcher_saturated_queue_returns_503(tmp_path):
    """A full bounded request queue surfaces as QueueFullError -> 503,
    instead of buffering unboundedly."""
    from cocodr_tpu.pipelines.http_serve import Batcher, QueueFullError

    svc = _tiny_http_service(tmp_path)
    svc.search(["w1"])  # precompile

    class Blocked:
        """Service stand-in whose dispatch never returns results."""
        cfg = svc.cfg

        def dispatch(self, texts, k):
            import time as _t
            _t.sleep(30)

        def collect(self, pending):  # pragma: no cover
            raise AssertionError

    b = Batcher(Blocked(), window_s=0.01, depth=1, queue_max=2)
    try:
        import threading

        # fill the queue from a background thread (submits block forever;
        # its own QueueFullError is expected — swallow it in-thread)
        def _fill():
            try:
                b.submit_many(["a"] * 12, 3, timeout=0.1)
            except (QueueFullError, TimeoutError):
                pass

        t = threading.Thread(target=_fill, daemon=True)
        t.start()
        import time as _t

        _t.sleep(0.5)  # let the queue fill and the dispatcher block
        with pytest.raises(QueueFullError):
            b.submit_many(["z"] * 4, 3, timeout=1.0)
    finally:
        b._stop = True  # threads are daemonic; don't join the 30s sleep
