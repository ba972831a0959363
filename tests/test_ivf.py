"""IVF clustered search: exactness at full probe, recall on clustered
data, block-spanning clusters, and pad-row exclusion (adversarial:
zero pad rows would outscore all-negative corpora if unmasked)."""
import numpy as np
import jax.numpy as jnp
import pytest

from cocodr_tpu.ops.ivf import build_ivf_index, ivf_topk


def _clustered(n, d, n_centers, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, d).astype(np.float32)
    docs = (centers[rng.randint(0, n_centers, n)]
            + scale * rng.randn(n, d)).astype(np.float32)
    return centers, docs, rng


def _numpy_topk(queries, corpus, k):
    s = queries.astype(np.float64) @ corpus.astype(np.float64).T
    idx = np.argsort(-s, axis=1)[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def test_full_probe_is_exact():
    """nprobe == n_clusters scans every block -> must equal brute force."""
    centers, corpus, rng = _clustered(3000, 32, 16)
    queries = (centers[rng.randint(0, 16, 64)]
               + 0.3 * rng.randn(64, 32)).astype(np.float32)
    idx = build_ivf_index(corpus, n_clusters=24, block_size=64,
                          kmeans_iters=8)
    ev, ei = _numpy_topk(queries, corpus, 50)
    v, i = ivf_topk(queries, idx, 50, nprobe=24)
    v, i = np.asarray(v), np.asarray(i)
    # same candidate sets; ordering ties broken arbitrarily
    for q in range(64):
        assert set(i[q]) == set(ei[q])
    np.testing.assert_allclose(v, ev, rtol=1e-4, atol=1e-4)


def test_small_nprobe_recall_on_clustered_data():
    centers, corpus, rng = _clustered(8000, 48, 64)
    queries = (centers[rng.randint(0, 64, 64)]
               + 0.3 * rng.randn(64, 48)).astype(np.float32)
    idx = build_ivf_index(corpus, n_clusters=64, block_size=128,
                          kmeans_iters=10)
    _, ei = _numpy_topk(queries, corpus, 20)
    _, i = ivf_topk(queries, idx, 20, nprobe=8)
    i = np.asarray(i)
    recall = np.mean([len(set(i[q]) & set(ei[q])) / 20 for q in range(64)])
    assert recall > 0.9, recall


def test_oversized_cluster_spans_blocks():
    """One dominant cluster >> block_size: its docs must all stay
    findable (block splitting, not truncation)."""
    rng = np.random.RandomState(1)
    center = rng.randn(16).astype(np.float32)
    big = (center + 0.05 * rng.randn(500, 16)).astype(np.float32)
    rest = rng.randn(100, 16).astype(np.float32) * 0.01
    corpus = np.concatenate([big, rest])
    idx = build_ivf_index(corpus, n_clusters=4, block_size=64,
                          kmeans_iters=10)
    assert idx.n_blocks >= 8  # 500-doc cluster alone needs 8 blocks
    queries = center[None, :] + 0.05 * rng.randn(4, 16).astype(np.float32)
    _, ei = _numpy_topk(queries, corpus, 100)
    _, i = ivf_topk(queries, idx, 100, nprobe=4)
    i = np.asarray(i)
    for q in range(4):
        assert set(i[q]) == set(ei[q])


def test_pad_rows_never_returned():
    """All-negative corpus scores: a zero pad row scores 0 and would win
    every query if the -inf mask were missing."""
    rng = np.random.RandomState(2)
    d = 8
    corpus = -np.abs(rng.randn(100, d)).astype(np.float32) - 0.5
    queries = np.abs(rng.randn(10, d)).astype(np.float32) + 0.5
    # tiny blocks force pad rows in nearly every block
    idx = build_ivf_index(corpus, n_clusters=16, block_size=32,
                          kmeans_iters=8)
    v, i = ivf_topk(queries, idx, 10, nprobe=16)
    v, i = np.asarray(v), np.asarray(i)
    assert (i >= 0).all() and (i < 100).all()
    assert (v < 0).all()  # every returned score is a real (negative) one


def test_underfilled_probe_pads_with_minus_one():
    """k larger than the number of docs actually probed: tail ids are -1."""
    rng = np.random.RandomState(3)
    corpus = rng.randn(60, 8).astype(np.float32)
    queries = rng.randn(5, 8).astype(np.float32)
    idx = build_ivf_index(corpus, n_clusters=12, block_size=8,
                          kmeans_iters=8)
    v, i = ivf_topk(queries, idx, 50, nprobe=1)
    v, i = np.asarray(v), np.asarray(i)
    assert (i == -1).any()
    assert np.isneginf(v[i == -1]).all()
    real = i[i >= 0]
    assert (real < 60).all()


def test_search_topk_dispatches_ivf():
    """parallel.topk.search_topk(method='ivf') builds an index inline and
    at full probe equals its own exact path."""
    from cocodr_tpu.parallel.topk import search_topk

    centers, corpus, rng = _clustered(2000, 32, 8, seed=5)
    queries = (centers[rng.randint(0, 8, 16)]
               + 0.3 * rng.randn(16, 32)).astype(np.float32)
    _, ei = _numpy_topk(queries, corpus, 10)
    _, i = search_topk(queries, corpus, 10, method="ivf",
                       ivf_nprobe=10_000)  # clamped to n_clusters
    i = np.asarray(i)
    # search_topk's ivf path scores in bf16 (the TPU regime), so the
    # top-10 boundary can differ from the f64 oracle by a rounding tie —
    # demand near-exact overlap, not set equality
    overlap = np.mean([len(set(i[q]) & set(ei[q])) / 10 for q in range(16)])
    assert overlap >= 0.95, overlap


def test_index_covers_every_doc_once():
    _, corpus, _ = _clustered(1000, 16, 8, seed=4)
    idx = build_ivf_index(corpus, n_clusters=8, block_size=64)
    ids = np.asarray(idx.block_ids)
    real = ids[ids >= 0]
    assert sorted(real.tolist()) == list(range(1000))
    # stored vectors match the corpus rows they claim to be
    blocks = np.asarray(idx.blocks)
    flat_ids = ids.reshape(-1)
    flat_vecs = blocks.reshape(-1, 16)
    sel = flat_ids >= 0
    np.testing.assert_allclose(flat_vecs[sel], corpus[flat_ids[sel]])


def test_empty_query_batch():
    """Zero queries must return empty [0, k] arrays, not crash (the exact
    paths already handle empty batches)."""
    from cocodr_tpu.ops.ivf import ivf_topk_chunked

    _, corpus, _ = _clustered(500, 16, 4)
    idx = build_ivf_index(corpus, n_clusters=4, block_size=64,
                          kmeans_iters=4)
    v, i = ivf_topk(np.zeros((0, 16), np.float32), idx, 10)
    assert v.shape == (0, 10) and i.shape == (0, 10)
    v, i = ivf_topk_chunked(np.zeros((0, 16), np.float32), idx, 10)
    assert v.shape == (0, 10) and i.shape == (0, 10)


def test_recall_on_unnormalized_embeddings():
    """MIPS recall on UNNORMALIZED vectors (the rdot regime): docs carry a
    norm component so high-IP docs are not the L2-nearest ones — the
    regime where assigning by L2 argmin strands high-norm docs. With
    IP-metric assignment, small-nprobe recall must stay high."""
    rng = np.random.RandomState(5)
    n, d = 8000, 48
    centers = rng.randn(32, d).astype(np.float32)
    docs = (centers[rng.randint(0, 32, n)]
            + 0.3 * rng.randn(n, d)).astype(np.float32)
    # heavy-tailed norms: a random 5% of docs scaled up 3-6x
    hot = rng.rand(n) < 0.05
    docs[hot] *= rng.uniform(3.0, 6.0, size=(hot.sum(), 1)).astype(np.float32)
    queries = (centers[rng.randint(0, 32, 64)]
               + 0.3 * rng.randn(64, d)).astype(np.float32)
    idx = build_ivf_index(docs, n_clusters=64, block_size=128,
                          kmeans_iters=10)
    _, ei = _numpy_topk(queries, docs, 20)
    _, i = ivf_topk(queries, idx, 20, nprobe=8)
    i = np.asarray(i)
    recall = np.mean([len(set(i[q]) & set(ei[q])) / 20 for q in range(64)])
    assert recall > 0.85, recall


def test_slab_boundaries_match_single_call():
    """Task-slab chunking (bounded HBM per _score_tasks call) must produce
    the same results as an effectively unbounded slab."""
    import cocodr_tpu.ops.ivf as ivf_mod

    centers, corpus, rng = _clustered(4000, 32, 24)
    queries = (centers[rng.randint(0, 24, 96)]
               + 0.3 * rng.randn(96, 32)).astype(np.float32)
    idx = build_ivf_index(corpus, n_clusters=24, block_size=64,
                          kmeans_iters=6)
    v1, i1 = ivf_topk(queries, idx, 25, nprobe=24)
    orig = ivf_mod._task_slab
    ivf_mod._task_slab = lambda *a, **k: 64  # force many slabs
    try:
        v2, i2 = ivf_topk(queries, idx, 25, nprobe=24)
    finally:
        ivf_mod._task_slab = orig
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
