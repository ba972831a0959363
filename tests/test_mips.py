"""Exact-MIPS engine vs numpy brute force; distributed merge on 8-dev mesh;
k-means sanity."""
import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cocodr_tpu.ops.kmeans import assign_clusters, kmeans
from cocodr_tpu.ops.mips import mips_topk, mips_topk_chunked_queries
from cocodr_tpu.parallel.topk import sharded_mips_topk


def _brute(q, c, k):
    scores = q @ c.T
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, ids, axis=1)
    return vals, ids


def test_mips_topk_exact():
    rng = np.random.RandomState(0)
    q = rng.randn(13, 24).astype(np.float32)
    c = rng.randn(1000, 24).astype(np.float32)
    vals, ids = mips_topk(jnp.asarray(q), jnp.asarray(c), k=17, tile=128, exact_fp32=True)
    ref_vals, ref_ids = _brute(q, c, 17)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4, rtol=1e-5)
    # ids may differ on exact ties; verify score-equivalence instead
    got = np.take_along_axis(q @ c.T, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got, ref_vals, atol=1e-4, rtol=1e-5)


def test_mips_topk_k_larger_than_tile():
    rng = np.random.RandomState(1)
    q = rng.randn(4, 8).astype(np.float32)
    c = rng.randn(300, 8).astype(np.float32)
    vals, ids = mips_topk(jnp.asarray(q), jnp.asarray(c), k=100, tile=64, exact_fp32=True)
    ref_vals, _ = _brute(q, c, 100)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4, rtol=1e-5)


def test_mips_topk_unaligned_corpus():
    rng = np.random.RandomState(2)
    q = rng.randn(3, 16).astype(np.float32)
    c = rng.randn(777, 16).astype(np.float32)
    vals, ids = mips_topk(jnp.asarray(q), jnp.asarray(c), k=10, tile=256, exact_fp32=True)
    ref_vals, _ = _brute(q, c, 10)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4, rtol=1e-5)
    assert np.asarray(ids).max() < 777


def test_chunked_queries():
    rng = np.random.RandomState(3)
    q = rng.randn(50, 8).astype(np.float32)
    c = rng.randn(200, 8).astype(np.float32)
    vals, ids = mips_topk_chunked_queries(q, c, k=5, q_chunk=16, tile=64, exact_fp32=True)
    ref_vals, _ = _brute(q, c, 5)
    np.testing.assert_allclose(vals, ref_vals, atol=1e-4, rtol=1e-5)


def test_sharded_mips_topk_8dev():
    """Corpus sharded over 8 CPU devices; global merge must equal brute force."""
    rng = np.random.RandomState(4)
    Q, N, D, K = 6, 1024, 16, 20
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = N // 8

    def body(q_rep, c_shard):
        offset = jax.lax.axis_index("data") * shard
        return sharded_mips_topk(q_rep, c_shard, offset, K, "data", tile=64, exact_fp32=True)

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
    )
    vals, ids = f(jnp.asarray(q), jnp.asarray(c))
    ref_vals, _ = _brute(q, c, K)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, atol=1e-4, rtol=1e-5)
    got = np.take_along_axis(q @ c.T, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got, ref_vals, atol=1e-4, rtol=1e-5)


def test_kmeans_separable():
    rng = np.random.RandomState(5)
    centers = np.array([[0, 0], [10, 10], [-10, 10]], np.float32)
    x = np.concatenate(
        [c + 0.3 * rng.randn(50, 2).astype(np.float32) for c in centers]
    )
    cents, ids = kmeans(jnp.asarray(x), 3, n_iter=20, n_redo=3)
    ids = np.asarray(ids)
    # each true blob maps to exactly one cluster
    blobs = [ids[i * 50 : (i + 1) * 50] for i in range(3)]
    labels = [np.bincount(b, minlength=3).argmax() for b in blobs]
    assert len(set(labels)) == 3
    for b, l in zip(blobs, labels):
        assert (b == l).mean() == 1.0
    # assignment fn consistent
    re_ids = np.asarray(assign_clusters(jnp.asarray(x), cents))
    np.testing.assert_array_equal(re_ids, ids)


def test_blockmax_exact_vs_naive():
    """Two-level block-max top-k must equal the naive bf16 sweep exactly
    (same score function, provably no candidate misses)."""
    from cocodr_tpu.ops.mips import mips_topk_blockmax

    rng = np.random.RandomState(7)
    q = rng.randn(9, 32).astype(np.float32)
    c = rng.randn(3000, 32).astype(np.float32)
    v_fast, i_fast = mips_topk_blockmax(
        jnp.asarray(q), jnp.asarray(c), k=25, tile=512, block=8,
        rescore_chunk=4,
    )
    v_ref, i_ref = mips_topk(jnp.asarray(q), jnp.asarray(c), k=25, tile=512)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_ref), atol=1e-5)
    # adversarial: many top items packed into one block
    c2 = c.copy()
    c2[100:108] = q[0] * 10  # 8 best items in one 8-wide block
    v2, i2 = mips_topk_blockmax(
        jnp.asarray(q), jnp.asarray(c2), k=25, tile=512, block=8,
        rescore_chunk=4,
    )
    v2r, _ = mips_topk(jnp.asarray(q), jnp.asarray(c2), k=25, tile=512)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v2r), atol=1e-5)
    assert set(range(100, 108)).issubset(set(np.asarray(i2)[0].tolist()))


def test_blockmax_unaligned():
    from cocodr_tpu.ops.mips import mips_topk_blockmax

    rng = np.random.RandomState(8)
    q = rng.randn(3, 16).astype(np.float32)
    c = rng.randn(777, 16).astype(np.float32)
    v, i = mips_topk_blockmax(
        jnp.asarray(q), jnp.asarray(c), k=15, tile=256, block=8,
        rescore_chunk=2,
    )
    vr, _ = mips_topk(jnp.asarray(q), jnp.asarray(c), k=15, tile=256)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=1e-5)
    assert np.asarray(i).max() < 777


def test_chunked_queries_fast_falls_back_off_tpu():
    """method='fast'/'pallas' require Mosaic; on CPU the dispatcher must
    fall back to the exact XLA block-max path rather than crash."""
    import numpy as np

    from cocodr_tpu.ops.mips import mips_topk_chunked_queries

    rng = np.random.RandomState(3)
    q = rng.randn(8, 16).astype(np.float32)
    c = rng.randn(300, 16).astype(np.float32)
    v, i = mips_topk_chunked_queries(q, c, 5, method="fast")
    s = q @ c.T
    ref = np.argsort(-s, axis=1)[:, :5]
    assert np.array_equal(np.sort(i, 1), np.sort(ref, 1))


def test_clamp_q_chunk_marco_scale():
    """Round-5 rehearsal regression: q_chunk=4096 over the 8.8M-doc MARCO
    corpus compiles a 36GB fine-maxima tensor (f32[17272,4096,64]) and
    OOMs; the scale-aware clamp must route large corpora to the
    measured-good chunk (256 at 8.8M — scripts/bench_marco_scale.py)
    while leaving small corpora untouched."""
    from cocodr_tpu.ops.mips import clamp_q_chunk

    assert clamp_q_chunk(4096, 1_048_576, 768) == 4096
    assert clamp_q_chunk(4096, 8_841_823, 768) == 256
    assert clamp_q_chunk(4096, 16_400_000, 768) == 128
    # never above the requested chunk, never below the 128 floor
    assert clamp_q_chunk(512, 8_841_823, 768) == 256
    assert clamp_q_chunk(4096, 50_000_000, 768) == 128
