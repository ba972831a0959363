"""Pallas fused block-max sweep (interpret mode on CPU) vs the XLA path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.ops.mips import mips_topk
from cocodr_tpu.ops.pallas_mips import (
    blockmax_sweep_pallas,
    mips_topk_blockmax_pallas,
)


def test_pallas_sweep_matches_xla():
    rng = np.random.RandomState(0)
    Q, N, D, L = 16, 512, 32, 8
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    bm = blockmax_sweep_pallas(
        jnp.asarray(q), jnp.asarray(c), tile=128, block=L, q_tile=8, interpret=True
    )
    # reference: bf16 matmul + blockmax
    s = (q.astype(np.float32) @ c.T.astype(np.float32))
    s_bf = np.asarray(
        jnp.matmul(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(c, jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    )
    ref = s_bf.reshape(Q, N // L, L).max(-1)
    np.testing.assert_allclose(np.asarray(bm), ref, atol=1e-5, rtol=1e-5)


def test_pallas_topk_matches_naive():
    rng = np.random.RandomState(1)
    Q, N, D = 8, 700, 16  # unaligned N exercises padding + extra block
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    v, i = mips_topk_blockmax_pallas(
        jnp.asarray(q), jnp.asarray(c), k=20, tile=128, block=8, q_tile=8,
        interpret=True,
    )
    v_ref, _ = mips_topk(jnp.asarray(q), jnp.asarray(c), k=20, tile=128)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_ref), atol=2e-5, rtol=1e-5
    )
    assert np.asarray(i).max() < N and np.asarray(i).min() >= 0


def test_pallas_topk_packed_block():
    rng = np.random.RandomState(2)
    Q, N, D = 4, 256, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    c[64:72] = q[0] * 10  # 8 best docs for q0 in one block
    v, i = mips_topk_blockmax_pallas(
        jnp.asarray(q), jnp.asarray(c), k=10, tile=64, block=8, q_tile=4,
        interpret=True,
    )
    assert set(range(64, 72)).issubset(set(np.asarray(i)[0].tolist()))


def test_hierarchical_matches_naive():
    from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

    rng = np.random.RandomState(5)
    Q, N, D = 8, 700, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    v, i = mips_topk_hierarchical(
        jnp.asarray(q), jnp.asarray(c), k=20, tile=128, fine=4, coarse=4,
        q_tile=8, interpret=True,
    )
    v_ref, _ = mips_topk(jnp.asarray(q), jnp.asarray(c), k=20, tile=128)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_ref), atol=2e-5, rtol=1e-5
    )
    assert np.asarray(i).min() >= 0 and np.asarray(i).max() < N


def test_hierarchical_packed_block():
    from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

    rng = np.random.RandomState(6)
    Q, N, D = 4, 256, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    c[64:72] = q[0] * 10  # 8 best docs for q0 packed into 2 fine blocks
    v, i = mips_topk_hierarchical(
        jnp.asarray(q), jnp.asarray(c), k=10, tile=64, fine=4, coarse=4,
        q_tile=4, interpret=True,
    )
    assert set(range(64, 72)).issubset(set(np.asarray(i)[0].tolist()))


def test_fast_mode_block_argmax():
    """Every id returned by the fast mode is the argmax of its fine block,
    values are the true scores with 3 mantissa LSBs cleared, and recall@k
    vs exact search is high."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_fast

    rng = np.random.RandomState(7)
    Q, N, D, K, FINE = 8, 1000, 32, 20, 4
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    v, i = mips_topk_fast(
        jnp.asarray(q), jnp.asarray(c), k=K, tile=128, fine=FINE, coarse=4,
        q_tile=8, interpret=True,
    )
    v, i = np.asarray(v), np.asarray(i)
    s = np.asarray(
        jnp.matmul(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(c, jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    )
    # block-argmax property + value = score with 3 LSBs cleared
    for qi in range(Q):
        for j in range(K):
            doc = i[qi, j]
            blk = doc // FINE
            rows = s[qi, blk * FINE : min((blk + 1) * FINE, N)]
            assert s[qi, doc] == rows.max()
            # value = block max with 3 LSBs cleared, up to accumulation-
            # order ULPs between dot_general and the reference matmul
            assert np.isclose(v[qi, j], s[qi, doc], rtol=1e-5), (
                v[qi, j], s[qi, doc])
    # recall vs exact
    exact_ids = np.argsort(-s, axis=1)[:, :K]
    rec = np.mean(
        [len(set(i[qi]) & set(exact_ids[qi])) / K for qi in range(Q)]
    )
    assert rec >= 0.9, rec


def test_fast_mode_nonaligned_tail():
    """Pad rows (replicated last row) must never produce out-of-range ids."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_fast

    rng = np.random.RandomState(8)
    Q, N, D = 4, 130, 16  # 130 % (4*4) != 0
    q = rng.randn(Q, D).astype(np.float32)
    c = -np.abs(rng.randn(N, D)).astype(np.float32)  # all-negative scores
    v, i = mips_topk_fast(
        jnp.asarray(q), jnp.asarray(np.abs(c)), k=8, tile=64, fine=4,
        coarse=4, q_tile=4, interpret=True,
    )
    i = np.asarray(i)
    assert i.min() >= 0 and i.max() < N
    assert len(set(i[0].tolist())) == 8  # no duplicate docs


def test_int8_mode():
    """int8 quantized search: integer argmax packing is exactly monotone,
    ids are in range, and recall vs f32 exact search is high."""
    from cocodr_tpu.ops.pallas_mips import (
        mips_topk_int8,
        quantize_corpus_int8,
    )

    rng = np.random.RandomState(9)
    Q, N, D, K = 8, 1000, 32, 20
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    c_i8, ds = quantize_corpus_int8(jnp.asarray(c))
    # quantization roundtrip sanity
    np.testing.assert_allclose(
        np.asarray(c_i8, np.float32) * np.asarray(ds), c, atol=0.05
    )
    v, i = mips_topk_int8(
        jnp.asarray(q), c_i8, ds, k=K, tile=128, fine=4, coarse=4,
        q_tile=8, interpret=True,
    )
    v, i = np.asarray(v), np.asarray(i)
    assert i.min() >= 0 and i.max() < N
    s = q @ c.T
    exact_ids = np.argsort(-s, axis=1)[:, :K]
    rec = np.mean(
        [len(set(i[qi]) & set(exact_ids[qi])) / K for qi in range(Q)]
    )
    assert rec >= 0.85, rec
    # approx scores close to true scores of the returned docs
    got = np.take_along_axis(s, i, axis=1)
    np.testing.assert_allclose(v, got, rtol=0.05, atol=0.1)
    # ranking within the returned list is by quantized score, descending
    assert np.all(np.diff(v, axis=1) <= 1e-6)


def test_hierarchical_super_level_matches_naive():
    """3-level selection (super over coarse) is exact, including with a
    replicate-padded boundary block (odd N) and padded super columns."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

    rng = np.random.RandomState(7)
    Q, N, D = 8, 3000, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    c[2996:] = q[3] * 10  # best docs for q3 in the boundary (padded) block
    v, i = mips_topk_hierarchical(
        jnp.asarray(q), jnp.asarray(c), k=4, tile=256, fine=4, coarse=4,
        q_tile=8, supers=4, interpret=True,
    )
    v_ref, _ = mips_topk(jnp.asarray(q), jnp.asarray(c), k=4, tile=256)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_ref), atol=2e-5, rtol=1e-5
    )
    assert np.asarray(i).min() >= 0 and np.asarray(i).max() < N
    assert set(range(2996, 3000)) == set(np.asarray(i)[3].tolist())


def test_fused_attention_matches_xla():
    """ops/pallas_attention: kernel == XLA formulation (interpret mode),
    both layouts, fwd + grad through the custom VJP."""
    from cocodr_tpu.ops.pallas_attention import (
        _xla_attention_seq,
        attention,
        fused_attention_seq_major,
    )

    B, N, S, D = 4, 2, 16, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, N, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, N, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, N, D), jnp.float32)
    bias = jnp.zeros((B, S), jnp.float32).at[:, 12:].set(-1e9)
    ref = _xla_attention_seq(q, k, v, bias, 0.3)
    out = fused_attention_seq_major(q, k, v, bias, 0.3, g=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :12]),
                               np.asarray(ref[:, :12]), atol=1e-5)
    # dispatcher (XLA fallback on CPU) + custom-VJP grad path
    g1 = jax.grad(lambda q: jnp.sum(attention(q, k, v, bias, 0.3)))(q)
    g2 = jax.grad(lambda q: jnp.sum(_xla_attention_seq(q, k, v, bias, 0.3)))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_hierarchical_multiple_query_tiles_super_rows():
    """The 3D super-rows fine-maxima layout indexes rows as
    sup*Qp + q (Qp = padded query count). With MULTIPLE query tiles the
    sweep writes each (i, j) block at a (super, q_tile) offset pair; a
    mis-indexed flat gather would read another query's maxima. Q spans 3
    q-tiles here (one partial) to pin the cross-tile indexing."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

    rng = np.random.RandomState(11)
    Q, N, D = 20, 4096, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    v, i = mips_topk_hierarchical(
        jnp.asarray(q), jnp.asarray(c), k=4, tile=256, fine=4, coarse=4,
        q_tile=8, supers=4, interpret=True,
    )
    v_ref, i_ref = mips_topk(jnp.asarray(q), jnp.asarray(c), k=4, tile=256)
    np.testing.assert_allclose(
        np.asarray(v), np.asarray(v_ref), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def _np_topk(q, c, k):
    """bf16-consistent reference scores + exact top-k (ties: lowest id)."""
    s = np.asarray(
        jnp.matmul(
            jnp.asarray(q, jnp.bfloat16),
            jnp.asarray(c, jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    )
    ids = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, ids, axis=1), ids


def test_exact2_matches_naive():
    from cocodr_tpu.ops.pallas_mips import mips_topk_exact2

    rng = np.random.RandomState(0)
    Q, N, D, k = 16, 2048, 32, 10
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    v, i = mips_topk_exact2(
        jnp.asarray(q), jnp.asarray(c), k, tile=256, cb=16, supers=4,
        q_tile=8, interpret=True,
    )
    rv, ri = _np_topk(q, c, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_allclose(np.asarray(v), rv, rtol=1e-5)


def test_exact2_boundary_block():
    """N not a multiple of the coarse block: replicate-padded copies of the
    last row must neither duplicate nor displace real docs."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_exact2

    rng = np.random.RandomState(1)
    Q, N, D, k = 8, 2048 - 37, 32, 8
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    # make the LAST row a strong match so its pad copies hit the top
    c[-1] = q[0] * 3.0
    v, i = mips_topk_exact2(
        jnp.asarray(q), jnp.asarray(c), k, tile=256, cb=16, supers=4,
        q_tile=8, interpret=True,
    )
    rv, ri = _np_topk(q, c, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    assert len(set(np.asarray(i)[0].tolist())) == k  # no duplicate docs


def test_exact2_two_docs_same_block():
    """Two top-k docs sharing one coarse block exercises the second-max
    flag + rescore path (the argmax certificate alone would miss one)."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_exact2

    rng = np.random.RandomState(2)
    Q, N, D, k = 4, 2048, 32, 5
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    # rows 100 and 101 are both strong for every query (same 16-row block)
    for col in range(Q):
        c[100] += q[col] * 2.0
        c[101] += q[col] * 1.9
    v, i = mips_topk_exact2(
        jnp.asarray(q), jnp.asarray(c), k, tile=256, cb=16, supers=4,
        q_tile=8, interpret=True,
    )
    rv, ri = _np_topk(q, c, k)
    np.testing.assert_array_equal(np.asarray(i), ri)
    for col in range(Q):
        assert 100 in np.asarray(i)[col] and 101 in np.asarray(i)[col]


def test_exact2_overflow_falls_back():
    """More flagged blocks than the rescore budget -> ok=False on device
    -> host fallback to the classic path; result still exact."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_exact2

    rng = np.random.RandomState(3)
    Q, N, D, k = 4, 2048, 16, 8
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32) * 0.01
    # 8 blocks each holding TWO strong docs -> 7 flags > rescore_blocks=2.
    # 0.05-spaced multipliers keep every planted score distinct after the
    # bf16 cast (relative step ~0.4%), so numpy's tie order is unambiguous.
    strong = q[0] / np.linalg.norm(q[0])
    for b in range(8):
        c[b * 256] = strong * (3.0 + 0.1 * b)
        c[b * 256 + 1] = strong * (2.95 + 0.1 * b)
    v, i = mips_topk_exact2(
        jnp.asarray(q), jnp.asarray(c), k, tile=256, cb=16, supers=4,
        rescore_blocks=2, q_tile=8, interpret=True,
    )
    rv, ri = _np_topk(q, c, k)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_exact2_small_corpus_delegates():
    from cocodr_tpu.ops.pallas_mips import mips_topk_exact2

    rng = np.random.RandomState(4)
    q = rng.randn(4, 16).astype(np.float32)
    c = rng.randn(96, 16).astype(np.float32)
    v, i = mips_topk_exact2(
        jnp.asarray(q), jnp.asarray(c), 5, tile=256, cb=16, supers=4,
        q_tile=8, interpret=True,
    )
    rv, ri = _np_topk(q, c, 5)
    np.testing.assert_array_equal(np.asarray(i), ri)


def test_hierarchical_prepadded_n_real_matches_unpadded():
    """Round-5 MARCO rehearsal fix: a caller that pre-pads the corpus to
    kernel alignment (replicating the last row) and passes n_real must get
    EXACTLY the unpadded results — no pad-row ids, identical scores. This
    is what lets mine() hold one device-resident bf16 corpus instead of
    paying the kernel's own full-corpus pad copy (13.5GB at 8.8M docs)."""
    from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

    rng = np.random.RandomState(11)
    Q, N, D = 8, 700, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    # make the LAST row a strong hit for q0: its pad replicas would also
    # score high, so any pad leakage shows up as duplicate ids
    c[-1] = q[0] * 10
    pad = (-N) % 128
    c_p = np.concatenate([c, np.broadcast_to(c[-1:], (pad, D))])
    kw = dict(k=20, tile=128, fine=4, coarse=4, q_tile=8, interpret=True)
    v_ref, i_ref = mips_topk_hierarchical(jnp.asarray(q), jnp.asarray(c),
                                          **kw)
    v, i = mips_topk_hierarchical(jnp.asarray(q), jnp.asarray(c_p),
                                  n_real=N, **kw)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               atol=2e-5, rtol=1e-5)
    assert np.asarray(i).max() < N
    for row in np.asarray(i):
        assert len(set(row.tolist())) == len(row)  # no pad-replica dupes


def test_fast_prepadded_n_real_matches_unpadded():
    from cocodr_tpu.ops.pallas_mips import mips_topk_fast

    rng = np.random.RandomState(12)
    Q, N, D = 4, 700, 16
    q = rng.randn(Q, D).astype(np.float32)
    c = rng.randn(N, D).astype(np.float32)
    c[-1] = q[0] * 10
    pad = (-N) % 128
    c_p = np.concatenate([c, np.broadcast_to(c[-1:], (pad, D))])
    kw = dict(k=10, tile=128, fine=4, coarse=4, q_tile=4, interpret=True)
    v_ref, i_ref = mips_topk_fast(jnp.asarray(q), jnp.asarray(c), **kw)
    v, i = mips_topk_fast(jnp.asarray(q), jnp.asarray(c_p), n_real=N, **kw)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               atol=2e-5, rtol=1e-5)
