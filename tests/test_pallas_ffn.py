"""Fused FFN kernel: interpret-mode numerics + model-level wiring."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig, BertModel
from cocodr_tpu.ops.pallas_ffn import _xla_ffn, ffn, fused_ffn


def test_fused_ffn_matches_dense_pair_interpret():
    rng = np.random.default_rng(0)
    T, H, F = 48, 128, 512
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(H) * 0.02, jnp.bfloat16)
    got = fused_ffn(x, w1, b1, w2, b2, act="gelu", token_tile=16,
                    interpret=True)
    # f32 reference (the kernel accumulates in f32; the bf16 XLA pair is a
    # coarser rounding of the same math)
    ref = _xla_ffn(*(jnp.asarray(a, jnp.float32)
                     for a in (x, w1, b1, w2, b2)), act="gelu")
    assert got.shape == (T, H) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    # odd T exercises the pad/unpad path
    got_odd = fused_ffn(x[:37], w1, b1, w2, b2, act="gelu", token_tile=16,
                        interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_odd, np.float32),
        np.asarray(got[:37], np.float32), rtol=1e-6, atol=1e-6,
    )


def test_ffn_dispatch_grad_matches_xla():
    """ffn() is differentiable (recompute-through-XLA VJP); off-TPU the
    forward IS the XLA pair, so grads must match jax.grad of _xla_ffn."""
    rng = np.random.default_rng(1)
    T, H, F = 16, 32, 64
    args = [
        jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((H, F)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(F) * 0.02, jnp.float32),
        jnp.asarray(rng.standard_normal((F, H)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(H) * 0.02, jnp.float32),
    ]
    g1 = jax.grad(lambda *a: jnp.sum(ffn(*a, "gelu") ** 2), argnums=(0, 1, 2))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_ffn(*a, "gelu") ** 2), argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_bert_ffn_impl_param_tree_and_forward_agree():
    """ffn_impl='fused' must produce the identical param tree as 'dense'
    and (off-TPU, where both dispatch to the XLA pair) identical outputs."""
    cfg_d = BertConfig.tiny()
    cfg_f = BertConfig.tiny(ffn_impl="fused")
    ids = jnp.asarray([[2, 7, 8, 9, 3, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0]], jnp.int32)
    m_d, m_f = BertModel(cfg_d), BertModel(cfg_f)
    p = m_d.init(jax.random.PRNGKey(0), ids, mask)["params"]
    p_f = m_f.init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(p_f)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_f)):
        assert a.shape == b.shape and a.dtype == b.dtype
    out_d = m_d.apply({"params": p}, ids, mask)
    out_f = m_f.apply({"params": p}, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_d[0]), np.asarray(out_f[0]), rtol=2e-5, atol=2e-5,
    )


def test_fused_ffn_block_matches_unfused_interpret():
    """LN1 -> FFN -> +res -> LN2 kernel vs the unfused op sequence."""
    from cocodr_tpu.ops.pallas_ffn import _xla_ffn_block, fused_ffn_block

    rng = np.random.default_rng(2)
    T, H, F = 48, 128, 512
    r = jnp.asarray(rng.standard_normal((T, H)) * 0.5, jnp.bfloat16)
    s1 = jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32)
    c1 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(H) * 0.02, jnp.bfloat16)
    s2 = jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32)
    c2 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    got = fused_ffn_block(r, s1, c1, w1, b1, w2, b2, s2, c2, act="gelu",
                          eps=1e-12, token_tile=16, interpret=True)
    ref = _xla_ffn_block(r, s1, c1, w1, b1, w2, b2, s2, c2, "gelu", 1e-12)
    assert got.shape == (T, H) and got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    # LN output is O(1), so abs agreement should be bf16-tight
    assert np.abs(np.asarray(got, np.float32)
                  - np.asarray(ref, np.float32)).mean() < 0.01


def test_ffn_block_grad_matches_unfused():
    from cocodr_tpu.ops.pallas_ffn import _xla_ffn_block, ffn_block

    rng = np.random.default_rng(3)
    T, H, F = 16, 32, 64
    args = [
        jnp.asarray(rng.standard_normal((T, H)) * 0.5, jnp.float32),
        jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32),
        jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32),
        jnp.asarray(rng.standard_normal((H, F)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(F) * 0.02, jnp.float32),
        jnp.asarray(rng.standard_normal((F, H)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(H) * 0.02, jnp.float32),
        jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32),
        jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32),
    ]
    g1 = jax.grad(
        lambda *a: jnp.sum(ffn_block(*a, "gelu", 1e-12) ** 2),
        argnums=tuple(range(9)),
    )(*args)
    g2 = jax.grad(
        lambda *a: jnp.sum(_xla_ffn_block(*a, "gelu", 1e-12) ** 2),
        argnums=tuple(range(9)),
    )(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_bert_forward_agrees_fused_vs_dense_deterministic():
    """Full tiny-BERT forward, fused block path vs dense path, off-TPU
    (both lower to the same XLA ops there — must agree to f32 tolerance)."""
    cfg_d = BertConfig.tiny()
    cfg_f = BertConfig.tiny(ffn_impl="fused")
    ids = jnp.asarray([[2, 7, 8, 9, 3, 0], [2, 5, 4, 3, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 0, 0]], jnp.int32)
    m_d, m_f = BertModel(cfg_d), BertModel(cfg_f)
    p = m_d.init(jax.random.PRNGKey(0), ids, mask)["params"]
    out_d = m_d.apply({"params": p}, ids, mask)
    out_f = m_f.apply({"params": p}, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out_d[0]), np.asarray(out_f[0]), rtol=1e-5, atol=1e-5,
    )


def test_fused_ffn_block_chunked_matches_unchunked_interpret():
    """F-chunked (streamed-weights) kernel == resident-weights kernel."""
    from cocodr_tpu.ops.pallas_ffn import fused_ffn_block

    rng = np.random.default_rng(4)
    T, H, F = 32, 128, 512
    r = jnp.asarray(rng.standard_normal((T, H)) * 0.5, jnp.bfloat16)
    s1 = jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32)
    c1 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal(H) * 0.02, jnp.bfloat16)
    s2 = jnp.asarray(1 + 0.1 * rng.standard_normal(H), jnp.float32)
    c2 = jnp.asarray(0.1 * rng.standard_normal(H), jnp.float32)
    base = fused_ffn_block(r, s1, c1, w1, b1, w2, b2, s2, c2, act="gelu",
                           eps=1e-12, token_tile=16, interpret=True)
    for nc in (2, 4):
        got = fused_ffn_block(r, s1, c1, w1, b1, w2, b2, s2, c2, act="gelu",
                              eps=1e-12, token_tile=16, f_chunks=nc,
                              interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(base, np.float32),
            rtol=2e-2, atol=2e-2,
        )
