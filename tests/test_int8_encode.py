"""W8A8 int8 PTQ encode path (ops/int8_matmul + BertConfig.matmul_int8).

The int8 path must (a) keep the EXACT same parameter tree as the float
path (checkpoints/converters see one layout), (b) match a numpy
quantization reference op-for-op, and (c) track the float encoder
closely enough that rankings agree (the production gate; the measured
on-device ranking agreement is recorded in docs/performance.md).
Reference analog: Apex-fp16 inference (SURVEY.md N4) — this is the
TPU-native step past it.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.ops.int8_matmul import dense_w8a8

pytestmark = pytest.mark.quick

TINY = dict(
    vocab_size=128, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=2, intermediate_size=64,
    max_position_embeddings=64,
)


def test_dense_w8a8_matches_numpy_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(16, 24).astype(np.float32)
    w = rng.randn(24, 40).astype(np.float32)
    b = rng.randn(40).astype(np.float32)
    got = np.asarray(dense_w8a8(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), out_dtype=jnp.float32))
    sx = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-30) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    sw = np.maximum(np.abs(w).max(axis=0, keepdims=True), 1e-30) / 127.0
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int32)
    ref = (xq @ wq).astype(np.float32) * (sx * sw) + b
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # and it approximates the real matmul to quantization tolerance
    exact = x @ w + b
    err = np.abs(got - exact) / (np.abs(exact).max() + 1e-9)
    assert err.max() < 0.02


def test_int8_encoder_same_param_tree_and_close_embeddings():
    cfg = BertConfig(**TINY)
    cfg8 = dataclasses.replace(cfg, matmul_int8=True)
    m = build_dual_encoder("rdot_nll_condenser", cfg)
    m8 = build_dual_encoder("rdot_nll_condenser", cfg8)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 128, (4, 16)))
    mask = jnp.ones_like(ids)
    p = m.init(jax.random.PRNGKey(0), ids, ids)["params"]
    p8 = m8.init(jax.random.PRNGKey(0), ids, ids)["params"]
    # identical trees: same leaves, same shapes
    flat = jax.tree_util.tree_leaves_with_path(p)
    flat8 = jax.tree_util.tree_leaves_with_path(p8)
    assert [(jax.tree_util.keystr(k), v.shape) for k, v in flat] == \
           [(jax.tree_util.keystr(k), v.shape) for k, v in flat8]
    # the int8 path consumes the FLOAT params (single source of truth)
    e = m.apply({"params": p}, ids, mask, method="body_emb")
    e8 = m8.apply({"params": p}, ids, mask, method="body_emb")
    e, e8 = np.asarray(e, np.float32), np.asarray(e8, np.float32)
    cos = np.sum(e * e8, axis=1) / (
        np.linalg.norm(e, axis=1) * np.linalg.norm(e8, axis=1) + 1e-9
    )
    assert cos.min() > 0.99, cos


def test_int8_encoder_ranking_agreement_small():
    """Rankings from int8 embeddings agree with float rankings on a
    synthetic corpus (the gate that matters for mining/serving)."""
    cfg = BertConfig(**TINY)
    cfg8 = dataclasses.replace(cfg, matmul_int8=True)
    m = build_dual_encoder("rdot_nll_condenser", cfg)
    m8 = build_dual_encoder("rdot_nll_condenser", cfg8)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(5, 128, (64, 16)))
    mask = jnp.ones_like(ids)
    p = m.init(jax.random.PRNGKey(0), ids[:1], ids[:1])["params"]
    docs = np.asarray(
        m.apply({"params": p}, ids, mask, method="body_emb"), np.float32)
    docs8 = np.asarray(
        m8.apply({"params": p}, ids, mask, method="body_emb"), np.float32)
    q_ids = jnp.asarray(rng.randint(5, 128, (8, 12)))
    q_mask = jnp.ones_like(q_ids)
    q = np.asarray(
        m.apply({"params": p}, q_ids, q_mask, method="query_emb"),
        np.float32)
    q8 = np.asarray(
        m8.apply({"params": p}, q_ids, q_mask, method="query_emb"),
        np.float32)
    top = np.argsort(-(q @ docs.T), axis=1)[:, :10]
    top8 = np.argsort(-(q8 @ docs8.T), axis=1)[:, :10]
    overlap = np.mean([
        len(np.intersect1d(top[i], top8[i])) / 10 for i in range(len(top))
    ])
    assert overlap >= 0.9, overlap
