"""Fused short-sequence attention kernel (encode/serving hot path).

At BERT shapes (S=128, D=64) XLA's attention materializes the [B, N, S, S]
fp32 score tensor in HBM between the QK^T matmul, the softmax, and the PV
matmul — measured 2.6 ms per layer at B=256 (≈5 TFLOP/s effective), which
makes attention ~60% of encode wall time while contributing ~2% of the
FLOPs. Flash attention (jax.experimental.pallas.ops.tpu.flash_attention)
is tuned for long sequences and is SLOWER here (4.2 ms fwd, 9.0 ms bwd —
block-processing overhead dominates at S=128).

This kernel processes one batch element per grid step with ALL heads
resident in VMEM: QK^T (fp32 accumulation), bias + softmax (fp32, VPU),
and PV run back-to-back with no HBM round trip for scores/probs. DMA per
step is just q/k/v in + ctx out (~780 KB at BERT-base shapes).

VERDICT of the measurements (kept for the record): the isolated kernel
beats isolated XLA attention (~2.85 vs ~3.77 ms/layer at B=256, g=2), but
END-TO-END in the full encoder it LOSES — 4.0k docs/s (head-major entry:
two HBM transposes per layer) and 2.6k docs/s (seq-major entry: Mosaic
in-VMEM head transposes are slow at D=64) vs 4.9k docs/s for XLA, whose
fusion with the surrounding QKV/output projections is worth more than
keeping scores in VMEM. BertConfig.attention_impl therefore defaults to
'einsum'; 'fused' remains available for experimentation and for shapes
where the tradeoff flips (longer S, larger D). Numerics match the XLA
path to bf16 tolerance (fp32 softmax in both); the custom VJP recomputes
through the XLA formulation, so the op is fully differentiable.

Replaces nothing in the reference — torch/HF attention is cuDNN's problem
there (reference warmup/model/models.py:272-293 uses HF BertModel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                 g: int):
    # q/k/v: [g, S, N, D] bf16 — the DenseGeneral-native layout; the head
    # transpose happens HERE in VMEM instead of costing an HBM round trip
    # per layer outside. bias: FULL [B, S] f32 array resident in VMEM (a
    # [1, S] block would violate the (8, 128) sublane constraint), indexed
    # by grid position; o mirrors the input layout. Scores [g*N, S, S]
    # live and die in VMEM.
    b0 = pl.program_id(0) * g
    G, S, N, D = q_ref.shape
    q = jnp.swapaxes(q_ref[:], 1, 2).reshape(G * N, S, D)
    k = jnp.swapaxes(k_ref[:], 1, 2).reshape(G * N, S, D)
    v = jnp.swapaxes(v_ref[:], 1, 2).reshape(G * N, S, D)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [G*N, S, S]
    bias = bias_ref[pl.ds(b0, g)]  # [g, S]
    bias = jnp.broadcast_to(
        bias[:, None, None, :], (G, N, 1, S)
    ).reshape(G * N, 1, S)
    scores = scores * scale + bias
    # fp32 softmax on the VPU (matches models/bert.py numerics)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
    ctx = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype).reshape(G, N, S, D)
    o_ref[:] = jnp.swapaxes(ctx, 1, 2)


def fused_attention_seq_major(q, k, v, bias, scale, g: int = 2,
                              interpret: bool = False):
    """fused attention on [B, S, N, D] (DenseGeneral-native) tensors.

    Avoids the two [B,S,N,D]<->[B,N,S,D] HBM transposes per layer that made
    the head-major entry a net LOSS inside the full model (encode 4.9k ->
    4.0k docs/s): the head transpose runs on VMEM-resident tiles instead.
    """
    B, S, N, D = q.shape
    while B % g:
        g //= 2
    g = max(g, 1)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, g=g),
        grid=(B // g,),
        in_specs=[
            pl.BlockSpec((g, S, N, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, S, N, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, S, N, D), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, S, N, D), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, N, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * S * S * D,
            bytes_accessed=8 * B * N * S * D,
            transcendentals=B * N * S * S,
        ),
    )(q, k, v, jnp.asarray(bias, jnp.float32))


def _tpu_like_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _xla_attention_seq(q, k, v, bias, scale):
    """models/bert.py's einsum formulation on [B, S, N, D] tensors."""
    scores = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def attention(q, k, v, bias, scale: float):
    """Dispatching attention: fused pallas kernel on TPU backends, XLA
    einsum elsewhere (bit-identical CPU math keeps the torch-parity tests
    exact). q/k/v [B, S, N, D] — the DenseGeneral-native layout, no HBM
    transposes; bias [B, S] f32 additive (0 real, -1e9 pad).
    Differentiable: the backward pass recomputes through the XLA
    formulation and takes its VJP — the same recompute a remat policy
    would do, so training pays one XLA forward extra while the live
    forward runs the fused kernel."""
    if _tpu_like_backend() and q.shape[1] % 8 == 0:
        return fused_attention_seq_major(q, k, v, bias, scale)
    return _xla_attention_seq(q, k, v, bias, scale)


def _attention_fwd(q, k, v, bias, scale):
    return attention(q, k, v, bias, scale), (q, k, v, bias)


def _attention_bwd(scale, res, ct):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_attention_seq(q, k, v, bias, scale), q, k, v
    )
    dq, dk, dv = vjp(ct)
    return dq, dk, dv, jnp.zeros_like(bias)


attention.defvjp(_attention_fwd, _attention_bwd)
