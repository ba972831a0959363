"""W8A8 dynamic-PTQ matmul for inference-time encoding.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate (measured
1.63x end-to-end on a chained FFN-shaped microbench including the
quantize/dequantize glue — docs/performance.md). `dense_w8a8` is a
drop-in for the nn.Dense matmul on the encoder's projection/FFN weights:

  - weights: per-OUTPUT-channel symmetric int8 (scale = maxabs(col)/127),
    quantized inline from the f32 params — the extra read/write is ~MBs
    against a ~GFLOP matmul, and keeping a single param tree means
    checkpoints, converters and the bf16 path stay untouched;
  - activations: per-TOKEN symmetric int8 (scale = maxabs(row)/127),
    computed dynamically — the standard W8A8 PTQ recipe for BERT-family
    encoders;
  - accumulation in int32, dequantized as y * (sx outer sw) in f32, bias
    added in f32, result cast back to the compute dtype.

The reference serves fp16 inference (Apex O1, SURVEY.md N4); this is the
TPU-native step past it: an opt-in int8 inference mode analogous to the
int8 search mode (`mips_topk_int8`), gated by `BertConfig.matmul_int8`.
Quality is measured, not assumed: see tests/test_int8_encode.py (cosine
vs bf16) and the ranking-agreement numbers in docs/performance.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray):
    """[T, H] float -> (int8 values, [T, 1] f32 scales). Symmetric
    per-row maxabs; all-zero rows get scale eps (quantize to 0)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
    s = s / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_cols(w: jnp.ndarray):
    """[H, F] float -> (int8 values, [1, F] f32 scales). Symmetric
    per-output-channel maxabs."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-30)
    s = s / 127.0
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def dense_w8a8(x: jnp.ndarray, kernel: jnp.ndarray, bias=None,
               out_dtype=None) -> jnp.ndarray:
    """y = x @ kernel (+ bias) through int8 MXU with dynamic activation
    quantization. x: [..., H]; kernel: [H, F] (any float dtype);
    bias: [F] or None. Returns [..., F] in out_dtype (default x.dtype)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    H = x.shape[-1]
    F = kernel.shape[-1]
    x2 = x.reshape(-1, H)
    xq, sx = quantize_rows(x2)
    wq, sw = quantize_cols(kernel)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, F)
