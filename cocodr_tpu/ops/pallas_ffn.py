"""Fused transformer FFN pallas kernel: dense -> activation -> dense in VMEM.

Motivation (device-traced at B=256, S=128, bert-base, one v5e): XLA's FFN
lowering materializes the [tokens, 4H] up-projection through HBM (200MB
bf16 at the bench shape — write + read ~0.5 ms/layer) and serializes the
fp32 LayerNorm chains around it; the FFN output-fusion runs 2.72 ms/layer
against ~1.57 ms of pure matmul. This kernel tiles over tokens and keeps
the 4H intermediate entirely in VMEM: per grid step one [tt, H] token tile
DMAs in, both matmuls run back-to-back on the MXU with f32 accumulation
(activation in f32 — slightly tighter numerics than the XLA bf16 path),
and only the [tt, H] output leaves. Weight blocks use a constant index_map,
so Mosaic's pipeline fetches them once, not per step.

Differentiable via the same recompute-through-XLA VJP pattern as
ops/pallas_attention (one XLA forward extra on the backward pass — what a
remat policy would pay anyway).

Reference: the FFN math mirrors flax nn.Dense pairs `intermediate` /
`ffn_output` in models/bert.py (HF BertIntermediate/BertOutput semantics,
reference ANCE/model/models.py backbones use HF BERT/RoBERTa).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x):
    """erf via Abramowitz-Stegun 7.1.26 (|error| <= 1.5e-7): Mosaic
    implements neither erf nor erfc, but exp lowers fine. The 1.5e-7
    absolute error is ~4 orders below bf16 resolution, so 'exact' gelu
    built on this is indistinguishable from lax.erf at the model dtype."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _act_fn(name: str, in_kernel: bool = True):
    if name == "gelu":
        if in_kernel:
            # 0.5·x·(1+erf(x/√2)) — same function as
            # jax.nn.gelu(approximate=False), erf per _erf_poly (Mosaic
            # lowers neither erf nor erfc)
            return lambda x: 0.5 * x * (1.0 + _erf_poly(x * (2.0 ** -0.5)))
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, act: str):
    x = x_ref[:]  # [tt, H] bf16
    h = jax.lax.dot_general(
        x, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tt, F] f32
    h = _act_fn(act)(h + b1_ref[:].astype(jnp.float32))
    y = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [tt, H] f32
    out_ref[:] = (y + b2_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "token_tile", "interpret")
)
def fused_ffn(x, w1, b1, w2, b2, act: str = "gelu", token_tile: int = 256,
              interpret: bool = False):
    """x [T, H]; w1 [H, F], b1 [F], w2 [F, H], b2 [H] (weights in x.dtype).
    -> [T, H] in x.dtype. T is padded to a token_tile multiple internally.

    VMEM budget at bert-base (H=768, F=3072, tt=256, bf16): w1 + w2 9MB
    (fetched once), x/out tiles ~1.5MB double-buffered, [tt, F] f32
    intermediate 3MB — comfortably under the ~16MB scoped limit."""
    T, H = x.shape
    F = w1.shape[1]
    tt = token_tile
    pad = (-T) % tt
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Tp = T + pad

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, act=act),
        grid=(Tp // tt,),
        in_specs=[
            pl.BlockSpec((tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * Tp * H * F,
            bytes_accessed=2 * Tp * H * x.dtype.itemsize
            + 2 * H * F * x.dtype.itemsize,
            transcendentals=Tp * F,
        ),
    )(x, w1, b1[None, :], w2, b2[None, :])
    return out[:T]


def _ln(x32, scale_ref, bias_ref, eps):
    """f32 LayerNorm over the last dim — the exact formulation of
    models/bert.LayerNorm (mean/var stats, rsqrt(var+eps), scale+bias)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * (
        scale_ref[:].astype(jnp.float32)
    ) + bias_ref[:].astype(jnp.float32)


def _ffn_block_kernel(
    r_ref, s1_ref, c1_ref, w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, c2_ref,
    out_ref, *, act: str, eps: float,
):
    """LN1 -> dense -> act -> dense -> +residual -> LN2, all in VMEM.

    r is the PRE-LN1 residual sum (h + attention out). The residual into
    LN2 is LN1's output u, per the post-LN block structure
    (models/bert.BertLayer). u and the FFN output are added in f32 (the
    unfused path adds in bf16 — strictly coarser rounding of the same sum).
    """
    u32 = _ln(r_ref[:].astype(jnp.float32), s1_ref, c1_ref, eps)  # [tt, H]
    u = u32.astype(out_ref.dtype)
    h = jax.lax.dot_general(
        u, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _act_fn(act)(h + b1_ref[:].astype(jnp.float32))
    y = jax.lax.dot_general(
        h.astype(u.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z32 = u32 + y + b2_ref[:].astype(jnp.float32)
    out_ref[:] = _ln(z32, s2_ref, c2_ref, eps).astype(out_ref.dtype)


def _ffn_block_chunked_kernel(
    r_ref, s1_ref, c1_ref, w1_ref, b1_ref, w2_ref, b2_ref, s2_ref, c2_ref,
    out_ref, u_ref, acc_ref, *, act: str, eps: float, nc: int,
):
    """F-chunked half-layer: grid (token tiles, F chunks), chunk minor.
    Weights stream through VMEM one [H, F/nc] + [F/nc, H] pair per step
    (for models whose full FFN weights exceed VMEM, e.g. bert-large's
    16MB bf16). LN1's output and the f32 accumulator persist in scratch
    across a tile's chunk steps; LN2 runs on the last chunk."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        u32 = _ln(r_ref[:].astype(jnp.float32), s1_ref, c1_ref, eps)
        u_ref[:] = u32.astype(u_ref.dtype)
        acc_ref[:] = u32 + b2_ref[:].astype(jnp.float32)

    h = jax.lax.dot_general(
        u_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _act_fn(act)(h + b1_ref[:].astype(jnp.float32))
    y = jax.lax.dot_general(
        h.astype(u_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += y

    @pl.when(c == nc - 1)
    def _fin():
        out_ref[:] = _ln(acc_ref[:], s2_ref, c2_ref, eps).astype(
            out_ref.dtype
        )


@functools.partial(
    jax.jit,
    static_argnames=("act", "eps", "token_tile", "f_chunks", "interpret"),
)
def fused_ffn_block(r, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale,
                    ln2_bias, act: str = "gelu", eps: float = 1e-12,
                    token_tile: int = 256, f_chunks: int = 1,
                    interpret: bool = False):
    """Whole post-attention half-layer: LN1(r) -> FFN -> +res -> LN2.
    r [T, H] in the compute dtype; LN params f32 [H]. f_chunks=1 keeps the
    weights VMEM-resident (bert-base: 9MB); f_chunks>1 streams them in
    column/row chunks for larger models. Same VMEM budget as fused_ffn
    plus two [tt, H] temporaries."""
    T, H = r.shape
    F = w1.shape[1]
    tt = token_tile
    pad = (-T) % tt
    if pad:
        r = jnp.pad(r, ((0, pad), (0, 0)))
    Tp = T + pad

    args = (r, ln1_scale[None, :], ln1_bias[None, :], w1, b1[None, :], w2,
            b2[None, :], ln2_scale[None, :], ln2_bias[None, :])
    cost = pl.CostEstimate(
        flops=4 * Tp * H * F,
        bytes_accessed=2 * Tp * H * r.dtype.itemsize
        + (Tp // tt if f_chunks > 1 else 1) * 2 * H * F * r.dtype.itemsize,
        transcendentals=Tp * F,
    )
    if f_chunks == 1:
        out = pl.pallas_call(
            functools.partial(_ffn_block_kernel, act=act, eps=eps),
            grid=(Tp // tt,),
            in_specs=[
                pl.BlockSpec((tt, H), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((F, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Tp, H), r.dtype),
            interpret=interpret,
            cost_estimate=cost,
        )(*args)
        return out[:T]

    if F % f_chunks:
        raise ValueError(f"f_chunks {f_chunks} must divide F {F}")
    Fc = F // f_chunks
    out = pl.pallas_call(
        functools.partial(
            _ffn_block_chunked_kernel, act=act, eps=eps, nc=f_chunks
        ),
        grid=(Tp // tt, f_chunks),
        in_specs=[
            pl.BlockSpec((tt, H), lambda i, c: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Fc), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fc), lambda i, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fc, H), lambda i, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tt, H), lambda i, c: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, H), r.dtype),
        scratch_shapes=[
            pltpu.VMEM((tt, H), r.dtype),
            pltpu.VMEM((tt, H), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=cost,
    )(*args)
    return out[:T]


def _quant_rows_f32(x32):
    """[tt, C] f32 -> (int8, [tt, 1] f32 scale). Symmetric per-row maxabs
    (same recipe as ops/int8_matmul.quantize_rows, inlined for VMEM)."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-30)
    s = s / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _ffn_block_kernel_int8(
    r_ref, s1_ref, c1_ref, w1_ref, sw1_ref, b1_ref, w2_ref, sw2_ref, b2_ref,
    s2_ref, c2_ref, out_ref, *, act: str, eps: float,
):
    """W8A8 twin of _ffn_block_kernel: LN1 -> q -> int8 dot -> dq -> act
    -> q -> int8 dot -> dq -> +residual -> LN2, all in VMEM.

    Weights arrive pre-quantized (per-output-channel symmetric int8 +
    f32 scales — half the VMEM of the bf16 weights, so bert-large fits
    resident). Activations are quantized per-token in-register; both
    accumulations are int32 on the MXU, dequantized as int32 * (row-scale
    x col-scale) in f32. LayerNorms, activation, residual and bias adds
    stay f32 — only the two matmuls drop precision."""
    u32 = _ln(r_ref[:].astype(jnp.float32), s1_ref, c1_ref, eps)  # [tt, H]
    uq, su = _quant_rows_f32(u32)
    h = jax.lax.dot_general(
        uq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (su * sw1_ref[:])  # [tt, F] f32
    h = _act_fn(act)(h + b1_ref[:].astype(jnp.float32))
    hq, sh = _quant_rows_f32(h)
    y = jax.lax.dot_general(
        hq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (sh * sw2_ref[:])  # [tt, H] f32
    z32 = u32 + y + b2_ref[:].astype(jnp.float32)
    out_ref[:] = _ln(z32, s2_ref, c2_ref, eps).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "eps", "token_tile", "interpret")
)
def fused_ffn_block_int8(r, ln1_scale, ln1_bias, w1q, sw1, b1, w2q, sw2, b2,
                         ln2_scale, ln2_bias, act: str = "gelu",
                         eps: float = 1e-12, token_tile: int = 256,
                         interpret: bool = False):
    """Post-attention half-layer with W8A8 int8 matmuls. r [T, H] compute
    dtype; w1q [H, F] / w2q [F, H] int8 with per-output-channel f32 scales
    sw1 [F] / sw2 [H]; biases and LN params f32. VMEM at bert-base: 4.5MB
    int8 weights (resident) + [tt, F] f32 intermediate 3MB + tiles."""
    T, H = r.shape
    F = w1q.shape[1]
    tt = token_tile
    pad = (-T) % tt
    if pad:
        r = jnp.pad(r, ((0, pad), (0, 0)))
    Tp = T + pad

    const = lambda i: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_ffn_block_kernel_int8, act=act, eps=eps),
        grid=(Tp // tt,),
        in_specs=[
            pl.BlockSpec((tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, H), r.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * Tp * H * F,
            bytes_accessed=2 * Tp * H * r.dtype.itemsize + 2 * H * F,
            transcendentals=Tp * F,
        ),
    )(r, ln1_scale[None, :], ln1_bias[None, :], w1q, sw1[None, :],
      b1[None, :], w2q, sw2[None, :], b2[None, :], ln2_scale[None, :],
      ln2_bias[None, :])
    return out[:T]


def _xla_ffn_block(r, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale,
                   ln2_bias, act: str, eps: float):
    """Unfused reference of the half-layer, replicating models/bert.py's
    exact op sequence and dtypes (bf16 residual adds, f32 LN stats)."""
    def ln(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)

    u = ln(r, ln1_scale, ln1_bias)
    y = _xla_ffn(u, w1, b1, w2, b2, act)
    return ln(u + y, ln2_scale, ln2_bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def ffn_block(r, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale, ln2_bias,
              act: str, eps: float):
    """Dispatching half-layer (LN1 -> FFN -> +res -> LN2): pallas on TPU
    (weights VMEM-resident when they fit, streamed in F-chunks otherwise —
    bert-large), XLA sequence elsewhere. Backward is the
    recompute-through-XLA VJP (cf. ffn)."""
    w_bytes = (w1.size + w2.size) * w1.dtype.itemsize
    if _tpu_like_backend() and r.shape[0] % 8 == 0:
        F = w1.shape[1]
        if w_bytes <= 12 * 1024 * 1024:
            chunks = 1  # VMEM-resident weights (bert-base: 9MB)
        else:
            # stream <=6MB weight-pair chunks (Mosaic double-buffers them)
            chunks = 2
            while (w_bytes // chunks > 6 * 1024 * 1024 and chunks < 8
                   and F % (chunks * 2) == 0
                   and (F // (chunks * 2)) % 128 == 0):
                chunks *= 2
            if F % chunks or (F // chunks) % 128:
                chunks = 0  # shape doesn't chunk cleanly -> XLA path
        if chunks:
            return fused_ffn_block(
                r, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale, ln2_bias,
                act=act, eps=eps, f_chunks=chunks,
            )
    return _xla_ffn_block(
        r, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale, ln2_bias, act, eps
    )


def ffn_block_int8(r, ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale,
                   ln2_bias, act: str, eps: float):
    """W8A8 half-layer dispatch (inference only — models/bert.py gates it
    behind matmul_int8 + deterministic). Weights are quantized
    per-output-channel here in XLA (one ~9MB pass, amortized across all
    token tiles); activations per-token inside the kernel. Off-TPU the
    same math runs through ops/int8_matmul.dense_w8a8 so CPU tests cover
    the exact quantization semantics the kernel implements."""
    from cocodr_tpu.ops.int8_matmul import dense_w8a8, quantize_cols

    if _tpu_like_backend() and r.shape[0] % 8 == 0:
        w_bytes = w1.size + w2.size  # int8: 1 byte/elem
        if w_bytes <= 12 * 1024 * 1024:
            w1q, sw1 = quantize_cols(w1)
            w2q, sw2 = quantize_cols(w2)
            return fused_ffn_block_int8(
                r, ln1_scale, ln1_bias, w1q, sw1[0], b1, w2q, sw2[0], b2,
                ln2_scale, ln2_bias, act=act, eps=eps,
            )

    def ln(x32, scale, bias):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias

    u32 = ln(r.astype(jnp.float32), ln1_scale, ln1_bias)
    h = _act_fn(act, in_kernel=False)(
        dense_w8a8(u32, w1, b1, out_dtype=jnp.float32)
    )
    y = dense_w8a8(h, w2, b2, out_dtype=jnp.float32)
    return ln(u32 + y, ln2_scale, ln2_bias).astype(r.dtype)


def _ffn_block_fwd(r, s1, c1, w1, b1, w2, b2, s2, c2, act, eps):
    return (
        ffn_block(r, s1, c1, w1, b1, w2, b2, s2, c2, act, eps),
        (r, s1, c1, w1, b1, w2, b2, s2, c2),
    )


def _ffn_block_bwd(act, eps, res, ct):
    _, vjp = jax.vjp(
        lambda *a: _xla_ffn_block(*a, act, eps), *res
    )
    return vjp(ct)


ffn_block.defvjp(_ffn_block_fwd, _ffn_block_bwd)


def _tpu_like_backend() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _xla_ffn(x, w1, b1, w2, b2, act: str):
    """models/bert.py's nn.Dense pair formulation (bf16 compute) — the
    off-TPU / backward-pass reference."""
    h = _act_fn(act, in_kernel=False)(jnp.dot(x, w1) + b1)
    return jnp.dot(h, w2) + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ffn(x, w1, b1, w2, b2, act: str):
    """Dispatching FFN: fused pallas kernel on TPU backends, XLA dense pair
    elsewhere (keeps CPU torch-parity tests on the reference math). All
    operands in the compute dtype (bf16 on TPU).

    The kernel keeps both weight matrices VMEM-resident, so it only
    dispatches when they fit the ~16MB scoped budget with room for tiles
    (bert-base bf16: 9MB -> fused; bert-large bf16: 16MB -> XLA pair)."""
    w_bytes = (w1.size + w2.size) * w1.dtype.itemsize
    if (_tpu_like_backend() and x.shape[0] % 8 == 0
            and w_bytes <= 12 * 1024 * 1024):
        return fused_ffn(x, w1, b1, w2, b2, act=act)
    return _xla_ffn(x, w1, b1, w2, b2, act)


def _ffn_fwd(x, w1, b1, w2, b2, act):
    return ffn(x, w1, b1, w2, b2, act), (x, w1, b1, w2, b2)


def _ffn_bwd(act, res, ct):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x, w1, b1, w2, b2: _xla_ffn(x, w1, b1, w2, b2, act),
        x, w1, b1, w2, b2,
    )
    return vjp(ct)


ffn.defvjp(_ffn_fwd, _ffn_bwd)
