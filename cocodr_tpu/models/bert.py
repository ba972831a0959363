"""TPU-native flax BERT encoder.

From-scratch implementation of the BERT/RoBERTa-family backbone the reference
gets from HF transformers (reference ANCE/model/models.py:194-232,
COCO/modeling.py:34-131). Design points:

- post-LayerNorm transformer, exact-erf GELU, HF-compatible shapes so the
  published COCO-DR checkpoints convert 1:1 (see models/hf.py).
- layers are stacked with `nn.scan` (single compiled layer body, weights with
  a leading `layer` axis) — fast compile for 12/24-layer towers, and the
  stacked layout makes last-k-layer selection for iDRO a simple slice.
- hidden-state collection is opt-in (`output_hidden_states=True`, HF-style):
  Condenser consumes `hidden_states[skip_from]` (reference
  COCO/modeling.py:70-73); retrieval encode/train paths skip the [L+1,B,S,H]
  stack entirely — it is pure HBM traffic on the hottest op otherwise.
- params in fp32, compute in a configurable dtype (bf16 on TPU); attention
  softmax and LayerNorm statistics accumulate in fp32.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    # 'bert': positions 0..S-1. 'roberta': positions offset past padding_idx,
    # computed from non-pad tokens (HF create_position_ids_from_input_ids).
    position_style: str = "bert"
    # flax-side knobs
    dtype: Dtype = jnp.float32
    remat: bool = False
    # remat granularity: '' = full recompute; 'dots_saveable' keeps matmul
    # outputs resident and recomputes only the cheap elementwise tail
    # (often near no-remat speed at a fraction of the activation memory)
    remat_policy: str = ""
    # attention formulation. 'einsum' (default): XLA path — measured
    # FASTER end-to-end than the fused pallas kernel at BERT shapes
    # (isolated kernel wins ~25%/layer, but in the full model XLA's fusion
    # with the surrounding projections beats it: encode 4.9k vs 4.0k
    # docs/s head-major, 2.6k seq-major — in-VMEM head transposes are
    # Mosaic-slow at D=64). 'fused' opts into the pallas kernel
    # (ops/pallas_attention.attention) for experimentation; it dispatches
    # to XLA automatically off-TPU and under attention-prob dropout.
    attention_impl: str = "einsum"
    # FFN formulation. 'fused' (default): the pallas kernel
    # (ops/pallas_ffn) keeps the [tokens, 4H] intermediate in VMEM instead
    # of materializing ~200MB through HBM per layer (device-traced: the XLA
    # FFN output-fusion runs 2.72 ms/layer vs ~1.57 ms of pure matmul at
    # B=256 S=128; measured end-to-end encode 52.3 -> 45.5 ms/batch, +15%,
    # same-session A/B). Dispatches to the XLA pair automatically off-TPU,
    # for weights beyond the VMEM budget (bert-large), and on the backward
    # pass (recompute-through-XLA VJP). 'dense': always the XLA pair.
    ffn_impl: str = "fused"
    # Opt-in W8A8 int8 FFN blocks (ops/pallas_ffn.fused_ffn_block_int8):
    # dynamic per-token activation scales, per-output-channel weight
    # scales, int32 MXU accumulation. Applied ONLY where int8 measured a
    # win — the fused FFN half-layer, where int8 weights halve the
    # resident VMEM (bert-large FFN fits unstreamed). The attention
    # projections stay bf16: XLA-level W8A8 there measured 0.78x (the
    # quantize passes don't fuse into the dot — docs/performance.md).
    # Embeddings, LayerNorm, softmax and the attention einsums keep the
    # bf16/f32 policy. PTQ inference mode for encode/mine/serve (the
    # reference's Apex-fp16 inference analog, one step further) — NOT
    # for training: no int8 VJP. Takes precedence over ffn_impl.
    matmul_int8: bool = False

    @classmethod
    def roberta_base(cls, **kw) -> "BertConfig":
        return cls(
            vocab_size=50265,
            max_position_embeddings=514,
            type_vocab_size=1,
            layer_norm_eps=1e-5,
            pad_token_id=1,
            position_style="roberta",
            **kw,
        )

    @classmethod
    def roberta_large(cls, **kw) -> "BertConfig":
        return cls(
            vocab_size=50265,
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            max_position_embeddings=514,
            type_vocab_size=1,
            layer_norm_eps=1e-5,
            pad_token_id=1,
            position_style="roberta",
            **kw,
        )

    @classmethod
    def base(cls, **kw) -> "BertConfig":
        return cls(**kw)

    @classmethod
    def large(cls, **kw) -> "BertConfig":
        return cls(
            hidden_size=1024,
            num_hidden_layers=24,
            num_attention_heads=16,
            intermediate_size=4096,
            **kw,
        )

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        """For tests."""
        return cls(
            vocab_size=128,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
            **kw,
        )

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _act(name: str) -> Callable:
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown activation {name}")


def _dense_init(cfg: BertConfig):
    return nn.initializers.normal(stddev=cfg.initializer_range)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics regardless of compute dtype."""

    eps: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class BertEmbeddings(nn.Module):
    cfg: BertConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            embedding_init=_dense_init(cfg),
            param_dtype=jnp.float32,
            dtype=cfg.dtype,
        )
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings,
            cfg.hidden_size,
            embedding_init=_dense_init(cfg),
            param_dtype=jnp.float32,
            dtype=cfg.dtype,
        )
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            embedding_init=_dense_init(cfg),
            param_dtype=jnp.float32,
            dtype=cfg.dtype,
        )
        self.layer_norm = LayerNorm(cfg.layer_norm_eps, cfg.dtype)
        self.dropout = nn.Dropout(cfg.hidden_dropout_prob)

    def __call__(self, input_ids, token_type_ids, position_ids, *, deterministic):
        h = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(position_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        h = self.layer_norm(h)
        return self.dropout(h, deterministic=deterministic)

    def attend(self, h):
        """Tied-decoder logits: h @ word_embeddings.T (for the MLM head)."""
        return self.word_embeddings.attend(h.astype(jnp.float32))


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, h, attn_bias, *, deterministic):
        cfg = self.cfg
        B, S, H = h.shape
        N, D = cfg.num_attention_heads, cfg.head_dim

        def proj(name):
            return nn.DenseGeneral(
                (N, D),
                kernel_init=_dense_init(cfg),
                param_dtype=jnp.float32,
                dtype=cfg.dtype,
                name=name,
            )(h)

        q, k, v = proj("query"), proj("key"), proj("value")
        scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
        if cfg.attention_impl not in ("einsum", "fused"):
            raise ValueError(
                f"attention_impl must be 'einsum' or 'fused', got "
                f"{cfg.attention_impl!r}"
            )
        use_fused = (
            cfg.attention_impl == "fused"
            and S % 8 == 0
            # attention-prob dropout can't run inside the kernel; the
            # dropout path keeps the XLA formulation
            and (deterministic or cfg.attention_probs_dropout_prob == 0.0)
        )
        if use_fused:
            # fused pallas kernel on TPU backends (XLA einsum elsewhere):
            # scores/probs never round-trip HBM. Differentiable via a
            # recompute-through-XLA VJP (ops/pallas_attention.attention).
            from cocodr_tpu.ops.pallas_attention import attention

            ctx = attention(
                q, k, v, attn_bias[:, 0, 0, :], float(1.0 / np.sqrt(D))
            )
        else:
            # fp32 logits + softmax statistics for stability under bf16
            # compute. The softmax DIVISION is deferred to after the
            # context matmul (softmax(s)·V == (exp(s-max)·V) / Σexp):
            # device-traced, XLA otherwise materializes the f32 exp
            # numerator [B, N, S, S] through HBM (100MB/layer at the bench
            # shape) before the bf16 convert — normalizing the small
            # [B, S, N, D] context instead halves that traffic. Dropout
            # commutes with the division (elementwise scale).
            scores = jnp.einsum(
                "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
            )
            scores = scores * scale + attn_bias
            # tagged for the 'no_save:attn_scores,attn_probs' remat policy:
            # the [B, N, S, S] pair is the bulk of the per-layer residual
            # stash; recomputing it in backward costs one QK^T + exp
            scores = checkpoint_name(scores, "attn_scores")
            m = jax.lax.stop_gradient(
                jnp.max(scores, axis=-1, keepdims=True)
            )
            # single consumer of the f32 exp -> the fusion emits only the
            # compute-dtype tensor; the denominator reads that one back
            unnorm = jnp.exp(scores - m).astype(cfg.dtype)
            unnorm = checkpoint_name(unnorm, "attn_probs")
            denom = jnp.sum(
                unnorm.astype(jnp.float32), axis=-1
            )  # [B, N, S]
            unnorm = nn.Dropout(cfg.attention_probs_dropout_prob)(
                unnorm, deterministic=deterministic
            )
            ctx = jnp.einsum("bnqk,bknd->bqnd", unnorm, v)
            ctx = (
                ctx.astype(jnp.float32)
                / jnp.swapaxes(denom, 1, 2)[..., None]
            ).astype(cfg.dtype)
        out = nn.DenseGeneral(
            H,
            axis=(-2, -1),
            kernel_init=_dense_init(cfg),
            param_dtype=jnp.float32,
            dtype=cfg.dtype,
            name="output",
        )(ctx)
        return out


class _DenseParams(nn.Module):
    """Parameter-only twin of nn.Dense (identical tree: kernel/bias) for
    paths that consume the weights inside a fused kernel. Named the same as
    the nn.Dense it replaces, so checkpoints/HF converters see one layout
    regardless of ffn_impl."""

    features_in: int
    features_out: int
    cfg: BertConfig

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", _dense_init(self.cfg),
            (self.features_in, self.features_out), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), jnp.float32
        )
        return k, b


class _LNParams(nn.Module):
    """Parameter-only twin of LayerNorm (identical tree: scale/bias) for
    paths that consume the params inside a fused kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class BertLayer(nn.Module):
    """One post-LN transformer block (also used standalone as Condenser c_head)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, h, attn_bias, *, deterministic):
        cfg = self.cfg
        attn_out = BertSelfAttention(cfg, name="attention")(
            h, attn_bias, deterministic=deterministic
        )
        attn_out = nn.Dropout(cfg.hidden_dropout_prob)(
            attn_out, deterministic=deterministic
        )
        if cfg.ffn_impl not in ("dense", "fused"):
            raise ValueError(
                f"ffn_impl must be 'dense' or 'fused', got {cfg.ffn_impl!r}"
            )
        if cfg.matmul_int8 and not deterministic and (
            cfg.hidden_dropout_prob > 0
        ):
            raise ValueError(
                "matmul_int8 is a PTQ inference mode (no int8 VJP, no "
                "dropout inside the fused block); run deterministic or "
                "zero hidden_dropout_prob"
            )
        if cfg.matmul_int8:
            # W8A8 half-layer kernel (LN1 -> int8 FFN -> +res -> LN2 in
            # VMEM, ops/pallas_ffn.ffn_block_int8) — the int8 twin of the
            # fused bf16 block below. Weights are quantized per call from
            # the shared f32 param tree; int8 halves the resident weight
            # VMEM, so bert-large also stays unstreamed.
            from cocodr_tpu.ops.pallas_ffn import ffn_block_int8

            s1, c1 = _LNParams(cfg.hidden_size, name="attention_layer_norm")()
            w1, b1 = _DenseParams(
                cfg.hidden_size, cfg.intermediate_size, cfg,
                name="intermediate",
            )()
            w2, b2 = _DenseParams(
                cfg.intermediate_size, cfg.hidden_size, cfg,
                name="ffn_output",
            )()
            s2, c2 = _LNParams(cfg.hidden_size, name="output_layer_norm")()
            r = h + attn_out
            B_, S_, H_ = r.shape
            return ffn_block_int8(
                r.reshape(B_ * S_, H_), s1, c1, w1, b1, w2, b2,
                s2, c2, cfg.hidden_act, cfg.layer_norm_eps,
            ).reshape(B_, S_, H_)
        if cfg.ffn_impl == "fused" and (
            deterministic or cfg.hidden_dropout_prob == 0.0
        ):
            # Whole half-layer in one kernel: LN1 -> FFN -> +res -> LN2
            # (ops/pallas_ffn.ffn_block) — both standalone [T, H] LayerNorm
            # HBM round trips disappear. Only when no dropout sits between
            # the FFN output and the residual add (the encode/eval hot
            # path, or dropout-free training); otherwise the semi-fused
            # path below keeps reference dropout placement.
            from cocodr_tpu.ops.pallas_ffn import ffn_block

            s1, c1 = _LNParams(cfg.hidden_size, name="attention_layer_norm")()
            w1, b1 = _DenseParams(
                cfg.hidden_size, cfg.intermediate_size, cfg,
                name="intermediate",
            )()
            w2, b2 = _DenseParams(
                cfg.intermediate_size, cfg.hidden_size, cfg,
                name="ffn_output",
            )()
            s2, c2 = _LNParams(cfg.hidden_size, name="output_layer_norm")()
            r = h + attn_out
            B_, S_, H_ = r.shape
            return ffn_block(
                r.reshape(B_ * S_, H_), s1, c1,
                w1.astype(cfg.dtype), b1.astype(cfg.dtype),
                w2.astype(cfg.dtype), b2.astype(cfg.dtype),
                s2, c2, cfg.hidden_act, cfg.layer_norm_eps,
            ).reshape(B_, S_, H_)
        h = LayerNorm(cfg.layer_norm_eps, cfg.dtype, name="attention_layer_norm")(
            h + attn_out
        )
        if cfg.ffn_impl == "fused":
            from cocodr_tpu.ops.pallas_ffn import ffn as fused_ffn_op

            w1, b1 = _DenseParams(
                cfg.hidden_size, cfg.intermediate_size, cfg,
                name="intermediate",
            )()
            w2, b2 = _DenseParams(
                cfg.intermediate_size, cfg.hidden_size, cfg,
                name="ffn_output",
            )()
            B_, S_, H_ = h.shape
            ffn = fused_ffn_op(
                h.reshape(B_ * S_, H_),
                w1.astype(cfg.dtype), b1.astype(cfg.dtype),
                w2.astype(cfg.dtype), b2.astype(cfg.dtype),
                cfg.hidden_act,
            ).reshape(B_, S_, H_)
        else:
            ffn = nn.Dense(
                cfg.intermediate_size,
                kernel_init=_dense_init(cfg),
                param_dtype=jnp.float32,
                dtype=cfg.dtype,
                name="intermediate",
            )(h)
            ffn = _act(cfg.hidden_act)(ffn)
            ffn = nn.Dense(
                cfg.hidden_size,
                kernel_init=_dense_init(cfg),
                param_dtype=jnp.float32,
                dtype=cfg.dtype,
                name="ffn_output",
            )(ffn)
        ffn = nn.Dropout(cfg.hidden_dropout_prob)(ffn, deterministic=deterministic)
        h = LayerNorm(cfg.layer_norm_eps, cfg.dtype, name="output_layer_norm")(
            h + ffn
        )
        return h


class BertEncoder(nn.Module):
    """Layer stack via nn.scan: params get a leading `layer` axis."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, h, attn_bias, *, deterministic,
                 output_hidden_states: bool = False,
                 capture_layer=None):
        cfg = self.cfg

        class Body(nn.Module):
            cfg: BertConfig

            @nn.compact
            def __call__(self, carry, _):
                if capture_layer is not None:
                    # capture ONE layer's output in the carry ([B, S, H])
                    # instead of collecting the full [L, B, S, H] ys stack
                    # — the iDRO group pass only needs layer L-K, and the
                    # full stack costs ~150MB/tower inside a vjp at the
                    # bench shape. cap initializes to the embeddings
                    # (hidden[0]), so capture_layer=0 needs no iteration.
                    hc, i, cap = carry
                    out = BertLayer(self.cfg, name="layer")(
                        hc, attn_bias, deterministic=deterministic
                    )
                    cap = jnp.where(i == capture_layer - 1, out, cap)
                    return (out, i + 1, cap), None
                out = BertLayer(self.cfg, name="layer")(
                    carry, attn_bias, deterministic=deterministic
                )
                # collecting every layer's output costs a [L, B, S, H] HBM
                # buffer per forward; only Condenser-style consumers ask for
                # it (HF: output_hidden_states) — retrieval encode/train
                # paths keep just the carry
                return out, (out if output_hidden_states else None)

        body = Body
        if cfg.remat:
            policy = None
            if cfg.remat_policy:
                if cfg.remat_policy.startswith("no_save:"):
                    # selective remat: save every residual EXCEPT the named
                    # checkpoint_name tags (e.g. 'attn_scores,attn_probs' —
                    # the [B, N, S, S] tensors), which backward recomputes
                    names = cfg.remat_policy[len("no_save:"):].split(",")
                    policy = (
                        jax.checkpoint_policies
                        .save_anything_except_these_names(*names)
                    )
                else:
                    policy = getattr(
                        jax.checkpoint_policies, cfg.remat_policy, None
                    )
                if policy is None:
                    raise ValueError(
                        f"unknown remat_policy {cfg.remat_policy!r}; valid "
                        f"names are jax.checkpoint_policies attributes, "
                        f"e.g. 'dots_saveable', or 'no_save:<tag,...>'"
                    )
            body = nn.remat(
                Body,
                static_argnums=(),
                prevent_cse=False,
                policy=policy,
            )
        stack = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.num_hidden_layers,
            metadata_params={nn.PARTITION_NAME: "layer"},
        )(cfg, name="layers")
        if capture_layer is not None:
            assert not output_hidden_states
            (last, _, captured), _ = stack((h, jnp.int32(0), h), None)
            return last, captured
        last, all_h = stack(h, None)
        if not output_hidden_states:
            return last, None
        # hidden_states: (embeddings, layer1, ..., layerN) like HF
        hidden_states = jnp.concatenate(
            [h[None], all_h], axis=0
        )  # [L+1, B, S, H]
        return last, hidden_states


class BertPooler(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, h):
        cls = h[:, 0]
        out = nn.Dense(
            self.cfg.hidden_size,
            kernel_init=_dense_init(self.cfg),
            param_dtype=jnp.float32,
            dtype=self.cfg.dtype,
            name="dense",
        )(cls)
        return jnp.tanh(out)


class BertModel(nn.Module):
    """Backbone. Returns (last_hidden_state, hidden_states[L+1,B,S,H], pooled)."""

    cfg: BertConfig
    with_pooler: bool = False

    def setup(self):
        self.embeddings = BertEmbeddings(self.cfg)
        self.encoder = BertEncoder(self.cfg)
        if self.with_pooler:
            self.pooler = BertPooler(self.cfg)

    def __call__(
        self,
        input_ids,
        attention_mask=None,
        token_type_ids=None,
        position_ids=None,
        deterministic: bool = True,
        output_hidden_states: bool = False,
        capture_layer=None,
    ):
        B, S = input_ids.shape
        if S > self.cfg.max_position_embeddings:
            # out-of-range embedding lookups return NaN silently (jnp.take
            # fill mode) — fail loudly at trace time instead
            raise ValueError(
                f"sequence length {S} exceeds max_position_embeddings "
                f"{self.cfg.max_position_embeddings}"
            )
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, S), jnp.int32)
        if position_ids is None:
            if self.cfg.position_style == "roberta":
                # positions count non-pad tokens, offset past padding_idx
                # (HF create_position_ids_from_input_ids)
                not_pad = (input_ids != self.cfg.pad_token_id).astype(jnp.int32)
                position_ids = (
                    jnp.cumsum(not_pad, axis=1) * not_pad + self.cfg.pad_token_id
                )
            else:
                position_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
        h = self.embeddings(
            input_ids, token_type_ids, position_ids, deterministic=deterministic
        )
        attn_bias = make_attention_bias(attention_mask)
        # hidden_states is EITHER the full [L+1, B, S, H] stack
        # (output_hidden_states) OR the single captured [B, S, H] layer
        # output (capture_layer) — the two are mutually exclusive
        last, hidden_states = self.encoder(
            h, attn_bias, deterministic=deterministic,
            output_hidden_states=output_hidden_states,
            capture_layer=capture_layer,
        )
        pooled = self.pooler(last) if self.with_pooler else None
        return last, hidden_states, pooled

    def mlm_logits_from_embed(self, transformed):
        """Tied decoder: logits over the vocabulary from transformed hiddens."""
        return self.embeddings.attend(transformed)


class BertMLMTransform(nn.Module):
    """HF `cls.predictions.transform` (dense + act + LN); decoder is tied."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, h):
        cfg = self.cfg
        h = nn.Dense(
            cfg.hidden_size,
            kernel_init=_dense_init(cfg),
            param_dtype=jnp.float32,
            dtype=cfg.dtype,
            name="dense",
        )(h)
        h = _act(cfg.hidden_act)(h)
        h = LayerNorm(cfg.layer_norm_eps, cfg.dtype, name="layer_norm")(h)
        return h


def make_attention_bias(attention_mask, dtype=jnp.float32):
    """[B,S] 0/1 mask -> additive [B,1,1,S] bias (0 keep, -1e9 drop)."""
    mask = attention_mask[:, None, None, :].astype(dtype)
    return (1.0 - mask) * jnp.asarray(-1e9, dtype)
