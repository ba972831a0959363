"""Dual-encoder retrieval models.

TPU-native rebuild of the reference's model zoo
(reference ANCE/model/models.py:27-445, warmup/model/models.py:27-368,
evaluate/model/models.py:21-466):

- query/document towers share weights by default — `body_emb` delegates to
  `query_emb` (reference ANCE/model/models.py:231-232); the DPR config uses
  two towers (reference warmup/model/models.py:296-320).
- pooling: CLS or masked-mean (`EmbeddingMixin.masked_mean_or_first`,
  reference warmup/model/models.py:46-57).
- projection head: linear(hidden->768) + LayerNorm for the `rdot_nll` family
  (reference ANCE/model/models.py:109-110); the condenser/BERT flavor emits
  the raw CLS (reference ANCE/model/models.py:226-232 — the head params exist
  in checkpoints but are unused on the embedding path).
- multi-chunk long-doc encoding: fold [B, chunks*base_len] into
  [B*chunks, base_len], one embedding per chunk
  (reference ANCE/model/models.py:365-399).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig, BertModel, LayerNorm, _dense_init


def masked_mean(hidden, mask):
    """Mean over non-padding positions. hidden [B,S,H], mask [B,S]."""
    m = mask[..., None].astype(jnp.float32)
    s = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    d = jnp.sum(m, axis=1)
    return s / d


def pool(hidden, mask, method: str):
    if method == "cls":
        return hidden[:, 0]
    if method == "mean":
        return masked_mean(hidden, mask).astype(hidden.dtype)
    raise ValueError(method)  # 'pooler' is handled in DualEncoder._emb


class ProjectionHead(nn.Module):
    """linear(hidden -> out_dim) + LayerNorm (rdot_nll head).

    The reference builds the head norm as `nn.LayerNorm(768)` — torch's
    DEFAULT eps=1e-5, NOT the encoder's config eps (reference
    ANCE/model/models.py:109-110). Published checkpoints were trained with
    1e-5 here even when the backbone uses 1e-12, so the head eps is fixed,
    independent of cfg.layer_norm_eps (caught by
    tests/test_parity_pipeline.py::test_rdot_nll_head_roberta_pipeline...)."""

    cfg: BertConfig
    out_dim: int = 768
    ln_eps: float = 1e-5  # torch nn.LayerNorm default

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.out_dim,
            kernel_init=_dense_init(self.cfg),
            param_dtype=jnp.float32,
            dtype=self.cfg.dtype,
            name="dense",
        )(x)
        return LayerNorm(self.ln_eps, self.cfg.dtype, name="layer_norm")(x)


@dataclasses.dataclass(frozen=True)
class DualEncoderConfig:
    bert: BertConfig
    pooling: str = "cls"  # 'cls' | 'mean' | 'pooler' (tanh pooler, DPR)
    use_head: bool = False  # linear+LN projection after pooling
    head_dim: int = 768
    two_tower: bool = False  # DPR-style separate q/d towers
    chunk_len: int = 0  # >0: multi-chunk body encoding with this base length

    @classmethod
    def rdot_nll(cls, bert: BertConfig, **kw) -> "DualEncoderConfig":
        return cls(bert=bert, pooling="cls", use_head=True, **kw)

    @classmethod
    def rdot_nll_multi_chunk(cls, bert: BertConfig, base_len=512, **kw):
        return cls(
            bert=bert, pooling="cls", use_head=True, chunk_len=base_len, **kw
        )

    @classmethod
    def rdot_nll_condenser(cls, bert: BertConfig, **kw) -> "DualEncoderConfig":
        # BertDot_NLL_LN: raw CLS embedding, no projection head.
        return cls(bert=bert, pooling="cls", use_head=False, **kw)

    @classmethod
    def dpr(cls, bert: BertConfig, **kw) -> "DualEncoderConfig":
        # BiEncoder embeds via the BERT tanh pooler output, not raw CLS
        # (reference warmup/model/models.py:303-308 pooled_output)
        return cls(
            bert=bert, pooling="pooler", use_head=False, two_tower=True, **kw
        )


class DualEncoder(nn.Module):
    """Shared- or two-tower dual encoder producing dense embeddings."""

    cfg: DualEncoderConfig

    def setup(self):
        with_pooler = self.cfg.pooling == "pooler"
        self.encoder = BertModel(self.cfg.bert, with_pooler=with_pooler)
        if self.cfg.two_tower:
            self.doc_encoder = BertModel(self.cfg.bert, with_pooler=with_pooler)
        if self.cfg.use_head:
            self.head = ProjectionHead(self.cfg.bert, self.cfg.head_dim)
            if self.cfg.two_tower:
                self.doc_head = ProjectionHead(self.cfg.bert, self.cfg.head_dim)

    def _emb(self, encoder, head, input_ids, attention_mask, token_type_ids,
             deterministic, capture_layer=None):
        last, hidden, pooled = encoder(
            input_ids,
            attention_mask,
            token_type_ids,
            deterministic=deterministic,
            capture_layer=capture_layer,
        )
        if self.cfg.pooling == "pooler":
            e = pooled
        else:
            e = pool(last, attention_mask, self.cfg.pooling)
        if head is not None:
            e = head(e)
        if capture_layer is not None:
            # hidden = output of layer capture_layer (layer 0 = the
            # embeddings), i.e. the INPUT to layer capture_layer+1 — the
            # restart point for a top-of-stack re-run (idro group pass).
            # Captured in the scan carry, NOT via the [L+1, B, S, H]
            # hidden-state stack (~150MB/tower inside a vjp at B=64).
            return e, hidden
        return e

    def query_emb(self, input_ids, attention_mask, token_type_ids=None,
                  deterministic: bool = True, capture_layer=None):
        head = self.head if self.cfg.use_head else None
        return self._emb(
            self.encoder, head, input_ids, attention_mask, token_type_ids,
            deterministic, capture_layer,
        )

    def body_emb(self, input_ids, attention_mask, token_type_ids=None,
                 deterministic: bool = True, capture_layer=None):
        if self.cfg.two_tower:
            head = self.doc_head if self.cfg.use_head else None
            encoder = self.doc_encoder
        else:
            head = self.head if self.cfg.use_head else None
            encoder = self.encoder
        if self.cfg.chunk_len and input_ids.shape[1] > self.cfg.chunk_len:
            return self._multi_chunk_emb(
                encoder, head, input_ids, attention_mask, deterministic,
                capture_layer,
            )
        return self._emb(
            encoder, head, input_ids, attention_mask, token_type_ids,
            deterministic, capture_layer,
        )

    def _multi_chunk_emb(self, encoder, head, input_ids, attention_mask,
                         deterministic, capture_layer=None):
        """[B, C*L] -> per-chunk embeddings [B, C, D] (chunks folded into batch,
        the layout the reference already uses, ANCE/model/models.py:369-386).
        With capture_layer the captured hiddens stay chunk-folded
        [B*C, L, H] — the layout a top-of-stack re-run consumes."""
        B, full = input_ids.shape
        L = self.cfg.chunk_len
        C = full // L
        ids = input_ids.reshape(B * C, L)
        mask = attention_mask.reshape(B * C, L)
        out = self._emb(
            encoder, head, ids, mask, None, deterministic, capture_layer
        )
        if capture_layer is not None:
            e, hidden = out
            return e.reshape(B, C, -1), hidden
        return out.reshape(B, C, -1)

    def __call__(self, input_ids, attention_mask, deterministic: bool = True):
        # default apply: query embedding (used for init)
        return self.query_emb(
            input_ids, attention_mask, deterministic=deterministic
        )


def chunk_max_score(q_emb, doc_chunk_emb, chunk_mask):
    """Query-doc score for multi-chunk docs: max over chunk scores with
    -9999 bias on padded chunks (reference ANCE/model/models.py:326-357).

    q_emb [B, D]; doc_chunk_emb [B, C, D]; chunk_mask [B, C] (1 = real chunk).
    """
    scores = jnp.einsum(
        "bd,bcd->bc", q_emb, doc_chunk_emb, preferred_element_type=jnp.float32
    )
    bias = (1.0 - chunk_mask.astype(jnp.float32)) * (-9999.0)
    return jnp.max(scores + bias, axis=-1)


# ---------------------------------------------------------------------------
# Registry — parity with MSMarcoConfigDict (reference ANCE/model/models.py:428-445,
# warmup/model/models.py:339-368). Keys are the reference's --model_type values.
MODEL_REGISTRY = {
    "rdot_nll": DualEncoderConfig.rdot_nll,
    "rdot_nll_multi_chunk": DualEncoderConfig.rdot_nll_multi_chunk,
    "rdot_nll_condenser": DualEncoderConfig.rdot_nll_condenser,
    "dpr": DualEncoderConfig.dpr,
}


def build_dual_encoder(model_type: str, bert: BertConfig, **kw) -> DualEncoder:
    if model_type not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model_type {model_type!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return DualEncoder(MODEL_REGISTRY[model_type](bert, **kw))
