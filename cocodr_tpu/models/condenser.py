"""Condenser / coCondenser pretraining heads (the COCO stage).

Rebuild of reference COCO/modeling.py:34-248:
- backbone MLM (BERT) with all hidden states;
- a 2-layer "c_head" of fresh transformer blocks over
  [CLS(last layer), hidden(skip_from)[1:]] (modeling.py:70-79);
- head MLM loss through the (tied-decoder) LM head; `late_mlm` adds the
  backbone's own MLM loss (modeling.py:82-83);
- coCondenser adds the global contrastive loss over span CLS embeddings
  (losses/contrastive.py).

Checkpoints: HF saves the backbone in transformers format and the c_head
separately as `model.pt` (modeling.py:123-131) so finetuning can load the
bare encoder; the converters here honor that split.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cocodr_tpu.losses.contrastive import co_contrastive_loss
from cocodr_tpu.models.bert import (
    BertConfig,
    BertLayer,
    BertMLMTransform,
    BertModel,
    make_attention_bias,
)

IGNORE_INDEX = -100


def mlm_cross_entropy(logits, labels):
    """Mean CE over positions with label != -100 (HF CrossEntropyLoss)."""
    vocab = logits.shape[-1]
    logits = logits.reshape(-1, vocab).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    lsm = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(lsm, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


class CondenserForPretraining(nn.Module):
    cfg: BertConfig
    n_head_layers: int = 2
    skip_from: int = 6
    late_mlm: bool = False
    # MLM decoder sparsity: only ~15% of positions carry labels (the WWM
    # collator caps masking at round(0.15*len) per sequence), yet the dense
    # formulation materializes [B*S, vocab] f32 logits (2GB at B=128
    # S=128). Gather masked rows (padded to this fraction of B*S) before
    # the decoder matmul — identical loss/gradients while the budget
    # covers every masked position (0.25 >= the collator's 0.15 cap);
    # device-measured 515 -> 672 spans/s on the COCO step (B=128). Set >= 1.0 to
    # force the dense path.
    mlm_budget_frac: float = 0.25

    def setup(self):
        self.bert = BertModel(self.cfg)
        self.mlm_transform = BertMLMTransform(self.cfg)
        self.decoder_bias = self.param(
            "decoder_bias", nn.initializers.zeros, (self.cfg.vocab_size,),
            jnp.float32,
        )
        self.c_head = [
            BertLayer(self.cfg, name=f"c_head_{i}")
            for i in range(self.n_head_layers)
        ]

    def mlm_logits(self, hiddens):
        h = self.mlm_transform(hiddens)
        logits = self.bert.mlm_logits_from_embed(h)
        return logits + self.decoder_bias

    def _mlm_budget(self, labels):
        """(order, l_sel) gathering masked positions into the padded
        budget, or None when the budget doesn't beat the dense path."""
        T = labels.shape[0] * labels.shape[1]
        budget = -(-int(T * self.mlm_budget_frac) // 128) * 128
        if budget >= T:
            return None
        flat_l = labels.reshape(T)
        # stable argsort over the not-masked flag: masked positions first,
        # in original order; unfilled budget rows keep IGNORE_INDEX labels
        order = jnp.argsort(flat_l == IGNORE_INDEX, stable=True)[:budget]
        return order, jnp.take(flat_l, order, axis=0)

    def mlm_loss(self, hiddens, labels):
        """mlm_cross_entropy(mlm_logits(hiddens), labels), computed over a
        gathered budget of masked positions (see mlm_budget_frac)."""
        sel = self._mlm_budget(labels)
        if sel is None:
            return mlm_cross_entropy(self.mlm_logits(hiddens), labels)
        order, l_sel = sel
        H = hiddens.shape[-1]
        h_sel = jnp.take(hiddens.reshape(-1, H), order, axis=0)
        return mlm_cross_entropy(self.mlm_logits(h_sel), l_sel)

    def mlm_loss_pair(self, h_head, h_late, labels):
        """(head_loss, late_loss) sharing one budget gather and ONE
        decoder matmul: the head and late_mlm losses use the same
        mlm_transform + tied decoder, so their [budget, H] selections
        stack into a single [2*budget, vocab] logits matmul — identical
        values/grads to two mlm_loss calls, half the kernel dispatches."""
        sel = self._mlm_budget(labels)
        if sel is None:
            return self.mlm_loss(h_head, labels), self.mlm_loss(
                h_late, labels
            )
        order, l_sel = sel
        H = h_head.shape[-1]
        both = jnp.concatenate(
            [
                jnp.take(h_head.reshape(-1, H), order, axis=0),
                jnp.take(h_late.reshape(-1, H), order, axis=0),
            ],
            axis=0,
        )
        logits = self.mlm_logits(both)
        budget = order.shape[0]
        return (
            mlm_cross_entropy(logits[:budget], l_sel),
            mlm_cross_entropy(logits[budget:], l_sel),
        )

    def encode(self, input_ids, attention_mask, deterministic=True):
        last, hidden_states, _ = self.bert(
            input_ids, attention_mask, deterministic=deterministic,
            output_hidden_states=True,
        )
        return last, hidden_states

    def head_hiddens(self, last, hidden_states, attention_mask,
                     deterministic=True):
        cls_h = last[:, :1]
        skip_h = hidden_states[self.skip_from]
        h = jnp.concatenate([cls_h, skip_h[:, 1:]], axis=1)
        bias = make_attention_bias(attention_mask)
        for layer in self.c_head:
            h = layer(h, bias, deterministic=deterministic)
        return h

    def cls_emb(self, input_ids, attention_mask, deterministic: bool = True):
        """Backbone CLS only — the grad-cache first pass (cheap, no head)."""
        last, _ = self.encode(input_ids, attention_mask, deterministic)
        return last[:, 0]

    def __call__(self, input_ids, attention_mask, labels,
                 deterministic: bool = True):
        """Returns (loss, aux dict with cls embeddings + sub-losses)."""
        last, hidden_states = self.encode(
            input_ids, attention_mask, deterministic
        )
        h = self.head_hiddens(last, hidden_states, attention_mask, deterministic)
        if self.late_mlm:
            head_loss, late_loss = self.mlm_loss_pair(h, last, labels)
            loss = head_loss + late_loss
        else:
            head_loss = self.mlm_loss(h, labels)
            loss = head_loss
            late_loss = jnp.zeros(())
        aux = {
            "cls": last[:, 0],
            "head_mlm_loss": head_loss,
            "backbone_mlm_loss": late_loss,
        }
        return loss, aux


class CoCondenserForPretraining(CondenserForPretraining):
    """Condenser + span contrastive loss (reference COCO/modeling.py:163-248).

    The batch interleaves 2 spans per document; the contrastive candidates
    are all spans across the mesh (axis_name) or the local batch.
    """

    def loss_with_contrastive(
        self,
        input_ids,
        attention_mask,
        labels,
        axis_name: Optional[str] = None,
        deterministic: bool = True,
    ):
        mlm_total, aux = self(
            input_ids, attention_mask, labels, deterministic=deterministic
        )
        co_loss = co_contrastive_loss(aux["cls"], axis_name=axis_name)
        aux["co_loss"] = co_loss
        return mlm_total + co_loss, aux


# ---------------------------------------------------------------------------
# HF interop


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _bert_layer_params_from_torch(sd: Mapping, prefix: str, cfg: BertConfig):
    """One un-stacked BertLayer (c_head) from HF BertLayer naming."""
    H, N, D = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim

    def g(name):
        return _np(sd[prefix + name])

    return {
        "attention": {
            "query": {
                "kernel": g("attention.self.query.weight").T.reshape(H, N, D),
                "bias": g("attention.self.query.bias").reshape(N, D),
            },
            "key": {
                "kernel": g("attention.self.key.weight").T.reshape(H, N, D),
                "bias": g("attention.self.key.bias").reshape(N, D),
            },
            "value": {
                "kernel": g("attention.self.value.weight").T.reshape(H, N, D),
                "bias": g("attention.self.value.bias").reshape(N, D),
            },
            "output": {
                "kernel": g("attention.output.dense.weight").T.reshape(N, D, H),
                "bias": g("attention.output.dense.bias"),
            },
        },
        "attention_layer_norm": {
            "scale": g("attention.output.LayerNorm.weight"),
            "bias": g("attention.output.LayerNorm.bias"),
        },
        "intermediate": {
            "kernel": g("intermediate.dense.weight").T,
            "bias": g("intermediate.dense.bias"),
        },
        "ffn_output": {
            "kernel": g("output.dense.weight").T,
            "bias": g("output.dense.bias"),
        },
        "output_layer_norm": {
            "scale": g("output.LayerNorm.weight"),
            "bias": g("output.LayerNorm.bias"),
        },
    }


def _bert_layer_params_to_torch(layer: Mapping, prefix: str, cfg: BertConfig):
    """Inverse of _bert_layer_params_from_torch: one flax BertLayer ->
    HF BertLayer-named numpy arrays under `prefix`."""
    H = cfg.hidden_size
    attn = layer["attention"]
    out = {}
    for name in ("query", "key", "value"):
        out[f"{prefix}attention.self.{name}.weight"] = (
            np.asarray(attn[name]["kernel"]).reshape(H, H).T.copy()
        )
        out[f"{prefix}attention.self.{name}.bias"] = np.asarray(
            attn[name]["bias"]
        ).reshape(H)
    out[f"{prefix}attention.output.dense.weight"] = (
        np.asarray(attn["output"]["kernel"]).reshape(H, H).T.copy()
    )
    out[f"{prefix}attention.output.dense.bias"] = np.asarray(
        attn["output"]["bias"]
    )
    out[f"{prefix}attention.output.LayerNorm.weight"] = np.asarray(
        layer["attention_layer_norm"]["scale"]
    )
    out[f"{prefix}attention.output.LayerNorm.bias"] = np.asarray(
        layer["attention_layer_norm"]["bias"]
    )
    out[f"{prefix}intermediate.dense.weight"] = np.asarray(
        layer["intermediate"]["kernel"]
    ).T.copy()
    out[f"{prefix}intermediate.dense.bias"] = np.asarray(
        layer["intermediate"]["bias"]
    )
    out[f"{prefix}output.dense.weight"] = np.asarray(
        layer["ffn_output"]["kernel"]
    ).T.copy()
    out[f"{prefix}output.dense.bias"] = np.asarray(layer["ffn_output"]["bias"])
    out[f"{prefix}output.LayerNorm.weight"] = np.asarray(
        layer["output_layer_norm"]["scale"]
    )
    out[f"{prefix}output.LayerNorm.bias"] = np.asarray(
        layer["output_layer_norm"]["bias"]
    )
    return out


def condenser_params_to_torch(params: Mapping, cfg: BertConfig):
    """flax CondenserForPretraining params -> (backbone_sd, c_head_sd):
    backbone_sd is the HF BertModel + MLM-head state dict, c_head_sd the
    split `model.pt` with `c_head.{i}.*` naming the reference finetune
    loaders expect (reference COCO/modeling.py:123-131). Inverse of
    condenser_params_from_torch."""
    from cocodr_tpu.models.hf import (
        bert_params_to_torch,
        mlm_transform_params_to_torch,
    )

    backbone = bert_params_to_torch(params["bert"], cfg)
    backbone.update(
        mlm_transform_params_to_torch(
            params["mlm_transform"], params["decoder_bias"]
        )
    )
    head = {}
    i = 0
    while f"c_head_{i}" in params:
        head.update(
            _bert_layer_params_to_torch(params[f"c_head_{i}"],
                                        f"c_head.{i}.", cfg)
        )
        i += 1
    return backbone, head


def condenser_params_from_torch(
    mlm_state_dict: Mapping,
    cfg: BertConfig,
    n_head_layers: int,
    head_state_dict: Optional[Mapping] = None,
) -> Dict:
    """HF BertForMaskedLM state_dict (+ optional model.pt c_head dict) ->
    flax params for CondenserForPretraining."""
    from cocodr_tpu.models.hf import (
        bert_params_from_torch,
        mlm_transform_params_from_torch,
    )

    params: Dict = {"bert": bert_params_from_torch(mlm_state_dict, cfg)}
    transform, decoder_bias = mlm_transform_params_from_torch(mlm_state_dict)
    params["mlm_transform"] = transform
    params["decoder_bias"] = decoder_bias
    if head_state_dict is not None:
        sd = {k: _np(v) for k, v in head_state_dict.items()}
        for i in range(n_head_layers):
            params[f"c_head_{i}"] = _bert_layer_params_from_torch(
                sd, f"c_head.{i}.", cfg
            )
    return params
