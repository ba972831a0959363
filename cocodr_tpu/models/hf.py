"""HF-checkpoint interop: torch BERT state_dict <-> cocodr_tpu flax params.

The parity targets live on the HuggingFace hub (`OpenMatch/cocodr-base` etc.,
reference README.md:72-91), so lossless weight conversion both ways is a
framework requirement (reference saves checkpoints via `save_pretrained`,
ANCE/drivers/run_ann.py:376-403, plus the Condenser split-head `model.pt`,
COCO/modeling.py:123-131).

Layout notes:
- torch nn.Linear stores weight as [out, in]; flax Dense kernels are [in, out].
- our encoder stacks layers via nn.scan, so every per-layer tensor gains a
  leading `layer` axis.
- attention projections are DenseGeneral: query/key/value kernels are
  [H, N, D], output kernel is [N, D, H].
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from cocodr_tpu.models.bert import BertConfig


def _np(t):
    # torch tensor or numpy array -> numpy fp32
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def config_from_hf(hf_config) -> BertConfig:
    g = (
        hf_config.get
        if isinstance(hf_config, Mapping)
        else lambda k, d=None: getattr(hf_config, k, d)
    )
    model_type = g("model_type", "bert")
    return BertConfig(
        position_style="roberta" if model_type == "roberta" else "bert",
        vocab_size=g("vocab_size"),
        hidden_size=g("hidden_size"),
        num_hidden_layers=g("num_hidden_layers"),
        num_attention_heads=g("num_attention_heads"),
        intermediate_size=g("intermediate_size"),
        hidden_act=g("hidden_act", "gelu"),
        hidden_dropout_prob=g("hidden_dropout_prob", 0.1),
        attention_probs_dropout_prob=g("attention_probs_dropout_prob", 0.1),
        max_position_embeddings=g("max_position_embeddings", 512),
        type_vocab_size=g("type_vocab_size", 2),
        layer_norm_eps=g("layer_norm_eps", 1e-12),
        pad_token_id=g("pad_token_id", 0),
    )


def _strip_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip a leading 'bert.' / 'roberta.' / 'lm.' wrapper prefix if present."""
    for prefix in ("bert.", "roberta."):
        if any(k.startswith(prefix + "embeddings.") for k in sd):
            return {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in sd.items()
            }
    return sd


def bert_params_from_torch(
    state_dict: Mapping[str, "np.ndarray"], cfg: BertConfig
) -> Dict:
    """HF BertModel state_dict -> flax params for models.bert.BertModel."""
    sd = _strip_prefix({k: _np(v) for k, v in state_dict.items()})
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    N, D = cfg.num_attention_heads, cfg.head_dim

    def stack(fmt: str):
        return np.stack([sd[fmt.format(i)] for i in range(L)])

    def lin_k(fmt: str):  # [L, out, in] -> [L, in, out]
        return np.transpose(stack(fmt), (0, 2, 1))

    params = {
        "embeddings": {
            "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]
            },
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"]
            },
            "layer_norm": {
                "scale": sd["embeddings.LayerNorm.weight"],
                "bias": sd["embeddings.LayerNorm.bias"],
            },
        },
        "encoder": {
            "layers": {
                "layer": {
                    "attention": {
                        "query": {
                            "kernel": lin_k(
                                "encoder.layer.{}.attention.self.query.weight"
                            ).reshape(L, H, N, D),
                            "bias": stack(
                                "encoder.layer.{}.attention.self.query.bias"
                            ).reshape(L, N, D),
                        },
                        "key": {
                            "kernel": lin_k(
                                "encoder.layer.{}.attention.self.key.weight"
                            ).reshape(L, H, N, D),
                            "bias": stack(
                                "encoder.layer.{}.attention.self.key.bias"
                            ).reshape(L, N, D),
                        },
                        "value": {
                            "kernel": lin_k(
                                "encoder.layer.{}.attention.self.value.weight"
                            ).reshape(L, H, N, D),
                            "bias": stack(
                                "encoder.layer.{}.attention.self.value.bias"
                            ).reshape(L, N, D),
                        },
                        "output": {
                            "kernel": lin_k(
                                "encoder.layer.{}.attention.output.dense.weight"
                            ).reshape(L, N, D, H),
                            "bias": stack(
                                "encoder.layer.{}.attention.output.dense.bias"
                            ),
                        },
                    },
                    "attention_layer_norm": {
                        "scale": stack(
                            "encoder.layer.{}.attention.output.LayerNorm.weight"
                        ),
                        "bias": stack(
                            "encoder.layer.{}.attention.output.LayerNorm.bias"
                        ),
                    },
                    "intermediate": {
                        "kernel": lin_k("encoder.layer.{}.intermediate.dense.weight"),
                        "bias": stack("encoder.layer.{}.intermediate.dense.bias"),
                    },
                    "ffn_output": {
                        "kernel": lin_k("encoder.layer.{}.output.dense.weight"),
                        "bias": stack("encoder.layer.{}.output.dense.bias"),
                    },
                    "output_layer_norm": {
                        "scale": stack("encoder.layer.{}.output.LayerNorm.weight"),
                        "bias": stack("encoder.layer.{}.output.LayerNorm.bias"),
                    },
                }
            }
        },
    }
    if "pooler.dense.weight" in sd:
        params["pooler"] = {
            "dense": {
                "kernel": sd["pooler.dense.weight"].T,
                "bias": sd["pooler.dense.bias"],
            }
        }
    return params


def mlm_transform_params_from_torch(state_dict: Mapping) -> Dict:
    """HF MLM head transform -> flax BertMLMTransform params.

    Handles both namings: BERT `cls.predictions.transform.{dense,LayerNorm}`
    + `cls.predictions.bias`, and RoBERTa `lm_head.{dense,layer_norm}` +
    `lm_head.bias`. Returns (transform_params, decoder_bias).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}

    def find(*suffixes):
        for suffix in suffixes:
            for k, v in sd.items():
                if k.endswith(suffix):
                    return v
        raise KeyError(suffixes)

    transform = {
        "dense": {
            "kernel": find(
                "predictions.transform.dense.weight", "lm_head.dense.weight"
            ).T,
            "bias": find(
                "predictions.transform.dense.bias", "lm_head.dense.bias"
            ),
        },
        "layer_norm": {
            "scale": find(
                "predictions.transform.LayerNorm.weight",
                "lm_head.layer_norm.weight",
            ),
            "bias": find(
                "predictions.transform.LayerNorm.bias",
                "lm_head.layer_norm.bias",
            ),
        },
    }
    decoder_bias = find("predictions.bias", "lm_head.bias")
    return transform, decoder_bias


def bert_params_to_torch(params: Dict, cfg: BertConfig) -> Dict[str, np.ndarray]:
    """flax params -> HF BertModel state_dict (numpy; caller wraps in torch)."""
    L, H = cfg.num_hidden_layers, cfg.hidden_size
    p = params
    emb = p["embeddings"]
    enc = p["encoder"]["layers"]["layer"]
    out = {
        "embeddings.word_embeddings.weight": np.asarray(
            emb["word_embeddings"]["embedding"]
        ),
        "embeddings.position_embeddings.weight": np.asarray(
            emb["position_embeddings"]["embedding"]
        ),
        "embeddings.token_type_embeddings.weight": np.asarray(
            emb["token_type_embeddings"]["embedding"]
        ),
        "embeddings.LayerNorm.weight": np.asarray(emb["layer_norm"]["scale"]),
        "embeddings.LayerNorm.bias": np.asarray(emb["layer_norm"]["bias"]),
    }
    attn = enc["attention"]
    for i in range(L):
        pre = f"encoder.layer.{i}"
        for name in ("query", "key", "value"):
            out[f"{pre}.attention.self.{name}.weight"] = (
                np.asarray(attn[name]["kernel"][i]).reshape(H, H).T
            )
            out[f"{pre}.attention.self.{name}.bias"] = np.asarray(
                attn[name]["bias"][i]
            ).reshape(H)
        out[f"{pre}.attention.output.dense.weight"] = (
            np.asarray(attn["output"]["kernel"][i]).reshape(H, H).T
        )
        out[f"{pre}.attention.output.dense.bias"] = np.asarray(
            attn["output"]["bias"][i]
        )
        out[f"{pre}.attention.output.LayerNorm.weight"] = np.asarray(
            enc["attention_layer_norm"]["scale"][i]
        )
        out[f"{pre}.attention.output.LayerNorm.bias"] = np.asarray(
            enc["attention_layer_norm"]["bias"][i]
        )
        out[f"{pre}.intermediate.dense.weight"] = np.asarray(
            enc["intermediate"]["kernel"][i]
        ).T
        out[f"{pre}.intermediate.dense.bias"] = np.asarray(
            enc["intermediate"]["bias"][i]
        )
        out[f"{pre}.output.dense.weight"] = np.asarray(
            enc["ffn_output"]["kernel"][i]
        ).T
        out[f"{pre}.output.dense.bias"] = np.asarray(enc["ffn_output"]["bias"][i])
        out[f"{pre}.output.LayerNorm.weight"] = np.asarray(
            enc["output_layer_norm"]["scale"][i]
        )
        out[f"{pre}.output.LayerNorm.bias"] = np.asarray(
            enc["output_layer_norm"]["bias"][i]
        )
    if "pooler" in p:
        out["pooler.dense.weight"] = np.asarray(p["pooler"]["dense"]["kernel"]).T
        out["pooler.dense.bias"] = np.asarray(p["pooler"]["dense"]["bias"])
    return out


def dual_encoder_params_from_torch(
    state_dict: Mapping, cfg: BertConfig, use_head: bool = False
) -> Dict:
    """Full dual-encoder checkpoint (RobertaDot_NLL_LN / BertDot_NLL_LN,
    reference ANCE/model/models.py:118-232) -> flax DualEncoder params.

    The backbone lives under 'roberta.'/'bert.'; the projection head is
    `embeddingHead` (Linear) + `norm` (LayerNorm) — present in all published
    checkpoints, used on the embedding path only by the rdot_nll family.

    DPR BiEncoder checkpoints carry two towers under `question_model.` /
    `ctx_model.` (reference warmup/model/models.py:296-320) -> encoder +
    doc_encoder.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    if any(k.startswith("question_model.") for k in sd):
        def tower(prefix):
            return bert_params_from_torch(
                {k[len(prefix):]: v for k, v in sd.items()
                 if k.startswith(prefix)},
                cfg,
            )

        return {
            "encoder": tower("question_model."),
            "doc_encoder": tower("ctx_model."),
        }
    params: Dict = {"encoder": bert_params_from_torch(sd, cfg)}
    if use_head:
        params["head"] = {
            "dense": {
                "kernel": sd["embeddingHead.weight"].T,
                "bias": sd["embeddingHead.bias"],
            },
            "layer_norm": {
                "scale": sd["norm.weight"],
                "bias": sd["norm.bias"],
            },
        }
    return params


def dpr_params_to_torch(params: Mapping, cfg: BertConfig) -> Dict[str, np.ndarray]:
    """flax two-tower DualEncoder -> BiEncoder state-dict naming
    (question_model.* / ctx_model.*, reference warmup/model/models.py:
    296-320). Inverse of the DPR branch above."""
    out = {}
    for prefix, key in (("question_model.", "encoder"),
                        ("ctx_model.", "doc_encoder")):
        for k, v in bert_params_to_torch(params[key], cfg).items():
            out[prefix + k] = v
    return out


def dual_head_params_to_torch(head_params: Mapping) -> Dict[str, np.ndarray]:
    """flax ProjectionHead params -> the reference's checkpoint naming:
    `embeddingHead.{weight,bias}` (Linear) + `norm.{weight,bias}` (LayerNorm)
    at the state-dict top level (reference ANCE/model/models.py:109-110).
    Inverse of dual_encoder_params_from_torch's head branch."""
    return {
        "embeddingHead.weight": np.asarray(
            head_params["dense"]["kernel"]
        ).T.copy(),
        "embeddingHead.bias": np.asarray(head_params["dense"]["bias"]),
        "norm.weight": np.asarray(head_params["layer_norm"]["scale"]),
        "norm.bias": np.asarray(head_params["layer_norm"]["bias"]),
    }


def mlm_transform_params_to_torch(
    transform: Mapping, decoder_bias
) -> Dict[str, np.ndarray]:
    """flax BertMLMTransform params -> HF BERT MLM-head naming
    (cls.predictions.transform.* + cls.predictions.bias). Inverse of
    mlm_transform_params_from_torch (BERT flavor)."""
    return {
        "cls.predictions.transform.dense.weight": np.asarray(
            transform["dense"]["kernel"]
        ).T.copy(),
        "cls.predictions.transform.dense.bias": np.asarray(
            transform["dense"]["bias"]
        ),
        "cls.predictions.transform.LayerNorm.weight": np.asarray(
            transform["layer_norm"]["scale"]
        ),
        "cls.predictions.transform.LayerNorm.bias": np.asarray(
            transform["layer_norm"]["bias"]
        ),
        "cls.predictions.bias": np.asarray(decoder_bias),
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a pytorch_model.bin or model.safetensors into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _np(v) for k, v in sd.items()}
