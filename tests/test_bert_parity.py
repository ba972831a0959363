"""Numerical parity of the flax BERT against torch (HF transformers).

The published COCO-DR checkpoints are torch; the converter + flax encoder must
reproduce torch BertModel outputs to fp32 tolerance, which is the foundation
of quality parity (reference targets README.md:72-91).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig, BertModel
from cocodr_tpu.models.hf import (
    bert_params_from_torch,
    bert_params_to_torch,
    config_from_hf,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_config():
    return transformers.BertConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = transformers.BertModel(_tiny_hf_config())
    model.eval()
    return model


def _inputs(B=4, S=16, vocab=99, seed=1):
    rng = np.random.RandomState(seed)
    input_ids = rng.randint(1, vocab, size=(B, S)).astype(np.int32)
    attention_mask = np.ones((B, S), np.int32)
    attention_mask[0, S // 2 :] = 0
    attention_mask[2, 3:] = 0
    token_type_ids = np.zeros((B, S), np.int32)
    token_type_ids[:, S // 2 :] = 1
    return input_ids, attention_mask, token_type_ids


def test_forward_matches_torch(torch_model):
    cfg = config_from_hf(torch_model.config)
    params = bert_params_from_torch(torch_model.state_dict(), cfg)
    flax_model = BertModel(cfg, with_pooler=True)

    input_ids, mask, types = _inputs()
    last, hidden, pooled = flax_model.apply(
        {"params": params},
        jnp.asarray(input_ids),
        jnp.asarray(mask),
        jnp.asarray(types),
        output_hidden_states=True,
    )
    with torch.no_grad():
        out = torch_model(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
            output_hidden_states=True,
        )
    ref_last = out.last_hidden_state.numpy()
    # padded positions attend freely in torch too, but their outputs are
    # garbage-in-garbage-out identically; compare everything.
    np.testing.assert_allclose(np.asarray(last), ref_last, atol=2e-5, rtol=1e-4)
    # all hidden states (embeddings + each layer)
    assert hidden.shape[0] == cfg.num_hidden_layers + 1
    for i, ref_h in enumerate(out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(hidden[i]), ref_h.numpy(), atol=2e-5, rtol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_roundtrip_export(torch_model):
    cfg = config_from_hf(torch_model.config)
    params = bert_params_from_torch(torch_model.state_dict(), cfg)
    exported = bert_params_to_torch(params, cfg)
    ref = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    for k, v in exported.items():
        np.testing.assert_array_equal(v, ref[k], err_msg=k)
    # every torch weight is covered
    missing = set(ref) - set(exported)
    assert not missing, missing


def test_bf16_close(torch_model):
    cfg = config_from_hf(torch_model.config)
    import dataclasses

    cfg16 = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    params = bert_params_from_torch(torch_model.state_dict(), cfg)
    input_ids, mask, types = _inputs()
    last32, _, _ = BertModel(cfg).apply(
        {"params": params}, jnp.asarray(input_ids), jnp.asarray(mask), jnp.asarray(types)
    )
    last16, _, _ = BertModel(cfg16).apply(
        {"params": params}, jnp.asarray(input_ids), jnp.asarray(mask), jnp.asarray(types)
    )
    # bf16 compute should stay within ~1e-2 of fp32 on a tiny model
    diff = np.abs(np.asarray(last16, np.float32) - np.asarray(last32))
    assert diff.max() < 5e-2


def test_dpr_pooler_emb_matches_torch(torch_model):
    """DPR BiEncoder embeds via BertModel's tanh pooler output (reference
    warmup/model/models.py:303-308 pooled_output) — our dpr registry model
    must produce the same vectors from a question_model./ctx_model.
    checkpoint."""
    cfg = config_from_hf(torch_model.config)
    sd = {}
    for prefix in ("question_model.", "ctx_model."):
        sd.update({prefix + k: v for k, v in torch_model.state_dict().items()})
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.models.hf import dual_encoder_params_from_torch

    model = build_dual_encoder("dpr", cfg)
    params = dual_encoder_params_from_torch(sd, cfg)
    assert "doc_encoder" in params and "pooler" in params["encoder"]

    input_ids, mask, _ = _inputs()
    import torch as _torch

    with _torch.no_grad():
        want = torch_model(
            input_ids=_torch.tensor(input_ids.astype(np.int64)),
            attention_mask=_torch.tensor(mask.astype(np.int64)),
        ).pooler_output.numpy()
    for method in ("query_emb", "body_emb"):
        got = model.apply(
            {"params": params}, jnp.asarray(input_ids), jnp.asarray(mask),
            method=getattr(model, method),
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   rtol=1e-4)
