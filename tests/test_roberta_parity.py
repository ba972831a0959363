"""RoBERTa-backbone parity (position-id scheme + converter) vs torch, and
the RobertaDot-style dual-encoder head conversion."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertModel
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.models.hf import (
    bert_params_from_torch,
    config_from_hf,
    dual_encoder_params_from_torch,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def torch_roberta():
    torch.manual_seed(0)
    cfg = transformers.RobertaConfig(
        vocab_size=101,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        type_vocab_size=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    m = transformers.RobertaModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


def test_roberta_forward_matches_torch(torch_roberta):
    cfg = config_from_hf(torch_roberta.config)
    assert cfg.position_style == "roberta"
    params = bert_params_from_torch(torch_roberta.state_dict(), cfg)
    model = BertModel(cfg)

    rng = np.random.RandomState(1)
    B, S = 3, 10
    ids = rng.randint(4, 101, size=(B, S)).astype(np.int32)
    ids[0, 7:] = 1  # pad
    mask = (ids != 1).astype(np.int32)

    last, _, _ = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask)
    )
    with torch.no_grad():
        ref = torch_roberta(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(last), ref, atol=3e-5, rtol=1e-4)


def test_robertadot_head_conversion(torch_roberta):
    """Simulate a RobertaDot_NLL_LN checkpoint: backbone + embeddingHead+norm."""
    cfg = config_from_hf(torch_roberta.config)
    H = cfg.hidden_size
    torch.manual_seed(2)
    head = torch.nn.Linear(H, H)
    norm = torch.nn.LayerNorm(H)
    sd = {f"roberta.{k}": v for k, v in torch_roberta.state_dict().items()}
    sd.update({f"embeddingHead.{k}": v for k, v in head.state_dict().items()})
    sd.update({f"norm.{k}": v for k, v in norm.state_dict().items()})

    import dataclasses

    de_cfg_model = build_dual_encoder("rdot_nll", cfg, head_dim=H)
    params = dual_encoder_params_from_torch(sd, cfg, use_head=True)

    rng = np.random.RandomState(3)
    ids = rng.randint(4, 101, size=(2, 8)).astype(np.int32)
    mask = np.ones((2, 8), np.int32)
    emb = de_cfg_model.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(mask),
        method=de_cfg_model.query_emb,
    )
    with torch.no_grad():
        h = torch_roberta(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state[:, 0]
        ref = norm(head(h)).numpy()
    np.testing.assert_allclose(np.asarray(emb), ref, atol=3e-5, rtol=1e-4)
