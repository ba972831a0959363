"""Condenser pretraining parity vs the reference torch implementation."""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.condenser import (
    CondenserForPretraining,
    condenser_params_from_torch,
    mlm_cross_entropy,
)
from cocodr_tpu.models.hf import config_from_hf

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_mlm():
    torch.manual_seed(0)
    cfg = transformers.BertConfig(
        vocab_size=97,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=40,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    m = transformers.BertForMaskedLM(cfg)
    m.eval()
    return m


def _load_reference_condenser(hf_model, n_head_layers=2, skip_from=2,
                              late_mlm=True):
    import importlib.util, os

    path = "/root/reference/COCO/modeling.py"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    # modeling.py imports `from arguments import ...`
    sys.path.insert(0, "/root/reference/COCO")
    try:
        spec = importlib.util.spec_from_file_location("ref_coco_modeling", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)

    model_args = types.SimpleNamespace(
        n_head_layers=n_head_layers, skip_from=skip_from, late_mlm=late_mlm
    )
    torch.manual_seed(1)
    ref = mod.CondenserForPretraining(hf_model, model_args, None, None)
    ref.eval()
    return ref


def test_condenser_loss_matches_reference():
    hf = _tiny_mlm()
    ref = _load_reference_condenser(hf)
    cfg = config_from_hf(hf.config)

    model = CondenserForPretraining(
        cfg, n_head_layers=2, skip_from=2, late_mlm=True
    )
    params = condenser_params_from_torch(
        hf.state_dict(), cfg, n_head_layers=2, head_state_dict=ref.state_dict()
    )

    rng = np.random.RandomState(3)
    B, S = 4, 12
    ids = rng.randint(5, 97, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[1, 8:] = 0
    labels = np.full((B, S), -100, np.int64)
    mask_pos = rng.rand(B, S) < 0.3
    labels[mask_pos] = rng.randint(5, 97, size=mask_pos.sum())
    labels[mask == 0] = -100

    with torch.no_grad():
        ref_loss = ref(
            {
                "input_ids": torch.tensor(ids, dtype=torch.long),
                "attention_mask": torch.tensor(mask, dtype=torch.long),
            },
            torch.tensor(labels),
        )
    loss, aux = model.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(labels),
    )
    np.testing.assert_allclose(
        float(loss), float(ref_loss), atol=2e-5, rtol=1e-5
    )
    assert aux["cls"].shape == (B, cfg.hidden_size)


def test_mlm_cross_entropy_ignore_index():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 7), jnp.float32)
    labels = jnp.asarray([[1, -100, 2], [-100, -100, 3]])
    loss = mlm_cross_entropy(logits, labels)
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(logits)).view(-1, 7),
        torch.tensor(np.asarray(labels)).view(-1).long(),
        ignore_index=-100,
    )
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-6)


def test_sparse_mlm_loss_equals_dense():
    """mlm_budget_frac gather path == dense [T, vocab] path, values AND
    gradients, while the budget covers every masked position."""
    import dataclasses as dc

    cfg = BertConfig.tiny()
    rng = np.random.default_rng(9)
    # T=256 with budget frac 0.25 -> gather budget 128: a REAL sparse path
    # (masked count ~38 << 128 < T)
    B2, S2 = 8, 32
    ids2 = jnp.asarray(rng.integers(5, 120, (B2, S2)), jnp.int32)
    mask2 = jnp.ones((B2, S2), jnp.int32)
    labels2 = np.full((B2, S2), -100, np.int32)
    mpos2 = rng.random((B2, S2)) < 0.15
    labels2[mpos2] = rng.integers(5, 120, mpos2.sum())
    labels2 = jnp.asarray(labels2)

    dense = CondenserForPretraining(cfg, n_head_layers=1, skip_from=1,
                                    late_mlm=True, mlm_budget_frac=1.0)
    sparse = dc.replace(dense, mlm_budget_frac=0.25)
    p = dense.init(jax.random.PRNGKey(0), ids2[:1], mask2[:1],
                   labels2[:1])["params"]

    def loss(m, p):
        out, _ = m.apply({"params": p}, ids2, mask2, labels2)
        return out

    ld, gd = jax.value_and_grad(lambda p: loss(dense, p))(p)
    ls, gs = jax.value_and_grad(lambda p: loss(sparse, p))(p)
    assert np.asarray(ld) == pytest.approx(np.asarray(ls), rel=1e-6)
    for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
