"""Composed training-trajectory parity against the torch reference.

Every ingredient is parity-tested in isolation elsewhere (forward:
test_bert_parity; losses: test_losses/test_dro; LAMB: test_lamb). These
tests compose them: N deterministic fp32 steps of the FULL training loop —
model forward -> loss -> backward -> global-norm clip -> reference-LAMB ->
HF linear schedule — run in BOTH frameworks from identical weights and
data, asserting the loss sequence and the final parameters match.

Torch side is built from the reference's own modules:
- model:      ANCE/model/models.py:234-273 (BertDot_NLL_LN)
- iDRO:       ANCE/model/dro_loss.py:160-254 (iDROLoss, incl. its own
              last-3-layer param selection at :174-190)
- optimizer:  ANCE/utils/lamb.py:24-123
- loop math:  ANCE/drivers/run_ann.py:289-356 (backward, clip_grad_norm,
              optimizer.step, scheduler.step), identical to
              warmup/drivers/run_bm25_warmup.py:208-253
at world size 1, where the documented iDRO global-update deviation
vanishes and trajectories must agree to fp32 tolerance.
"""
import importlib
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.losses import DroConfig, idro_init
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.models.hf import (
    bert_params_to_torch,
    config_from_hf,
    dual_encoder_params_from_torch,
)
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.utils.train_state import TrainState

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

ANCE = "/root/reference/ANCE"

pytestmark = pytest.mark.slow

# 12 layers so the reference iDROLoss's own base-size layer-name selection
# ('layer.9'/'layer.10'/'layer.11', dro_loss.py:177-183) applies unmodified.
N_LAYERS = 12
N_STEPS = 10
LR = 1e-3
WARMUP, TOTAL = 3, N_STEPS
B, SQ, SD = 8, 10, 14
VOCAB = 99


def _load_reference_models():
    if not os.path.exists(f"{ANCE}/model/models.py"):
        pytest.skip("reference not available")
    sys.path.insert(0, ANCE)
    try:
        return importlib.import_module("model.models")
    finally:
        sys.path.remove(ANCE)


class _WorldSize1Dist:
    """Stand-ins for the torch.distributed calls in the reference model
    forward (models.py:255-257) and iDRO (dro_loss.py:232) at world size 1:
    all_reduce is the identity."""

    def __enter__(self):
        self._saved = torch.distributed.all_reduce
        torch.distributed.all_reduce = lambda *a, **k: None
        return self

    def __exit__(self, *exc):
        torch.distributed.all_reduce = self._saved


def _tiny_hf_config():
    return transformers.BertConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        num_hidden_layers=N_LAYERS,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=48,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def _batches(seed=7, with_groups=False, n_groups=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(N_STEPS):
        def tok(S):
            ids = rng.randint(1, VOCAB, size=(B, S)).astype(np.int64)
            lens = rng.randint(S // 2, S + 1, size=B)
            mask = (np.arange(S)[None, :] < lens[:, None]).astype(np.int64)
            ids = ids * mask  # pad ids to 0 beyond the length
            return ids, mask

        b = {}
        b["q_ids"], b["q_mask"] = tok(SQ)
        b["pos_ids"], b["pos_mask"] = tok(SD)
        b["neg_ids"], b["neg_mask"] = tok(SD)
        b["weights"] = rng.uniform(0.5, 1.5, size=B).astype(np.float32)
        if with_groups:
            b["groups"] = rng.randint(0, n_groups, size=B).astype(np.int64)
        out.append(b)
    return out


def _torch_setup(ref_models, dro=None):
    torch.manual_seed(0)
    tmodel = ref_models.BertDot_NLL_LN(_tiny_hf_config())
    tmodel.train()
    if dro is not None:
        args = SimpleNamespace(model_size="base", local_rank=0)
        tmodel.add_group_loss(
            args, n_groups=dro.n_groups, dro_type="idro", alpha=dro.alpha,
            eps=dro.eps, ema=dro.ema, rho=dro.rho,
        )
        tmodel.loss.train()

    sys.path.insert(0, f"{ANCE}/utils")
    try:
        ref_lamb = importlib.import_module("lamb")
    finally:
        sys.path.remove(f"{ANCE}/utils")
    opt = ref_lamb.Lamb(tmodel.parameters(), lr=LR, eps=1e-6)
    sched = transformers.get_linear_schedule_with_warmup(opt, WARMUP, TOTAL)
    return tmodel, opt, sched


def _jax_setup(tmodel, loss_kind, dro=None):
    cfg = config_from_hf(tmodel.config)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    params = dual_encoder_params_from_torch(tmodel.state_dict(), cfg)
    # BertForSequenceClassification carries a tanh pooler the rdot models
    # never touch (query_emb reads raw CLS, models.py:225-228) — the flax
    # model has no pooler submodule, drop it from the converted tree.
    params["encoder"].pop("pooler", None)
    tx = lamb(warmup_linear(LR, WARMUP, TOTAL), eps=1e-6)
    extra = idro_init(dro) if dro is not None else None
    state = TrainState.create(
        jax.tree_util.tree_map(jnp.asarray, params), tx, extra=extra
    )
    step = build_train_step(
        model, tx,
        TrainStepConfig(loss_kind=loss_kind, dro=dro, max_grad_norm=1.0,
                        idro_last_k_layers=3),
    )
    return model, state, step, cfg


def _torch_step(tmodel, opt, sched, b, group=False):
    inputs = dict(
        query_ids=torch.tensor(b["q_ids"]),
        attention_mask_q=torch.tensor(b["q_mask"]),
        input_ids_a=torch.tensor(b["pos_ids"]),
        attention_mask_a=torch.tensor(b["pos_mask"]),
        input_ids_b=torch.tensor(b["neg_ids"]),
        attention_mask_b=torch.tensor(b["neg_mask"]),
    )
    if group:
        inputs["group_ids"] = torch.tensor(b["groups"])
        inputs["weights"] = torch.tensor(b["weights"])
        loss, _, gl, gc = tmodel(**inputs)
    else:
        inputs["weights"] = torch.tensor(b["weights"])
        loss, _, _ = tmodel(**inputs)
        gl = gc = None
    loss.backward()
    torch.nn.utils.clip_grad_norm_(tmodel.parameters(), 1.0)
    opt.step()
    sched.step()
    tmodel.zero_grad()
    return float(loss.detach()), gl, gc


def _assert_final_params_match(state, tmodel, cfg, atol, rtol):
    t_sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    ours = bert_params_to_torch(
        jax.tree_util.tree_map(np.asarray, state.params["encoder"]), cfg
    )
    compared = 0
    for k, v in ours.items():
        if k.startswith("pooler."):
            continue  # inert in torch (no grads), absent in flax
        np.testing.assert_allclose(
            v, t_sd["bert." + k], atol=atol, rtol=rtol,
            err_msg=f"final param {k}",
        )
        compared += 1
    assert compared > 10 * N_LAYERS  # the whole backbone was checked


def test_warmup_trajectory_matches_reference():
    """10 deterministic steps of weighted triplet NLL + clip(1.0) +
    reference-LAMB + HF linear schedule: loss sequence and final params
    match the composed torch reference (loop math of
    warmup/drivers/run_bm25_warmup.py:208-253 at world size 1)."""
    ref_models = _load_reference_models()
    batches = _batches()
    with _WorldSize1Dist():
        tmodel, opt, sched = _torch_setup(ref_models)
        _, state, step, cfg = _jax_setup(tmodel, "nll")

        t_losses, j_losses = [], []
        for b in batches:
            t_loss, _, _ = _torch_step(tmodel, opt, sched, b)
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            state, metrics = step(state, jb)
            t_losses.append(t_loss)
            j_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(
        j_losses, t_losses, rtol=2e-4, atol=1e-5, err_msg="loss sequence"
    )
    _assert_final_params_match(state, tmodel, cfg, atol=5e-5, rtol=1e-3)


def test_ance_idro_trajectory_matches_reference():
    """10 deterministic steps of ANCE+iDRO (groups, robust loss, h_fun
    multiplicative updates through the reference's OWN last-3-layer
    selection and autograd.grad loop) + clip + reference-LAMB: robust-loss
    sequence, h_fun trajectory, group losses/counts, and final params all
    match the composed torch reference (loop math of
    ANCE/drivers/run_ann.py:289-356 at world size 1)."""
    ref_models = _load_reference_models()
    dro = DroConfig(n_groups=6, alpha=0.25, eps=0.01, ema=0.1, rho=0.05)
    batches = _batches(seed=11, with_groups=True, n_groups=dro.n_groups)
    with _WorldSize1Dist():
        tmodel, opt, sched = _torch_setup(ref_models, dro=dro)
        _, state, step, cfg = _jax_setup(tmodel, "idro", dro=dro)

        for i, b in enumerate(batches):
            t_loss, t_gl, t_gc = _torch_step(
                tmodel, opt, sched, b, group=True
            )
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            state, metrics = step(state, jb)
            np.testing.assert_allclose(
                float(metrics["loss"]), t_loss, rtol=5e-4, atol=1e-5,
                err_msg=f"robust loss step {i}",
            )
            np.testing.assert_allclose(
                np.asarray(metrics["group_losses"]), t_gl.numpy(),
                rtol=5e-4, atol=1e-5, err_msg=f"group losses step {i}",
            )
            np.testing.assert_allclose(
                np.asarray(metrics["group_counts"]), t_gc.numpy(),
                atol=1e-6, err_msg=f"group counts step {i}",
            )
            np.testing.assert_allclose(
                np.asarray(state.extra.h_fun),
                tmodel.loss.h_fun.detach().numpy(),
                rtol=1e-3, atol=1e-5, err_msg=f"h_fun step {i}",
            )

    _assert_final_params_match(state, tmodel, cfg, atol=1e-4, rtol=2e-3)
