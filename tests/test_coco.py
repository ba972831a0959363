"""COCO pipeline: WWM collator behavior + grad-cache == full-batch gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.data.coco_collator import (
    CoCondenserCollator,
    CondenserWWMCollator,
    greedy_pack_spans,
)
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.condenser import CoCondenserForPretraining
from cocodr_tpu.pipelines.coco import CocoConfig, build_coco_train_step
from cocodr_tpu.utils.train_state import TrainState

transformers = pytest.importorskip("transformers")


@pytest.fixture()
def tokenizer(tmp_path):
    vocab = (
        "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed "
        "over lazy dog hello world".split()
    )
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    return transformers.BertTokenizerFast(vocab_file=str(vp), do_lower_case=True)


def test_wwm_collator(tokenizer):
    coll = CondenserWWMCollator(tokenizer, mlm_probability=0.5, max_seq_length=12)
    text_ids = tokenizer.convert_tokens_to_ids(
        ["the", "quick", "jump", "##s", "over", "lazy", "dog"]
    )
    batch = coll([{"text": text_ids}, {"text": text_ids}])
    assert batch["input_ids"].shape == (2, 12)
    assert batch["labels"].shape == (2, 12)
    # labels only at corrupted positions; those positions carry original ids
    lab = batch["labels"]
    assert (lab != -100).sum() >= 2
    # whole-word property: 'jump' and '##s' masked together or not at all
    jump_id = tokenizer.convert_tokens_to_ids(["jump"])[0]
    s_id = tokenizer.convert_tokens_to_ids(["##s"])[0]
    for row in lab:
        pos = set(row[row != -100].tolist())
        assert (jump_id in pos) == (s_id in pos)
    # attention mask covers CLS + tokens + SEP
    assert batch["attention_mask"][0].sum() == 9


def test_wwm_random_offset_truncation(tokenizer):
    coll = CondenserWWMCollator(tokenizer, max_seq_length=6)
    long_ids = tokenizer.convert_tokens_to_ids(["the"] * 20)
    batch = coll([{"text": long_ids}])
    # CLS + 4 tokens + SEP
    assert batch["attention_mask"][0].sum() == 6


def test_co_collator_pairs(tokenizer):
    coll = CoCondenserCollator(tokenizer, max_seq_length=8)
    ids = tokenizer.convert_tokens_to_ids(["quick", "fox"])
    ids2 = tokenizer.convert_tokens_to_ids(["lazy", "dog"])
    batch = coll.collate_spans(
        [{"spans": [ids]}, {"spans": [ids, ids2]}]
    )
    assert batch["input_ids"].shape[0] == 4  # 2 docs x 2 spans


def test_greedy_pack():
    sents = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]
    import random

    spans = greedy_pack_spans(sents, target_len=5, break_prob=0.0,
                              rng=random.Random(0))
    assert sum(len(s) for s in spans) == 10
    assert all(len(s) <= 9 for s in spans)


@pytest.mark.slow
def test_grad_cache_matches_full_batch():
    """Chunked grad-cache step must equal the direct full-batch step."""
    cfg = BertConfig.tiny()
    model = CoCondenserForPretraining(cfg, n_head_layers=1, skip_from=1,
                                      late_mlm=True)
    B, S = 8, 10
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 100, size=(B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    labels = np.where(rng.rand(B, S) < 0.3, ids, -100).astype(np.int32)
    # make the chunks deliberately unbalanced: wipe most masks in chunk 2 so
    # the token-weighted accumulation (not mean-of-chunk-means) is exercised
    labels[4:, : S - 2] = -100
    assert (labels[:4] != -100).sum() != (labels[4:] != -100).sum()
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["labels"],
    )["params"]

    import optax

    tx = optax.sgd(0.0)  # zero LR: isolate gradient computation via updates
    # instead compare raw grads computed by each path

    # direct grads
    def full_loss(p, rngs_key):
        # single chunk == full batch, same dropout stream as chunked path
        loss, aux = model.apply(
            {"params": p},
            batch["input_ids"],
            batch["attention_mask"],
            batch["labels"],
            deterministic=False,
            rngs={"dropout": rngs_key},
            method=model.loss_with_contrastive,
        )
        return loss

    key = jax.random.PRNGKey(42)
    chunk_keys = jax.random.split(key, 2)

    # reference grads: token-weighted MLM over the full batch (each chunk
    # mean scaled by its masked-token share) + co over the full batch —
    # identical to computing the MLM mean over all masked tokens at once.
    n_masked = (labels != -100).sum()

    def direct(p):
        total = 0.0
        cls_all = []
        for c, ck in enumerate(chunk_keys):
            sl = slice(c * 4, (c + 1) * 4)
            mlm, aux = model.apply(
                {"params": p},
                batch["input_ids"][sl],
                batch["attention_mask"][sl],
                batch["labels"][sl],
                deterministic=False,
                rngs={"dropout": ck},
            )
            w = (labels[sl] != -100).sum() / n_masked
            total = total + mlm * w
            cls_all.append(aux["cls"].astype(jnp.float32))
        from cocodr_tpu.losses.contrastive import co_contrastive_loss

        co = co_contrastive_loss(jnp.concatenate(cls_all))
        return total + co

    ref_grads = jax.grad(direct)(params)

    # grad-cache step with SGD lr so params' delta reveals grads? cleaner:
    # rebuild the internals by calling the step and diffing params with lr=1
    tx1 = optax.sgd(1.0)
    state = TrainState.create(params, tx1)
    step = build_coco_train_step(
        model, tx1, CocoConfig(cache_chunk_size=4, max_grad_norm=0)
    )
    new_state, metrics = step(state, batch, key)
    got_grads = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), params, new_state.params
    )
    jax.tree_util.tree_map(
        lambda g, r: np.testing.assert_allclose(
            g, np.asarray(r), atol=2e-4, rtol=5e-3
        ),
        got_grads,
        ref_grads,
    )
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_coco_step_no_cache_runs():
    cfg = BertConfig.tiny()
    model = CoCondenserForPretraining(cfg, n_head_layers=1, skip_from=1)
    B, S = 4, 8
    ids = jnp.ones((B, S), jnp.int32)
    batch = {
        "input_ids": ids,
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.where(ids > 0, ids, -100).astype(jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["input_ids"], batch["attention_mask"],
        batch["labels"],
    )["params"]
    import optax

    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)
    step = build_coco_train_step(model, tx, CocoConfig())
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def _write_span_corpus(path, n_docs=16, seed=0):
    import json

    rng = np.random.RandomState(seed)
    with open(path, "w") as f:
        for _ in range(n_docs):
            spans = [
                [int(x) for x in rng.randint(5, 17, size=rng.randint(3, 8))]
                for _ in range(rng.randint(1, 4))
            ]
            f.write(json.dumps({"spans": spans}) + "\n")


@pytest.mark.slow
def test_coco_kill_and_restart_resumes_identically(tmp_path, tokenizer):
    """Save at step 2, 'crash', restart from disk with the span stream
    fast-forwarded — the step-4 state must be bit-identical to an
    uninterrupted run (COCO resume; the reference goes through the HF
    Trainer's model_path, COCO/run_coco_pre_training.py:146-152)."""
    import optax

    from cocodr_tpu.data.coco_spans import span_batches
    from cocodr_tpu.pipelines.coco import run_coco_pretrain
    from cocodr_tpu.utils.train_state import (
        latest_checkpoint,
        load_checkpoint,
    )

    sf = tmp_path / "spans.jsonl"
    _write_span_corpus(sf)
    collator = CoCondenserCollator(
        tokenizer, mlm_probability=0.3, max_seq_length=12
    )
    cfg = BertConfig.tiny()
    model = CoCondenserForPretraining(cfg, n_head_layers=1, skip_from=1)

    def fresh():
        params = model.init(
            jax.random.PRNGKey(1),
            jnp.ones((2, 12), jnp.int32),
            jnp.ones((2, 12), jnp.int32),
            jnp.full((2, 12), -100, jnp.int32),
        )["params"]
        tx = optax.adamw(1e-3)
        state = TrainState.create(params, tx)
        return build_coco_train_step(
            model, tx, CocoConfig(max_seq_length=12)
        ), state

    def mk(start):
        return span_batches(
            [str(sf)], collator, docs_per_batch=4, num_epochs=3,
            start_batch=start,
        )

    key = jax.random.PRNGKey(7)

    step_a, state = fresh()
    ck_a = str(tmp_path / "ck_a")
    state_a = run_coco_pretrain(
        state, step_a, mk(0), key, max_steps=4, ckpt_dir=ck_a, save_steps=2
    )

    step_b, state_b = fresh()
    ck_b = str(tmp_path / "ck_b")
    run_coco_pretrain(
        state_b, step_b, mk(0), key, max_steps=2, ckpt_dir=ck_b, save_steps=2
    )
    # fresh "process": new step fn + template state, restore purely from disk
    step_c, template = fresh()
    ck = latest_checkpoint(ck_b)
    assert ck is not None
    resumed = load_checkpoint(ck, template)
    assert int(resumed.step) == 2
    state_b2 = run_coco_pretrain(
        resumed, step_c, mk(int(resumed.step)), key, max_steps=4,
        ckpt_dir=ck_b, save_steps=2,
    )

    assert int(state_a.step) == int(state_b2.step) == 4
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.params),
        jax.tree_util.tree_leaves(state_b2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.opt_state),
        jax.tree_util.tree_leaves(state_b2.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_count_span_batches_matches_stream(tmp_path, tokenizer):
    from cocodr_tpu.data.coco_spans import count_span_batches, span_batches

    sf = tmp_path / "spans.jsonl"
    _write_span_corpus(sf, n_docs=10)
    collator = CoCondenserCollator(tokenizer, max_seq_length=12)
    n = sum(1 for _ in span_batches([str(sf)], collator, 3, num_epochs=2))
    assert n == count_span_batches([str(sf)], 3, num_epochs=2)


def test_warmup_ratio_to_steps():
    from cocodr_tpu.core.configs import CocoStageConfig

    cfg = CocoStageConfig.base()  # warmup_ratio 0.1
    assert cfg.warmup_steps_for(10_000) == 1_000
    assert cfg.warmup_steps_for(5) == 1  # floor of 1
    import dataclasses

    off = dataclasses.replace(cfg, warmup_ratio=0.0)
    assert off.warmup_steps_for(10_000) == off.optimizer.warmup_steps
