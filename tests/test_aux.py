"""Aux components: criterion zoo vs torch, EMA teacher, noise, schedules,
span preprocessing, episode LR decay, metrics logger."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.losses.criteria import (
    LOSS_REGISTRY,
    ce_loss,
    hellinger_loss,
    js_loss,
    kl_loss,
    mse_loss,
    stable_kl_loss,
    sym_kl_loss,
)
from cocodr_tpu.utils.misc import (
    add_embedding_noise,
    episode_lr_decay,
    mean_teacher_update,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def test_criteria_match_torch():
    rng = np.random.RandomState(0)
    a = rng.randn(6, 9).astype(np.float32)
    b = rng.randn(6, 9).astype(np.float32)
    ta, tb = torch.tensor(a), torch.tensor(b)

    np.testing.assert_allclose(
        float(kl_loss(jnp.asarray(a), jnp.asarray(b))),
        float(
            F.kl_div(
                F.log_softmax(ta, -1), F.softmax(tb, -1), reduction="batchmean"
            )
        ),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(mse_loss(jnp.asarray(a), jnp.asarray(b))),
        float(F.mse_loss(ta, tb)),
        rtol=1e-6,
    )
    targets = rng.randint(0, 9, 6)
    np.testing.assert_allclose(
        float(ce_loss(jnp.asarray(a), jnp.asarray(targets))),
        float(F.cross_entropy(ta, torch.tensor(targets, dtype=torch.long))),
        rtol=1e-5,
    )
    # symmetry / bounds
    assert float(sym_kl_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        float(sym_kl_loss(jnp.asarray(b), jnp.asarray(a))), rel=1e-5
    )
    assert 0 <= float(js_loss(jnp.asarray(a), jnp.asarray(b))) <= np.log(2) + 1e-6
    h = float(hellinger_loss(jnp.asarray(a), jnp.asarray(b)))
    assert 0 <= h <= 1 + 1e-6
    assert len(LOSS_REGISTRY) == 10


def test_mean_teacher_update():
    t = {"w": jnp.ones(3)}
    s = {"w": jnp.zeros(3)}
    t2 = mean_teacher_update(t, s, alpha=0.9)
    np.testing.assert_allclose(np.asarray(t2["w"]), 0.9)
    t3 = mean_teacher_update(t, s, average="simple", step=4)
    np.testing.assert_allclose(np.asarray(t3["w"]), 0.75)


def test_embedding_noise():
    emb = jnp.zeros((4, 8))
    out = add_embedding_noise(emb, jax.random.PRNGKey(0), 0.1)
    assert np.abs(np.asarray(out)).mean() > 0.5  # scale 26.8 * 0.1
    same = add_embedding_noise(emb, jax.random.PRNGKey(0), 0.0)
    np.testing.assert_array_equal(np.asarray(same), 0)


def test_episode_lr_decay():
    assert episode_lr_decay(1.0, 0, 100) == 1.0
    assert episode_lr_decay(1.0, 50, 100) == 0.5
    assert episode_lr_decay(1.0, 99, 100) == pytest.approx(0.2)  # floor


def test_span_preprocess(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK] the quick fox runs far away".split()
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vp), do_lower_case=True)

    from cocodr_tpu.data.coco_spans import (
        preprocess_corpus_to_spans,
        span_batches,
    )

    corpus = tmp_path / "corpus.jsonl"
    corpus.write_text(
        json.dumps(
            {"_id": "1", "title": "The Fox",
             "text": "The quick fox runs. The fox runs far away. Quick!"}
        )
        + "\n"
        + json.dumps({"_id": "2", "title": "", "text": "far far away."})
        + "\n"
    )
    out = tmp_path / "spans.jsonl"
    n = preprocess_corpus_to_spans(str(corpus), str(out), tok, target_len=6)
    assert n == 2
    docs = [json.loads(l) for l in open(out)]
    assert all(len(d["spans"]) >= 1 for d in docs)
    assert all(
        isinstance(t, int) for d in docs for s in d["spans"] for t in s
    )

    from cocodr_tpu.data.coco_collator import CoCondenserCollator

    coll = CoCondenserCollator(tok, max_seq_length=10)
    batches = list(span_batches([str(out)], coll, docs_per_batch=2))
    assert batches and batches[0]["input_ids"].shape == (4, 10)


def test_metrics_logger(tmp_path):
    from cocodr_tpu.utils.logging import MetricsLogger, StepTimer

    jp = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(log_dir=str(tmp_path / "tb"), jsonl_path=jp)
    ml.log(1, {"loss": 0.5})
    ml.log(2, {"loss": jnp.asarray(0.25)})
    ml.close()
    recs = [json.loads(l) for l in open(jp)]
    assert recs[1]["loss"] == 0.25

    st = StepTimer()
    with st.phase("encode"):
        pass
    assert st.summary()["encode"]["count"] == 1


def test_lamb_trust_ratios_diagnostic():
    import optax

    from cocodr_tpu.optim import lamb
    from cocodr_tpu.utils.misc import lamb_trust_ratios

    params = {"layer": {"w": jnp.ones((4, 4)) * 2.0, "b": jnp.zeros(4)}}
    tx = lamb(1e-3)
    state = tx.init(params)
    grads = {"layer": {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}}
    _, state = tx.update(grads, state, params)
    ratios = lamb_trust_ratios(state, params)
    assert any("layer/w" in k for k in ratios)
    for v in ratios.values():
        assert np.isfinite(v) and v >= 0


def test_read_group_results(tmp_path):
    import json as _json

    from cocodr_tpu.utils.misc import read_group_results

    (tmp_path / "ann_ndcg_group_scifact_0").write_text(
        _json.dumps({"ndcg": 0.1, "checkpoint": "a"})
    )
    (tmp_path / "ann_ndcg_group_scifact_2").write_text(
        _json.dumps({"ndcg": 0.5, "checkpoint": "b"})
    )
    out = read_group_results(str(tmp_path))
    assert out["scifact"]["ndcg"] == 0.5  # latest round wins


def test_async_saver_done_protocol(tmp_path):
    """AsyncSaver returns before the DONE marker exists, the checkpoint
    becomes discoverable only after completion, and the payload restores
    bit-identically."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from cocodr_tpu.utils.train_state import (
        AsyncSaver,
        TrainState,
        latest_checkpoint,
        load_checkpoint,
    )

    params = {"w": jnp.arange(8, dtype=jnp.float32)}
    tx = optax.sgd(1e-2)
    state = TrainState.create(params, tx).replace(step=jnp.asarray(7))
    saver = AsyncSaver()
    path = saver.save(str(tmp_path), state, keep=2)
    saver.wait()
    assert latest_checkpoint(str(tmp_path)) == path
    restored = load_checkpoint(path, TrainState.create(params, tx))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(8, dtype=np.float32))
    assert int(restored.step) == 7
    # a second save waits for the first and prunes
    state2 = state.replace(step=jnp.asarray(9))
    saver.save(str(tmp_path), state2)
    saver.close()
    assert latest_checkpoint(str(tmp_path)).endswith("9")


def test_criteria_reference_exact_semantics():
    """sym_kl / js / stable_kl / hellinger match the reference's torch
    formulas in VALUE and GRADIENT structure (detach sides, no 0.5
    factors, batchmean) — ANCE/model/loss.py:7-18,112-177."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    a = rng.randn(5, 7).astype(np.float32)
    b = rng.randn(5, 7).astype(np.float32)
    ta = torch.tensor(a, requires_grad=True)
    tb = torch.tensor(b, requires_grad=True)

    # SymKl
    ref = (F.kl_div(F.log_softmax(ta, -1), F.softmax(tb.detach(), -1),
                    reduction="batchmean")
           + F.kl_div(F.log_softmax(tb, -1), F.softmax(ta.detach(), -1),
                      reduction="batchmean"))
    got = sym_kl_loss(jnp.asarray(a), jnp.asarray(b))
    assert float(got) == pytest.approx(float(ref), rel=1e-5)
    ref.backward()
    ga = jax.grad(lambda x: sym_kl_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(),
                               rtol=1e-4, atol=1e-6)

    # JS
    m = 0.5 * (F.softmax(ta.detach(), -1) + F.softmax(tb.detach(), -1))
    ref_js = (F.kl_div(F.log_softmax(ta, -1), m, reduction="batchmean")
              + F.kl_div(F.log_softmax(tb, -1), m, reduction="batchmean"))
    got_js = js_loss(jnp.asarray(a), jnp.asarray(b))
    assert float(got_js) == pytest.approx(float(ref_js), rel=1e-5)

    # stable_kl: gradient flows only through the leading p factor
    def torch_stable_kl(logit, target, epsilon=1e-6):
        p = F.log_softmax(logit, 1).exp()
        y = F.log_softmax(target, 1).exp()
        rp = -(1.0 / (p + epsilon) - 1 + epsilon).detach().log()
        ry = -(1.0 / (y + epsilon) - 1 + epsilon).detach().log()
        return (p * (rp - ry) * 2).sum() / logit.size(0)

    ta2 = torch.tensor(a, requires_grad=True)
    ref_sk = torch_stable_kl(ta2, torch.tensor(b))
    got_sk = stable_kl_loss(jnp.asarray(a), jnp.asarray(b))
    assert float(got_sk) == pytest.approx(float(ref_sk), rel=1e-5)
    ref_sk.backward()
    gsk = jax.grad(lambda x: stable_kl_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(gsk), ta2.grad.numpy(),
                               rtol=1e-4, atol=1e-6)

    # hellinger: reference detaches BOTH sides -> zero gradient (quirk)
    ref_h = F.mse_loss(F.softmax(torch.tensor(b), -1).sqrt(),
                       F.softmax(torch.tensor(a), -1).sqrt())
    got_h = hellinger_loss(jnp.asarray(a), jnp.asarray(b))
    assert float(got_h) == pytest.approx(float(ref_h), rel=1e-5)
    gh = jax.grad(lambda x: hellinger_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    assert float(jnp.abs(gh).max()) == 0.0
