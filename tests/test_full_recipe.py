"""Capstone integration: the full 4-stage COCO-DR recipe on a synthetic
world — COCO pretrain -> BM25-style warmup -> ANCE(+DRO) -> BEIR-style eval —
exercising every pipeline against one shared tiny vocabulary and verifying
the final retrieval quality beats the untrained and warmup-only models.
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from cocodr_tpu.data.coco_collator import CoCondenserCollator
from cocodr_tpu.data.coco_spans import preprocess_corpus_to_spans, span_batches
from cocodr_tpu.data.records import RecordWriter, TokenCache
from cocodr_tpu.data.streams import TripletBatcher
from cocodr_tpu.losses import DroConfig, dro_greedy_init
from cocodr_tpu.models.bert import BertConfig, BertModel
from cocodr_tpu.models.condenser import CoCondenserForPretraining
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.ance import MineConfig, ance_round
from cocodr_tpu.pipelines.coco import CocoConfig, build_coco_train_step
from cocodr_tpu.pipelines.eval_beir import eval_beir
from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
from cocodr_tpu.pipelines.warmup import WarmupConfig, run_warmup
from cocodr_tpu.utils.train_state import TrainState

transformers = pytest.importorskip("transformers")

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon",
         "zeta", "eta", "theta", "iota", "kappa"]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    """Synthetic world: 10 topics; docs repeat topic words, queries name a
    topic. BEIR-format corpus for eval, triples for warmup, records for ANCE."""
    root = tmp_path_factory.mktemp("world")
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK]".split() + WORDS + ["filler"]
    (root / "vocab.txt").write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file=str(root / "vocab.txt"), do_lower_case=True
    )
    rng = np.random.RandomState(0)

    # BEIR task
    beir = root / "beir"
    (beir / "qrels").mkdir(parents=True)
    with open(beir / "corpus.jsonl", "w") as f:
        for i in range(40):
            w = WORDS[i % 10]
            other = WORDS[rng.randint(10)]
            f.write(json.dumps(
                {"_id": f"d{i}", "title": "",
                 "text": f"{w} {w} filler {other} {w}"}) + "\n")
    with open(beir / "queries.jsonl", "w") as f:
        for j, w in enumerate(WORDS):
            f.write(json.dumps({"_id": f"q{j}", "text": f"{w} filler"}) + "\n")
    with open(beir / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for j in range(10):
            for i in range(40):
                if i % 10 == j:
                    f.write(f"q{j}\td{i}\t1\n")

    # warmup triples (text) — cycle the negative across 6 distinct topics
    # per query so warmup must separate ALL topics, not just one fixed
    # confuser (a single (j+3) pattern let the model drift on the other
    # pairs and made the stage-2 ndcg assertion seed-brittle)
    with open(root / "triples.tsv", "w") as f:
        for r in range(6):
            for j, w in enumerate(WORDS):
                neg = WORDS[(j + 1 + r) % 10]
                f.write(f"{w}\t{w} {w} filler\t{neg} {neg} filler\n")

    # ANCE records (query/passage token caches + positives)
    qp, pp = str(root / "train-query"), str(root / "passages")
    wid = {w: tok.convert_tokens_to_ids([w])[0] for w in WORDS}
    fid = tok.convert_tokens_to_ids(["filler"])[0]
    with RecordWriter(qp, 6) as w_:
        for j, w in enumerate(WORDS):
            w_.write([2, wid[w], fid, 3])
    with RecordWriter(pp, 6) as w_:
        for i in range(40):
            w = WORDS[i % 10]
            w_.write([2, wid[w], wid[w], fid, 3])
    positives = {j: j for j in range(10)}  # query j -> doc offset j
    dev_qrels = {j: {i: 1 for i in range(40) if i % 10 == j} for j in range(10)}
    return {
        "root": root, "tok": tok, "beir": str(beir),
        "qp": qp, "pp": pp, "positives": positives, "dev_qrels": dev_qrels,
    }


@pytest.mark.slow
def test_full_recipe(world, tmp_path):
    tok = world["tok"]
    bert = BertConfig.tiny()

    # ---- stage 1: COCO pretraining (coCondenser) from random init
    spans_path = tmp_path / "spans.jsonl"
    n = preprocess_corpus_to_spans(
        str(world["beir"] + "/corpus.jsonl"), str(spans_path), tok,
        target_len=6,
    )
    assert n == 40
    coco_model = CoCondenserForPretraining(
        bert, n_head_layers=1, skip_from=1, late_mlm=True
    )
    coll = CoCondenserCollator(tok, mlm_probability=0.3, max_seq_length=10)
    init_batch = next(span_batches([str(spans_path)], coll, docs_per_batch=8))
    coco_params = coco_model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(init_batch["input_ids"]),
        jnp.asarray(init_batch["attention_mask"]),
        jnp.asarray(init_batch["labels"]),
    )["params"]
    tx = optax.adamw(5e-4)
    coco_state = TrainState.create(coco_params, tx)
    coco_step = build_coco_train_step(coco_model, tx, CocoConfig())
    key = jax.random.PRNGKey(1)
    first = last = None
    for i, batch in enumerate(
        span_batches([str(spans_path)], coll, docs_per_batch=8, num_epochs=8)
    ):
        key, k = jax.random.split(key)
        jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
        coco_state, m = coco_step(coco_state, jb, k)
        if first is None:
            first = float(m["loss"])
        last = float(m["loss"])
        if i >= 25:
            break
    assert last < first, (first, last)

    # transfer the pretrained backbone into the dual encoder
    de_model = build_dual_encoder("rdot_nll_condenser", bert)
    de_params = {"encoder": coco_state.params["bert"]}

    def eval_ndcg(params):
        metrics = eval_beir(
            de_model, params, world["beir"],
            str(tmp_path / f"evalwork_{np.random.randint(1e9)}"),
            tok, task="synthetic", batch_size=16, top_k=40, mips_tile=16,
            q_chunk=16, exact_fp32=True, query_len=8, doc_len=10,
        )
        return metrics["ndcg_cut_10"]

    ndcg_coco = eval_ndcg(de_params)

    # ---- stage 2: warmup on text triples
    tx2 = lamb(warmup_linear(1e-3, 4, 600))
    state2 = TrainState.create(de_params, tx2)
    step2 = build_train_step(de_model, tx2, TrainStepConfig(loss_kind="nll"))
    wcfg = WarmupConfig(max_seq_len=6, batch_size=10, num_epochs=20,
                        save_steps=0, log_every=100)
    # deterministic training: this test asserts RECIPE improvement on a
    # tiny synthetic world, where dropout noise at ~100 steps swamps the
    # signal; stochastic-dropout behavior has its own tests
    # (test_lifecycle.py)
    state2 = run_warmup(
        state2, step2, str(world["root"] / "triples.tsv"), tok, wcfg,
        str(tmp_path / "warmup_ck"), resume=False, dropout_seed=None,
    )
    assert int(state2.step) > 0
    ndcg_warmup = eval_ndcg(state2.params)

    # ---- stage 3: ANCE + DRO-greedy
    dcfg = DroConfig(n_groups=4)
    tx3 = lamb(warmup_linear(1e-3, 4, 400))
    state3 = TrainState.create(state2.params, tx3, extra=dro_greedy_init(dcfg))
    step3 = build_train_step(
        de_model, tx3, TrainStepConfig(loss_kind="dro-greedy", dro=dcfg)
    )
    qc, pc = TokenCache(world["qp"]), TokenCache(world["pp"])
    batcher = TripletBatcher(qc, pc)
    mine_cfg = MineConfig(
        topk_training=12, negative_sample=4, n_splits=1, cluster_query=True,
        cluster_centroids=4, kmeans_iters=10, kmeans_redo=1, dev_topk=10,
        batch_size=16, q_chunk=16, mips_tile=16, exact_fp32=True,
    )
    for rnd in range(3):
        state3, dev_m, steps = ance_round(
            state3, step3, de_model, batcher, pc, qc, world["positives"],
            qc, world["dev_qrels"], str(tmp_path / "ann"), rnd, mine_cfg,
            batch_size=10, steps_per_round=20, dropout_seed=None,
        )
    ndcg_final = eval_ndcg(state3.params)

    # ---- the recipe must help: each stage's eval improves over raw COCO
    print("ndcg: coco", ndcg_coco, "warmup", ndcg_warmup, "final", ndcg_final)
    assert ndcg_warmup > ndcg_coco, (ndcg_coco, ndcg_warmup)
    assert ndcg_final > ndcg_warmup, (ndcg_warmup, ndcg_final)
    assert ndcg_final > ndcg_coco + 0.1, (ndcg_coco, ndcg_warmup, ndcg_final)
