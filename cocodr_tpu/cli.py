"""Command-line interface — the L7 orchestration layer.

Replaces the reference's bash pipelines (reference commands/*.sh,
*/commands/*.sh) with subcommands:

  python -m cocodr_tpu.cli preprocess-msmarco --collection ... --out ...
  python -m cocodr_tpu.cli preprocess-beir --data-dir ... --out ...
  python -m cocodr_tpu.cli eval-beir --data-dir ... --checkpoint ... --task scifact
  python -m cocodr_tpu.cli warmup --triples ... --ckpt-dir ... [--preset warmup-base]
  python -m cocodr_tpu.cli ance --data-dir ... --ckpt-dir ... [--preset ance-base]
  python -m cocodr_tpu.cli coco --train-dir ... --ckpt-dir ... [--preset coco-base]
  python -m cocodr_tpu.cli ance-mine / ance-train   (async two-job pair)
  python -m cocodr_tpu.cli preprocess-coco --data-dirs ... --out ...
  python -m cocodr_tpu.cli encode --records ... --out emb.npy
  python -m cocodr_tpu.cli serve --checkpoint ... --records ...  (stdin REPL)
  python -m cocodr_tpu.cli convert-hf --hf-dir ...
  python -m cocodr_tpu.cli export-hf --checkpoint ... --out ...
  python -m cocodr_tpu.cli presets
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p):
    p.add_argument("--preset", default=None)
    p.add_argument("--compile-cache", default="/root/repo/.jax_cache")
    p.add_argument(
        "--mesh",
        default=None,
        help="device mesh 'DATAxMODEL' (e.g. 8x1, 4x2) or 'auto' for all "
        "devices data-parallel; default single-device",
    )
    p.add_argument(
        "--cpu-devices",
        type=int,
        default=0,
        help="provision N virtual CPU devices (multi-device smoke tests "
        "without TPU hardware)",
    )
    p.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: jax.distributed.initialize() (coordinator "
        "address/rank from env or cluster autodetection)",
    )
    p.add_argument("--log-dir", default=None,
                   help="TensorBoard + JSONL metrics directory")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the whole command "
                        "into this directory (open with TensorBoard or "
                        "Perfetto)")


def _setup_jax(args):
    """Runtime setup. Order matters: virtual CPU devices can only be
    provisioned before any backend initialization, and multi-host init must
    precede device enumeration."""
    import jax

    if getattr(args, "cpu_devices", 0):
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "distributed", False):
        # the reference launches every stage under torch.distributed.launch
        # with RANK/MASTER_* env (ANCE/drivers/run_ann.py:833-843); the JAX
        # equivalent autodetects or reads COORDINATOR_ADDRESS etc.
        jax.distributed.initialize()
    if getattr(args, "compile_cache", None):
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _parse_buckets(spec):
    """--length-buckets '64,128' -> (64, 128); '' -> () (single width)."""
    if not spec:
        return ()
    return tuple(int(x) for x in spec.split(","))


def _build_mesh(args):
    """--mesh spec -> jax.sharding.Mesh (or None for single-device)."""
    spec = getattr(args, "mesh", None)
    if not spec:
        return None
    from cocodr_tpu.core.mesh import MeshConfig, create_mesh

    if spec == "auto":
        cfg = MeshConfig()
    else:
        try:
            d, m = spec.lower().split("x")
            cfg = MeshConfig(data=int(d), model=int(m))
        except ValueError:
            raise SystemExit(f"bad --mesh '{spec}': expected DATAxMODEL or auto")
    return create_mesh(cfg)


def _metrics_logger(args):
    if not getattr(args, "log_dir", None):
        return None
    from cocodr_tpu.utils.logging import MetricsLogger

    os.makedirs(args.log_dir, exist_ok=True)
    return MetricsLogger(
        log_dir=args.log_dir,
        jsonl_path=os.path.join(args.log_dir, "metrics.jsonl"),
    )


def _load_tokenizer(path_or_name: str):
    import transformers

    return transformers.AutoTokenizer.from_pretrained(path_or_name)


def _load_model_params(checkpoint: str, model_type: str,
                       bert_overrides: dict | None = None):
    """checkpoint: HF dir (pytorch_model.bin/safetensors + config.json).
    bert_overrides: BertConfig field overrides applied after config.json
    (e.g. {"matmul_int8": True} for the W8A8 inference mode)."""
    import glob as _glob

    from cocodr_tpu.models.dual_encoder import MODEL_REGISTRY, build_dual_encoder
    from cocodr_tpu.models.hf import (
        config_from_hf,
        dual_encoder_params_from_torch,
        load_torch_state_dict,
    )

    with open(os.path.join(checkpoint, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg)
    if bert_overrides:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, **bert_overrides)
    weights = None
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(checkpoint, name)
        if os.path.exists(p):
            weights = load_torch_state_dict(p)
            break
    if weights is None:
        raise FileNotFoundError(f"no weights in {checkpoint}")
    model = build_dual_encoder(model_type, cfg)
    use_head = model.cfg.use_head and any(
        k.startswith("embeddingHead") for k in weights
    )
    params = dual_encoder_params_from_torch(weights, cfg, use_head=use_head)
    if model.cfg.two_tower and "doc_encoder" not in params:
        # single-backbone checkpoint bootstraps both towers (the reference
        # inits question_model and ctx_model from the same pretrained BERT,
        # warmup/model/models.py:300-302)
        import copy as _copy

        params["doc_encoder"] = _copy.deepcopy(params["encoder"])
    needs_fresh = (model.cfg.use_head and not use_head) or (
        model.cfg.pooling == "pooler"
        and "pooler" not in params["encoder"]
    )
    if needs_fresh:
        # missing head/pooler weights (bare backbone checkpoint): fresh init.
        # flax only materializes params on the traced path, so init both
        # towers (query_emb never touches doc_encoder).
        import jax
        import jax.numpy as jnp

        dummy = (jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))
        init = dict(model.init(jax.random.PRNGKey(0), *dummy)["params"])
        if model.cfg.two_tower:
            init.update(
                model.init(
                    jax.random.PRNGKey(0), *dummy, method=model.body_emb
                )["params"]
            )
        if model.cfg.use_head and not use_head:
            params["head"] = init["head"]
            if model.cfg.two_tower:
                params["doc_head"] = init["doc_head"]
        for tower in ("encoder", "doc_encoder"):
            if (model.cfg.pooling == "pooler" and tower in params
                    and "pooler" not in params[tower]):
                params[tower]["pooler"] = init[tower]["pooler"]
    return model, params, cfg


def cmd_presets(args):
    from cocodr_tpu.core.configs import PRESETS, to_json

    for name, fn in PRESETS.items():
        print(f"== {name} ==")
        print(to_json(fn()))


def cmd_eval_beir(args):
    _setup_jax(args)
    from cocodr_tpu.pipelines.eval_beir import eval_beir

    mesh = _build_mesh(args)
    model, params, _ = _load_model_params(
        args.checkpoint, args.model_type,
        bert_overrides={"matmul_int8": True} if args.int8_encode else None,
    )
    tokenizer = _load_tokenizer(args.tokenizer or args.checkpoint)
    kw = {}
    if args.query_len:
        kw["query_len"] = args.query_len
    if args.doc_len:
        kw["doc_len"] = args.doc_len
    task = args.task or os.path.basename(os.path.normpath(args.data_dir))
    metrics = eval_beir(
        model,
        params,
        args.data_dir,
        args.work_dir,
        tokenizer,
        task=task,
        mesh=mesh,
        batch_size=args.batch_size,
        top_k=args.top_k,
        exact_fp32=args.exact_fp32,
        length_buckets=_parse_buckets(args.length_buckets),
        search_method=args.search_method,
        ivf_nprobe=getattr(args, "ivf_nprobe", 32),
        **kw,
    )
    if args.result_dir:
        # per-BEIR-task group curve protocol consumed by the ANCE trainer
        # (reference ANCE/drivers/run_ann.py:270-284)
        from cocodr_tpu.pipelines.ance import write_group_ndcg

        write_group_ndcg(
            args.result_dir,
            task,
            args.result_num,
            metrics["ndcg_cut_10"],
            checkpoint=args.checkpoint,
        )
    logger = _metrics_logger(args)
    if logger:
        logger.log(args.result_num, metrics, prefix=f"beir/{task}/")
        logger.close()
    print(json.dumps(metrics, indent=2))


# Published BEIR-avg nDCG@10 per released checkpoint (reference
# README.md:72-81). Keyed by checkpoint dir basename / hub name tail so
# `parity --checkpoint /ckpts/cocodr-base-msmarco` resolves its target
# automatically the day checkpoints mount.
EXPECTED_BEIR_AVG = {
    "cocodr-base-msmarco": 0.461,
    "cocodr-base-msmarco-idro-only": 0.447,
    "cocodr-base-msmarco-warmup": 0.435,
    "cocodr-base": 0.288,
    "cocodr-large-msmarco": 0.484,
    "cocodr-large-msmarco-idro-only": 0.462,
    "cocodr-large-msmarco-warmup": 0.456,
    "cocodr-large": 0.316,
}


def cmd_parity(args):
    """One-command quality-parity check (round-4 verdict ask #8): given a
    published-checkpoint dir and one or more BEIR task dirs, run
    convert -> encode -> exact search -> nDCG@10 and print the comparison
    against the reference's published numbers (reference README.md:72-81).
    Exit code 1 on FAIL so it gates in CI the day checkpoints mount."""
    _setup_jax(args)
    from cocodr_tpu.pipelines.eval_beir import eval_beir

    model, params, _ = _load_model_params(args.checkpoint, args.model_type)
    tokenizer = _load_tokenizer(args.tokenizer or args.checkpoint)
    kw = {}
    if args.query_len:
        kw["query_len"] = args.query_len
    if args.doc_len:
        kw["doc_len"] = args.doc_len
    per_task = {}
    for data_dir in args.beir_dir:
        task = os.path.basename(os.path.normpath(data_dir))
        metrics = eval_beir(
            model, params, data_dir,
            os.path.join(args.work_dir, task), tokenizer, task=task,
            batch_size=args.batch_size, top_k=args.top_k,
            exact_fp32=args.exact_fp32, **kw,
        )
        per_task[task] = metrics["ndcg_cut_10"]
        print(f"{task}: nDCG@10 = {metrics['ndcg_cut_10']:.4f}")
    avg = sum(per_task.values()) / len(per_task)
    expected = args.expect_ndcg
    if expected is None:
        name = os.path.basename(os.path.normpath(args.checkpoint))
        expected = EXPECTED_BEIR_AVG.get(name)
    result = {
        "checkpoint": args.checkpoint,
        "tasks": per_task,
        "avg_ndcg_cut_10": round(avg, 4),
        "expected": expected,
    }
    if expected is not None:
        ok = abs(avg - expected) <= args.tolerance
        result["parity"] = "PASS" if ok else "FAIL"
        print(
            f"parity {result['parity']}: avg nDCG@10 {avg:.4f} vs published "
            f"{expected:.4f} (+/-{args.tolerance}) "
            f"[reference README.md:72-81]"
        )
    else:
        print(
            "no published number for this checkpoint name; pass "
            "--expect-ndcg (known: " + ", ".join(EXPECTED_BEIR_AVG) + ")"
        )
    print(json.dumps(result))
    if result.get("parity") == "FAIL":
        sys.exit(1)


def cmd_preprocess_msmarco(args):
    from cocodr_tpu.data.preprocess import (
        rewrite_qrels,
        tokenize_msmarco_passages,
        tokenize_queries,
    )

    tokenizer = _load_tokenizer(args.tokenizer)
    os.makedirs(args.out, exist_ok=True)
    lowercase = "condenser" in args.model_type
    pid2off = tokenize_msmarco_passages(
        args.collection,
        os.path.join(args.out, "passages"),
        tokenizer,
        args.max_seq_length,
        lowercase=lowercase,
        data_type=args.data_type,
        n_workers=args.n_workers,
    )
    for split, qfile, qrfile in (
        ("train", args.train_queries, args.train_qrels),
        ("dev", args.dev_queries, args.dev_qrels),
    ):
        if not qfile:
            continue
        qid2off = tokenize_queries(
            qfile,
            os.path.join(args.out, f"{split}-query"),
            tokenizer,
            args.max_query_length,
            lowercase=lowercase,
            n_workers=args.n_workers,
        )
        if qrfile:
            rewrite_qrels(
                qrfile,
                os.path.join(args.out, f"{split}-qrel.tsv"),
                qid2off,
                pid2off,
            )
    print(f"wrote records to {args.out}")


def cmd_preprocess_beir(args):
    """Standalone BEIR tokenization (stage 1 of the reference's 3-stage
    eval pipeline); eval-beir also does this on demand."""
    from cocodr_tpu.pipelines.eval_beir import BeirEvalConfig, prepare_beir_task

    tokenizer = _load_tokenizer(args.tokenizer)
    kw = {}
    if args.query_len:
        kw["query_len"] = args.query_len
    if args.doc_len:
        kw["doc_len"] = args.doc_len
    cfg = BeirEvalConfig.for_task(args.task or os.path.basename(
        os.path.normpath(args.data_dir)), **kw)
    prepare_beir_task(args.data_dir, args.out, tokenizer, cfg,
                      n_workers=args.n_workers)
    print(f"tokenized {args.data_dir} -> {args.out}")


def cmd_encode(args):
    """Encode a token-record file to .npy embeddings — the reference's
    encode-only stage (evaluate/drivers/run_ann_data_gen.py:273-274
    --inference; per-rank pickles become one device-encoded .npy + the
    id map already sitting next to the records)."""
    _setup_jax(args)
    import numpy as np

    from cocodr_tpu.data.native import open_token_cache
    from cocodr_tpu.pipelines.encode import EncodeConfig, Encoder, encode_cache

    mesh = _build_mesh(args)
    model, params, _ = _load_model_params(
        args.checkpoint, args.model_type,
        bert_overrides={"matmul_int8": True} if args.int8_encode else None,
    )
    cache = open_token_cache(args.records)
    enc = Encoder(
        model, params, mesh=mesh, is_query=args.queries,
        noise_level=args.noise_level,
    )
    ecfg = EncodeConfig(
        batch_size=args.batch_size,
        length_buckets=_parse_buckets(args.length_buckets),
    )
    chunk_len = getattr(model.cfg, "chunk_len", 0)
    if chunk_len and cache.max_len > chunk_len:
        from cocodr_tpu.pipelines.encode import encode_cache_multivector

        emb, row2doc = encode_cache_multivector(
            enc, cache, ecfg, chunk_len=chunk_len
        )
        np.save(args.out + ".rows.npy", row2doc)
    else:
        emb = encode_cache(enc, cache, ecfg)
    np.save(args.out + ".tmp.npy", emb)
    os.replace(args.out + ".tmp.npy", args.out)
    print(json.dumps({
        "out": args.out, "n": int(emb.shape[0]), "dim": int(emb.shape[1]),
    }))


def cmd_serve(args):
    """Online retrieval REPL: one query per stdin line -> one JSON line of
    the top-k (doc_id, score) pairs. Corpus embeddings come from --emb
    (a .npy from `encode`) or are encoded at startup from --records."""
    _setup_jax(args)
    import sys as _sys

    import numpy as np

    from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

    model, params, _ = _load_model_params(
        args.checkpoint, args.model_type,
        bert_overrides={"matmul_int8": True} if args.int8_encode else None,
    )
    tokenizer = _load_tokenizer(args.tokenizer or args.checkpoint)
    doc_ids = None
    if args.emb:
        corpus_emb = np.load(args.emb)
    else:
        from cocodr_tpu.data.native import open_token_cache
        from cocodr_tpu.pipelines.encode import (
            EncodeConfig,
            Encoder,
            encode_cache,
        )

        cache = open_token_cache(args.records)
        corpus_emb = encode_cache(
            Encoder(model, params, is_query=False),
            cache,
            EncodeConfig(batch_size=args.batch_size),
        )
    if args.id_map:
        from cocodr_tpu.data.records import load_id_map

        id2off = load_id_map(args.id_map)
        off2id = {v: k for k, v in id2off.items()}
        doc_ids = [off2id.get(i, i) for i in range(corpus_emb.shape[0])]
    service = RetrievalService(
        model, params, tokenizer, corpus_emb, doc_ids=doc_ids,
        cfg=ServeConfig(
            top_k=args.top_k,
            fast_search=args.fast,
            quantize_int8=args.int8,
            exact_fp32=args.exact_fp32,
            ivf=args.search_method == "ivf",
            ivf_nprobe=args.ivf_nprobe,
        ),
        mesh=_build_mesh(args),
    )
    if args.http:
        from cocodr_tpu.pipelines.http_serve import make_server

        # warm the fused program BEFORE accepting traffic: a cold-cache
        # compile at corpus scale takes minutes, which would expire the
        # per-request timeout of everything arriving meanwhile
        service.search([""])
        host, _, port = args.http.rpartition(":")
        server, _ = make_server(
            service, host=host or "127.0.0.1", port=int(port),
            window_s=args.batch_window_ms / 1000.0,
        )
        print(json.dumps({
            "ready": True, "http": args.http,
            "n_docs": int(corpus_emb.shape[0]),
        }), flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.batcher.stop()
            server.server_close()
        return
    if args.queries:
        # Bulk mode: qid\ttext TSV in, TREC run file out, through the
        # pipelined search_stream (batches stay in flight, grouped
        # readbacks — ~3.9x the blocking-call throughput on one chip).
        import time as _time

        qids, texts = [], []
        with open(args.queries) as f:
            for ln in f:
                parts = ln.rstrip("\n").split("\t")
                if len(parts) >= 2:
                    qids.append(parts[0])
                    texts.append(parts[1])
        bs = service.cfg.max_batch
        batches = [texts[i:i + bs] for i in range(0, len(texts), bs)]
        out = open(args.output, "w") if args.output else _sys.stdout
        t0 = _time.time()
        qi = 0
        for vals, ids in service.search_stream(
            batches, depth=args.stream_depth
        ):
            for r in range(len(ids)):
                for rank, (d, v) in enumerate(zip(ids[r], vals[r]), 1):
                    out.write(
                        f"{qids[qi]} Q0 {d} {rank} {float(v):.6f} "
                        f"cocodr_tpu\n"
                    )
                qi += 1
        dt = _time.time() - t0
        if args.output:
            out.close()
        print(json.dumps({
            "queries": len(texts),
            "seconds": round(dt, 3),
            "qps": round(len(texts) / max(dt, 1e-9), 1),
        }), file=_sys.stderr, flush=True)
        return
    print(json.dumps({"ready": True, "n_docs": int(corpus_emb.shape[0])}),
          flush=True)
    for line in _sys.stdin:
        q = line.rstrip("\n")
        if not q:
            continue
        vals, ids = service.search([q])
        print(json.dumps({"query": q, "hits": [
            {"id": str(d), "score": float(v)}
            for d, v in zip(ids[0], vals[0])
        ]}), flush=True)


def cmd_warmup(args):
    _setup_jax(args)
    from cocodr_tpu.core.configs import PRESETS, WarmupStageConfig
    from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
    from cocodr_tpu.pipelines.warmup import WarmupConfig, run_warmup
    from cocodr_tpu.utils.train_state import TrainState

    cfg = PRESETS[args.preset]() if args.preset else WarmupStageConfig.base()
    mesh = _build_mesh(args)
    model, params, _ = _load_model_params(args.checkpoint, cfg.model_type)
    tokenizer = _load_tokenizer(args.tokenizer or args.checkpoint)
    tx = cfg.optimizer.build()
    device_put = None
    if mesh is not None:
        from cocodr_tpu.parallel.sharded_train import shard_train_init

        state, device_put = shard_train_init(mesh, params, tx)
    else:
        state = TrainState.create(params, tx)
    step = build_train_step(model, tx, TrainStepConfig(loss_kind="nll"))
    eval_fn = None
    if args.eval_data_dir:
        from cocodr_tpu.data.native import open_token_cache
        from cocodr_tpu.data.records import load_id_map, load_qrels
        from cocodr_tpu.evals.mrr_eval import combined_mrr, load_top_dev

        dev_qc = open_token_cache(os.path.join(args.eval_data_dir, "dev-query"))
        dev_pc = open_token_cache(os.path.join(args.eval_data_dir, "passages"))
        dev_qrels = {
            q: list(d) for q, d in load_qrels(
                os.path.join(args.eval_data_dir, "dev-qrel.tsv")
            ).items()
        }
        candidates = None
        if getattr(args, "eval_top1000", None):
            # the reference's top1000.dev rerank mode
            # (warmup/utils/eval_mrr.py:166-229)
            candidates = load_top_dev(
                args.eval_top1000,
                load_id_map(os.path.join(args.eval_data_dir,
                                         "dev-query.qid2offset.pickle")),
                load_id_map(os.path.join(args.eval_data_dir,
                                         "passages.pid2offset.pickle")),
            )

        def eval_fn(state):
            m = combined_mrr(
                model, state.params, dev_qc, dev_pc, dev_qrels,
                candidates=candidates,
            )
            print(json.dumps({"step": int(state.step), **m}))

    wcfg = WarmupConfig(
        max_seq_len=args.max_seq_len or cfg.max_seq_len,
        batch_size=args.batch_size or cfg.per_device_batch,
        num_epochs=cfg.num_epochs,
        save_steps=cfg.save_steps,
        max_steps=args.max_steps,
        eval_every_steps=args.eval_every,
        log_every=args.log_every,
    )
    logger = _metrics_logger(args)

    def log_fn(s, m):
        print(json.dumps({"step": s, **m}))
        if logger:
            logger.log(s, m, prefix="warmup/")

    saver = None
    if getattr(args, "async_checkpoint", False):
        from cocodr_tpu.utils.train_state import AsyncSaver

        saver = AsyncSaver()
    run_warmup(
        state,
        step,
        args.triples,
        tokenizer,
        wcfg,
        args.ckpt_dir,
        eval_fn=eval_fn,
        log_fn=log_fn,
        dropout_seed=None if args.no_dropout else args.seed,
        device_put=device_put,
        saver=saver,
    )
    if saver:
        saver.close()
    if logger:
        logger.close()


def cmd_ance(args):
    _setup_jax(args)
    from cocodr_tpu.data.streams import TripletBatcher
    from cocodr_tpu.pipelines.ance import (
        ance_round,
        get_latest_ann_data,
    )
    from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step
    from cocodr_tpu.utils.train_state import save_checkpoint

    (cfg, model, tx, state, pc, qc, dev_qc, positives, dev_qrels, mesh,
     device_put) = _ance_setup(args)
    step = build_train_step(
        model,
        tx,
        TrainStepConfig(
            loss_kind=cfg.loss_kind,
            dro=cfg.dro,
            idro_last_k_layers=cfg.idro_last_k_layers,
            max_grad_norm=cfg.optimizer.max_grad_norm,
        ),
    )
    batcher = TripletBatcher(qc, pc)
    mine_cfg = _mine_config(args, cfg)
    # int8 applies to the mining encodes only; `step` above captured the
    # float model, and both share state.params
    mine_model = _int8_variant(model) if args.int8_encode else model
    logger = _metrics_logger(args)
    work_dir = os.path.join(args.ckpt_dir, "ann_data")
    # resume: the state was restored in _ance_setup; continue at the round
    # after the last mined ann file (reference restarts discover the latest
    # checkpoint + ann data the same way, run_ann.py:998-1002,263-287)
    start_round = 0
    if not args.no_resume:
        last_n, _, _ = get_latest_ann_data(work_dir)
        start_round = last_n + 1
    for rnd in range(start_round, args.rounds):
        state, dev_metrics, steps = ance_round(
            state,
            step,
            mine_model,
            batcher,
            pc,
            qc,
            positives,
            dev_qc,
            dev_qrels,
            work_dir,
            rnd,
            mine_cfg,
            batch_size=args.batch_size or cfg.per_device_batch,
            steps_per_round=args.steps_per_round,
            mesh=mesh,
            dropout_seed=None if args.no_dropout else args.seed,
            device_put=device_put,
        )
        rec = {"round": rnd, "steps": steps,
               **{k: float(v) for k, v in dev_metrics.items()}}
        print(json.dumps(rec))
        if logger:
            logger.log(int(state.step), rec, prefix="ance/")
        save_checkpoint(args.ckpt_dir, state, keep=3)
    if logger:
        logger.close()


def cmd_preprocess_coco(args):
    """BEIR corpora -> span jsonl files (the 18-task COCO mix)."""
    from cocodr_tpu.data.coco_spans import preprocess_corpus_to_spans

    tokenizer = _load_tokenizer(args.tokenizer)
    os.makedirs(args.out, exist_ok=True)
    for data_dir in args.data_dirs:
        task = os.path.basename(os.path.normpath(data_dir))
        out = os.path.join(args.out, f"{task}.spans.jsonl")
        n = preprocess_corpus_to_spans(
            os.path.join(data_dir, "corpus.jsonl"),
            out,
            tokenizer,
            target_len=args.target_len,
        )
        print(f"{task}: {n} documents -> {out}")


def cmd_coco(args):
    _setup_jax(args)
    import glob as _glob

    import jax

    from cocodr_tpu.core.configs import CocoStageConfig, PRESETS
    from cocodr_tpu.data.coco_collator import CoCondenserCollator
    from cocodr_tpu.data.coco_spans import span_batches
    from cocodr_tpu.models.condenser import (
        CoCondenserForPretraining,
        condenser_params_from_torch,
    )
    from cocodr_tpu.models.hf import config_from_hf, load_torch_state_dict
    from cocodr_tpu.pipelines.coco import (
        CocoConfig,
        build_coco_train_step,
        run_coco_pretrain,
    )
    from cocodr_tpu.utils.train_state import TrainState

    cfg = PRESETS[args.preset]() if args.preset else CocoStageConfig.base()
    with open(os.path.join(args.checkpoint, "config.json")) as f:
        bert_cfg = config_from_hf(json.load(f))
    model = CoCondenserForPretraining(
        bert_cfg,
        n_head_layers=cfg.n_head_layers,
        skip_from=cfg.skip_from,
        late_mlm=cfg.late_mlm,
        mlm_budget_frac=cfg.mlm_budget_frac,
    )
    weights = None
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(args.checkpoint, name)
        if os.path.exists(p):
            weights = load_torch_state_dict(p)
            break
    head_sd = None
    head_path = os.path.join(args.checkpoint, "model.pt")
    if os.path.exists(head_path):
        head_sd = load_torch_state_dict(head_path)
    params = condenser_params_from_torch(
        weights, bert_cfg, cfg.n_head_layers, head_state_dict=head_sd
    )
    if head_sd is None:
        # fresh c_head init (the from-scratch Condenser case)
        import jax.numpy as jnp

        init = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((2, 8), jnp.int32),
            jnp.ones((2, 8), jnp.int32),
            jnp.full((2, 8), -100, jnp.int32),
        )["params"]
        for i in range(cfg.n_head_layers):
            params[f"c_head_{i}"] = init[f"c_head_{i}"]

    tokenizer = _load_tokenizer(args.tokenizer or args.checkpoint)
    max_seq = args.max_seq_length or cfg.max_seq_length
    collator = CoCondenserCollator(
        tokenizer,
        mlm_probability=cfg.mlm_probability,
        max_seq_length=max_seq,
    )
    span_files = sorted(_glob.glob(os.path.join(args.train_dir, "*.jsonl")))
    docs_per_batch = args.batch_docs or cfg.per_device_batch_docs

    # warmup_ratio -> warmup steps from the actual step budget (reference
    # COCO/trainer.py:66-70: warmup_steps = num_training_steps * ratio)
    from cocodr_tpu.data.coco_spans import count_span_batches

    total_steps = count_span_batches(
        span_files, docs_per_batch, cfg.num_epochs
    )
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps) or args.max_steps
    opt_cfg = cfg.optimizer
    if cfg.warmup_ratio > 0 and total_steps > 0:
        import dataclasses as _dc

        opt_cfg = _dc.replace(
            opt_cfg,
            warmup_steps=cfg.warmup_steps_for(total_steps),
            total_steps=total_steps,
        )
    tx = opt_cfg.build()
    mesh = _build_mesh(args)
    device_put = None
    if mesh is not None:
        from cocodr_tpu.parallel.sharded_train import shard_train_init

        state, device_put = shard_train_init(mesh, params, tx)
    else:
        state = TrainState.create(params, tx)

    # resume from the latest DONE checkpoint (the reference resumes via the
    # HF Trainer's model_path, COCO/run_coco_pre_training.py:146-152)
    from cocodr_tpu.utils.train_state import latest_checkpoint, load_checkpoint

    start_step = 0
    if not args.no_resume and args.ckpt_dir:
        ck = latest_checkpoint(args.ckpt_dir)
        if ck:
            state = load_checkpoint(ck, state)
            start_step = int(state.step)
            print(f"resumed from {ck} (step {start_step})")

    batches = span_batches(
        span_files,
        collator,
        docs_per_batch=docs_per_batch,
        num_epochs=cfg.num_epochs,
        start_batch=start_step,
    )
    step = build_coco_train_step(
        model,
        tx,
        CocoConfig(
            max_seq_length=max_seq,
            cache_chunk_size=args.cache_chunk_size,
        ),
    )
    logger = _metrics_logger(args)
    saver = None
    if args.async_checkpoint:
        from cocodr_tpu.utils.train_state import AsyncSaver

        saver = AsyncSaver()

    def log_fn(s, m):
        print(json.dumps({"step": s, **m}))
        if logger:
            logger.log(s, m, prefix="coco/")

    run_coco_pretrain(
        state,
        step,
        batches,
        jax.random.key(args.seed, impl=args.dropout_rng),
        max_steps=args.max_steps,
        log_fn=log_fn,
        ckpt_dir=args.ckpt_dir,
        save_steps=args.save_steps,
        device_put=device_put,
        saver=saver,
    )
    if saver:
        saver.close()
    if logger:
        logger.close()


def _ance_setup(args):
    """Shared state for the ance / ance-mine / ance-train jobs: config,
    model, mesh-sharded train state (resumed from the latest DONE checkpoint
    unless --no-resume), token caches and qrels."""
    import dataclasses as _dc

    from cocodr_tpu.core.configs import AnceStageConfig, PRESETS
    from cocodr_tpu.data.native import open_token_cache
    from cocodr_tpu.data.records import load_qrels
    from cocodr_tpu.losses import dro_greedy_init
    from cocodr_tpu.utils.train_state import (
        TrainState,
        latest_checkpoint,
        load_checkpoint,
    )

    cfg = PRESETS[args.preset]() if args.preset else AnceStageConfig.base()
    if getattr(args, "loss_kind", None):
        # the reference's --dro_type switch incl. its absence = plain NLL
        # (ANCE/drivers/run_ann.py:903-906)
        cfg = _dc.replace(cfg, loss_kind=args.loss_kind)
    if getattr(args, "n_groups", 0):
        cfg = _dc.replace(cfg, dro=_dc.replace(cfg.dro,
                                               n_groups=args.n_groups))
    if getattr(args, "weight_ema", False):
        # reference --weight_ema (run_ann.py:792,906): EMA-blend the
        # greedy h_fun update from the running-fraction cutoff
        cfg = _dc.replace(cfg, dro=_dc.replace(cfg.dro, weight_ema=True))
    # DRO hyperparameters (reference --alpha/--eps/--rho/--ema,
    # run_ann.py:905-906; preset defaults carry the published values)
    for flag, field in (("dro_alpha", "alpha"), ("dro_eps", "eps"),
                        ("dro_rho", "rho"), ("dro_ema", "ema")):
        v = getattr(args, flag, None)
        if v is not None:
            cfg = _dc.replace(cfg, dro=_dc.replace(cfg.dro, **{field: v}))
    if getattr(args, "rewarmup", False):
        # per-episode LR re-warmup + cross-episode decay
        # (reference ANCE/drivers/run_ann.py:120-125,248-266)
        episode = getattr(args, "steps_per_round", 0) or cfg.max_steps_per_episode
        cfg = _dc.replace(
            cfg,
            optimizer=_dc.replace(
                cfg.optimizer,
                schedule="episode-rewarmup",
                episode_steps=episode,
            ),
        )
    mesh = _build_mesh(args)
    model, params, _ = _load_model_params(args.checkpoint, cfg.model_type)
    tx = cfg.optimizer.build()
    extra = dro_greedy_init(cfg.dro) if cfg.loss_kind != "nll" else None
    device_put = None
    if mesh is not None:
        from cocodr_tpu.parallel.sharded_train import shard_train_init

        state, device_put = shard_train_init(mesh, params, tx, extra=extra)
    else:
        state = TrainState.create(params, tx, extra=extra)
    if not getattr(args, "no_resume", False):
        ck = latest_checkpoint(args.ckpt_dir)
        if ck:
            state = load_checkpoint(ck, state)
            print(json.dumps({"resumed": ck, "step": int(state.step)}))
    pc = open_token_cache(os.path.join(args.data_dir, "passages"))
    qc = open_token_cache(os.path.join(args.data_dir, "train-query"))
    dev_qc = open_token_cache(os.path.join(args.data_dir, "dev-query"))
    train_qrels = load_qrels(os.path.join(args.data_dir, "train-qrel.tsv"))
    positives = {q: max(d, key=d.get) for q, d in train_qrels.items()}
    dev_qrels = load_qrels(os.path.join(args.data_dir, "dev-qrel.tsv"))
    return (cfg, model, tx, state, pc, qc, dev_qc, positives, dev_qrels,
            mesh, device_put)


def _int8_variant(model):
    """Clone a dual encoder with matmul_int8=True for the W8A8 PTQ encode
    path. Same param tree — the int8 blocks quantize from the shared float
    params at apply time, so the clone shares `state.params` with the fp
    training model; only the encode-side compute changes."""
    import dataclasses as _dc

    from cocodr_tpu.models.dual_encoder import DualEncoder

    cfg = model.cfg
    return DualEncoder(
        _dc.replace(cfg, bert=_dc.replace(cfg.bert, matmul_int8=True))
    )


def _add_miner_knobs(sp):
    """Miner flags shared by `ance` and `ance-mine` (parity with
    run_ann_data_gen.py's CLI surface)."""
    sp.add_argument("--search-method", default="auto",
                    choices=["auto", "pallas", "exact2", "fast", "blockmax",
                             "refined", "naive", "ivf"])
    sp.add_argument("--ivf-nprobe", type=int, default=32,
                    help="clusters probed per query with "
                         "--search-method ivf (recall knob)")
    sp.add_argument("--emb-cache-dir", default="",
                    help="reuse corpus embeddings per checkpoint "
                         "(reference embedding_dir_exist/load_embedding)")
    sp.add_argument("--ann-chunk-factor", type=int, default=1,
                    help="mine 1/N of the train queries per round, "
                         "rotating (reference ann_chunk_factor)")
    sp.add_argument("--exact-fp32", action="store_true",
                    help="fp32 sweep for FAISS-bit parity")
    sp.add_argument("--emb-cache-keep", type=int, default=2,
                    help="keep the N newest cached corpus embedding dumps "
                         "(0 = keep all; reference "
                         "--only_keep_latest_embedding_file)")
    sp.add_argument("--int8-encode", action="store_true",
                    help="W8A8 int8 FFN blocks for the mining encodes "
                         "(PTQ inference mode; training stays float)")


def _mine_config(args, cfg):
    """MineConfig from stage config + the miner's CLI knobs (parity with
    run_ann_data_gen.py flags: --search-method, --emb-cache-dir for
    embedding reuse :438-495, --ann-chunk-factor :332-386)."""
    from cocodr_tpu.pipelines.ance import MineConfig

    return MineConfig(
        topk_training=cfg.topk_training,
        negative_sample=cfg.negative_sample,
        cluster_query=cfg.loss_kind != "nll",
        cluster_centroids=cfg.dro.n_groups,
        batch_size=cfg.eval_batch,
        length_buckets=_parse_buckets(getattr(args, "length_buckets", "")),
        search_method=getattr(args, "search_method", "auto") or "auto",
        ivf_nprobe=getattr(args, "ivf_nprobe", 32) or 32,
        emb_cache_dir=getattr(args, "emb_cache_dir", "") or "",
        emb_cache_keep=getattr(args, "emb_cache_keep", 2),
        ann_chunk_factor=getattr(args, "ann_chunk_factor", 1) or 1,
        exact_fp32=bool(getattr(args, "exact_fp32", False)),
    )


def cmd_ance_mine(args):
    """Async producer job (the reference's run_ann_data_gen.py)."""
    _setup_jax(args)
    from cocodr_tpu.pipelines.ance import (
        checkpoint_params_loader,
        mine_loop,
    )

    (cfg, model, tx, state, pc, qc, dev_qc, positives, dev_qrels, mesh,
     _device_put) = _ance_setup(args)
    if getattr(args, "int8_encode", False):
        model = _int8_variant(model)
    mine_loop(
        model,
        checkpoint_params_loader(args.ckpt_dir, state),
        os.path.join(args.ckpt_dir, "ann_data"),
        poll_secs=args.poll_secs,
        max_rounds=args.rounds if args.rounds > 0 else None,
        passage_cache=pc,
        train_query_cache=qc,
        train_positives=positives,
        dev_query_cache=dev_qc,
        dev_qrels=dev_qrels,
        mesh=mesh,
        cfg=_mine_config(args, cfg),
    )


def cmd_ance_train(args):
    """Async consumer job (the reference's run_ann.py)."""
    _setup_jax(args)
    from cocodr_tpu.data.streams import TripletBatcher
    from cocodr_tpu.pipelines.ance import train_loop
    from cocodr_tpu.pipelines.train_step import TrainStepConfig, build_train_step

    (cfg, model, tx, state, pc, qc, dev_qc, positives, dev_qrels, mesh,
     device_put) = _ance_setup(args)
    step = build_train_step(
        model,
        tx,
        TrainStepConfig(
            loss_kind=cfg.loss_kind,
            dro=cfg.dro,
            idro_last_k_layers=cfg.idro_last_k_layers,
            max_grad_norm=cfg.optimizer.max_grad_norm,
        ),
    )
    logger = _metrics_logger(args)
    saver = None
    if getattr(args, "async_checkpoint", False):
        from cocodr_tpu.utils.train_state import AsyncSaver

        saver = AsyncSaver()
    train_loop(
        state,
        step,
        TripletBatcher(qc, pc),
        os.path.join(args.ckpt_dir, "ann_data"),
        args.ckpt_dir,
        batch_size=args.batch_size or cfg.per_device_batch,
        poll_secs=args.poll_secs,
        max_ann_files=args.rounds if args.rounds > 0 else None,
        steps_per_file=args.steps_per_round,
        metrics_cb=lambda s, m: (
            print(json.dumps({"step": s, "loss": float(m["loss"])}))
            if s % 100 == 0
            else None
        ),
        resume=not args.no_resume,
        dropout_seed=None if args.no_dropout else args.seed,
        metrics_logger=logger,
        group_result_dir=args.result_dir,
        device_put=device_put,
        saver=saver,
    )
    if saver:
        saver.close()
    if logger:
        logger.close()


def cmd_export_hf(args):
    """Export a framework checkpoint back to HF torch format.

    Two sources:
    - an HF dual-encoder dir (default): backbone + the rdot_nll projection
      head under the reference's `embeddingHead.*`/`norm.*` naming
      (ANCE/model/models.py:109-110); a source `model.pt` (Condenser c_head,
      unused on the embedding path) is carried through verbatim.
    - --from-orbax: a COCO pretraining checkpoint (orbax TrainState) ->
      backbone + MLM head in pytorch_model.bin, c_head split into model.pt
      (reference COCO/modeling.py:123-131) — the `coco_ck/export` handoff
      the warmup stage consumes (docs/commands.md).
    """
    import shutil as _shutil

    from cocodr_tpu.utils.train_state import export_hf_bert

    if args.from_orbax:
        import orbax.checkpoint as ocp

        from cocodr_tpu.models.condenser import condenser_params_to_torch
        from cocodr_tpu.models.hf import config_from_hf
        from cocodr_tpu.utils.train_state import latest_checkpoint

        with open(os.path.join(args.config, "config.json")) as f:
            cfg = config_from_hf(json.load(f))
        ck = args.checkpoint
        if not os.path.exists(os.path.join(ck, "state")):
            ck = latest_checkpoint(ck) or ck
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.path.join(ck, "state"))
        )
        params = restored["params"]
        backbone_sd, head_sd = condenser_params_to_torch(params, cfg)
        # backbone keys are already torch-named; reuse export for config +
        # model.pt, passing the MLM-head keys through extra_state
        mlm_keys = {k: v for k, v in backbone_sd.items()
                    if k.startswith("cls.")}
        export_hf_bert(
            params["bert"], cfg, args.out,
            head_params=head_sd or None, extra_state=mlm_keys,
        )
        print(f"exported COCO checkpoint {ck} to {args.out}")
        return

    model, params, cfg = _load_model_params(args.checkpoint, args.model_type)
    if model.cfg.two_tower:
        # DPR: both towers under the BiEncoder's state-dict naming
        import torch

        from cocodr_tpu.models.hf import dpr_params_to_torch
        from cocodr_tpu.utils.train_state import export_hf_bert as _export

        _export(params["encoder"], cfg, args.out)  # config.json + tower 0
        sd = {
            k: torch.tensor(v)
            for k, v in dpr_params_to_torch(params, cfg).items()
        }
        torch.save(sd, os.path.join(args.out, "pytorch_model.bin"))
        print(f"exported DPR BiEncoder checkpoint to {args.out}")
        return
    extra = None
    if model.cfg.use_head and "head" in params:
        from cocodr_tpu.models.hf import dual_head_params_to_torch

        extra = dual_head_params_to_torch(params["head"])
    export_hf_bert(params["encoder"], cfg, args.out, extra_state=extra)
    src_cpt = os.path.join(args.checkpoint, "model.pt")
    if os.path.exists(src_cpt):
        _shutil.copy(src_cpt, os.path.join(args.out, "model.pt"))
    print(f"exported HF checkpoint to {args.out}")


def cmd_convert_hf(args):
    """HF torch checkpoint dir -> report + (optionally) flax export check."""
    model, params, cfg = _load_model_params(args.hf_dir, args.model_type)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"converted {args.hf_dir}: {n/1e6:.1f}M params, "
          f"{cfg.num_hidden_layers} layers, hidden {cfg.hidden_size}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="cocodr_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("presets")
    sp.set_defaults(fn=cmd_presets)

    sp = sub.add_parser("eval-beir")
    _add_common(sp)
    sp.add_argument("--data-dir", required=True)
    sp.add_argument("--work-dir", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--tokenizer", default=None)
    sp.add_argument("--task", default=None)
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.add_argument("--batch-size", type=int, default=512)
    sp.add_argument("--top-k", type=int, default=1000)
    sp.add_argument("--query-len", type=int, default=0)
    sp.add_argument("--doc-len", type=int, default=0)
    sp.add_argument("--exact-fp32", action="store_true")
    sp.add_argument("--length-buckets", default="",
                    help="comma-separated ascending encode widths (last >= "
                         "doc len), e.g. 64,128 — recovers padding waste")
    sp.add_argument("--search-method", default="auto",
                    choices=["auto", "pallas", "exact2", "fast", "blockmax",
                             "refined", "naive", "ivf"])
    sp.add_argument("--ivf-nprobe", type=int, default=32,
                    help="clusters probed per query with "
                         "--search-method ivf (recall knob)")
    sp.add_argument("--result-dir", default=None,
                    help="write ann_ndcg_group_{task}_{n} for the ANCE "
                         "trainer's per-task TB curves")
    sp.add_argument("--result-num", type=int, default=0)
    sp.add_argument("--int8-encode", action="store_true",
                    help="W8A8 int8 FFN blocks for corpus/query encoding "
                         "(PTQ inference mode)")
    sp.set_defaults(fn=cmd_eval_beir)

    sp = sub.add_parser(
        "parity",
        help="published-checkpoint quality parity vs reference "
             "README.md:72-81 (convert -> encode -> exact search -> nDCG@10)")
    _add_common(sp)
    sp.add_argument("--checkpoint", required=True,
                    help="HF checkpoint dir (e.g. a mounted "
                         "OpenMatch/cocodr-base-msmarco)")
    sp.add_argument("--beir-dir", action="append", required=True,
                    help="BEIR task dir (corpus.jsonl/queries.jsonl/qrels); "
                         "repeat for multi-task average")
    sp.add_argument("--work-dir", default="/tmp/cocodr_parity")
    sp.add_argument("--tokenizer", default=None)
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.add_argument("--batch-size", type=int, default=512)
    sp.add_argument("--top-k", type=int, default=1000)
    sp.add_argument("--query-len", type=int, default=0)
    sp.add_argument("--doc-len", type=int, default=0)
    sp.add_argument("--exact-fp32", action="store_true")
    sp.add_argument("--expect-ndcg", type=float, default=None,
                    help="override the built-in published target")
    sp.add_argument("--tolerance", type=float, default=0.005)
    sp.set_defaults(fn=cmd_parity)

    sp = sub.add_parser("encode")
    _add_common(sp)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--records", required=True,
                    help="token-record file (from preprocess-*)")
    sp.add_argument("--out", required=True, help=".npy output path")
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.add_argument("--batch-size", type=int, default=512)
    sp.add_argument("--queries", action="store_true",
                    help="encode with query_emb (default: body_emb)")
    sp.add_argument("--noise-level", type=float, default=0.0)
    sp.add_argument("--length-buckets", default="")
    sp.add_argument("--int8-encode", action="store_true",
                    help="W8A8 int8 FFN blocks (PTQ inference mode, "
                         "+8-17%% encode throughput — docs/performance.md)")
    sp.set_defaults(fn=cmd_encode)

    sp = sub.add_parser("serve")
    _add_common(sp)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--tokenizer", default=None)
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.add_argument("--records", default=None)
    sp.add_argument("--emb", default=None, help=".npy corpus embeddings")
    sp.add_argument("--id-map", default=None,
                    help="docid2offset pickle for external ids")
    sp.add_argument("--batch-size", type=int, default=512)
    sp.add_argument("--top-k", type=int, default=10)
    sp.add_argument("--fast", action="store_true")
    sp.add_argument("--int8", action="store_true")
    sp.add_argument("--int8-encode", action="store_true",
                    help="W8A8 int8 FFN blocks for query encoding")
    sp.add_argument("--exact-fp32", action="store_true")
    sp.add_argument("--search-method", default="auto",
                    choices=["auto", "ivf"],
                    help="ivf: clustered approximate search for corpora "
                         "past the int8 ceiling (>16.4M docs/chip); "
                         "recall/latency curve in docs/performance.md")
    sp.add_argument("--ivf-nprobe", type=int, default=32,
                    help="--search-method ivf: clusters probed per query "
                         "(recall knob)")
    sp.add_argument("--queries", default=None,
                    help="qid\\ttext TSV: bulk mode -> TREC run via the "
                         "pipelined search_stream (no REPL)")
    sp.add_argument("--output", default=None,
                    help="bulk mode: TREC run file (default stdout)")
    sp.add_argument("--stream-depth", type=int, default=8,
                    help="bulk mode: query batches kept in flight")
    sp.add_argument("--http", default=None, metavar="[HOST:]PORT",
                    help="serve over HTTP with dynamic batching "
                         "(GET /healthz, POST /search)")
    sp.add_argument("--batch-window-ms", type=float, default=2.0,
                    help="http mode: request-coalescing window")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("preprocess-msmarco")
    sp.add_argument("--collection", required=True)
    sp.add_argument("--train-queries")
    sp.add_argument("--train-qrels")
    sp.add_argument("--dev-queries")
    sp.add_argument("--dev-qrels")
    sp.add_argument("--out", required=True)
    sp.add_argument("--tokenizer", required=True)
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.add_argument("--data-type", type=int, default=1)
    sp.add_argument("--max-seq-length", type=int, default=128)
    sp.add_argument("--max-query-length", type=int, default=64)
    sp.add_argument("--n-workers", type=int, default=1,
                    help="parallel tokenizer processes (reference uses 32, "
                    "ANCE/utils/util.py:420-436); output is byte-identical")
    sp.set_defaults(fn=cmd_preprocess_msmarco)

    sp = sub.add_parser("preprocess-beir")
    sp.add_argument("--data-dir", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--tokenizer", required=True)
    sp.add_argument("--task", default=None)
    sp.add_argument("--n-workers", type=int, default=1)
    sp.add_argument("--query-len", type=int, default=0)
    sp.add_argument("--doc-len", type=int, default=0)
    sp.set_defaults(fn=cmd_preprocess_beir)

    sp = sub.add_parser("warmup")
    _add_common(sp)
    sp.add_argument("--triples", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--tokenizer", default=None)
    sp.add_argument("--ckpt-dir", required=True)
    sp.add_argument("--batch-size", type=int, default=0)
    sp.add_argument("--max-steps", type=int, default=0)
    sp.add_argument("--eval-data-dir", default=None)
    sp.add_argument("--eval-top1000", default=None,
                    help="top1000.dev candidate file (qid\\tpid...): adds "
                         "reranking MRR to the in-training eval")
    sp.add_argument("--eval-every", type=int, default=0)
    sp.add_argument("--no-dropout", action="store_true")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--max-seq-len", type=int, default=0,
                    help="override the preset sequence length")
    sp.add_argument("--log-every", type=int, default=100)
    sp.add_argument("--async-checkpoint", action="store_true",
                    help="non-blocking orbax saves (DONE marker preserved)")
    sp.set_defaults(fn=cmd_warmup)

    sp = sub.add_parser("ance")
    _add_common(sp)
    sp.add_argument("--data-dir", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--ckpt-dir", required=True)
    sp.add_argument("--rounds", type=int, default=10)
    sp.add_argument("--steps-per-round", type=int, default=5000)
    sp.add_argument("--batch-size", type=int, default=0)
    sp.add_argument("--no-resume", action="store_true")
    sp.add_argument("--rewarmup", action="store_true",
                    help="episode-rewarmup LR schedule (re-warm per round)")
    sp.add_argument("--loss-kind", default=None,
                    choices=["nll", "dro-greedy", "idro"],
                    help="override the preset loss (reference --dro_type; "
                         "absent = plain NLL, run_ann.py:903-906)")
    sp.add_argument("--n-groups", type=int, default=0)
    sp.add_argument("--weight-ema", action="store_true",
                    help="EMA-blend the greedy h_fun update (reference "
                         "--weight_ema, run_ann.py:792,906)")
    sp.add_argument("--dro-alpha", type=float, default=None)
    sp.add_argument("--dro-eps", type=float, default=None)
    sp.add_argument("--dro-rho", type=float, default=None)
    sp.add_argument("--dro-ema", type=float, default=None)
    sp.add_argument("--length-buckets", default="")
    sp.add_argument("--no-dropout", action="store_true")
    sp.add_argument("--seed", type=int, default=0)
    _add_miner_knobs(sp)
    sp.set_defaults(fn=cmd_ance)

    for name, fn in (("ance-mine", cmd_ance_mine), ("ance-train", cmd_ance_train)):
        sp = sub.add_parser(name)
        _add_common(sp)
        sp.add_argument("--data-dir", required=True)
        sp.add_argument("--checkpoint", required=True)
        sp.add_argument("--ckpt-dir", required=True)
        sp.add_argument("--rounds", type=int, default=0)
        sp.add_argument("--poll-secs", type=float, default=60.0)
        sp.add_argument("--batch-size", type=int, default=0)
        sp.add_argument("--steps-per-round", type=int, default=5000)
        sp.add_argument("--no-resume", action="store_true")
        sp.add_argument("--rewarmup", action="store_true")
        sp.add_argument("--no-dropout", action="store_true")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--result-dir", default=None,
                        help="per-BEIR-task group result dir for TB curves")
        sp.add_argument("--loss-kind", default=None,
                        choices=["nll", "dro-greedy", "idro"])
        sp.add_argument("--n-groups", type=int, default=0)
        sp.add_argument("--weight-ema", action="store_true",
                        help="EMA-blend the greedy h_fun update "
                             "(reference --weight_ema)")
        sp.add_argument("--dro-alpha", type=float, default=None)
        sp.add_argument("--dro-eps", type=float, default=None)
        sp.add_argument("--dro-rho", type=float, default=None)
        sp.add_argument("--dro-ema", type=float, default=None)
        sp.add_argument("--length-buckets", default="")
        sp.add_argument("--async-checkpoint", action="store_true")
        if name == "ance-mine":
            _add_miner_knobs(sp)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("export-hf")
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.add_argument("--from-orbax", action="store_true",
                    help="checkpoint is a COCO orbax ckpt dir (or its root);"
                         " exports backbone+MLM head and c_head model.pt")
    sp.add_argument("--config", default=None,
                    help="HF dir providing config.json (required with "
                         "--from-orbax)")
    sp.set_defaults(fn=cmd_export_hf)

    sp = sub.add_parser("preprocess-coco")
    sp.add_argument("--data-dirs", nargs="+", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--tokenizer", required=True)
    sp.add_argument("--target-len", type=int, default=30)
    sp.set_defaults(fn=cmd_preprocess_coco)

    sp = sub.add_parser("coco")
    _add_common(sp)
    sp.add_argument("--train-dir", required=True)
    sp.add_argument("--checkpoint", required=True)
    sp.add_argument("--tokenizer", default=None)
    sp.add_argument("--ckpt-dir", required=True)
    sp.add_argument("--batch-docs", type=int, default=0)
    sp.add_argument("--cache-chunk-size", type=int, default=0)
    sp.add_argument("--max-seq-length", type=int, default=0)
    sp.add_argument("--max-steps", type=int, default=1000000)
    sp.add_argument("--save-steps", type=int, default=10000)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--dropout-rng", default="rbg",
                    choices=["rbg", "threefry2x32"],
                    help="dropout PRNG impl. rbg (default) uses the TPU "
                         "hardware RNG: device-measured -24%% step time vs "
                         "threefry at B=128 (docs/performance.md 'COCO "
                         "step (round 5)'); mask distribution identical, "
                         "bit stream differs (the reference's masks are "
                         "torch RNG anyway)")
    sp.add_argument("--no-resume", action="store_true")
    sp.add_argument("--async-checkpoint", action="store_true",
                    help="non-blocking checkpoint writes (AsyncSaver)")
    sp.set_defaults(fn=cmd_coco)

    sp = sub.add_parser("convert-hf")
    sp.add_argument("--hf-dir", required=True)
    sp.add_argument("--model-type", default="rdot_nll_condenser")
    sp.set_defaults(fn=cmd_convert_hf)

    args = p.parse_args(argv)
    if getattr(args, "profile_dir", None):
        import jax

        with jax.profiler.trace(args.profile_dir):
            return args.fn(args)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
