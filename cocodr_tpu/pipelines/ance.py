"""ANCE asynchronous hard-negative mining + training.

Rebuild of the reference's two-job system (reference
ANCE/drivers/run_ann_data_gen.py — producer; ANCE/drivers/run_ann.py —
consumer), coupled only through the filesystem:

  miner:   latest valid checkpoint -> encode corpus + queries -> exact MIPS
           top-k -> filter positives/dupes -> sample negatives -> write
           ann_training_data_{n} (+ weight/cluster columns when clustering)
           and ann_ndcg_{n} JSON {ndcg, mrr, checkpoint}
  trainer: polls for new ann files, rebuilds the triplet stream, trains with
           (i)DRO group reweighting, checkpoints with the DONE-marker
           validity protocol

The staleness semantics are preserved: negatives always come from an older
checkpoint — that lag is part of ANCE's published behavior. `ance_round`
offers the single-program time-multiplexed mode (train N steps -> re-mine)
which removes polling entirely on one TPU slice; `mine_loop`/`train_loop`
keep the two-job async mode for separate slices.

FAISS IndexFlatIP/Kmeans are replaced by ops.mips / ops.kmeans on device.
"""
from __future__ import annotations

import dataclasses
import glob
import json
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from cocodr_tpu.evals.metrics import evaluate_run, run_from_topk
from cocodr_tpu.ops.kmeans import kmeans
from cocodr_tpu.parallel.topk import search_topk
from cocodr_tpu.pipelines.encode import EncodeConfig, Encoder, encode_cache


@dataclasses.dataclass
class MineConfig:
    topk_training: int = 200  # candidates per query (ANCE/README.md)
    negative_sample: int = 30  # kept negatives
    select_topk: bool = True  # top-(n+1) vs random-from-candidates
    n_splits: int = 5  # negative slices per ann file (data_gen.py:408-423)
    cluster_query: bool = False  # k-means groups for iDRO
    cluster_centroids: int = 50
    # faiss.Kmeans defaults in the reference: niter=500, nredo=5
    # (ANCE/drivers/run_ann_data_gen.py:343-352); lower iters is a speed knob
    kmeans_iters: int = 500
    kmeans_redo: int = 5
    dev_topk: int = 100
    batch_size: int = 512
    q_chunk: int = 4096
    mips_tile: int = 32768
    exact_fp32: bool = False  # fp32 sweep (FAISS-bit parity); default bf16+fp32 rescore
    # search method for mining/dev eval: 'auto' (exact pallas on TPU),
    # 'fast' (rescore-free block-argmax, ~1.25x faster, ~99.7% recall@100 —
    # hard negatives tolerate it), or 'ivf' (clustered approximate,
    # ops/ivf.py: the index is built once per round and reused for the
    # dev + train searches; recall set by ivf_nprobe). ignored with
    # exact_fp32.
    search_method: str = "auto"
    ivf_nprobe: int = 32
    # length-bucketed corpus encode: ascending seq widths, last >= cache
    # max_len (e.g. (64, 128)); recovers padding waste — MARCO passages
    # average ~half the 128-token budget. () = single-width encode.
    length_buckets: tuple = ()
    # mine each round over 1/chunk_factor of the train queries, rotating by
    # round (reference ann_chunk_factor, data_gen.py:332-386); <=1 disables.
    # ignored when cluster_query=True, matching the reference.
    ann_chunk_factor: int = 1
    # cache corpus embeddings under this dir and reuse them for the same
    # checkpoint (reference embedding_dir_exist/load_embedding,
    # data_gen.py:438-495)
    emb_cache_dir: str = ""
    # keep only the newest N cached corpus embeddings (13.6GB each at
    # MARCO scale — unbounded growth across rounds otherwise); 0 = keep
    # all. The reference's --only_keep_latest_embedding_file bounds the
    # same cost by overwriting one file (data_gen.py:972-973).
    emb_cache_keep: int = 2
    seed: int = 0


def _prune_emb_cache(cache_dir: str, keep: int) -> None:
    """Drop all but the `keep` newest corpus_*.npy caches (plus their
    .rows.npy sidecars) — each is corpus-sized (13.6GB at MARCO scale)."""
    import glob

    files = sorted(
        (f for f in glob.glob(os.path.join(cache_dir, "corpus_*.npy"))
         if not f.endswith(".rows.npy")),
        key=os.path.getmtime, reverse=True,
    )
    for f in files[keep:]:
        for victim in (f, f.replace(".npy", ".rows.npy")):
            try:
                os.remove(victim)
            except OSError:
                pass


def ann_data_path(out_dir: str, n: int) -> str:
    return os.path.join(out_dir, f"ann_training_data_{n}")


def ann_ndcg_path(out_dir: str, n: int) -> str:
    return os.path.join(out_dir, f"ann_ndcg_{n}")


def get_latest_ann_data(out_dir: str):
    """(n, data_path, ndcg_json or None); n=-1 when absent
    (reference ANCE/drivers/run_ann.py:263-287)."""
    best = -1
    for p in glob.glob(os.path.join(out_dir, "ann_ndcg_*")):
        try:
            n = int(p.rsplit("_", 1)[1])
        except ValueError:
            continue
        if n > best and os.path.exists(ann_data_path(out_dir, n)):
            best = n
    if best < 0:
        return -1, None, None
    with open(ann_ndcg_path(out_dir, best)) as f:
        meta = json.load(f)
    return best, ann_data_path(out_dir, best), meta


def generate_negatives(
    top_ids: np.ndarray,
    query_ids: np.ndarray,
    positives: Dict[int, int],
    cfg: MineConfig,
    rng: np.random.RandomState,
):
    """Per-query negatives + self-MRR (reference GenerateNegativePassaageID,
    data_gen.py:497-570). top_ids rows are corpus offsets (== pids in offset
    space)."""
    negatives: Dict[int, List[int]] = {}
    mrr_scores: Dict[int, float] = {}
    for row, qid in zip(top_ids, query_ids):
        qid = int(qid)
        if qid not in positives:
            continue
        pos_pid = positives[qid]
        ranks = np.nonzero(row == pos_pid)[0]
        mrr_scores[qid] = 1.0 / (ranks[0] + 1) if len(ranks) else 0.0
        if cfg.select_topk:
            cand = row[: cfg.negative_sample + 1]
        else:
            cand = row[rng.permutation(len(row))]
        negs: List[int] = []
        for pid in cand:
            pid = int(pid)
            if pid == pos_pid or pid < 0 or pid in negs:
                continue
            negs.append(pid)
            if len(negs) >= cfg.negative_sample:
                break
        negatives[qid] = negs
    return negatives, mrr_scores


def write_ann_data(
    path: str,
    negatives: Dict[int, List[int]],
    positives: Dict[int, int],
    cfg: MineConfig,
    rng: np.random.RandomState,
    clusters: Optional[Dict[int, int]] = None,
    weights: Optional[Dict[int, float]] = None,
):
    """5-split ann file, shuffled query order per the reference
    (data_gen.py:403-429)."""
    qids = list(negatives.keys())
    with open(path + ".tmp", "w") as f:
        order = rng.permutation(len(qids))
        for split in range(cfg.n_splits):
            for i in order:
                qid = qids[i]
                negs = negatives[qid]
                n5 = len(negs) // cfg.n_splits
                sl = negs[split * n5 : (split + 1) * n5]
                if not sl:
                    continue
                neg_str = ",".join(str(p) for p in sl)
                if clusters is not None:
                    w = 1.0 if weights is None else weights.get(qid, 1.0)
                    f.write(
                        f"{qid}\t{positives[qid]}\t{neg_str}\t{w:.4f}\t"
                        f"{clusters[qid]}\n"
                    )
                else:
                    f.write(f"{qid}\t{positives[qid]}\t{neg_str}\n")
    os.replace(path + ".tmp", path)


def mine(
    model,
    params,
    passage_cache,
    train_query_cache,
    train_positives: Dict[int, int],
    dev_query_cache,
    dev_qrels: Dict[int, Dict[int, int]],
    out_dir: str,
    output_num: int,
    cfg: MineConfig = MineConfig(),
    mesh=None,
    checkpoint_name: str = "",
    corpus_emb: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """One mining round. Returns the dev metrics it logged, plus a
    `time_*` wall-clock breakdown of the phases (corpus encode dominates
    at full MARCO scale — see docs/performance.md, mining rehearsal)."""
    os.makedirs(out_dir, exist_ok=True)
    timings: Dict[str, float] = {}
    _t = time.time()

    def _mark(phase):
        nonlocal _t
        now = time.time()
        timings[phase] = timings.get(phase, 0.0) + (now - _t)
        _t = now

    rng = np.random.RandomState(cfg.seed + output_num)
    ecfg = EncodeConfig(batch_size=cfg.batch_size,
                        length_buckets=cfg.length_buckets)

    doc_enc = Encoder(model, params, mesh=mesh, is_query=False)
    q_enc = Encoder(model, params, mesh=mesh, is_query=True)
    # multi-chunk long-doc corpora index one vector per chunk; search rows
    # map back to doc ids before negative generation (the reference's 3-D
    # embedding handling, data_gen.py:201-204)
    chunk_len = getattr(getattr(model, "cfg", None), "chunk_len", 0)
    multivector = bool(chunk_len) and passage_cache.max_len > chunk_len
    row2doc = None
    if corpus_emb is None:
        emb_file = None
        if cfg.emb_cache_dir and checkpoint_name:
            os.makedirs(cfg.emb_cache_dir, exist_ok=True)
            safe = checkpoint_name.replace(os.sep, "_")
            suffix = "_mv" if multivector else ""
            emb_file = os.path.join(
                cfg.emb_cache_dir, f"corpus_{safe}{suffix}.npy"
            )
        if emb_file and os.path.exists(emb_file):
            os.utime(emb_file)  # LRU: a reused cache is the one to keep
            corpus_emb = np.load(emb_file)
            if multivector:
                row2doc = np.load(emb_file.replace(".npy", ".rows.npy"))
        elif multivector:
            from cocodr_tpu.pipelines.encode import encode_cache_multivector

            corpus_emb, row2doc = encode_cache_multivector(
                doc_enc, passage_cache, ecfg, chunk_len=chunk_len
            )
            if emb_file:
                np.save(emb_file + ".tmp.npy", corpus_emb)
                os.replace(emb_file + ".tmp.npy", emb_file)
                np.save(emb_file.replace(".npy", ".rows.npy"), row2doc)
        else:
            corpus_emb = encode_cache(doc_enc, passage_cache, ecfg)
            if emb_file:
                np.save(emb_file + ".tmp.npy", corpus_emb)
                os.replace(emb_file + ".tmp.npy", emb_file)
        if emb_file and cfg.emb_cache_keep > 0:
            _prune_emb_cache(cfg.emb_cache_dir, cfg.emb_cache_keep)
    _mark("corpus_encode")

    # TPU search prep: cast the host-f32 embeddings to bf16 ONCE and put
    # them device-resident before the dev + train searches. Passing host
    # f32 into the per-chunk search jit needs a full on-device f32->bf16
    # conversion temp (12.65GB at 8.8M docs — the compile OOMs alongside
    # the 13.5GB bf16 corpus; round-5 rehearsal) and would re-transfer
    # per call. The pallas kernels sweep bf16 regardless, so this is
    # numerically identical for the TPU path; CPU/fp32-parity paths keep
    # the f32 host array (mesh-sharded search shards host arrays itself).
    n_real_docs = 0
    if (not cfg.exact_fp32 and mesh is None
            and getattr(corpus_emb, "dtype", None) == np.float32):
        import jax

        if jax.devices()[0].platform == "tpu":
            import ml_dtypes

            c16 = corpus_emb.astype(ml_dtypes.bfloat16)
            # pre-pad to the pallas kernels' 2048-row alignment
            # (replicating the last row, _pad_replicate semantics) so the
            # kernel's own pad is a no-op — its on-device pad copies the
            # WHOLE corpus (a second 13.5GB HLO temp at MARCO scale,
            # where 8,841,823 rows are not aligned; round-5 rehearsal
            # OOM #3). n_real keeps the search masks on the real count.
            n = c16.shape[0]
            pad = (-n) % 2048
            if pad:
                n_real_docs = n
                c16 = np.concatenate(
                    [c16, np.broadcast_to(c16[-1:], (pad, c16.shape[1]))]
                )
            corpus_emb = jax.device_put(c16)
            del c16
    _mark("corpus_to_device")

    def rows_to_docs(top):
        if row2doc is None:
            return top
        return np.where(top >= 0, row2doc[top], -1)

    # one IVF index per round serves both the dev and train searches
    ivf_index = None
    if cfg.search_method == "ivf" and not cfg.exact_fp32:
        from cocodr_tpu.core.mesh import DATA_AXIS

        if mesh is None or mesh.shape[DATA_AXIS] <= 1:
            import jax.numpy as jnp

            from cocodr_tpu.ops.ivf import build_ivf_index

            ivf_index = build_ivf_index(corpus_emb, dtype=jnp.bfloat16)
    _mark("ivf_build")

    # dev eval at this checkpoint (data_gen.py:306-319)
    dev_emb = encode_cache(q_enc, dev_query_cache, ecfg)
    k = min(cfg.dev_topk, n_real_docs or corpus_emb.shape[0])
    _, dev_top = search_topk(
        dev_emb, corpus_emb, k, mesh=mesh, q_chunk=cfg.q_chunk,
        tile=cfg.mips_tile, exact_fp32=cfg.exact_fp32,
        method=cfg.search_method, ivf_index=ivf_index,
        ivf_nprobe=cfg.ivf_nprobe, n_real=n_real_docs,
    )
    dev_top = rows_to_docs(dev_top)
    dev_run = run_from_topk(
        list(range(len(dev_emb))), dev_top, dedupe=row2doc is not None
    )
    dev_metrics = evaluate_run(dev_run, dev_qrels, recall_ks=(k,))
    _mark("dev_eval")

    # train-query encode + mine; without clustering, rotate over
    # 1/chunk_factor of the queries per round (data_gen.py:375-386)
    n_train = len(train_query_cache)
    if cfg.ann_chunk_factor > 1 and not cfg.cluster_query:
        per = n_train // cfg.ann_chunk_factor
        eff = output_num % cfg.ann_chunk_factor
        start = per * eff
        end = n_train if eff == cfg.ann_chunk_factor - 1 else start + per
        query_ids = np.arange(start, end)
    else:
        query_ids = np.arange(n_train)
    train_emb = encode_cache(
        q_enc, train_query_cache, ecfg, indices=query_ids
    )
    _mark("train_encode")
    kt = min(cfg.topk_training, n_real_docs or corpus_emb.shape[0])
    _, train_top = search_topk(
        train_emb, corpus_emb, kt, mesh=mesh, q_chunk=cfg.q_chunk,
        tile=cfg.mips_tile, exact_fp32=cfg.exact_fp32,
        method=cfg.search_method, ivf_index=ivf_index,
        ivf_nprobe=cfg.ivf_nprobe, n_real=n_real_docs,
    )
    _mark("train_search")
    negatives, mrr_scores = generate_negatives(
        rows_to_docs(train_top), query_ids, train_positives, cfg, rng
    )
    _mark("negatives")

    clusters = weights = None
    if cfg.cluster_query:
        _, assign = kmeans(
            train_emb,
            cfg.cluster_centroids,
            n_iter=cfg.kmeans_iters,
            n_redo=cfg.kmeans_redo,
            seed=cfg.seed,
        )
        assign = np.asarray(assign)
        clusters = {
            int(query_ids[pos]): int(assign[pos])
            for pos in range(len(train_emb))
        }
        weights = {q: 1.0 for q in clusters}  # reference writes weight=1
    _mark("cluster")

    write_ann_data(
        ann_data_path(out_dir, output_num),
        negatives,
        train_positives,
        cfg,
        rng,
        clusters=clusters,
        weights=weights,
    )
    with open(ann_ndcg_path(out_dir, output_num) + ".tmp", "w") as f:
        json.dump(
            {
                "ndcg": dev_metrics["ndcg_cut_10"],
                "mrr": dev_metrics["recip_rank"],
                "checkpoint": checkpoint_name,
            },
            f,
        )
    os.replace(
        ann_ndcg_path(out_dir, output_num) + ".tmp",
        ann_ndcg_path(out_dir, output_num),
    )
    _mark("write")
    for phase, secs in timings.items():
        dev_metrics[f"time_{phase}"] = secs
    dev_metrics["time_total"] = sum(timings.values())
    return dev_metrics


def train_on_ann_file(
    state,
    train_step: Callable,
    batcher,
    ann_file: str,
    batch_size: int,
    max_steps: Optional[int] = None,
    seed: int = 0,
    device_put: Callable = None,
    metrics_cb: Optional[Callable] = None,
    dropout_seed: Optional[int] = 0,
):
    """Consume one ann file (reference run_ann.py:240-356).

    dropout_seed: trains with dropout active, per-step keys folded from the
    global step so resume reproduces the draws (the reference trains ANCE
    with HF-default dropout 0.1, ANCE/model/models.py:194-232). None trains
    deterministically. Batch collation runs prefetch-deep on a background
    thread so the device never waits on the token-cache gather."""
    import jax
    import jax.numpy as jnp

    from cocodr_tpu.data.prefetch import prefetch
    from cocodr_tpu.data.streams import (
        shuffled_ann_lines,
        triplets_from_ann_lines,
    )

    with open(ann_file) as f:
        lines = f.readlines()
    lines = shuffled_ann_lines(lines, seed)
    dropout_key = (
        jax.random.PRNGKey(dropout_seed) if dropout_seed is not None else None
    )
    steps = 0
    step_no = int(state.step)
    for tb in prefetch(
        batcher.batches(triplets_from_ann_lines(lines), batch_size),
        depth=2,
        device_put=False,
    ):
        batch = {
            "q_ids": jnp.asarray(tb.query_ids),
            "q_mask": jnp.asarray(tb.query_mask),
            "pos_ids": jnp.asarray(tb.pos_ids),
            "pos_mask": jnp.asarray(tb.pos_mask),
            "neg_ids": jnp.asarray(tb.neg_ids),
            "neg_mask": jnp.asarray(tb.neg_mask),
            "groups": jnp.asarray(tb.groups),
            "weights": jnp.asarray(tb.weights),
        }
        if device_put is not None:
            batch = device_put(batch)
        if dropout_key is not None:
            state, metrics = train_step(
                state, batch, jax.random.fold_in(dropout_key, step_no)
            )
        else:
            state, metrics = train_step(state, batch)
        steps += 1
        step_no = int(state.step)
        if metrics_cb:
            metrics_cb(step_no, metrics)
        if max_steps and steps >= max_steps:
            break
    return state, steps


def ance_round(
    state,
    train_step,
    model,
    batcher,
    passage_cache,
    train_query_cache,
    train_positives,
    dev_query_cache,
    dev_qrels,
    work_dir: str,
    round_idx: int,
    mine_cfg: MineConfig,
    batch_size: int,
    steps_per_round: int,
    mesh=None,
    metrics_cb=None,
    dropout_seed: Optional[int] = 0,
    device_put: Callable = None,
):
    """Time-multiplexed ANCE: mine with current params -> train on the fresh
    negatives. One TPU slice, no polling, same staleness semantics (the
    negatives were mined before the round's updates)."""
    dev_metrics = mine(
        model,
        state.params,
        passage_cache,
        train_query_cache,
        train_positives,
        dev_query_cache,
        dev_qrels,
        work_dir,
        round_idx,
        mine_cfg,
        mesh=mesh,
        checkpoint_name=f"step-{int(state.step)}",
    )
    state, steps = train_on_ann_file(
        state,
        train_step,
        batcher,
        ann_data_path(work_dir, round_idx),
        batch_size,
        max_steps=steps_per_round,
        seed=round_idx,
        metrics_cb=metrics_cb,
        dropout_seed=dropout_seed,
        device_put=device_put,
    )
    return state, dev_metrics, steps


def checkpoint_params_loader(ckpt_dir: str, template_state,
                             initial: bool = True):
    """params_loader for mine_loop: latest valid checkpoint -> (name, params).

    Mirrors get_latest_checkpoint's validity protocol (reference
    ANCE/drivers/run_ann.py:51-67 — our DONE marker plays scheduler.pt's
    role). With initial=True an empty checkpoint dir yields
    ("initial", template params) so the FIRST mining round runs from the
    warmup checkpoint before the trainer has saved anything — the
    reference miner's bootstrap (run_ann_data_gen.py:57-73 falls back to
    the initial model path); otherwise the async pair would deadlock at
    startup (miner waits for a checkpoint, trainer waits for ann data)."""
    from cocodr_tpu.utils.train_state import latest_checkpoint, load_checkpoint

    def load():
        path = latest_checkpoint(ckpt_dir)
        if path is None:
            return ("initial", template_state.params) if initial else None
        state = load_checkpoint(path, template_state)
        return os.path.basename(path), state.params

    return load


def _progress_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "ann_progress.json")


def _read_progress(ckpt_dir: str) -> int:
    try:
        with open(_progress_path(ckpt_dir)) as f:
            return int(json.load(f)["last_ann"])
    except (OSError, ValueError, KeyError):
        return -1


def _write_progress(ckpt_dir: str, last_ann: int):
    tmp = _progress_path(ckpt_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_ann": last_ann}, f)
    os.replace(tmp, _progress_path(ckpt_dir))


def write_group_ndcg(result_dir: str, task: str, n: int, ndcg: float,
                     checkpoint: str = ""):
    """Per-BEIR-task group result file `ann_ndcg_group_{task}_{n}` — the
    writer half of the protocol whose reader is
    utils.misc.read_group_results (reference ANCE/drivers/run_ann.py:270-284
    reads these; the reference never shipped the writer)."""
    os.makedirs(result_dir, exist_ok=True)
    path = os.path.join(result_dir, f"ann_ndcg_group_{task}_{n}")
    with open(path + ".tmp", "w") as f:
        json.dump({"ndcg": ndcg, "checkpoint": checkpoint}, f)
    os.replace(path + ".tmp", path)


def train_loop(
    state,
    train_step: Callable,
    batcher,
    ann_dir: str,
    ckpt_dir: str,
    batch_size: int,
    save_steps: int = 5000,
    poll_secs: float = 30.0,
    max_ann_files: Optional[int] = None,
    steps_per_file: Optional[int] = None,
    metrics_cb: Optional[Callable] = None,
    resume: bool = True,
    dropout_seed: Optional[int] = 0,
    metrics_logger=None,
    saver=None,
    group_result_dir: Optional[str] = None,
    device_put: Callable = None,
):
    """Async consumer: poll for new ann files, train on each, checkpoint
    (reference ANCE/drivers/run_ann.py:220-285 polling + :376-403 saves).

    resume: restore the latest DONE checkpoint (params + optimizer + DRO
    state, reference run_ann.py:150-159,998-1002) and skip ann files already
    consumed (recorded in ann_progress.json). metrics_logger: a
    utils.logging.MetricsLogger; the mined dev nDCG/MRR are logged keyed to
    the step at which the file is consumed, plus per-BEIR-task group curves
    read from group_result_dir (reference run_ann.py:270-284)."""
    from cocodr_tpu.utils.train_state import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    seen = -1
    if resume:
        ck = latest_checkpoint(ckpt_dir)
        if ck:
            state = load_checkpoint(ck, state)
            seen = _read_progress(ckpt_dir)
    consumed = 0
    while max_ann_files is None or consumed < max_ann_files:
        n, data_path, meta = get_latest_ann_data(ann_dir)
        if n <= seen:
            time.sleep(poll_secs)
            continue
        seen = n
        if metrics_logger is not None and meta:
            mined = {
                "dev_ndcg": meta.get("ndcg", 0.0),
                "dev_mrr": meta.get("mrr", 0.0),
            }
            if group_result_dir:
                from cocodr_tpu.utils.misc import read_group_results

                for name, res in read_group_results(group_result_dir).items():
                    mined[f"ann_ndcg_group_{name}"] = res.get("ndcg", 0.0)
            metrics_logger.log(int(state.step), mined, prefix="ance/")
        state, steps = train_on_ann_file(
            state,
            train_step,
            batcher,
            data_path,
            batch_size,
            max_steps=steps_per_file,
            seed=n,
            metrics_cb=metrics_cb,
            dropout_seed=dropout_seed,
            device_put=device_put,
        )
        if metrics_logger is not None:
            rec = {"ann_file": n, "steps": steps}
            from cocodr_tpu.losses.dro import DroState, dro_state_summary

            if isinstance(state.extra, DroState):
                # the reference dumps per-group h_fun / running losses via
                # output_state() (ANCE/model/models.py:275-280)
                rec.update({
                    k: v for k, v in dro_state_summary(state.extra).items()
                    if not isinstance(v, list)
                })
            metrics_logger.log(int(state.step), rec, prefix="ance/")
        # ann_progress must never run ahead of checkpoint validity: a crash
        # between them would resume from an older checkpoint but skip this
        # ann file's training entirely
        if saver:
            saver.save(ckpt_dir, state, keep=3,
                       on_complete=lambda n=n: _write_progress(ckpt_dir, n))
        else:
            save_checkpoint(ckpt_dir, state, keep=3)
            _write_progress(ckpt_dir, n)
        consumed += 1
    if saver:
        saver.wait()
    return state


def mine_loop(
    model,
    params_loader: Callable[[], Optional[tuple]],
    out_dir: str,
    poll_secs: float = 60.0,
    max_rounds: Optional[int] = None,
    **mine_kwargs,
):
    """Async producer: poll for new checkpoints, mine when one appears
    (reference evaluate/drivers/run_ann_data_gen.py:695-719)."""
    last_ckpt = None
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        loaded = params_loader()
        if loaded is None:
            time.sleep(poll_secs)
            continue
        ckpt_name, params = loaded
        if ckpt_name == last_ckpt:
            time.sleep(poll_secs)
            continue
        n, _, _ = get_latest_ann_data(out_dir)
        mine(
            model,
            params,
            out_dir=out_dir,
            output_num=n + 1,
            checkpoint_name=ckpt_name,
            **mine_kwargs,
        )
        last_ckpt = ckpt_name
        rounds += 1
