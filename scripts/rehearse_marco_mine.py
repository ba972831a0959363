"""MARCO-scale mining rehearsal, timed end-to-end (VERDICT r03 item 9).

Runs the full `mine()` — corpus encode, dev eval, train-query encode,
top-200 search, negative generation, 5-split ann-file write — on one
chip at the reference's scale: 8.8M synthetic passages, 500k train
queries, 6,980 dev queries (reference ANCE/README.md MARCO numbers).
Records the wall-clock breakdown (encode should dominate at ~23 min);
numbers go to docs/performance.md.

Synthetic token caches are written VECTORIZED (a per-record Python loop
over 8.8M rows costs ~10 min alone on the 1-core host) in the
byte-compatible record format (data/records.py).

Run: python -u scripts/rehearse_marco_mine.py  [N_DOCS=… N_QUERIES=… env]
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

N_DOCS = int(os.environ.get("N_DOCS", "8841823"))
N_QUERIES = int(os.environ.get("N_QUERIES", "502939"))
N_DEV = int(os.environ.get("N_DEV", "6980"))
DOC_LEN, Q_LEN = 128, 64
VOCAB = 30522


def write_cache(path: str, n: int, max_len: int, seed: int):
    """Vectorized writer for the len+tokens record format."""
    rng = np.random.default_rng(seed)
    rb = 4 + max_len * 4
    chunk = 200_000
    with open(path, "wb") as f:
        for s in range(0, n, chunk):
            m = min(chunk, n - s)
            # MARCO passages average ~half the 128 budget
            lens = rng.integers(max_len // 4, max_len + 1, m)
            toks = rng.integers(5, VOCAB, (m, max_len), dtype=np.int32)
            toks[np.arange(max_len)[None, :] >= lens[:, None]] = 0
            rec = np.empty((m, rb), np.uint8)
            rec[:, :4] = (
                lens.astype(">i4").view(np.uint8).reshape(m, 4)
            )
            rec[:, 4:] = toks.view(np.uint8).reshape(m, max_len * 4)
            rec.tofile(f)
    with open(path + "_meta", "w") as f:
        json.dump({"type": "int32", "total_number": n,
                   "embedding_size": max_len}, f)


def main():
    import dataclasses

    import jax

    if os.environ.get("REHEARSE_CPU"):
        # smoke-test path; the env var JAX_PLATFORMS is ignored in this
        # environment's pre-warmed interpreter
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cocodr_tpu.data.records import TokenCache
    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.pipelines.ance import MineConfig, mine

    print("platform:", jax.devices()[0].platform, flush=True)
    d = tempfile.mkdtemp(prefix="marco_rehearsal_")
    try:
        t0 = time.time()
        write_cache(os.path.join(d, "passages"), N_DOCS, DOC_LEN, 0)
        write_cache(os.path.join(d, "train_q"), N_QUERIES, Q_LEN, 1)
        write_cache(os.path.join(d, "dev_q"), N_DEV, Q_LEN, 2)
        print(f"synthetic caches written: {time.time()-t0:.0f}s "
              f"({N_DOCS/1e6:.1f}M docs, {N_QUERIES/1e3:.0f}k queries)",
              flush=True)

        passages = TokenCache(os.path.join(d, "passages"))
        train_q = TokenCache(os.path.join(d, "train_q"))
        dev_q = TokenCache(os.path.join(d, "dev_q"))
        rng = np.random.default_rng(3)
        positives = {
            int(q): int(p)
            for q, p in enumerate(rng.integers(0, N_DOCS, N_QUERIES))
        }
        dev_qrels = {
            int(q): {int(rng.integers(0, N_DOCS)): 1} for q in range(N_DEV)
        }

        if os.environ.get("REHEARSE_TINY"):
            cfg = dataclasses.replace(
                BertConfig.tiny(), vocab_size=VOCAB,
                max_position_embeddings=DOC_LEN,
            )
        else:
            cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
        model = build_dual_encoder("rdot_nll_condenser", cfg)
        ids = jnp.ones((1, 16), jnp.int32)
        params = jax.device_put(
            model.init(jax.random.PRNGKey(0), ids, ids)["params"]
        )

        t0 = time.time()
        # EMB_CACHE env: persist corpus embeddings across rehearsal runs
        # (synthetic caches are seed-deterministic, params are PRNGKey(0),
        # so reuse is valid) — a re-run skips the ~25-min encode phase
        cfg = MineConfig(emb_cache_dir=os.environ.get("EMB_CACHE", ""))
        metrics = mine(
            model, params, passages, train_q, positives, dev_q, dev_qrels,
            out_dir=os.path.join(d, "ann"), output_num=0,
            cfg=cfg,  # reference defaults: top-200, 30 negs, 5 splits
            checkpoint_name="rehearsal-fixed-params",
        )
        total = time.time() - t0
        print(f"\nmine() end-to-end: {total:.0f}s "
              f"({total/60:.1f} min)", flush=True)
        for k in sorted(metrics):
            if k.startswith("time_"):
                print(f"  {k[5:]:16s} {metrics[k]:8.1f}s "
                      f"({100*metrics[k]/max(total,1e-9):5.1f}%)",
                      flush=True)
        ann = os.path.join(d, "ann", "ann_training_data_0")
        print("ann files:",
              [f for f in sorted(os.listdir(os.path.join(d, "ann")))],
              flush=True)
        sz = sum(
            os.path.getsize(os.path.join(d, "ann", f))
            for f in os.listdir(os.path.join(d, "ann"))
        )
        print(f"ann output bytes: {sz/1e6:.0f} MB", flush=True)
        _ = ann
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
