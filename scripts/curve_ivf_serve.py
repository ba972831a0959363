"""nprobe -> recall@10 / latency curve for the IVF serving mode at 1M
docs on one real TPU chip (VERDICT r03 item 10).

Run: python -u scripts/curve_ivf_serve.py   (numbers recorded in
docs/performance.md, serving section)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from cocodr_tpu.ops.ivf import build_ivf_index, ivf_topk_chunked
from cocodr_tpu.ops.mips import mips_topk_chunked_queries

N, D, Q, K = 1_000_000, 768, 4096, 10


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.RandomState(0)
    centers = rng.randn(4096, D).astype(np.float32)
    docs = np.empty((N, D), np.float32)
    step = 65536
    for s in range(0, N, step):
        e = min(s + step, N)
        docs[s:e] = (centers[rng.randint(0, 4096, e - s)]
                     + 0.5 * rng.randn(e - s, D)).astype(np.float32)
    queries = (centers[rng.randint(0, 4096, Q)]
               + 0.5 * rng.randn(Q, D)).astype(np.float32)

    t0 = time.time()
    _, ei = mips_topk_chunked_queries(queries, docs, K)
    ei = np.asarray(ei)
    # warm exact timing: corpus upload amortized inside; re-run for rate
    t0 = time.time()
    _, _ = mips_topk_chunked_queries(queries, docs, K)
    exact_qps = Q / (time.time() - t0)
    print(f"exact: {exact_qps:,.0f} QPS (incl. per-call upload)", flush=True)

    t0 = time.time()
    idx = build_ivf_index(docs, dtype=jnp.bfloat16)
    print(f"ivf build: {time.time()-t0:.1f}s  n_clusters={idx.n_clusters} "
          f"n_blocks={idx.n_blocks}", flush=True)

    exact_sets = [set(r) for r in ei]
    for nprobe in (4, 8, 16, 32, 64, 128):
        # warm with the FULL query batch: slab-count/qmap buckets depend
        # on (Q, nprobe), so a smaller warm batch leaves the timed call
        # paying its compile (measured: nonmonotonic 300-2000 QPS noise)
        _ = ivf_topk_chunked(queries, idx, K, nprobe=nprobe)
        t0 = time.time()
        _, ii = ivf_topk_chunked(queries, idx, K, nprobe=nprobe)
        dt = time.time() - t0
        ii = np.asarray(ii)
        rec = np.mean([
            len(set(ii[q]) & exact_sets[q]) / K for q in range(Q)
        ])
        frac = nprobe / idx.n_clusters
        print(f"nprobe={nprobe:4d} ({frac:5.1%} of corpus): "
              f"recall@10={rec:.3f}  {Q/dt:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
