"""A/B: IVF clustered search vs exact/fast pallas MIPS on the real chip.

1M x 768 bf16 corpus, Q=1024, k=100 — the bench.py headline shape — plus
recall vs the exact kernel at several nprobe settings, and the index
build cost. Run: python scripts/ab_ivf.py [n_docs_millions]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cocodr_tpu.ops.ivf import build_ivf_index, ivf_topk  # noqa: E402
from cocodr_tpu.ops.pallas_mips import (  # noqa: E402
    mips_topk_fast,
    mips_topk_hierarchical,
)

n_docs = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 1_048_576
dim, n_q, k = 768, 1024, 100

# clustered corpus — embedding spaces are directionally clustered;
# i.i.d. gaussian has no cluster structure for IVF to exploit and is the
# pessimistic case. Generated ON DEVICE (host randn of 800M gaussians on
# this environment's single CPU core takes minutes).
n_centers = 1024


@jax.jit
def make_corpus(key):
    kc, ka, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_centers, dim), jnp.float32)
    a = jax.random.randint(ka, (n_docs,), 0, n_centers)
    noise = 0.6 * jax.random.normal(kn, (n_docs, dim), jnp.bfloat16)
    return (centers[a].astype(jnp.bfloat16) + noise), centers


@jax.jit
def make_queries(key, centers):
    ka, kn = jax.random.split(key)
    a = jax.random.randint(ka, (n_q,), 0, n_centers)
    return (
        centers[a] + 0.6 * jax.random.normal(kn, (n_q, dim), jnp.float32)
    ).astype(jnp.bfloat16)


corpus, centers = make_corpus(jax.random.PRNGKey(0))
queries = make_queries(jax.random.PRNGKey(1), centers)
jax.block_until_ready((corpus, queries))
print(f"n_docs={n_docs} dim={dim} Q={n_q} k={k}", flush=True)

t0 = time.time()
idx = build_ivf_index(corpus, dtype=jnp.bfloat16)
print(
    f"build: {time.time()-t0:.1f}s  C={idx.n_clusters} "
    f"blocks={idx.n_blocks} m={idx.block_size} "
    f"pad={1 - n_docs/(idx.n_blocks*idx.block_size):.3f}",
    flush=True,
)


def timed(fn, iters=10, best_of=3):
    v, _ = fn()
    _ = np.asarray(v)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.time()
        for _ in range(iters):
            v, _ = fn()
        _ = np.asarray(v)
        best = min(best, (time.time() - t0) / iters)
    return best


ex = timed(lambda: mips_topk_hierarchical(queries, corpus, k))
ev, ei = mips_topk_hierarchical(queries, corpus, k)
ei = np.asarray(ei)
print(f"exact:  {ex*1e3:7.2f} ms  {n_q/ex:9.0f} QPS", flush=True)
fa = timed(lambda: mips_topk_fast(queries, corpus, k))
print(f"fast:   {fa*1e3:7.2f} ms  {n_q/fa:9.0f} QPS", flush=True)

qf = jnp.asarray(queries)
for nprobe in (8, 16, 32, 64):
    iv = timed(lambda: ivf_topk(qf, idx, k, nprobe=nprobe))
    _, ii = ivf_topk(qf, idx, k, nprobe=nprobe)
    ii = np.asarray(ii)
    rec = np.mean(
        [len(set(ii[q]) & set(ei[q])) / k for q in range(n_q)]
    )
    print(
        f"ivf nprobe={nprobe:3d}: {iv*1e3:7.2f} ms  {n_q/iv:9.0f} QPS  "
        f"recall@{k}={rec:.4f}",
        flush=True,
    )
