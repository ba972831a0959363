#!/usr/bin/env python
"""QPS vs query-batch size for the exact and fast 1M-doc search.

Q=1024 is the historical bench shape; larger batches amortize dispatch
and per-search fixed costs (selection top-ks scale with Q, the sweep is
already MXU-bound). Memory bound: the 3D fine-maxima array is
[n_super, Qp, 64] f32 = Qp * 0.5GB/1024 at 1M docs, so Q=4096 adds 1.5GB
over Q=1024 — fine next to the 1.5GB corpus on 16GB HBM.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import mips_topk_fast, mips_topk_hierarchical

N, D, K = 2048 * 488, 768, 100


def timeit(fn, *args, reps=10, best_of=3):
    out = fn(*args)
    np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out[0][:1])
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    corpus = jax.device_put(jnp.asarray(
        rng.standard_normal((N, D), dtype=np.float32) * 0.05,
        dtype=jnp.bfloat16))
    for Q in (512, 1024, 2048, 4096):
        queries = jax.device_put(jnp.asarray(
            rng.standard_normal((Q, D), dtype=np.float32) * 0.05,
            dtype=jnp.bfloat16))
        for name, fn in (("exact", mips_topk_hierarchical),
                         ("fast", mips_topk_fast)):
            try:
                ms = timeit(lambda q, c: fn(q, c, k=K), queries, corpus)
                print(f"{name:5s} Q={Q:5d}: {ms:7.2f} ms "
                      f"({Q/ms*1e3:9,.0f} QPS)", flush=True)
            except Exception as e:
                print(f"{name:5s} Q={Q:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
