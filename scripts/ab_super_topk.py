#!/usr/bin/env python
"""Same-session A/B: super-level selection via pallas_topk vs lax.top_k.

The super top-k in _select_fine_blocks is the only remaining lax full-sort
candidate; this patches pallas_topk with a width dispatcher (the super level
is the only call site at width n_super=1953 for the 1M bench shape) so both
variants run in one chip session, interleaved best-of to cancel drift.
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import cocodr_tpu.ops.pallas_mips as pm

N, D, Q, K = 2048 * 488, 768, 1024, 100
SUPER_W = (N // 64 + 7) // 8  # n_super at the bench shape = 1953

orig_pallas_topk = pm.pallas_topk


def lax_super_topk(x, k, **kw):
    if x.shape[1] == SUPER_W:  # the super-level call site
        return jax.lax.top_k(x, k)
    return orig_pallas_topk(x, k, **kw)


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    corpus = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16))

    # AOT-compile each variant while its patch is active: the jit cache
    # keys on (fn, static args) and would conflate the two tracings, but
    # .lower().compile() captures the executable immediately.
    variants = {}
    for name, impl in [("pallas", orig_pallas_topk), ("lax", lax_super_topk)]:
        pm.pallas_topk = impl
        print(f"compiling {name} exact...", flush=True)
        ex = pm.mips_topk_hierarchical.lower(queries, corpus, k=K).compile()
        print(f"compiling {name} fast...", flush=True)
        fa = pm.mips_topk_fast.lower(queries, corpus, k=K).compile()
        variants[name] = (ex, fa)
        pm.pallas_topk = orig_pallas_topk

    best = {n: [float("inf")] * 2 for n in variants}
    for rnd in range(4):
        for n, (ex, fa) in variants.items():
            best[n][0] = min(best[n][0], timeit(ex, queries, corpus))
            best[n][1] = min(best[n][1], timeit(fa, queries, corpus))
        print(f"round {rnd}: " + "  ".join(
            f"{n}: exact {b[0]:.2f} fast {b[1]:.2f}"
            for n, b in best.items()), flush=True)
    for n, b in best.items():
        print(f"{n:7s} exact {b[0]:6.2f} ms ({Q/b[0]*1e3:,.0f} QPS)   "
              f"fast {b[1]:6.2f} ms ({Q/b[1]*1e3:,.0f} QPS)", flush=True)


if __name__ == "__main__":
    main()
