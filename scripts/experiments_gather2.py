#!/usr/bin/env python
"""Round 2 micro-experiments: dispatch floor, run-gathers, rescore variants."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N, D, Q, K = 2048 * 488, 768, 1024, 100
FINE, COARSE = 8, 8
N_FINE, N_COARSE = N // FINE, N // (FINE * COARSE)
KC = K + 1


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:46s}: {ms:8.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # query-major fine maxima (the layout a kernel-side transpose would give)
    bm_fine_q = jax.device_put(
        jax.random.normal(k1, (Q, N_FINE), jnp.float32))
    bm_coarse = jax.device_put(
        jax.random.normal(k2, (Q, N_COARSE), jnp.float32))
    coarse_ids = jax.device_put(
        jax.random.randint(k3, (Q, KC), 0, N_COARSE, jnp.int32))
    fine_ids = jax.device_put(
        jax.random.randint(k4, (Q, KC), 0, N_FINE, jnp.int32))
    corpus = jax.device_put(jax.random.normal(k1, (N, D), jnp.bfloat16))
    queries = jax.device_put(jax.random.normal(k2, (Q, D), jnp.bfloat16))
    rows_pre = jax.device_put(
        jax.random.normal(k3, (Q, KC * FINE, D), jnp.bfloat16))

    timeit("E0 dispatch floor (tiny add)",
           jax.jit(lambda x: x[:1, :1] + 1.0), bm_coarse)

    # ---- B replacement: contiguous-run gather in query-major layout ----
    @jax.jit
    def e1_gather(bmq, cids):
        g3 = bmq.reshape(Q, N_COARSE, COARSE)
        return jnp.take_along_axis(
            g3, cids[:, :, None], axis=1)  # [Q, KC, 8] 32B runs

    timeit("E1 run-gather(32B) axis1 only", e1_gather, bm_fine_q, coarse_ids)

    @jax.jit
    def e2_full(bmq, cids):
        g3 = bmq.reshape(Q, N_COARSE, COARSE)
        fm = jnp.take_along_axis(g3, cids[:, :, None], axis=1).reshape(
            Q, KC * COARSE)
        cand = (cids[:, :, None] * COARSE
                + jnp.arange(COARSE, dtype=jnp.int32)[None, None, :]).reshape(
            Q, KC * COARSE)
        _, pos = jax.lax.top_k(fm, KC)
        return jnp.take_along_axis(cand, pos, axis=1)

    timeit("E2 run-gather + topk808 (B replacement)", e2_full,
           bm_fine_q, coarse_ids)

    # ---- C variants ----
    @jax.jit
    def e3(corpus, fid):
        c2 = corpus.reshape(N_FINE, FINE * D)
        return jnp.take(c2, fid, axis=0)

    timeit("E3 2-d row take (6144-wide)", e3, corpus, fine_ids)

    @jax.jit
    def e4(queries, corpus, fid):
        c2 = corpus.reshape(N_FINE, FINE * D)
        rows = jnp.take(c2, fid, axis=0).reshape(Q, KC * FINE, D)
        s = jnp.einsum("qd,qkd->qk", queries, rows,
                       preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)

    timeit("E4 2-d take + einsum + topk (C full)", e4, queries, corpus,
           fine_ids)

    @jax.jit
    def e5(queries, rows):
        s = jnp.einsum("qd,qkd->qk", queries, rows,
                       preferred_element_type=jnp.float32)
        return jax.lax.top_k(s, K)

    timeit("E5 einsum+topk on pre-gathered rows", e5, queries, rows_pre)

    timeit("E6 topk only [Q,15616] k=101 (A again)",
           jax.jit(lambda x: jax.lax.top_k(x, KC)[1]), bm_coarse)

    # A at reduced n: does topk scale with n?
    bm_half = jax.device_put(jax.random.normal(k4, (Q, N_COARSE // 4),
                                               jnp.float32))
    timeit("E7 topk [Q,3904] k=101",
           jax.jit(lambda x: jax.lax.top_k(x, KC)[1]), bm_half)

    # variable-k: does topk scale with k?
    timeit("E8 topk [Q,15616] k=8",
           jax.jit(lambda x: jax.lax.top_k(x, 8)[1]), bm_coarse)


if __name__ == "__main__":
    main()
