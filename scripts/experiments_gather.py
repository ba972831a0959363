#!/usr/bin/env python
"""Micro-experiments: faster formulations for the hierarchical-search tail.

Phases under test (1M x 768 corpus, Q=1024, k=100):
  A. coarse top_k        : lax.top_k [Q, 15616] k=101 (8.2 ms today)
  B. fine gather + top_k : 808x1024 gather from [124928, 1024] (15.2 ms)
  C. rescore gather      : 1024 x 101 blocks x 12KB from corpus (13.3 ms)
"""
import functools
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
    print(f"{name:44s}: {ms:8.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bm_fine_t = jax.device_put(jax.random.normal(k1, (N_FINE, Q), jnp.float32))
    bm_coarse = jax.device_put(
        jax.random.normal(k2, (Q, N_COARSE), jnp.float32))
    coarse_ids = jax.device_put(
        jax.random.randint(k3, (Q, KC), 0, N_COARSE, jnp.int32))
    fine_ids = jax.device_put(
        jax.random.randint(k4, (Q, KC), 0, N_FINE, jnp.int32))
    corpus = jax.device_put(
        jax.random.normal(k1, (N, D), jnp.bfloat16))
    queries = jax.device_put(jax.random.normal(k2, (Q, D), jnp.bfloat16))

    # ---- A: coarse selection ----
    timeit("A0 lax.top_k [Q,15616] k=101",
           jax.jit(lambda x: jax.lax.top_k(x, KC)[1]), bm_coarse)

    @jax.jit
    def a1_super(bm):  # third level: max over 8-coarse groups, then topk+refine
        sup = jnp.max(bm.reshape(Q, N_COARSE // 8, 8), axis=2)
        _, sid = jax.lax.top_k(sup, KC)  # [Q, 101]
        cand = (sid[:, :, None] * 8 + jnp.arange(8)[None, None, :]).reshape(
            Q, KC * 8)
        cm = jnp.take_along_axis(bm, cand, axis=1)
        _, pos = jax.lax.top_k(cm, KC)
        return jnp.take_along_axis(cand, pos, axis=1)

    timeit("A1 super-max + topk1952 + row-gather808", a1_super, bm_coarse)

    @jax.jit
    def a2_sort(bm):  # full sort instead of top_k, for reference
        return jax.lax.sort(bm, dimension=1)

    timeit("A2 full sort [Q,15616] (reference)", a2_sort, bm_coarse)

    timeit("A3 approx_max_k k=101 (speed ref only)",
           jax.jit(lambda x: jax.lax.approx_max_k(x, KC)[1]), bm_coarse)

    # ---- B: fine gather variants ----
    fine_cand = (coarse_ids[:, :, None] * COARSE
                 + jnp.arange(COARSE)[None, None, :]).reshape(Q, KC * COARSE)
    fine_cand = jax.device_put(fine_cand)

    @jax.jit
    def b0(bmf_t, cand):  # current: transposed axis-0 gather
        fm = jnp.take_along_axis(bmf_t, cand.T, axis=0).T
        _, pos = jax.lax.top_k(fm, KC)
        return jnp.take_along_axis(cand, pos, axis=1)

    timeit("B0 take_along_axis axis0 (current)", b0, bm_fine_t, fine_cand)

    timeit("B0a gather only (no topk)",
           jax.jit(lambda b, c: jnp.take_along_axis(b, c.T, axis=0)),
           bm_fine_t, fine_cand)
    timeit("B0b topk only [Q,808]",
           jax.jit(lambda fm: jax.lax.top_k(fm, KC)),
           jax.device_put(jax.random.normal(k3, (Q, KC * COARSE))))

    @jax.jit
    def b1(bmf_t, cand):  # transpose whole array, minor-axis gather
        bmf = bmf_t.T  # [Q, N_FINE]
        fm = jnp.take_along_axis(bmf, cand, axis=1)
        _, pos = jax.lax.top_k(fm, KC)
        return jnp.take_along_axis(cand, pos, axis=1)

    timeit("B1 full transpose + axis1 gather", b1, bm_fine_t, fine_cand)

    timeit("B1a transpose only [124928,1024]",
           jax.jit(lambda x: x.T + 0.0), bm_fine_t)

    @jax.jit
    def b2(bmf_t, cids):  # gather 8-row fine GROUPS via coarse ids (axis0,
        # contiguous 8-run) on the 3d view [N_COARSE, 8, Q]
        g = jnp.take(bmf_t.reshape(N_COARSE, COARSE, Q), cids.T, axis=0)
        # g: [KC, Q, 8, Q] -- wrong; need per-column. keep for timing of take
        return g[:, 0]

    # b2 is semantically wrong (indices vary per column); skip.

    @jax.jit
    def b3(bmf_t, cand):  # vmap dynamic-slice per query over columns
        def per_q(col, idx):
            return col[idx]
        fm = jax.vmap(per_q, in_axes=(1, 0))(bmf_t, cand)
        _, pos = jax.lax.top_k(fm, KC)
        return jnp.take_along_axis(cand, pos, axis=1)

    timeit("B3 vmap col-index", b3, bm_fine_t, fine_cand)

    # ---- C: rescore variants ----
    @jax.jit
    def c0(queries, corpus, fid):  # current: jnp.take of 8-row blocks
        blocks = corpus.reshape(N_FINE, FINE, D)
        rows = jnp.take(blocks, fid, axis=0).reshape(Q, KC * FINE, D)
        cand = (fid[:, :, None] * FINE
                + jnp.arange(FINE, dtype=jnp.int32)[None, None, :]).reshape(
            Q, KC * FINE)
        s = jnp.einsum("qd,qkd->qk", queries, rows,
                       preferred_element_type=jnp.float32)
        v, pos = jax.lax.top_k(s, K)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    timeit("C0 take 12KB blocks + einsum (current)", c0, queries, corpus,
           fine_ids)

    timeit("C0a take only",
           jax.jit(lambda c, f: jnp.take(c.reshape(N_FINE, FINE, D), f,
                                         axis=0)), corpus, fine_ids)

    @jax.jit
    def c1(queries, corpus, fid):  # sort indices per query before gathering
        fid_s = jax.lax.sort(fid, dimension=1)
        blocks = corpus.reshape(N_FINE, FINE, D)
        rows = jnp.take(blocks, fid_s, axis=0).reshape(Q, KC * FINE, D)
        cand = (fid_s[:, :, None] * FINE
                + jnp.arange(FINE, dtype=jnp.int32)[None, None, :]).reshape(
            Q, KC * FINE)
        s = jnp.einsum("qd,qkd->qk", queries, rows,
                       preferred_element_type=jnp.float32)
        v, pos = jax.lax.top_k(s, K)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    timeit("C1 sorted ids + take + einsum", c1, queries, corpus, fine_ids)

    @jax.jit
    def c2(queries, corpus, fid):  # flat row gather (row-granular, 1.5KB)
        cand = (fid[:, :, None] * FINE
                + jnp.arange(FINE, dtype=jnp.int32)[None, None, :]).reshape(
            Q, KC * FINE)
        rows = jnp.take(corpus, cand, axis=0)
        s = jnp.einsum("qd,qkd->qk", queries, rows,
                       preferred_element_type=jnp.float32)
        v, pos = jax.lax.top_k(s, K)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    timeit("C2 row-granular take + einsum", c2, queries, corpus, fine_ids)


if __name__ == "__main__":
    main()
