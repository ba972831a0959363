#!/usr/bin/env python
"""Phase timing of the round-3 hierarchical search (pallas_topk selection).

Phases: dual sweep -> _select_fine_blocks (super lax.top_k + wide
pallas_topk) -> rescore (gather + einsum + pallas_topk). Isolated timings
are dispatch-inflated over the tunnel; use them comparatively.
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import (
    _dual_sweep_mixed,
    _select_fine_blocks,
    mips_topk_hierarchical,
    mips_topk_fast,
    pallas_topk,
)

N, D, Q, K = 2048 * 488, 768, 1024, 100
TILE, FINE, COARSE, QTILE, SUPERS = 2048, 8, 8, 1024, 8


def timeit(fn, *args, reps=10, best_of=3):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x[:1]), out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best, out


def main():
    rng = np.random.default_rng(0)
    corpus = jax.device_put(jnp.asarray(
        rng.standard_normal((N, D), dtype=np.float32) * 0.05,
        dtype=jnp.bfloat16))
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32) * 0.05,
        dtype=jnp.bfloat16))

    ms, _ = timeit(functools.partial(
        mips_topk_hierarchical, k=K, tile=TILE, fine=FINE, coarse=COARSE,
        q_tile=QTILE, supers=SUPERS), queries, corpus)
    print(f"full exact       : {ms:8.2f} ms  ({Q/ms*1e3:,.0f} QPS)",
          flush=True)
    msf, _ = timeit(functools.partial(
        mips_topk_fast, k=K, tile=TILE, fine=FINE, coarse=COARSE,
        q_tile=QTILE, supers=SUPERS), queries, corpus)
    print(f"full fast        : {msf:8.2f} ms  ({Q/msf*1e3:,.0f} QPS)",
          flush=True)

    sweep = jax.jit(functools.partial(
        _dual_sweep_mixed, tile=TILE, fine=FINE, coarse=COARSE,
        q_tile=QTILE, interpret=False))
    ms_sweep, (bm_fine_q, bm_coarse_t) = timeit(sweep, queries, corpus)
    print(f"dual sweep       : {ms_sweep:8.2f} ms", flush=True)
    bm_fine_q = jax.device_put(bm_fine_q)
    bm_coarse_t = jax.device_put(bm_coarse_t)

    cb = FINE * COARSE
    n_coarse = N // cb
    n_fine_real = -(-N // FINE)

    @jax.jit
    def select(bm_fine_q, bm_coarse_t):
        bm_coarse = bm_coarse_t.T[:Q]
        return _select_fine_blocks(
            bm_fine_q, bm_coarse, k_sel=min(K + 1, n_coarse), k_fine=K + 1,
            coarse=COARSE, supers=SUPERS, n_fine_real=n_fine_real,
            k_super=K + 1, interpret=False)

    ms_sel, (_, fine_ids) = timeit(select, bm_fine_q, bm_coarse_t)
    print(f"fine selection   : {ms_sel:8.2f} ms", flush=True)
    fine_ids = jax.device_put(fine_ids)

    @jax.jit
    def rescore(queries, corpus, fine_ids):
        blocks = corpus.reshape(N // FINE, FINE, D)
        kf = fine_ids.shape[1]
        rows = jnp.take(blocks, fine_ids, axis=0).reshape(Q, kf * FINE, D)
        cand = (
            fine_ids[:, :, None] * FINE
            + jnp.arange(FINE, dtype=jnp.int32)[None, None, :]
        ).reshape(Q, kf * FINE)
        scores = jnp.einsum("qd,qkd->qk", queries, rows,
                            preferred_element_type=jnp.float32)
        v, pos = pallas_topk(scores, K)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    ms_r, _ = timeit(rescore, queries, corpus, fine_ids)
    print(f"rescore          : {ms_r:8.2f} ms", flush=True)

    # rescore sub-phases
    @jax.jit
    def gather_only(corpus, fine_ids):
        blocks = corpus.reshape(N // FINE, FINE, D)
        kf = fine_ids.shape[1]
        return jnp.take(blocks, fine_ids, axis=0).reshape(Q, kf * FINE, D)

    ms_g, rows = timeit(gather_only, corpus, fine_ids)
    print(f"  gather only    : {ms_g:8.2f} ms "
          f"({rows.nbytes/1e9:.2f} GB out)", flush=True)
    rows = jax.device_put(rows)

    @jax.jit
    def dot_only(queries, rows):
        return jnp.einsum("qd,qkd->qk", queries, rows,
                          preferred_element_type=jnp.float32)

    ms_d, scores = timeit(dot_only, queries, rows)
    print(f"  einsum only    : {ms_d:8.2f} ms", flush=True)
    scores = jax.device_put(scores)
    ms_t, _ = timeit(functools.partial(pallas_topk, k=K), scores)
    print(f"  pallas_topk    : {ms_t:8.2f} ms  [Q,{scores.shape[1]}]",
          flush=True)

    print(f"phase sum        : {ms_sweep+ms_sel+ms_r:8.2f} ms "
          f"(vs full {ms:.2f})", flush=True)


if __name__ == "__main__":
    main()
