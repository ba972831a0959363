#!/usr/bin/env python
"""Phase timing of the CURRENT hierarchical search (with super level),
plus A/B probes for selection-tail experiments (round 3)."""
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
    _select_coarse_blocks,
    mips_topk_hierarchical,
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
    corpus = jax.device_put(
        jnp.asarray(rng.standard_normal((N, D), dtype=np.float32) * 0.05,
                    dtype=jnp.bfloat16))
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((Q, D), dtype=np.float32) * 0.05,
                    dtype=jnp.bfloat16))

    ms, _ = timeit(
        functools.partial(mips_topk_hierarchical, k=K, tile=TILE, fine=FINE,
                          coarse=COARSE, q_tile=QTILE, supers=SUPERS),
        queries, corpus)
    print(f"full search      : {ms:8.2f} ms  ({Q/ms*1e3:,.0f} QPS)", flush=True)

    sweep = jax.jit(functools.partial(
        _dual_sweep_mixed, tile=TILE, fine=FINE, coarse=COARSE,
        q_tile=QTILE, interpret=False))
    ms_sweep, (bm_fine_q, bm_coarse_t) = timeit(sweep, queries, corpus)
    print(f"dual sweep       : {ms_sweep:8.2f} ms", flush=True)
    bm_fine_q = jax.device_put(bm_fine_q)
    bm_coarse_t = jax.device_put(bm_coarse_t)

    cb = FINE * COARSE
    n_coarse = N // cb
    kc = min(K, n_coarse)

    csel = jax.jit(lambda bt: _select_coarse_blocks(bt.T, kc, SUPERS, K))
    ms_c, coarse_ids = timeit(csel, bm_coarse_t)
    print(f"coarse sel(super): {ms_c:8.2f} ms   [Q,{n_coarse}] k={kc}",
          flush=True)
    coarse_ids = jax.device_put(coarse_ids)

    @jax.jit
    def fine_select(bm_fine_q, coarse_ids):
        fine_max = jnp.take_along_axis(
            bm_fine_q.reshape(Q, n_coarse, COARSE),
            coarse_ids[:, :, None], axis=1,
        ).reshape(Q, kc * COARSE)
        fine_cand = (
            coarse_ids[:, :, None] * COARSE
            + jnp.arange(COARSE, dtype=jnp.int32)[None, None, :]
        ).reshape(Q, kc * COARSE)
        _, pos = jax.lax.top_k(fine_max, K)
        return jnp.take_along_axis(fine_cand, pos, axis=1)

    ms_f, fine_ids = timeit(fine_select, bm_fine_q, coarse_ids)
    print(f"fine gather+topk : {ms_f:8.2f} ms", flush=True)
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
        v, pos = jax.lax.top_k(scores, K)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    ms_r, _ = timeit(rescore, queries, corpus, fine_ids)
    print(f"rescore          : {ms_r:8.2f} ms", flush=True)
    print(f"phase sum        : {ms_sweep+ms_c+ms_f+ms_r:8.2f} ms "
          f"(vs full {ms:.2f})", flush=True)

    # sub-split of coarse selection: super reduce+topk vs coarse re-select
    n_super = n_coarse // SUPERS

    @jax.jit
    def super_phase(bt):
        sup = jnp.max(bt.T.reshape(Q, n_super, SUPERS), axis=2)
        return jax.lax.top_k(sup, K)

    ms_s, (sv, sids) = timeit(super_phase, bm_coarse_t)
    print(f"  super reduce+tk: {ms_s:8.2f} ms   [Q,{n_super}] k={K}",
          flush=True)


if __name__ == "__main__":
    main()
