#!/usr/bin/env python
"""A/B: rescore formulations that avoid the 1.26GB relayout copy.

Device trace shows exact search pays transpose.17 — an identity-dims
layout copy of the gathered [Q, kf, 8, D] candidate buffer — before the
einsum (3.2 ms), plus reshape.13 — a 512MB retile of the sweep's fine
maxima (3.2 ms). Variants here attack the first:
  a) current: take -> reshape(C, kf*8, D) -> einsum qd,qkd->qk
  b) no-reshape einsum: take -> einsum qd,qkfd->qkf -> reshape scores
  c) multiply-reduce: take -> (rows * q).sum(-1, f32) (VPU, no dot)
Each variant runs the FULL exact pipeline (sweep+selection identical),
so wall deltas are attributable to the rescore lowering alone.
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


def build(variant):
    @functools.partial(jax.jit, static_argnames=("k",))
    def search(queries, corpus, k):
        tile, fine, coarse, q_tile, supers = 2048, 8, 8, 1024, 8
        Qn, Dn = queries.shape
        Nn = corpus.shape[0]
        cb = fine * coarse
        q_tile = min(q_tile, max(128, -(-Qn // 128) * 128))
        corpus_p = pm._pad_replicate(corpus, max(tile, cb))
        Np = corpus_p.shape[0]
        bm_fine_q, bm_coarse_t = pm._dual_sweep_mixed(
            queries, corpus_p, tile=tile, fine=fine, coarse=coarse,
            q_tile=q_tile, interpret=False,
        )
        n_coarse = Np // cb
        n_fine_real = -(-Nn // fine)
        n_coarse_real = -(-Nn // cb)
        bm_coarse = jnp.where(
            (jnp.arange(n_coarse) < n_coarse_real)[:, None],
            bm_coarse_t, -jnp.inf,
        ).T
        extra = 1 if Nn % cb else 0
        _, fine_ids = pm._select_fine_blocks(
            bm_fine_q, bm_coarse, k_sel=min(k + extra, n_coarse),
            k_fine=k + extra, coarse=coarse, supers=supers,
            n_fine_real=n_fine_real,
            k_super=k + (1 if Nn % (cb * supers) else 0), interpret=False,
        )
        kf = fine_ids.shape[1]
        blocks = corpus_p.reshape(Np // fine, fine, Dn)
        qq = queries.astype(jnp.bfloat16)
        cand = (
            fine_ids[:, :, None] * fine
            + jnp.arange(fine, dtype=jnp.int32)[None, None, :]
        ).reshape(Qn, kf * fine)
        rows4 = jnp.take(blocks, fine_ids, axis=0)  # [Q, kf, 8, D]
        if variant == "a":
            rows = rows4.reshape(Qn, kf * fine, Dn)
            scores = jnp.einsum(
                "qd,qkd->qk", qq, rows, preferred_element_type=jnp.float32
            )
        elif variant == "b":
            scores = jnp.einsum(
                "qd,qkfd->qkf", qq, rows4,
                preferred_element_type=jnp.float32,
            ).reshape(Qn, kf * fine)
        elif variant == "c":
            scores = jnp.sum(
                rows4 * qq[:, None, None, :], axis=-1, dtype=jnp.float32
            ).reshape(Qn, kf * fine)
        scores = jnp.where(cand < Nn, scores, -jnp.inf)
        v, pos = pm.pallas_topk(scores, k)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    return search


def timeit(fn, *args, reps=10, best_of=3):
    # explicit readback: block_until_ready returns early on axon
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

    ms0, (v0, i0) = timeit(
        lambda q, c: pm.mips_topk_hierarchical(q, c, k=K), queries, corpus)
    print(f"shipped exact      : {ms0:7.2f} ms  ({Q/ms0*1e3:8,.0f} QPS)")
    for variant in ("a", "b", "c"):
        fn = build(variant)
        ms, (v, i) = timeit(lambda q, c: fn(q, c, k=K), queries, corpus)
        ok_v = np.allclose(np.asarray(v), np.asarray(v0), atol=1e-3)
        ok_i = np.array_equal(np.asarray(i), np.asarray(i0))
        print(f"variant {variant}          : {ms:7.2f} ms  "
              f"({Q/ms*1e3:8,.0f} QPS)  vals={ok_v} ids={ok_i}")


if __name__ == "__main__":
    main()
