#!/usr/bin/env python
"""Probe: sweep kernel emitting QUERY-MAJOR fine/coarse maxima.

Tests two in-kernel transpose flavors (VPU jnp .T; MXU identity-dot) at a
small shape first (compile risk containment), checks numerics, then times
the full 1M-scale sweep for each.
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def _kernel_qmajor(q_ref, c_ref, fine_ref, coarse_ref, *, fine, coarse,
                   mxu_t):
    scores = jax.lax.dot_general(
        c_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, Qt]
    T, Qt = scores.shape
    fm = jnp.max(scores.reshape(T // fine, fine, Qt), axis=1)  # [T/f, Qt]
    cm = jnp.max(fm.reshape(T // (fine * coarse), coarse, Qt), axis=1)
    coarse_ref[:] = cm  # stays corpus-major ([T/cb, Qt]); XLA transposes
    if mxu_t:
        eye = (jax.lax.broadcasted_iota(jnp.int32, (Qt, Qt), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (Qt, Qt), 1)
               ).astype(jnp.float32)
        fine_ref[:] = jax.lax.dot_general(
            eye, fm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        fine_ref[:] = fm.T


@functools.partial(
    jax.jit,
    static_argnames=("tile", "fine", "coarse", "q_tile", "mxu_t"))
def sweep_qmajor(queries, corpus, tile, fine, coarse, q_tile, mxu_t):
    Q, D = queries.shape
    N = corpus.shape[0]
    cb = fine * coarse
    assert N % tile == 0 and tile % cb == 0
    n_tiles = N // tile
    qpad = (-Q) % q_tile
    if qpad:
        queries = jnp.pad(queries, ((0, qpad), (0, 0)))
    Qp = Q + qpad
    fine_q, coarse_q = pl.pallas_call(
        functools.partial(_kernel_qmajor, fine=fine, coarse=coarse,
                          mxu_t=mxu_t),
        grid=(n_tiles, Qp // q_tile),
        in_specs=[
            pl.BlockSpec((q_tile, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((q_tile, tile // fine), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile // cb, q_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, N // fine), jnp.float32),
            jax.ShapeDtypeStruct((N // cb, Qp), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=N * D * 2 + Qp * D * 2
            + Qp * (N // fine + N // cb) * 4,
            transcendentals=0,
        ),
    )(queries.astype(jnp.bfloat16), corpus.astype(jnp.bfloat16))
    return fine_q[:Q], coarse_q[:Q]


def check_small(mxu_t):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (256, 768), jnp.bfloat16)
    c = jax.random.normal(jax.random.PRNGKey(1), (8192, 768), jnp.bfloat16)
    t0 = time.perf_counter()
    try:
        fq, cq = sweep_qmajor(q, c, tile=2048, fine=8, coarse=8, q_tile=128,
                              mxu_t=mxu_t)
        fq, cq = np.asarray(fq), np.asarray(cq)
    except Exception as e:
        print(f"mxu_t={mxu_t}: COMPILE/RUN FAILED: {str(e)[:400]}",
              flush=True)
        return False
    dt = time.perf_counter() - t0
    ref = (c.astype(jnp.float32) @ q.astype(jnp.float32).T)
    ref = np.asarray(jnp.max(ref.reshape(1024, 8, 256), axis=1)).T
    ok = np.allclose(fq, ref, atol=2e-2, rtol=2e-2)
    exact = np.mean(fq == ref)
    print(f"mxu_t={mxu_t}: small compile+run {dt:.1f}s, numerics "
          f"allclose={ok} exact_frac={exact:.4f}", flush=True)
    return ok


def time_full(mxu_t):
    N, D, Q = 2048 * 488, 768, 1024
    corpus = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16))
    f = functools.partial(sweep_qmajor, tile=2048, fine=8, coarse=8,
                          q_tile=512, mxu_t=mxu_t)
    out = f(queries, corpus)
    _ = np.asarray(out[0][:1])
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(queries, corpus)
    _ = np.asarray(out[0][:1])
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"mxu_t={mxu_t}: FULL sweep {ms:.2f} ms  (corpus-major was ~14.0)",
          flush=True)


if __name__ == "__main__":
    for mxu_t in (False, True):
        if check_small(mxu_t):
            time_full(mxu_t)
