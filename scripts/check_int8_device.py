#!/usr/bin/env python
"""Device check: int8 quantized search — recall, QPS, and the 16M-doc
single-chip capacity demo (int8 corpus = half the HBM of bf16)."""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import (
    mips_topk_hierarchical,
    mips_topk_int8,
    quantize_corpus_int8,
)


def timeit(f, *a, reps=10):
    out = f(*a)
    _ = np.asarray(out[0][:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    _ = np.asarray(out[0][:1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    D, K = 768, 100
    # recall + QPS at 1M
    N, Q = 2048 * 488, 1024
    cf = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16)
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16))
    c_i8, ds = quantize_corpus_int8(cf)
    c_i8, ds = jax.device_put(c_i8), jax.device_put(ds)
    iv, ii = mips_topk_int8(queries, c_i8, ds, K)
    ev, ei = mips_topk_hierarchical(queries, jax.device_put(cf), K)
    ii, ei = np.asarray(ii), np.asarray(ei)
    rec = np.mean([len(set(ii[x]) & set(ei[x])) / K for x in range(Q)])
    ms = timeit(functools.partial(mips_topk_int8, k=K), queries, c_i8, ds)
    print(f"int8 1M x 768 k=100 Q=1024: {ms:.2f} ms -> {Q/ms*1e3:,.0f} QPS, "
          f"recall@100 vs exact bf16 = {rec:.4f}", flush=True)
    del cf, ev, ei

    # capacity demo: 16.4M docs on one chip
    N2, Q2 = 2048 * 8000, 128
    # build the 12.6GB corpus by tiling one 2M-doc int8 block (randint's
    # internal uint32 bits would need 50GB for a direct 16M-doc draw)
    block = jax.random.randint(
        jax.random.PRNGKey(2), (N2 // 8, D), -127, 128, dtype=jnp.int8)
    c2 = jax.device_put(jnp.tile(block, (8, 1)))
    del block
    ds2 = jax.device_put(jnp.ones((D,), jnp.float32))
    q2 = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(3), (Q2, D), jnp.bfloat16))
    ms2 = timeit(functools.partial(mips_topk_int8, k=K), q2, c2, ds2, reps=5)
    print(f"int8 16.4M x 768 k=100 Q=128 ({N2*D/1e9:.1f}GB corpus): "
          f"{ms2:.2f} ms -> {Q2/ms2*1e3:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
