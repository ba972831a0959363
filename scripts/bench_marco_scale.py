#!/usr/bin/env python
"""MS MARCO-scale single-chip search benchmark: 8.8M x 768 bf16 corpus
resident in HBM, exact and fast top-200 (the ANCE mining configuration)."""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import mips_topk_fast, mips_topk_hierarchical

N = 2048 * 4317  # 8,841,216 ~ the 8.8M-passage MS MARCO corpus
D, Q, K = 768, 256, 200


def main():
    corpus = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16))
    print(f"corpus resident: {N*D*2/1e9:.1f} GB bf16", flush=True)
    for name, fn in (("exact", mips_topk_hierarchical),
                     ("fast", mips_topk_fast)):
        f = functools.partial(fn, k=K)
        try:
            out = f(queries, corpus)
            _ = np.asarray(out[0][:1])
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:300]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(queries, corpus)
        _ = np.asarray(out[0][:1])
        ms = (time.perf_counter() - t0) / 5 * 1e3
        print(f"{name:5s} 8.8M x 768 k=200 Q=256: {ms:7.2f} ms -> "
              f"{Q/ms*1e3:,.0f} QPS; 500k-query mining sweep "
              f"{500_000/(Q/ms*1e3)/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
