#!/usr/bin/env python
"""A/B: fine-block width in the hierarchical exact search.

fine=8 (current): rescore gathers (k+1)*8 rows/query (1.27 GB at Q=1024).
fine=4: gather volume halves; the sweep's fine-maxima output doubles
([Q, N/4] f32 = 1 GB at 1M docs) and the in-kernel max-reduce shrinks.
Also probes coarse/supers rebalances that keep selection width sane.
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical

N, D, Q, K = 2048 * 488, 768, 1024, 100


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

    ref_v = ref_i = None
    for fine, coarse, supers in (
        (8, 8, 8),     # current default
        (4, 16, 8),    # cb=64 kept, half gather
        (4, 8, 16),    # cb=32, super=512 kept
        (4, 8, 8),     # cb=32, super=256
        (8, 16, 4),    # cb=128, super=512
    ):
        try:
            ms, (v, i) = timeit(functools.partial(
                mips_topk_hierarchical, k=K, tile=2048, fine=fine,
                coarse=coarse, q_tile=1024, supers=supers), queries, corpus)
        except Exception as e:  # Mosaic constraint violations etc.
            print(f"fine={fine} coarse={coarse:2d} supers={supers:2d}: "
                  f"FAILED {type(e).__name__}: {str(e)[:90]}", flush=True)
            continue
        if ref_v is None:
            ref_v, ref_i = np.asarray(v), np.asarray(i)
            ok = "ref"
        else:
            ok = ("ids==" if np.array_equal(np.asarray(i), ref_i)
                  else "IDS DIFFER")
        print(f"fine={fine} coarse={coarse:2d} supers={supers:2d}: "
              f"{ms:7.2f} ms  ({Q/ms*1e3:,.0f} QPS)  [{ok}]", flush=True)


if __name__ == "__main__":
    main()
