#!/usr/bin/env python
"""Device check + timing of the rescore-free fast search mode."""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import mips_topk_fast, mips_topk_hierarchical


def main():
    # recall vs exact at moderate scale (small compile first)
    Nc, D, Qc, K = 100_003, 768, 256, 100
    c = jax.random.normal(jax.random.PRNGKey(0), (Nc, D), jnp.bfloat16)
    q = jax.random.normal(jax.random.PRNGKey(1), (Qc, D), jnp.bfloat16)
    fv, fi = mips_topk_fast(q, c, K)
    ev, ei = mips_topk_hierarchical(q, c, K)
    fv, fi, ev, ei = map(np.asarray, (fv, fi, ev, ei))
    rec = np.mean([len(set(fi[x]) & set(ei[x])) / K for x in range(Qc)])
    vdiff = np.abs(fv - ev).max()
    print(f"fast vs exact @100k: recall@100={rec:.4f} max|v-v_exact|={vdiff:.2e}",
          flush=True)
    assert fi.min() >= 0 and fi.max() < Nc

    # timing at 1M
    N, Q = 2048 * 488, 1024
    corpus = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16))
    for name, fn in (("fast", mips_topk_fast),
                     ("exact", mips_topk_hierarchical)):
        f = functools.partial(fn, k=K)
        out = f(queries, corpus)
        _ = np.asarray(out[0][:1])
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(queries, corpus)
        _ = np.asarray(out[0][:1])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{name:5s} 1M x 768 k=100 Q=1024: {ms:6.2f} ms -> "
              f"{Q/ms*1e3:,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
