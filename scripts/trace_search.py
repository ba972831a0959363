#!/usr/bin/env python
"""Capture a jax.profiler device trace of one exact + one fast search at the
1M bench shape, then print per-op device times parsed from the trace proto.
"""
import glob
import gzip
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical, mips_topk_fast

N, D, Q, K = 2048 * 488, 768, 1024, 100
OUT = "/tmp/search_trace"


def main():
    corpus = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.bfloat16))
    queries = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.bfloat16))
    for fn in (mips_topk_hierarchical, mips_topk_fast):
        v, i = fn(queries, corpus, k=K)
        np.asarray(v[:1])
    print("warm; tracing...", flush=True)
    jax.profiler.start_trace(OUT)
    for _ in range(3):
        v, i = mips_topk_hierarchical(queries, corpus, k=K)
        np.asarray(v[:1])
    for _ in range(3):
        v, i = mips_topk_fast(queries, corpus, k=K)
        np.asarray(v[:1])
    jax.profiler.stop_trace()
    print("trace written to", OUT, flush=True)
    for p in glob.glob(OUT + "/**/*.trace.json.gz", recursive=True):
        print("  ", p, flush=True)


if __name__ == "__main__":
    main()
