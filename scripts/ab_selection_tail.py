#!/usr/bin/env python
"""Clean A/B of the selection-tail restructure (round 3, VERDICT item 4).

Loads the OLD (HEAD) pallas_mips as a separate module from a git-show dump
and the NEW one from the working tree, then times both end-to-end in the
SAME process / same chip session so tunnel drift hits both equally.
"""
import functools
import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

# materialize the OLD module under a different name
os.makedirs("/tmp/old_mips", exist_ok=True)
old_src = subprocess.run(
    ["git", "show", "HEAD:cocodr_tpu/ops/pallas_mips.py"],
    capture_output=True, text=True, check=True).stdout
with open("/tmp/old_mips/old_pallas_mips.py", "w") as f:
    f.write(old_src)
spec = importlib.util.spec_from_file_location(
    "old_pallas_mips", "/tmp/old_mips/old_pallas_mips.py")
old_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(old_mod)

from cocodr_tpu.ops import pallas_mips as new_mod

N, D, Q, K = 2048 * 488, 768, 1024, 100  # ~1M docs, bench shape
KW = dict(k=K, tile=2048, fine=8, coarse=8, q_tile=1024, supers=8)


def timeit(fn, *args, reps=10, best_of=5):
    out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[:1]), out)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree.map(lambda x: np.asarray(x[:1]), out)
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    corpus = jax.device_put(jnp.asarray(
        rng.standard_normal((N, D), dtype=np.float32) * 0.05,
        dtype=jnp.bfloat16))
    queries = jax.device_put(jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32) * 0.05,
        dtype=jnp.bfloat16))

    pairs = [
        ("exact_old", functools.partial(old_mod.mips_topk_hierarchical, **KW)),
        ("exact_new", functools.partial(new_mod.mips_topk_hierarchical, **KW)),
        ("fast_old", functools.partial(old_mod.mips_topk_fast, **KW)),
        ("fast_new", functools.partial(new_mod.mips_topk_fast, **KW)),
    ]
    # interleave old/new twice to cancel drift
    results = {}
    for rnd in range(2):
        for name, fn in pairs:
            ms = timeit(fn, queries, corpus)
            results.setdefault(name, []).append(ms)
            print(f"round{rnd} {name}: {ms:.2f} ms  "
                  f"({Q/ms*1000:.0f} QPS)", flush=True)
    print("---")
    for name, vals in results.items():
        best = min(vals)
        print(f"{name}: best {best:.2f} ms = {Q/best*1000:.0f} QPS")


if __name__ == "__main__":
    main()
