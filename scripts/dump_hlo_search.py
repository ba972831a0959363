#!/usr/bin/env python
"""Dump the TPU-optimized HLO of the exact search; print the copy/fusion ops
with shapes so trace op names (copy.32 etc.) can be attributed."""
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_mips import mips_topk_hierarchical, mips_topk_fast

N, D, Q, K = 2048 * 488, 768, 1024, 100
q = jax.ShapeDtypeStruct((Q, D), jnp.bfloat16)
c = jax.ShapeDtypeStruct((N, D), jnp.bfloat16)

for fn, name in [(mips_topk_hierarchical, "exact"), (mips_topk_fast, "fast")]:
    txt = fn.lower(q, c, k=K).compile().as_text()
    open(f"/tmp/hlo_{name}.txt", "w").write(txt)
    print(f"== {name}: {len(txt)} chars", flush=True)
    for line in txt.splitlines():
        s = line.strip()
        if re.match(r"%?(copy|transpose|bitcast)[.\d]* = ", s) or \
           (" = " in s and ("copy(" in s or "transpose(" in s)):
            print("  ", s[:160], flush=True)
