#!/usr/bin/env python
"""Dump the TPU-optimized HLO of the bf16 encoder (B=256, S=128) and print
the per-layer fusion definitions so trace names can be attributed."""
import dataclasses
import re
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.core.configs import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder

B, S = 256, 128
cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
model = build_dual_encoder("rdot_nll_condenser", cfg)
ids1 = jnp.ones((1, S), jnp.int32)
params = model.init(jax.random.PRNGKey(0), ids1, ids1)["params"]
enc = jax.jit(
    lambda p, i, m: model.apply({"params": p}, i, m, method=model.body_emb))
txt = enc.lower(
    jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
    jax.ShapeDtypeStruct((B, S), jnp.int32),
    jax.ShapeDtypeStruct((B, S), jnp.int32),
).compile().as_text()
open("/tmp/hlo_encoder.txt", "w").write(txt)
print(len(txt), "chars")
for pat in ("convert_reduce_fusion.9 ", "convert_reduce_fusion.8 ",
            "fusion.225 ", "fusion.221 ", "fusion.223 ", "fusion.232 ",
            "fusion.228 ", "fusion.231 "):
    for line in txt.splitlines():
        if line.strip().startswith("%" + pat.strip() + " =") or \
           line.strip().startswith(pat.strip() + " ="):
            print(line.strip()[:400])
            break
