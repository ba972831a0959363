#!/usr/bin/env python
"""Device-trace the bf16 BERT-base encoder at the bench shape (B=256 S=128)
and print per-op device times — where does the non-MXU time go?"""
import dataclasses
import glob
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.core.configs import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder

OUT = "/tmp/encoder_trace"
B, S = 256, 128


def main():
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids1 = jnp.ones((1, S), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids1, ids1)["params"])
    enc = jax.jit(
        lambda p, i, m: model.apply({"params": p}, i, m,
                                    method=model.body_emb))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 20000, (B, S)), dtype=jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    out = enc(params, ids, mask)
    np.asarray(out[:1])
    print("warm; tracing...", flush=True)
    jax.profiler.start_trace(OUT)
    for _ in range(4):
        out = enc(params, ids, mask)
        np.asarray(out[:1])
    jax.profiler.stop_trace()
    for p in glob.glob(OUT + "/**/*.trace.json.gz", recursive=True):
        print("  ", p, flush=True)


if __name__ == "__main__":
    main()
