#!/usr/bin/env python
"""Model-level A/B of the fused-FFN token tile (usage: ab_ffn_tile.py [tt]
[int8]). The kernel-level probe (ab_ffn_vpu.py) showed tt=128 saving
~0.42 ms/call over tt=256 at the bench shape — but isolated calls carry
~1.8 ms of tunnel dispatch overhead, so the encoder is the real meter."""
import dataclasses
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops import pallas_ffn

tt = int(sys.argv[1]) if len(sys.argv) > 1 else 256
int8 = len(sys.argv) > 2 and sys.argv[2] == "int8"
pallas_ffn.fused_ffn_block = functools.partial(
    pallas_ffn.fused_ffn_block, token_tile=tt)
pallas_ffn.fused_ffn_block_int8 = functools.partial(
    pallas_ffn.fused_ffn_block_int8, token_tile=tt)

from cocodr_tpu.core.configs import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder

B, S = 256, 128


def main():
    cfg = dataclasses.replace(
        BertConfig(), dtype=jnp.bfloat16, matmul_int8=int8)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids1 = jnp.ones((1, S), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids1, ids1)["params"])
    enc = jax.jit(lambda p, i, m: model.apply(
        {"params": p}, i, m, method=model.body_emb))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 20000, (B, S)), dtype=jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    out = enc(params, ids, mask)
    np.asarray(out[:1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = enc(params, ids, mask)
        np.asarray(out[:1])
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"tt={tt} int8={int8}: {best*1e3:.2f} ms/batch, "
          f"{B/best:,.0f} docs/s")


if __name__ == "__main__":
    main()
