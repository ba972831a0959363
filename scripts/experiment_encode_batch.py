#!/usr/bin/env python
"""Round-3 measured experiment on the encoder MFU gap (VERDICT item 8).

Question: is the ~16-point matmul-MFU gap at B=256/S=128 recoverable by
(a) larger batches, or (b) shorter sequence buckets (S=64, the dominant
real-corpus bucket for MARCO passages), or is it overhead that scales
with the work itself?

Measures docs/s and matmul-only TFLOP/s over a (B, S) grid, bf16, CLS
pooling, params device-resident. Matmul FLOPs/doc = 2*P_nonembed*S +
12 layers * 2 score/value einsums * 2*S*S*768. Results recorded in
docs/performance.md.
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.core.configs import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder

P_NONEMBED = 85_646_592  # bert-base matmul-visible params (12 enc layers)
PEAK = 197e12  # v5e bf16 peak


def flops_per_doc(S):
    return 2 * P_NONEMBED * S + 12 * 2 * 2 * S * S * 768


def main():
    cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16)
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids1 = jnp.ones((1, 128), jnp.int32)
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids1, ids1)["params"])
    enc = jax.jit(
        lambda p, i, m: model.apply({"params": p}, i, m, method=model.body_emb)
    )
    rng = np.random.default_rng(0)

    for S in (128, 64):
        for B in (128, 256, 384, 512, 1024):
            ids = jnp.asarray(
                rng.integers(1000, 20000, (B, S)), dtype=jnp.int32)
            mask = jnp.ones((B, S), jnp.int32)
            try:
                out = enc(params, ids, mask)
                np.asarray(out[:1])
            except Exception as e:  # compile-service 500s on some shapes
                print(f"S={S:3d} B={B:4d}: FAILED {type(e).__name__}:"
                      f" {str(e)[:120]}", flush=True)
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    out = enc(params, ids, mask)
                np.asarray(out[:1])
                best = min(best, (time.perf_counter() - t0) / 10)
            dps = B / best
            tf = dps * flops_per_doc(S) / 1e12
            print(f"S={S:3d} B={B:4d}: {best*1e3:7.2f} ms  {dps:8.0f} docs/s"
                  f"  {tf:6.1f} TFLOP/s  {tf/PEAK*1e12*100:5.1f}% MFU",
                  flush=True)


if __name__ == "__main__":
    main()
