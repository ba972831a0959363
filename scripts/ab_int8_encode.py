#!/usr/bin/env python
"""Same-session A/B on the chip: bf16 fused-FFN encoder vs the W8A8 path
(matmul_int8=True: int8 Q/K/V/output projections via ops/int8_matmul +
the fused int8 half-layer kernel ops/pallas_ffn.fused_ffn_block_int8) at
the bench shape B=256 S=128. Also reports embedding cosine agreement and
top-k ranking agreement on a synthetic 100k-doc MIPS to put a number on
the PTQ quality cost (docs/performance.md)."""
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

B, S = 256, 128


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 20000, (B, S)), dtype=jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    encs, outs = {}, {}
    params = None
    for name, kw in (
        ("bf16", dict(ffn_impl="fused")),
        ("int8", dict(matmul_int8=True)),
    ):
        cfg = dataclasses.replace(BertConfig(), dtype=jnp.bfloat16, **kw)
        model = build_dual_encoder("rdot_nll_condenser", cfg)
        if params is None:
            ids1 = jnp.ones((1, S), jnp.int32)
            params = jax.device_put(
                model.init(jax.random.PRNGKey(0), ids1, ids1)["params"])
        enc = jax.jit(lambda p, i, m, model=model: model.apply(
            {"params": p}, i, m, method=model.body_emb))
        print(f"compiling {name}...", flush=True)
        outs[name] = np.asarray(enc(params, ids, mask), np.float32)
        encs[name] = enc

    a, b = outs["bf16"], outs["int8"]
    cos = (a * b).sum(-1) / np.maximum(
        1e-9, np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    print(f"emb cosine bf16 vs int8: min {cos.min():.5f} "
          f"mean {cos.mean():.5f}", flush=True)

    # Ranking agreement: same synthetic corpus, rank by both embedding
    # sets, compare top-10/top-100 overlap.
    D = a.shape[-1]
    docs = rng.standard_normal((100_000, D)).astype(np.float32)
    # make docs correlated with queries so top-k is non-degenerate
    docs[:B] = a + 0.3 * rng.standard_normal(a.shape).astype(np.float32)
    sa = a @ docs.T
    sb = b @ docs.T
    for k in (10, 100):
        ta = np.argpartition(-sa, k, axis=-1)[:, :k]
        tb = np.argpartition(-sb, k, axis=-1)[:, :k]
        ov = np.mean([len(set(ta[i]) & set(tb[i])) / k for i in range(B)])
        print(f"top-{k} overlap: {ov:.4f}", flush=True)

    best = {k: float("inf") for k in encs}
    for rnd in range(4):
        for k, enc in encs.items():
            out = enc(params, ids, mask)
            np.asarray(out[:1])
            t0 = time.perf_counter()
            for _ in range(10):
                out = enc(params, ids, mask)
            np.asarray(out[:1])
            dt = (time.perf_counter() - t0) / 10
            best[k] = min(best[k], dt)
    for k, dt in best.items():
        print(f"{k}: {dt*1e3:.2f} ms/batch -> {B/dt:,.0f} docs/s", flush=True)
    print(f"speedup int8/bf16: {best['bf16']/best['int8']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
