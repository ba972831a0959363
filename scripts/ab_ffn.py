#!/usr/bin/env python
"""Same-session A/B on the chip: encoder with ffn_impl='dense' vs 'fused'
(pallas VMEM-resident FFN) at the bench shape B=256 S=128, plus a numeric
agreement check between the two implementations on device."""
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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(out[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[:1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 20000, (B, S)), dtype=jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)

    encs, outs = {}, {}
    params = None
    for impl in ("dense", "fused"):
        cfg = dataclasses.replace(
            BertConfig(), dtype=jnp.bfloat16, ffn_impl=impl)
        model = build_dual_encoder("rdot_nll_condenser", cfg)
        if params is None:
            ids1 = jnp.ones((1, S), jnp.int32)
            params = jax.device_put(
                model.init(jax.random.PRNGKey(0), ids1, ids1)["params"])
        enc = jax.jit(lambda p, i, m, model=model: model.apply(
            {"params": p}, i, m, method=model.body_emb))
        print(f"compiling {impl}...", flush=True)
        outs[impl] = np.asarray(enc(params, ids, mask), np.float32)
        encs[impl] = enc

    d = np.abs(outs["dense"] - outs["fused"]).max()
    rel = d / max(1e-9, np.abs(outs["dense"]).max())
    print(f"max |dense-fused| = {d:.4g} (rel {rel:.3%})", flush=True)

    best = {k: float("inf") for k in encs}
    for rnd in range(4):
        for k, enc in encs.items():
            best[k] = min(best[k], timeit(enc, params, ids, mask))
        print(f"round {rnd}: " + "  ".join(
            f"{k}: {v:.2f} ms" for k, v in best.items()), flush=True)
    for k, v in best.items():
        print(f"{k:6s} {v:6.2f} ms/batch -> {B/v*1e3:,.0f} docs/s", flush=True)


if __name__ == "__main__":
    main()
