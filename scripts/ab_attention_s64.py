"""A/B: fused pallas attention vs XLA einsum at the S=64 bucket
(VERDICT r03 item 5: the kernel's isolated win was largest at S=64;
end-to-end at S=128 it loses to XLA's projection fusion — measured
round 3, ops/pallas_attention.py docstring).

S=64 is a real hot shape: query encoding (max_query_len=32..64 pads to
the 64 bucket) and the first length bucket of bucketed corpus encode.

Run: python -u scripts/ab_attention_s64.py
Numbers recorded in docs/performance.md (Encoder section).
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder

ITERS = 16


def run(name, attention_impl, B, S):
    cfg = dataclasses.replace(
        BertConfig(), dtype=jnp.bfloat16, attention_impl=attention_impl
    )
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    ids = jnp.ones((B, S), jnp.int32)
    rng = np.random.RandomState(0)
    lens = rng.randint(S // 2, S + 1, B)
    mask = jnp.asarray(
        (np.arange(S)[None, :] < lens[:, None]).astype(np.int32)
    )
    params = jax.device_put(
        model.init(jax.random.PRNGKey(0), ids[:2], mask[:2])["params"]
    )

    @jax.jit
    def enc(p, i, m):
        return model.apply({"params": p}, i, m, method=model.body_emb)

    out = enc(params, ids, mask)
    _ = np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            out = enc(params, ids, mask)
        _ = np.asarray(out)
        best = min(best, (time.time() - t0) / ITERS)
    print(f"{name:28s} B={B} S={S}: {best*1e3:6.2f} ms/batch  "
          f"{B/best:8.0f} docs/s", flush=True)
    return best


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    for B, S in ((256, 64), (512, 64), (256, 128)):
        a = run("einsum (XLA)", "einsum", B, S)
        b = run("fused (pallas)", "fused", B, S)
        print(f"  -> fused/einsum speedup at B={B} S={S}: {a/b:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
