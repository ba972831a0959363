"""A/B: IVF doc-assignment metric (IP vs L2) on unnormalized MIPS
embeddings with heavy-tailed norms — the rdot regime (advisor r03: L2
assignment strands high-norm/high-IP docs in clusters IP probing ranks
low). Swaps ops.ivf._assign_chunk for the build only.

Run: python scripts/ab_ivf_assign_metric.py

Measured (CPU, 8k docs x 48d, 5% of docs scaled 3-6x, 64 clusters,
recall@20 vs f64 brute force, mean over 64 queries):
    nprobe= 4: IP 0.925   L2 0.864
    nprobe= 8: IP 0.969   L2 0.926
    nprobe=16: IP 0.982   L2 0.995
IP assignment (FAISS IP-IVF quantizer semantics) wins in the
small-nprobe regime IVF exists for; at large nprobe the two converge
(and L2 can edge ahead as the scan approaches exhaustive). Adopted IP.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")  # host-loop-heavy; tunnel TPU is slow here
import numpy as np
import jax.numpy as jnp

import cocodr_tpu.ops.ivf as ivf


def _assign_l2(x, c):
    """The pre-r04 assignment: L2 argmin to centroids."""
    x = x.astype(jnp.float32)
    d2 = (
        jnp.sum(jnp.square(x), 1, keepdims=True)
        - 2.0 * jnp.matmul(x, c.T, preferred_element_type=jnp.float32)
        + jnp.sum(jnp.square(c), 1)[None, :]
    )
    return jnp.argmin(d2, axis=1)


def main():
    rng = np.random.RandomState(5)
    n, d = 8000, 48
    centers = rng.randn(32, d).astype(np.float32)
    docs = (centers[rng.randint(0, 32, n)]
            + 0.3 * rng.randn(n, d)).astype(np.float32)
    hot = rng.rand(n) < 0.05  # heavy-tailed norms: 5% of docs 3-6x hotter
    docs[hot] *= rng.uniform(3.0, 6.0, (hot.sum(), 1)).astype(np.float32)
    queries = (centers[rng.randint(0, 32, 64)]
               + 0.3 * rng.randn(64, d)).astype(np.float32)
    s = queries.astype(np.float64) @ docs.astype(np.float64).T
    ei = np.argsort(-s, axis=1)[:, :20]

    def recall(idx, nprobe):
        _, i = ivf.ivf_topk(queries, idx, 20, nprobe=nprobe)
        i = np.asarray(i)
        return np.mean([len(set(i[q]) & set(ei[q])) / 20 for q in range(64)])

    orig = ivf._assign_chunk
    for metric, fn in (("ip", orig), ("l2", _assign_l2)):
        ivf._assign_chunk = fn
        try:
            idx = ivf.build_ivf_index(
                docs, n_clusters=64, block_size=128, kmeans_iters=10
            )
        finally:
            ivf._assign_chunk = orig
        for nprobe in (4, 8, 16):
            print(f"{metric} assign nprobe={nprobe:2d}: "
                  f"recall@20={recall(idx, nprobe):.3f}")


if __name__ == "__main__":
    main()
