#!/usr/bin/env python
"""Kernel-level A/B on the FFN half-layer: the encoder trace shows
fused_ffn_block at 1.92 ms/layer vs 1.57 ms pure-matmul ideal (~82% MXU).
Hypothesis: the f32 gelu (32768x3072 = 100M erf+exp per layer) runs on the
VPU strictly BETWEEN the two matmuls, so ~0.3 ms/layer of VPU time never
overlaps the MXU. Variants measured at the bench shape (T=32768, H=768,
F=3072, bf16 weights):

  base       shipped kernel (tt=256, f32 act)
  tt128/512  token-tile sweep
  bf16act    activation computed in bf16 (the unfused XLA path's dtype)
  inter2     F split in 2 in-kernel chunks, ops ordered so chunk c+1's
             up-projection (MXU) can overlap chunk c's gelu (VPU):
             up1, up2||act1, down1||act2, down2
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from cocodr_tpu.ops.pallas_ffn import (
    _act_fn, _ln, fused_ffn_block,
)

T, H, F = 32768, 768, 3072
EPS = 1e-12


def _block_kernel_v(r_ref, s1_ref, c1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    s2_ref, c2_ref, out_ref, *, act, eps, variant):
    u32 = _ln(r_ref[:].astype(jnp.float32), s1_ref, c1_ref, eps)
    u = u32.astype(out_ref.dtype)
    f = w1_ref.shape[1]
    if variant == "bf16act":
        h = jax.lax.dot_general(
            u, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hb = (h + b1_ref[:].astype(jnp.float32)).astype(u.dtype)
        g = _act_fn(act)(hb)  # bf16 VPU math
        y = jax.lax.dot_general(
            g.astype(u.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    elif variant == "inter2":
        fc = f // 2
        up = []
        for c in range(2):
            up.append(jax.lax.dot_general(
                u, w1_ref[:, c * fc:(c + 1) * fc],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b1_ref[:, c * fc:(c + 1) * fc].astype(jnp.float32))
        y = jnp.zeros(u32.shape, jnp.float32)
        for c in range(2):
            g = _act_fn(act)(up[c]).astype(u.dtype)
            y = y + jax.lax.dot_general(
                g, w2_ref[c * fc:(c + 1) * fc, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:  # base
        h = jax.lax.dot_general(
            u, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = _act_fn(act)(h + b1_ref[:].astype(jnp.float32))
        y = jax.lax.dot_general(
            g.astype(u.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    z32 = u32 + y + b2_ref[:].astype(jnp.float32)
    out_ref[:] = _ln(z32, s2_ref, c2_ref, eps).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tt", "variant"))
def block_v(r, s1, c1, w1, b1, w2, b2, s2, c2, tt=256, variant="base"):
    Tn = r.shape[0]
    return pl.pallas_call(
        functools.partial(
            _block_kernel_v, act="gelu", eps=EPS, variant=variant),
        grid=(Tn // tt,),
        in_specs=[
            pl.BlockSpec((tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tt, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tn, H), r.dtype),
    )(r, s1, c1, w1, b1, w2, b2, s2, c2)


def timeit(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    np.asarray(out[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(out[:1])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((T, H)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((1, F)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((1, H)) * 0.01, jnp.float32)
    s1 = jnp.ones((1, H), jnp.float32)
    c1 = jnp.zeros((1, H), jnp.float32)
    s2 = jnp.ones((1, H), jnp.float32)
    c2 = jnp.zeros((1, H), jnp.float32)
    args = (r, s1, c1, w1, b1, w2, b2, s2, c2)
    args_ship = (r, s1[0], c1[0], w1, b1[0], w2, b2[0], s2[0], c2[0])

    t_ship, ref = timeit(fused_ffn_block, *args_ship)
    print(f"shipped fused_ffn_block      : {t_ship:7.3f} ms", flush=True)
    ref = np.asarray(ref, np.float32)
    for variant in ("base", "bf16act", "inter2"):
        for tt in (128, 256, 512):
            try:
                t, out = timeit(block_v, *args, tt=tt, variant=variant)
            except Exception as e:
                print(f"{variant:8s} tt={tt:4d}: FAIL {str(e)[:80]}")
                continue
            d = np.max(np.abs(np.asarray(out, np.float32) - ref))
            print(f"{variant:8s} tt={tt:4d}: {t:7.3f} ms  maxdiff {d:.4f}",
                  flush=True)
    ideal = 4 * T * H * F / 197e12 * 1e3
    print(f"pure-matmul ideal at 197 TFLOP/s: {ideal:.3f} ms")


if __name__ == "__main__":
    main()
