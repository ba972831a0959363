"""Precision policy.

The reference trains fp16 via Apex AMP O1 with loss scaling
(reference ANCE/drivers/run_ann.py:161-169). On TPU the native story is
bf16 compute with fp32 params/optimizer state — no loss scaling needed.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Reductions / losses / similarity accumulate in fp32 regardless.

    @classmethod
    def bf16(cls) -> "Precision":
        return cls()

    @classmethod
    def fp32(cls) -> "Precision":
        return cls(compute_dtype=jnp.float32)
