"""Small training utilities with reference parity."""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

# The reference's hardcoded BEIR task grouping used for per-task TB curves
# (reference ANCE/utils/util.py:237-260 `get_latest_group_result`).
BEIR_GROUP_NAMES = (
    "trec-covid",
    "nfcorpus",
    "fiqa",
    "arguana",
    "webis-touche2020",
    "dbpedia-entity",
    "scidocs",
    "climate-fever",
    "scifact",
)


def mean_teacher_update(teacher_params, student_params, average: str =
                        "exponential", alpha: float = 0.995,
                        step: Optional[int] = None):
    """EMA / simple-average teacher update (`mt_update`, reference
    ANCE/model/models.py:27-38). Pure: returns new teacher params."""
    if average == "exponential":
        return jax.tree_util.tree_map(
            lambda t, s: t + (1.0 - alpha) * (s - t),
            teacher_params,
            student_params,
        )
    if average == "simple":
        if step is None:
            raise ValueError("simple average requires step")
        decay = 1.0 / float(step)
        return jax.tree_util.tree_map(
            lambda t, s: t + (s - t) * decay, teacher_params, student_params
        )
    raise ValueError(average)


def add_embedding_noise(emb, rng, noise_level: float, scale: float = 26.8):
    """Gaussian embedding perturbation for robustness probing
    (reference evaluate/model/models.py:81-89: noise ~ N(0,1)*scale*level
    added to query embeddings; 26.8 is the reference's empirical embedding
    std)."""
    if noise_level <= 0:
        return emb
    noise = jax.random.normal(rng, emb.shape, jnp.float32)
    return emb + (noise * scale * noise_level).astype(emb.dtype)


def lamb_trust_ratios(opt_state, params) -> Dict[str, float]:
    """Per-tensor LAMB trust ratios for diagnostics (the reference logs TB
    histograms of these, ANCE/utils/lamb.py:11-22). Derives them from the
    current (mu, nu) moments."""
    from cocodr_tpu.optim.lamb import ScaleByLambState

    lamb_state = None
    for s in jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, ScaleByLambState)
    ):
        if isinstance(s, ScaleByLambState):
            lamb_state = s
            break
    if lamb_state is None:
        return {}
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_m = jax.tree_util.tree_leaves(lamb_state.mu)
    flat_v = jax.tree_util.tree_leaves(lamb_state.nu)
    out = {}
    for (path, p), m, v in zip(flat_p, flat_m, flat_v):
        adam = m / (jnp.sqrt(v) + 1e-6)
        wn = float(jnp.clip(jnp.sqrt(jnp.sum(jnp.square(p))), 0, 10))
        an = float(jnp.sqrt(jnp.sum(jnp.square(adam))))
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out[name] = 1.0 if wn == 0 or an == 0 else wn / an
    return out


class AverageMeter:
    """Running average (reference ANCE/model/dro_loss.py:138-158)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count if self.count > 0 else 0.0


def read_group_results(result_dir: str, group_names=BEIR_GROUP_NAMES):
    """Latest per-BEIR-task nDCG files for TB curves: scans
    `ann_ndcg_group_{name}_{n}` JSONs (reference `get_latest_group_result`,
    ANCE/utils/util.py:237-260, incl. its 9 named groups).
    Returns {name: {'ndcg': ..., 'checkpoint': ...}} for groups found."""
    import glob as _glob
    import json as _json
    import os as _os

    out = {}
    for name in group_names:
        best_n, best = -1, None
        for p in _glob.glob(
            _os.path.join(result_dir, f"ann_ndcg_group_{name}_*")
        ):
            try:
                n = int(p.rsplit("_", 1)[1])
            except ValueError:
                continue
            if n > best_n:
                best_n, best = n, p
        if best:
            with open(best) as f:
                out[name] = _json.load(f)
    return out


def episode_lr_decay(base_lr: float, step: int, total_steps: int,
                     floor: float = 0.2) -> float:
    """LR decay across ANCE episodes: lr <- max(floor, 1 - step/total) * lr
    (reference ANCE/drivers/run_ann.py:120-125)."""
    return max(floor, 1.0 - step / float(total_steps)) * base_lr
