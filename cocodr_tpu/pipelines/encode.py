"""Sharded corpus / query encoding.

Replaces the reference's `StreamInferenceDoc` (rank-sharded streaming encode
+ pickle/filesystem shard merge, reference
ANCE/drivers/run_ann_data_gen.py:157-249, ANCE/utils/util.py:87-155):
batches come straight off the memmap/native token cache, are device_put
sharded over the mesh data axis, and embeddings accumulate on device (or
host for corpora larger than HBM). No filesystem round-trip.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cocodr_tpu.core.mesh import DATA_AXIS
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class EncodeConfig:
    batch_size: int = 512
    to_host: bool = True  # gather embeddings to host numpy
    emb_dtype: np.dtype = np.float32
    # e.g. (32, 64, 128): encode short records at narrower widths
    length_buckets: tuple = ()


# jitted-closure cache: mining constructs fresh Encoders every round
# (pipelines/ance.mine), and a fresh jax.jit(closure) would re-trace (and
# without a persistent compile cache, re-COMPILE) both encoder programs per
# round. Keyed on the hashable flax module (frozen dataclass — equal
# configs share entries), mesh, tower, and noise level.
_ENCODE_FN_CACHE: dict = {}


def _encode_fn(model, mesh, is_query: bool, noise_level: float):
    key = (model, mesh, is_query, round(noise_level, 9))
    hit = _ENCODE_FN_CACHE.get(key)
    if hit is not None:
        return hit
    method = model.query_emb if is_query else model.body_emb
    if noise_level > 0.0:
        from cocodr_tpu.utils.misc import add_embedding_noise

        def fn(p, ids, mask, key):
            emb = model.apply({"params": p}, ids, mask, method=method)
            return add_embedding_noise(emb, key, noise_level)
    else:
        def fn(p, ids, mask):
            return model.apply({"params": p}, ids, mask, method=method)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        dsh = NamedSharding(mesh, P(DATA_AXIS))
        in_sh = (repl, dsh, dsh) + ((repl,) if noise_level > 0.0 else ())
        jitted = jax.jit(fn, in_shardings=in_sh, out_shardings=dsh)
    else:
        jitted = jax.jit(fn)
    _ENCODE_FN_CACHE[key] = jitted
    return jitted


class Encoder:
    """jit-compiled embedding function over a (possibly 1-device) mesh.

    noise_level > 0 adds the reference's Gaussian embedding perturbation for
    robustness probing (reference evaluate/model/models.py:81-89)."""

    def __init__(self, model, params, mesh: Optional[Mesh] = None,
                 is_query: bool = False, noise_level: float = 0.0,
                 noise_seed: int = 0):
        self.model = model
        self.mesh = mesh
        self._noise = noise_level > 0.0
        # fresh noise per batch: a host-side counter folded into the key
        # (the reference samples new noise every forward,
        # evaluate/model/models.py:81-89 — a fixed key would reuse one draw)
        self._noise_key = jax.random.PRNGKey(noise_seed)
        self._batch_no = 0
        self._fn = _encode_fn(model, mesh, is_query, noise_level)
        if mesh is not None:
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            self.params = jax.device_put(params)
        self._batch_sharding = (
            NamedSharding(mesh, P(DATA_AXIS)) if mesh is not None else None
        )

    def __call__(self, ids: np.ndarray, mask: np.ndarray):
        ids = jnp.asarray(ids)
        mask = jnp.asarray(mask)
        if self._batch_sharding is not None:
            ids = jax.device_put(ids, self._batch_sharding)
            mask = jax.device_put(mask, self._batch_sharding)
        if self._noise:
            key = jax.random.fold_in(self._noise_key, self._batch_no)
            self._batch_no += 1
            return self._fn(self.params, ids, mask, key)
        return self._fn(self.params, ids, mask)


def encode_cache_multivector(
    encoder: Encoder,
    cache,
    cfg: EncodeConfig = EncodeConfig(),
    chunk_len: int = 512,
):
    """Multi-chunk documents -> flat multi-vector index.

    The encoder emits [B, C, D] (one vector per chunk,
    models/dual_encoder.py:_multi_chunk_emb). Returns (emb [R, D],
    row2doc [R]) with padded chunks (no real tokens) dropped — the flat
    layout the reference searches over, deduped downstream
    (reference ANCE/drivers/run_ann_data_gen.py:201-204,
    evaluate/evaluation/evaluate_beir.py:132-134).
    """
    n = len(cache)
    bs = cfg.batch_size
    embs, row2doc = [], []
    for s in range(0, n, bs):
        idx = np.arange(s, min(s + bs, n))
        pad = bs - len(idx)
        gather = np.concatenate([idx, np.repeat(idx[-1:], pad)]) if pad else idx
        tokens, mask = cache.batch_with_mask(gather)
        emb = np.asarray(encoder(tokens, mask), cfg.emb_dtype)  # [B, C, D]
        C = emb.shape[1]
        chunk_real = (
            mask.reshape(len(gather), C, -1)[:, :, 0].astype(bool)
        )
        if pad:
            emb, chunk_real = emb[: len(idx)], chunk_real[: len(idx)]
        keep = chunk_real.reshape(-1)
        flat = emb.reshape(-1, emb.shape[-1])[keep]
        docs = np.repeat(idx, C)[keep]
        embs.append(flat)
        row2doc.append(docs)
    return np.concatenate(embs), np.concatenate(row2doc)


def encode_cache(
    encoder: Encoder,
    cache,
    cfg: EncodeConfig = EncodeConfig(),
    indices: Optional[np.ndarray] = None,
    progress: Optional[Callable[[int, int], None]] = None,
    prefetch_depth: int = 2,
) -> np.ndarray:
    """Encode all (or selected) records of a token cache -> [N, D] embeddings.

    The trailing partial batch is padded to the full batch size (static
    shapes keep one compiled program) and trimmed on output. Host-side
    record gathers run `prefetch_depth` batches ahead on a background thread
    so the device never waits on the data plane.
    """
    from cocodr_tpu.data.prefetch import prefetch

    n = len(cache) if indices is None else len(indices)
    idx = np.arange(n) if indices is None else np.asarray(indices)
    bs = cfg.batch_size

    if cfg.length_buckets:
        return _encode_bucketed(encoder, cache, cfg, idx, progress,
                                prefetch_depth)

    def batches():
        for s in range(0, n, bs):
            chunk = idx[s : s + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad)])
            tokens, mask = cache.batch_with_mask(chunk)
            yield s, pad, tokens, mask

    out = None
    stream = (
        prefetch(batches(), depth=prefetch_depth, device_put=False)
        if prefetch_depth > 0
        else batches()
    )
    for s, pad, tokens, mask in stream:
        emb = encoder(tokens, mask)
        emb_np = np.asarray(emb, cfg.emb_dtype)
        if pad:
            emb_np = emb_np[: bs - pad]
        if out is None:
            out = np.empty((n, emb_np.shape[-1]), cfg.emb_dtype)
        out[s : s + len(emb_np)] = emb_np
        if progress:
            progress(min(s + bs, n), n)
    return out


def _encode_bucketed(encoder, cache, cfg, idx, progress, prefetch_depth):
    """Length-bucketed encode: records are grouped by token length into
    cfg.length_buckets (ascending seq widths; the last must cover max_len)
    and each bucket runs at its truncated width — recovering the padding
    waste of encoding everything at max_len (MS MARCO passages average
    ~half of the 128 budget). One compiled program per bucket width.
    Output order matches `idx`."""
    from cocodr_tpu.data.prefetch import prefetch

    lengths = cache.lengths()[idx]
    buckets = sorted(cfg.length_buckets)
    assert buckets[-1] >= cache.max_len, (buckets, cache.max_len)
    bs = cfg.batch_size
    out = None

    for width in buckets:
        lo = 0 if width == buckets[0] else buckets[buckets.index(width) - 1]
        sel = np.nonzero((lengths > lo) & (lengths <= width))[0]
        if len(sel) == 0:
            continue
        sub_idx = idx[sel]

        def batches():
            for s in range(0, len(sub_idx), bs):
                chunk = sub_idx[s : s + bs]
                pad = bs - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.repeat(chunk[-1:], pad)]
                    )
                tokens, mask = cache.batch_with_mask(chunk)
                yield s, pad, tokens[:, :width], mask[:, :width]

        stream = (
            prefetch(batches(), depth=prefetch_depth, device_put=False)
            if prefetch_depth > 0
            else batches()
        )
        for s, pad, tokens, mask in stream:
            emb_np = np.asarray(encoder(tokens, mask), cfg.emb_dtype)
            if pad:
                emb_np = emb_np[: bs - pad]
            if out is None:
                out = np.empty((len(idx), emb_np.shape[-1]), cfg.emb_dtype)
            out[sel[s : s + len(emb_np)]] = emb_np
        if progress:
            progress(width, buckets[-1])
    return out
