"""Pallas fused MIPS sweep kernel: matmul + per-block score maxima.

The block-max top-k (ops/mips.py:mips_topk_blockmax) spends its sweep on
[Q, T] score tiles; under XLA those tiles may round-trip through HBM between
the matmul and the max-reduce. This kernel fuses them: each grid step DMAs
one corpus tile into VMEM (pipelined by pallas), runs the MXU matmul with
fp32 accumulation, and reduces to per-block maxima in VMEM — only the
[Q, T/block] maxima ever leave the core.

The exactness argument and the candidate-rescore phase are shared with
mips_topk_blockmax (the kernel only replaces the sweep).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(q_ref, c_ref, out_ref, *, block: int):
    # q_ref: [Qt, D] bf16; c_ref: [T, D] bf16 (this grid step's corpus
    # tile); out_ref: [T//block, Qt] f32 (this tile's maxima, TRANSPOSED).
    #
    # Scores are computed corpus-major ([T, Qt]) so the block split is a
    # layout-preserving leading-dim reshape — Mosaic cannot lower a
    # lane-splitting [Q, T] -> [Q, T/b, b] reshape (it crashes the
    # compiler), but [T, Qt] -> [T/b, b, Qt] is free and the axis-1 max is
    # a plain sublane reduction.
    scores = jax.lax.dot_general(
        c_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, Qt]
    T, Qt = scores.shape
    out_ref[:] = jnp.max(scores.reshape(T // block, block, Qt), axis=1)


def _pack_argmax(s3):
    """[B, fine, Qt] scores -> [B, Qt] f32 block maxima with the argmax row
    offset (0..fine-1, fine <= 8) packed into the 3 low mantissa bits.

    Monotone: clearing 3 LSBs preserves float ordering to within 7 ULP
    (~1e-6 relative); the packed value compares like the max itself. Used
    by the rescore-free fast search mode, where selection over packed
    maxima directly yields doc ids with no candidate gather."""
    B, fine, Qt = s3.shape
    best = s3[:, 0, :]
    arg = jnp.zeros((B, Qt), jnp.int32)
    for r in range(1, fine):  # unrolled VPU max+select chain
        m = s3[:, r, :] > best
        best = jnp.where(m, s3[:, r, :], best)
        arg = jnp.where(m, r, arg)
    bits = jax.lax.bitcast_convert_type(best, jnp.int32)
    packed = (bits & ~jnp.int32(7)) | arg
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def _sweep_kernel_i8(q_ref, c_ref, fine_ref, coarse_ref, *, fine: int,
                     coarse: int, super_rows: int = 0):
    """int8 x int8 -> int32 sweep with EXACT integer argmax packing.

    packed = (block_max << 3) | argmax is strictly monotone in the max
    (|score| <= D*127^2 < 2^28, so the shift cannot overflow), unlike the
    f32 mantissa packing which is monotone only to 7 ULP.

    super_rows = fps > 0 writes the fine maxima in the 3D
    [supers_per_tile, Qt, fps] super-rows layout (see _sweep_kernel2)."""
    scores = jax.lax.dot_general(
        c_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [T, Qt] int32
    T, Qt = scores.shape
    s3 = scores.reshape(T // fine, fine, Qt)
    best = s3[:, 0, :]
    arg = jnp.zeros((T // fine, Qt), jnp.int32)
    for r in range(1, fine):
        m = s3[:, r, :] > best
        best = jnp.where(m, s3[:, r, :], best)
        arg = jnp.where(m, r, arg)
    packed = (best << 3) | arg
    if super_rows:
        fps = super_rows
        fine_ref[:] = packed.reshape(
            T // fine // fps, fps, Qt
        ).swapaxes(1, 2)
    else:
        fine_ref[:] = packed.T  # [Qt, T/fine]
    coarse_ref[:] = jnp.max(
        packed.reshape(T // (fine * coarse), coarse, Qt), axis=1
    )


def _sweep_kernel2(q_ref, c_ref, fine_ref, coarse_ref, *, fine: int,
                   coarse: int, pack: bool = False, super_rows: int = 0):
    """Dual-output sweep: fine AND coarse maxima in one pass, so the
    selection phase never re-reads the big fine-maxima array from HBM.
    With pack=True the fine maxima carry their in-block argmax in the 3
    low mantissa bits (see _pack_argmax) and the coarse maxima are maxima
    of the packed values (ordering-consistent).

    Fine maxima are written QUERY-MAJOR (in-kernel VPU transpose of the
    [T/fine, Qt] tile): downstream gathers then read contiguous
    `coarse`-length runs along the minor axis, which the XLA gather engine
    serves ~2.7x faster than the per-column scattered gathers the
    corpus-major layout forces (measured: 6.9ms vs 12.4ms for the fine
    select at 1M x 768, Q=1024). The transpose also speeds the sweep itself
    up (12.0ms vs 14.0ms) — the [Qt, T/fine] store pattern is friendlier.
    Coarse maxima stay corpus-major: their [T/cb, Qt] block has a minor dim
    < 128 when transposed (Mosaic lane constraint) and the array is small
    enough (64MB at 1M docs) that an XLA transpose downstream is cheap.

    With super_rows = fps > 0 the fine maxima are instead written as a 3D
    [supers_per_tile, Qt, fps] block — one row of fps fine maxima per
    (super block, query) pair. The full array [n_super, Qp, fps] is then
    consumed by _select_fine_blocks' run-gather as a flat row gather after
    a LEADING-axes merge, which is layout-free; the 2D query-major layout
    needed a [Q, n_fine] -> [Q*n_super, fps] minor-axis split that XLA's
    (8,128) tiling turns into a 512MB retile copy (~3.2 ms/search at 1M
    docs, device-traced reshape.13 — paid by exact AND fast modes)."""
    scores = jax.lax.dot_general(
        c_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, Qt]
    T, Qt = scores.shape
    s3 = scores.reshape(T // fine, fine, Qt)
    fm = _pack_argmax(s3) if pack else jnp.max(s3, axis=1)
    if super_rows:
        fps = super_rows
        fine_ref[:] = fm.reshape(T // fine // fps, fps, Qt).swapaxes(1, 2)
    else:
        fine_ref[:] = fm.T  # [Qt, T/fine]
    coarse_ref[:] = jnp.max(
        fm.reshape(T // (fine * coarse), coarse, Qt), axis=1
    )


@functools.partial(
    jax.jit, static_argnames=("tile", "block", "q_tile", "interpret")
)
def blockmax_sweep_pallas(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    tile: int = 2048,
    block: int = 32,
    q_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[Q, D] x [N, D] -> per-block score maxima [Q, N//block].

    N must be a multiple of `tile` (pad with zero rows and mask downstream;
    zero rows score 0.0). Queries are zero-padded to a q_tile multiple.

    Grid: (corpus tiles, query tiles) — corpus outermost so each corpus tile
    is DMA'd exactly once while the (small) query tiles cycle in the inner
    dimension; the pallas pipeline double-buffers the streams.
    Mosaic constraints: output block dims need (tile/block) % 8 == 0 and
    q_tile % 128 == 0; keep tile <= 2048 — larger corpus tiles overflow VMEM
    under double-buffering and crash the Mosaic compile helper.

    Measured (v5e, 1M x 768 corpus, Q=1024): 11.6 ms/sweep = 142 TFLOP/s
    (~72% of bf16 peak) at tile=2048/q_tile=512 — 12x the unfused XLA
    block-max sweep, 43x the naive sort-per-tile sweep.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % tile == 0, (N, tile)
    if not interpret:  # Mosaic block constraints (interpret mode is free)
        assert (tile // block) % 8 == 0 and q_tile % 128 == 0, (
            tile, block, q_tile,
        )
    n_tiles = N // tile
    qpad = (-Q) % q_tile
    if qpad:
        queries = jnp.pad(queries, ((0, qpad), (0, 0)))
    Qp = Q + qpad
    n_q_tiles = Qp // q_tile

    out_t = pl.pallas_call(
        functools.partial(_sweep_kernel, block=block),
        grid=(n_tiles, n_q_tiles),
        in_specs=[
            pl.BlockSpec(
                (q_tile, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile // block, q_tile),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N // block, Qp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=N * D * 2 + Qp * D * 2 + Qp * (N // block) * 4,
            transcendentals=0,
        ),
    )(queries.astype(jnp.bfloat16), corpus.astype(jnp.bfloat16))
    return out_t.T[:Q]


def _topk_kernel(x_ref, vals_ref, ids_ref, xs_ref, *, k: int, width: int):
    """Iterative extract-max top-k over a VMEM-resident [QB, W] block.

    XLA's TopK lowers to a full variadic sort — measured ~3.1 ms FLAT for
    any [1024, 250..2000] f32 input at k=100 on v5e (sort cost is
    shuffle-bound, k-independent). For k << W an extract-max loop is far
    cheaper: k passes of (row max, first-argmax, mask) — all dense VPU ops,
    no cross-lane shuffles. Measured 0.4-1.0 ms for the same shapes (see
    pallas_topk docstring).

    Tie semantics match lax.top_k: equal values yield the lowest index
    first (the argmax is min-over-equal-positions, and only that position
    is masked per iteration)."""
    xs_ref[:] = x_ref[:]
    QB = xs_ref.shape[0]
    neg = (
        jnp.finfo(xs_ref.dtype).min
        if jnp.issubdtype(xs_ref.dtype, jnp.floating)
        else jnp.iinfo(xs_ref.dtype).min
    )
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (QB, width), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (QB, k), 1)

    def body(i, _):
        x = xs_ref[:]
        m = jnp.max(x, axis=1)  # [QB]
        hit = x == m[:, None]
        a = jnp.min(jnp.where(hit, iota_w, width), axis=1)  # first argmax
        xs_ref[:] = jnp.where(iota_w == a[:, None], neg, x)
        sel = iota_k == i
        vals_ref[:] = jnp.where(sel, m[:, None], vals_ref[:])
        ids_ref[:] = jnp.where(sel, a[:, None], ids_ref[:])
        return 0

    vals_ref[:] = jnp.full((QB, k), neg, vals_ref.dtype)
    ids_ref[:] = jnp.zeros((QB, k), jnp.int32)
    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "q_block", "interpret"))
def pallas_topk(
    x: jnp.ndarray,
    k: int,
    q_block: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k along the last axis of [Q, W] (f32 or int32), lowest
    index first on ties — drop-in for jax.lax.top_k where k << W.

    Measured (v5e, Q=1024, k=100, best-of-3): [Q,800] 0.63 ms and [Q,1952]
    1.33 ms vs lax.top_k's 3.14 / 3.47 ms — the selection phases of the
    hierarchical search are built from these calls (see
    mips_topk_hierarchical)."""
    Q, W = x.shape
    assert k <= W, (k, W)
    neg = (
        jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    wpad = (-W) % 128
    if wpad:
        x = jnp.pad(x, ((0, 0), (0, wpad)), constant_values=neg)
    Wp = W + wpad
    # scoped VMEM is ~16MB: the kernel holds the input block, a same-size
    # scratch, and double-buffering — cap the block at ~4MB so wide inputs
    # (e.g. [Q, 12800] from the fps=128 fine select) still fit
    fit = max(8, (4 * 1024 * 1024 // (Wp * x.dtype.itemsize)) // 8 * 8)
    qb = min(q_block, fit, max(8, -(-Q // 8) * 8))
    qpad = (-Q) % qb
    if qpad:
        x = jnp.pad(x, ((0, qpad), (0, 0)), constant_values=neg)
    Qp = Q + qpad

    vals, ids = pl.pallas_call(
        functools.partial(_topk_kernel, k=k, width=Wp),
        grid=(Qp // qb,),
        in_specs=[
            pl.BlockSpec((qb, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, k), x.dtype),
            jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((qb, Wp), x.dtype)],
        interpret=interpret,
    )(x)
    return vals[:Q], ids[:Q]


def _select_coarse_blocks(bm_coarse, kc: int, supers: int, k_super: int):
    """Top-kc coarse blocks via an optional super level.

    bm_coarse: [Q, n_coarse] (-inf on padded columns). With supers > 1 the
    [Q, n_coarse] top_k becomes a max-reduce to [Q, n_coarse/supers], a
    top-k_super there, and a contiguous run-gather re-select among the
    surviving supers' coarse maxima. Lossless by the block-max coverage
    chain: a coarse block among the kc best has its super parent's max >=
    its own max, and at most k_super parents can hold such blocks — pass
    k_super = k (+1 when a replicate-padded boundary block can duplicate a
    real doc's score). Used by both the exact hierarchical search and the
    rescore-free fast mode (identical selection semantics)."""
    Q, n_coarse = bm_coarse.shape
    if supers <= 1 or n_coarse <= supers * kc:
        _, coarse_ids = jax.lax.top_k(bm_coarse, kc)
        return coarse_ids
    neg = (
        -jnp.inf if jnp.issubdtype(bm_coarse.dtype, jnp.floating)
        else jnp.iinfo(bm_coarse.dtype).min
    )
    n_super = -(-n_coarse // supers)
    pad_c = n_super * supers - n_coarse
    bm_c_p = (
        jnp.pad(bm_coarse, ((0, 0), (0, pad_c)), constant_values=neg)
        if pad_c else bm_coarse
    )
    sup = jnp.max(bm_c_p.reshape(Q, n_super, supers), axis=2)
    ks = min(k_super, n_super)
    _, sup_ids = jax.lax.top_k(sup, ks)  # [Q, ks]
    c_max = jnp.take_along_axis(
        bm_c_p.reshape(Q, n_super, supers), sup_ids[:, :, None], axis=1
    ).reshape(Q, ks * supers)
    c_cand = (
        sup_ids[:, :, None] * supers
        + jnp.arange(supers, dtype=jnp.int32)[None, None, :]
    ).reshape(Q, ks * supers)
    kc = min(kc, ks * supers)
    _, pos_c = jax.lax.top_k(c_max, kc)
    return jnp.take_along_axis(c_cand, pos_c, axis=1)  # [Q, kc]


def _select_fine_blocks(bm_fine_q, bm_coarse, k_sel: int, k_fine: int,
                        coarse: int, supers: int, n_fine_real: int,
                        k_super: int, interpret: bool):
    """Fine-block selection: super top-k -> DIRECT fine top-k among the
    surviving supers' fine maxima (the coarse re-select level is gone).

    bm_fine_q: [Q, n_fine] query-major fine maxima, OR the sweep's 3D
    [n_super, Qp, fps] super-rows layout (preferred at scale: its
    run-gather view is a leading-axes merge instead of a 512MB minor-axis
    retile — see _sweep_kernel2). bm_coarse [Q, n_coarse] (-inf/INT_MIN
    on padded columns). Returns (vals, ids): the k_fine best fine-block
    maxima and their fine-block ids.

    Two-call structure: ONE lax.top_k over the [Q, ~2k] super maxima plus
    ONE pallas_topk over the [Q, k_super*supers*coarse] gathered fine runs.
    lax.top_k costs ~3.1 ms FLAT per call on v5e (full-sort lowering), so
    collapsing the old coarse-re-select + fine pair (2 sorts + gather,
    ~6.6 ms) into one extract-max top-k (~3.6 ms at width 6464) buys ~2.5 ms
    per search. Losslessness is the same coverage chain: a fine block with
    max >= s_k has a super ancestor with max >= s_k, and at most k_super
    supers qualify, so every qualifying fine block survives the gather."""
    Q, n_coarse = bm_coarse.shape
    neg = (
        -jnp.inf if jnp.issubdtype(bm_coarse.dtype, jnp.floating)
        else jnp.iinfo(bm_coarse.dtype).min
    )
    if bm_fine_q.ndim == 3:
        # super-rows layout: [n_super, Qp, fps] from _dual_sweep_mixed
        assert supers > 1 and n_coarse > supers * k_sel, (
            "3D fine maxima require the supers selection path"
        )
        n_super, Qp, fps = bm_fine_q.shape
        assert fps == supers * coarse, (fps, supers, coarse)
        sup = jnp.max(
            jnp.pad(
                bm_coarse, ((0, 0), (0, n_super * supers - n_coarse)),
                constant_values=neg,
            ).reshape(Q, n_super, supers)
            if n_super * supers != n_coarse
            else bm_coarse.reshape(Q, n_super, supers),
            axis=2,
        )
        ks = min(k_super, n_super)
        _, sup_ids = pallas_topk(sup, ks, interpret=interpret)  # [Q, ks]
        fine_cand = (
            sup_ids[:, :, None] * fps
            + jnp.arange(fps, dtype=jnp.int32)[None, None, :]
        ).reshape(Q, ks * fps)
        # flat row gather over the (super, query)-major rows: the
        # [n_super, Qp, fps] -> [n_super*Qp, fps] view merges LEADING
        # axes only, so no retile copy (cf. the 2D layout note above)
        flat_rows = sup_ids * Qp + jnp.arange(Q, dtype=jnp.int32)[:, None]
        fine_max = jnp.take(
            bm_fine_q.reshape(n_super * Qp, fps), flat_rows, axis=0
        ).reshape(Q, ks * fps)
        fine_max = jnp.where(fine_cand < n_fine_real, fine_max, neg)
        kf = min(k_fine, n_fine_real)
        vals, pos = pallas_topk(fine_max, kf, interpret=interpret)
        return vals, jnp.take_along_axis(fine_cand, pos, axis=1)
    if supers <= 1 or n_coarse <= supers * k_sel:
        # small corpus: single coarse top_k then fine top_k (legacy path)
        kc = min(k_sel, n_coarse)
        _, coarse_ids = jax.lax.top_k(bm_coarse, kc)
        fine_max = jnp.take_along_axis(
            bm_fine_q.reshape(Q, n_coarse, coarse),
            coarse_ids[:, :, None], axis=1,
        ).reshape(Q, kc * coarse)
        fine_cand = (
            coarse_ids[:, :, None] * coarse
            + jnp.arange(coarse, dtype=jnp.int32)[None, None, :]
        ).reshape(Q, kc * coarse)
        fine_max = jnp.where(fine_cand < n_fine_real, fine_max, neg)
        kf = min(k_fine, n_fine_real)
        vals, pos = jax.lax.top_k(fine_max, kf)
        return vals, jnp.take_along_axis(fine_cand, pos, axis=1)

    n_super = -(-n_coarse // supers)
    pad_c = n_super * supers - n_coarse
    bm_c_p = (
        jnp.pad(bm_coarse, ((0, 0), (0, pad_c)), constant_values=neg)
        if pad_c else bm_coarse
    )
    sup = jnp.max(bm_c_p.reshape(Q, n_super, supers), axis=2)
    ks = min(k_super, n_super)
    # extract-max here too: [Q, ~2k] k~100 is 1.3 ms pallas vs 3.5 ms for
    # the lax full-sort lowering (see pallas_topk docstring)
    _, sup_ids = pallas_topk(sup, ks, interpret=interpret)  # [Q, ks]

    fps = supers * coarse  # fine blocks per super block
    n_fine = bm_fine_q.shape[1]
    pad_f = n_super * fps - n_fine
    bm_f_p = (
        jnp.pad(bm_fine_q, ((0, 0), (0, pad_f)), constant_values=neg)
        if pad_f else bm_fine_q
    )
    fine_cand = (
        sup_ids[:, :, None] * fps
        + jnp.arange(fps, dtype=jnp.int32)[None, None, :]
    ).reshape(Q, ks * fps)
    # Run-gather the surviving supers' fine maxima as a flat ROW gather:
    # view the [Q, n_fine] sweep output as [Q*n_super, fps] (row-major
    # contiguity preserved — a pure bitcast, no relayout) and jnp.take
    # whole fps-rows — the canonical fast TPU gather form (same engine
    # path as the rescore's corpus-block gather). Device-traced
    # alternatives at 1M docs, all rejected:
    #   reshape(Q, n_super, fps) + take_along_axis(axis=1): fast gather,
    #     but XLA layout assignment relayouts the 512MB sweep output TWICE
    #     ({1,0}->{0,1}->{2,1,0} — a net no-op, ~3.9 ms/search of copies);
    #   element-flat take_along_axis: no copies, ~67 ms scalar-gather
    #     fusion;
    #   vmapped dynamic_slice / hand-built run lax.gather: both serialized
    #     into a ~146 ms 200k-step while loop.
    flat_rows = (
        jnp.arange(Q, dtype=jnp.int32)[:, None] * n_super + sup_ids
    )  # [Q, ks]
    fine_max = jnp.take(
        bm_f_p.reshape(Q * n_super, fps), flat_rows, axis=0
    ).reshape(Q, ks * fps)
    fine_max = jnp.where(fine_cand < n_fine_real, fine_max, neg)
    kf = min(k_fine, n_fine_real)
    vals, pos = pallas_topk(fine_max, kf, interpret=interpret)
    return vals, jnp.take_along_axis(fine_cand, pos, axis=1)


def _pad_replicate(corpus, multiple):
    """Pad the corpus row count to a multiple by replicating the last row.

    Replicate-padding (vs zero-padding) keeps BOTH search modes correct
    without special cases: a pad row can never beat its block's max (it IS
    a copy of row N-1, a real row of the final partial block), and if the
    fast mode's in-block argmax lands on a pad slot, min(id, N-1) maps it
    back to the identical real row."""
    N = corpus.shape[0]
    pad = (-N) % multiple
    if not pad:
        return corpus
    tail = jnp.broadcast_to(corpus[-1:], (pad, corpus.shape[1]))
    return jnp.concatenate([corpus, tail], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile", "fine", "coarse", "q_tile", "supers", "interpret",
        "n_real",
    ),
)
def mips_topk_hierarchical(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 2048,
    fine: int = 8,
    coarse: int = 8,  # coarse block = fine * coarse rows
    q_tile: int = 1024,  # measured ~2% faster than 512 (best-of-5 A/B)
    supers: int = 8,  # super block = fine * coarse * supers rows (1 = off)
    interpret: bool = False,
    n_real: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with a three-level block hierarchy — the fast path.

    Sweep keeps FINE (8-row) block maxima; selection is hierarchical:
      top-k over SUPER (512-row) maxima  -> surviving super blocks
      top-k over their coarse maxima     -> k coarse blocks
      top-k over their fine maxima       -> k fine blocks
      rescore k*fine candidate rows      -> exact order
    Every selection level is lossless by the block-max coverage argument: a
    block (any granularity) whose max >= the global k-th score contains a
    top-k item as its argmax, so at most k blocks qualify and top-k over
    block maxima keeps them all. The fine level cuts the candidate-gather
    4x vs block=32 (the gather dominated the flat version: 100ms of a 136ms
    search); the super level shrinks the only big top_k from [Q, N/64] to
    [Q, N/512] (the [Q,16384] coarse top_k was ~1/3 of the search at 1M
    docs); the query-major fine-maxima layout makes the fine select a
    contiguous run-gather (2.7x faster than the scattered corpus-major
    gather).

    Measured (v5e, 1M x 768, Q=1024, k=100, best-of-3): 22.7-23.0
    ms/search -> ~44.5-45.1k QPS with the super-rows fine-maxima layout
    (28.6 ms with the 2D query-major layout; 33.1 ms without the super
    level).
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    if n_real:
        # pre-padded corpus (pad rows replicate the last real row, see
        # _pad_replicate): avoids the kernel's own pad making a SECOND
        # full on-device copy — a 12.65GB HLO temp at MARCO scale, where
        # 8,841,823 rows are not tile-aligned (round-5 rehearsal OOM).
        # All masking below keys on the REAL row count.
        assert n_real <= N, (n_real, N)
        N = n_real
    k = min(k, N)
    cb = fine * coarse
    # don't pad small query batches up to a full q_tile: the fine-maxima
    # output is [Qpadded, N/fine] f32, and at MARCO scale (8.8M docs) a
    # 512-row pad overflows Mosaic's 2GB buffer-offset limit (and wastes
    # half the sweep)
    q_tile = min(q_tile, max(128, -(-Q // 128) * 128))
    corpus_p = _pad_replicate(corpus, max(tile, cb))
    Np = corpus_p.shape[0]

    # phase 1: fine + coarse block maxima in ONE kernel pass; fine maxima
    # arrive in the 3D super-rows layout when the supers selection path
    # will run (its run-gather view is then layout-free — _sweep_kernel2),
    # else QUERY-MAJOR [Q, n_fine]; coarse maxima corpus-major [n_coarse, Q]
    n_fine = Np // fine
    n_coarse = Np // cb
    extra = 1 if N % cb else 0
    k_sel = min(k + extra, n_coarse)
    use_super_rows = (
        supers > 1 and n_coarse > supers * k_sel
        and tile % (cb * supers) == 0
    )
    bm_fine_q, bm_coarse_t = _dual_sweep_mixed(
        queries, corpus_p, tile=tile, fine=fine, coarse=coarse,
        q_tile=q_tile, interpret=interpret,
        supers=supers if use_super_rows else 0,
    )

    # mask padded blocks (zero-score pad rows could outrank real negatives)
    n_fine_real = -(-N // fine)
    n_coarse_real = -(-N // cb)
    bm_coarse = jnp.where(
        (jnp.arange(n_coarse) < n_coarse_real)[:, None], bm_coarse_t, -jnp.inf
    ).T  # [Q, n_coarse]
    # phase 2: super top-k -> fine top-k directly (see _select_fine_blocks)
    _, fine_ids = _select_fine_blocks(
        bm_fine_q, bm_coarse, k_sel=k_sel,
        k_fine=k + extra, coarse=coarse, supers=supers,
        n_fine_real=n_fine_real,
        k_super=k + (1 if N % (cb * supers) else 0), interpret=interpret,
    )  # [Q, kf]
    kf = fine_ids.shape[1]

    # phase 3: rescore candidates. Candidates are whole fine blocks, so the
    # gather moves fine*D contiguous bytes per index (12KB at fine=8) —
    # 1.7x faster than row-granular gathers on the XLA gather engine.
    # Query-chunked (lax.map) to bound the gather buffer for large k.
    blocks = corpus_p.reshape(Np // fine, fine, D)
    qq = queries.astype(jnp.bfloat16)

    def rescore_chunk(args):
        q_c, fid_c = args  # [C, D], [C, kf]
        C = q_c.shape[0]
        rows = jnp.take(blocks, fid_c, axis=0).reshape(
            C, kf * fine, D
        ).astype(jnp.bfloat16)
        cand = (
            fid_c[:, :, None] * fine
            + jnp.arange(fine, dtype=jnp.int32)[None, None, :]
        ).reshape(C, kf * fine)
        scores = jnp.einsum(
            "qd,qkd->qk", q_c, rows, preferred_element_type=jnp.float32
        )
        scores = jnp.where(cand < N, scores, -jnp.inf)
        # extract-max top-k beats the lax full-sort lowering here too
        # (2.7 vs 3.1 ms at [1024, 808] k=100; same tie semantics)
        v, pos = pallas_topk(scores, k, interpret=interpret)
        return v, jnp.take_along_axis(cand, pos, axis=1)

    # keep the per-chunk gather buffer under ~1.5GB bf16
    budget_rows = max(1, (750 * 1024 * 1024) // (kf * fine * D))
    chunk = max(128, min(Q, budget_rows))
    n_chunks = -(-Q // chunk)
    qpad2 = n_chunks * chunk - Q
    q_p = jnp.pad(qq, ((0, qpad2), (0, 0)))
    f_p = jnp.pad(fine_ids, ((0, qpad2), (0, 0)))
    if n_chunks == 1:
        vals, ids = rescore_chunk((q_p, f_p))
    else:
        vals, ids = jax.lax.map(
            rescore_chunk,
            (
                q_p.reshape(n_chunks, chunk, D),
                f_p.reshape(n_chunks, chunk, kf),
            ),
        )
        vals = vals.reshape(-1, k)
        ids = ids.reshape(-1, k)
    return vals[:Q], ids[:Q]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile", "fine", "coarse", "q_tile", "supers", "interpret",
        "n_real",
    ),
)
def mips_topk_fast(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 2048,
    fine: int = 8,
    coarse: int = 8,
    q_tile: int = 1024,  # see mips_topk_hierarchical
    supers: int = 8,
    interpret: bool = False,
    n_real: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rescore-free approximate top-k: block-argmax search.

    The sweep packs each fine block's argmax row offset into the 3 low
    mantissa bits of the block max (_pack_argmax); selection over packed
    maxima then yields doc ids directly — no candidate gather, no rescore.
    Returns at most one row per fine block: a true top-k row is missed only
    when it shares an 8-row block with a strictly better top-k row, so
    expected misses ~ C(k,2)*(fine-1)/n_fine (recall@100 measured 99.7% at
    N=100k and higher at 1M, random corpora). Scores carry the 3-bit
    mantissa quantization (<= 7 ULP low). Use mips_topk_hierarchical when
    exactness is required; this path is for serving/mining where ~1.25x
    lower latency buys more than the last ~0.3% of recall.

    Measured (v5e, 1M x 768, Q=1024, k=100, best-of-3): 17.4-18.0 ms ->
    56.8-58.9k QPS at 99.97% recall@100 (exact hierarchical: 22.7-23.0 ms
    -> ~45k QPS).
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    if n_real:
        assert n_real <= N, (n_real, N)  # see mips_topk_hierarchical
        N = n_real
    k = min(k, N)
    cb = fine * coarse
    assert fine <= 8, "argmax packing uses 3 mantissa bits"
    q_tile = min(q_tile, max(128, -(-Q // 128) * 128))  # see hierarchical
    corpus_p = _pad_replicate(corpus, max(tile, cb))
    Np = corpus_p.shape[0]

    n_fine = Np // fine
    n_coarse = Np // cb
    n_fine_real = -(-N // fine)
    n_coarse_real = -(-N // cb)
    use_super_rows = (
        supers > 1 and n_coarse > supers * min(k, n_coarse)
        and tile % (cb * supers) == 0
    )
    bm_fine_q, bm_coarse_t = _dual_sweep_mixed(
        queries, corpus_p, tile=tile, fine=fine, coarse=coarse,
        q_tile=q_tile, interpret=interpret, pack=True,
        supers=supers if use_super_rows else 0,
    )

    bm_coarse = jnp.where(
        (jnp.arange(n_coarse) < n_coarse_real)[:, None], bm_coarse_t, -jnp.inf
    ).T  # [Q, n_coarse]
    vals, blocks = _select_fine_blocks(
        bm_fine_q, bm_coarse, k_sel=min(k, n_coarse), k_fine=k,
        coarse=coarse, supers=supers, n_fine_real=n_fine_real, k_super=k,
        interpret=interpret,
    )
    kk = vals.shape[1]

    bits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    ids = jnp.minimum(blocks * fine + (bits & 7), N - 1)
    clean = jax.lax.bitcast_convert_type(bits & ~jnp.int32(7), jnp.float32)
    if kk < k:  # tiny corpus: pad result width to k
        vals = jnp.pad(clean, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)))
        return vals, ids
    return clean, ids


def quantize_corpus_int8(corpus) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-dimension int8 quantization: returns (corpus_i8 [N, D],
    dim_scale [D] f32) with corpus ~ corpus_i8 * dim_scale.

    Per-dim scales fold into the query side at search time (see
    mips_topk_int8), so ranking quality degrades only with the query's own
    8-bit rounding. Halves corpus HBM vs bf16: ~17M 768-d docs per v5e."""
    c = jnp.asarray(corpus, jnp.float32)
    dim_scale = jnp.maximum(jnp.max(jnp.abs(c), axis=0), 1e-30) / 127.0
    c_i8 = jnp.clip(jnp.round(c / dim_scale), -127, 127).astype(jnp.int8)
    return c_i8, dim_scale


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "tile", "fine", "coarse", "q_tile", "supers", "interpret",
    ),
)
def mips_topk_int8(
    queries: jnp.ndarray,
    corpus_i8: jnp.ndarray,
    dim_scale: jnp.ndarray,
    k: int,
    tile: int = 2048,
    fine: int = 8,
    coarse: int = 8,
    q_tile: int = 1024,
    supers: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Block-argmax top-k over an int8-quantized corpus.

    Capacity mode: the int8 corpus is half the HBM of bf16 at the same
    search latency (the v5e runs this int8 sweep at the bf16 kernel's speed
    — measured 12.2 vs 12.0 ms/1M-doc sweep — so the win is fitting ~17M
    768-d docs on one chip, or freeing 7GB at MARCO scale). Scoring: the
    per-dim corpus scale folds into the query, which is then quantized to
    int8 per-query; int32 scores rank exactly like (q * dim_scale_folded)
    8-bit-rounded products. Integer argmax packing makes the selection
    arithmetic exact given those scores (no ULP caveat); the approximation
    vs f32 exact search is the 8-bit rounding plus the one-row-per-block
    property of the fast mode. Returns (approx f32 scores, ids).

    recall@100 vs exact bf16 = 98.4% (random corpora); capacity demo:
    16.4M docs (12.6GB) resident on one chip, 4.0k QPS at Q=128.
    Measured (v5e, 1M x 768, Q=1024, k=100, best-of-3): 16.6 ms -> 61.7k
    QPS with the super-rows layout (23.3 ms query-major, 34.3 ms without
    the super level).
    """
    Q, D = queries.shape
    N = corpus_i8.shape[0]
    k = min(k, N)
    cb = fine * coarse
    assert fine <= 8, "argmax packing uses 3 bits"
    q_tile = min(q_tile, max(128, -(-Q // 128) * 128))
    corpus_p = _pad_replicate(corpus_i8, max(tile, cb))
    Np = corpus_p.shape[0]

    # fold per-dim corpus scale into the query, quantize per query
    qf = jnp.asarray(queries, jnp.float32) * dim_scale[None, :]
    q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-30) / 127.0
    q_i8 = jnp.clip(
        jnp.round(qf / q_scale[:, None]), -127, 127
    ).astype(jnp.int8)

    n_fine = Np // fine
    n_coarse = Np // cb
    n_fine_real = -(-N // fine)
    n_coarse_real = -(-N // cb)
    NEG = jnp.iinfo(jnp.int32).min
    use_super_rows = (
        supers > 1 and n_coarse > supers * min(k, n_coarse)
        and tile % (cb * supers) == 0
    )
    bm_fine_q, bm_coarse_t = _int8_sweep(
        q_i8, corpus_p, tile=tile, fine=fine, coarse=coarse, q_tile=q_tile,
        interpret=interpret, supers=supers if use_super_rows else 0,
    )

    bm_coarse = jnp.where(
        (jnp.arange(n_coarse) < n_coarse_real)[:, None], bm_coarse_t, NEG
    ).T
    vals, blocks = _select_fine_blocks(
        bm_fine_q, bm_coarse, k_sel=min(k, n_coarse), k_fine=k,
        coarse=coarse, supers=supers, n_fine_real=n_fine_real, k_super=k,
        interpret=interpret,
    )
    kk = vals.shape[1]

    ids = jnp.minimum(blocks * fine + (vals & 7), N - 1)
    scores = (vals >> 3).astype(jnp.float32) * q_scale[:, None]
    if kk < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - kk)),
                         constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, k - kk)))
    return scores, ids


def _int8_sweep(q_i8, corpus_i8, tile, fine, coarse, q_tile, interpret,
                supers=0):
    """[Q, D] int8 x [N, D] int8 -> (packed fine maxima int32, packed
    coarse maxima [N/cb, Q] int32 corpus-major). Fine maxima are 2D
    query-major [Q, N/fine] with supers=0, else the 3D super-rows layout
    [n_super, Qp, fps] (see _dual_sweep_mixed)."""
    Q, D = q_i8.shape
    N = corpus_i8.shape[0]
    cb = fine * coarse
    if supers and Q > q_tile:
        q_tile = min(q_tile, 512)  # see _dual_sweep_mixed
    assert N % tile == 0 and tile % cb == 0, (N, tile, cb)
    if not interpret:
        assert (tile // cb) % 8 == 0 and q_tile % 128 == 0, (tile, cb, q_tile)
        assert (tile // fine) % 128 == 0, (tile, fine)
    qpad = (-Q) % q_tile
    if qpad:
        q_i8 = jnp.pad(q_i8, ((0, qpad), (0, 0)))
    Qp = Q + qpad
    if supers:
        fps = coarse * supers
        assert tile % (cb * supers) == 0, (tile, cb, supers)
        spt = tile // (cb * supers)
        fine_spec = pl.BlockSpec(
            (spt, q_tile, fps), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        )
        fine_shape = jax.ShapeDtypeStruct(
            (N // (cb * supers), Qp, fps), jnp.int32
        )
    else:
        fps = 0
        fine_spec = pl.BlockSpec(
            (q_tile, tile // fine), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        )
        fine_shape = jax.ShapeDtypeStruct((Qp, N // fine), jnp.int32)
    fine_q, coarse_t = pl.pallas_call(
        functools.partial(_sweep_kernel_i8, fine=fine, coarse=coarse,
                          super_rows=fps),
        grid=(N // tile, Qp // q_tile),
        in_specs=[
            pl.BlockSpec((q_tile, D), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            fine_spec,
            pl.BlockSpec((tile // cb, q_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            fine_shape,
            jax.ShapeDtypeStruct((N // cb, Qp), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=N * D + Qp * D
            + Qp * (N // fine + N // cb) * 4,
            transcendentals=0,
        ),
    )(q_i8, corpus_i8)
    if supers:
        return fine_q, coarse_t[:, :Q]
    return fine_q[:Q], coarse_t[:, :Q]


def _dual_sweep_mixed(queries, corpus, tile, fine, coarse, q_tile,
                      interpret, pack=False, supers=0):
    """One kernel pass -> (fine maxima, coarse maxima [N/cb, Q]
    corpus-major).

    With supers=0 the fine maxima come back 2D query-major [Q, N/fine].
    With supers=s > 0 they come back 3D [n_super, Qp, fps] (fps =
    coarse*s fine maxima per (super block, query) row; NOTE: the query
    axis keeps its q_tile padding Qp so the leading-axes merge downstream
    stays layout-free — see _sweep_kernel2). Requires tile % (cb*s) == 0."""
    Q, D = queries.shape
    N = corpus.shape[0]
    cb = fine * coarse
    if supers and Q > q_tile:
        # multiple query tiles double-buffer the query stream on top of
        # the (lane-padded) 3D fine block — q_tile=1024 then overflows
        # VMEM and crashes the Mosaic compile helper; 512 fits (~2% sweep
        # cost at Q=1024, measured)
        q_tile = min(q_tile, 512)
    assert N % tile == 0 and tile % cb == 0, (N, tile, cb)
    if not interpret:
        assert (tile // cb) % 8 == 0 and q_tile % 128 == 0, (tile, cb, q_tile)
        assert (tile // fine) % 128 == 0, (tile, fine)  # q-major fine block
    n_tiles = N // tile
    qpad = (-Q) % q_tile
    if qpad:
        queries = jnp.pad(queries, ((0, qpad), (0, 0)))
    Qp = Q + qpad
    n_q_tiles = Qp // q_tile

    if supers:
        fps = coarse * supers
        assert tile % (cb * supers) == 0, (tile, cb, supers)
        spt = tile // (cb * supers)  # super blocks per corpus tile
        fine_spec = pl.BlockSpec(
            (spt, q_tile, fps), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        )
        fine_shape = jax.ShapeDtypeStruct(
            (N // (cb * supers), Qp, fps), jnp.float32
        )
    else:
        fps = 0
        fine_spec = pl.BlockSpec(
            (q_tile, tile // fine), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        )
        fine_shape = jax.ShapeDtypeStruct((Qp, N // fine), jnp.float32)

    fine_q, coarse_t = pl.pallas_call(
        functools.partial(_sweep_kernel2, fine=fine, coarse=coarse,
                          pack=pack, super_rows=fps),
        grid=(n_tiles, n_q_tiles),
        in_specs=[
            pl.BlockSpec(
                (q_tile, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            fine_spec,
            pl.BlockSpec(
                (tile // cb, q_tile), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            fine_shape,
            jax.ShapeDtypeStruct((N // cb, Qp), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=N * D * 2 + Qp * D * 2
            + Qp * (N // fine + N // cb) * 4,
            transcendentals=0,
        ),
    )(queries.astype(jnp.bfloat16), corpus.astype(jnp.bfloat16))
    if supers:
        return fine_q, coarse_t[:, :Q]  # fine_q keeps the Qp pad (3D)
    return fine_q[:Q], coarse_t[:, :Q]


def _blockmax_sweep_transposed(queries, corpus, tile, block, q_tile,
                               interpret):
    """Like blockmax_sweep_pallas but returns the transposed [N//block, Q]
    maxima without the final transpose (the hierarchy consumes both
    layouts; the cheap ops stay in whichever layout is free)."""
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % tile == 0, (N, tile)
    if not interpret:
        assert (tile // block) % 8 == 0 and q_tile % 128 == 0, (
            tile, block, q_tile,
        )
    n_tiles = N // tile
    qpad = (-Q) % q_tile
    if qpad:
        queries = jnp.pad(queries, ((0, qpad), (0, 0)))
    Qp = Q + qpad
    n_q_tiles = Qp // q_tile

    out_t = pl.pallas_call(
        functools.partial(_sweep_kernel, block=block),
        grid=(n_tiles, n_q_tiles),
        in_specs=[
            pl.BlockSpec(
                (q_tile, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile // block, q_tile),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N // block, Qp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=N * D * 2 + Qp * D * 2 + Qp * (N // block) * 4,
            transcendentals=0,
        ),
    )(queries.astype(jnp.bfloat16), corpus.astype(jnp.bfloat16))
    return out_t[:, :Q]


def mips_topk_blockmax_pallas(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 2048,
    block: int = 32,
    q_tile: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full exact top-k with the pallas sweep + shared top-k/rescore phases."""
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    pad = (-N) % tile
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus

    bm = blockmax_sweep_pallas(
        queries, corpus_p, tile=tile, block=block, q_tile=q_tile,
        interpret=interpret,
    )  # [Q, Np//block]
    # mask fully-padded blocks (zero-row scores could exceed real negatives)
    n_blocks_real = -(-N // block)
    blk_ids = jnp.arange(bm.shape[1])
    bm = jnp.where(blk_ids[None, :] < n_blocks_real, bm, -jnp.inf)

    # the last real block may contain padded zero rows that inflate its max;
    # one extra block slot absorbs it without breaking the coverage proof
    extra = 1 if N % block else 0
    kb = min(k + extra, n_blocks_real)
    _, block_ids = jax.lax.top_k(bm, kb)
    cand = (
        block_ids[:, :, None] * block
        + jnp.arange(block, dtype=jnp.int32)[None, None, :]
    ).reshape(Q, kb * block)
    cand = jnp.where(cand < N, cand, -1)

    from cocodr_tpu.ops.mips import rescore_topk

    # bf16 multiplies keep the rescore consistent with the sweep's scores
    return rescore_topk(queries, corpus, cand, k, dtype=jnp.bfloat16)


# ---------------------------------------------------------------------------
# Argmax-certificate exact search (top-2 per coarse block)
# ---------------------------------------------------------------------------

def _sweep_kernel_top2(q_ref, c_ref, best_ref, pack_ref, *, cb: int):
    """Sweep emitting per-COARSE-block (cb rows) top-2 statistics:

      best_ref [T/cb, Qt] f32 — the block's EXACT max score;
      pack_ref [T/cb, Qt] f32 — the block's second-best score with the
        argmax ROW (0..cb-1, cb <= 64 -> 6 bits) packed into the 6 low
        mantissa bits.

    The packing clears 6 mantissa LSBs of the SECOND value only — the
    best stays exact, so downstream selection order and the returned
    scores are exact; the second is used only for a >= threshold test,
    where clearing low mantissa bits is monotone (for both signs:
    |t(x)| = floor-to-step(|x|), so x >= y implies t(x) >= t(y) when the
    threshold is cleared the same way) and therefore only ever flags
    MORE blocks, never fewer.

    Ties: strict '>' keeps the FIRST max occurrence as argmax (matching
    lax.top_k semantics) — with replicate padding the real row N-1
    precedes its pad copies, so the argmax doc id is always < N; a pad
    copy that ties the max lands in `second` instead, flagging the
    boundary block for rescore exactly when its docs matter."""
    T = c_ref.shape[0]
    Qt = q_ref.shape[0]
    # VMEM discipline: a whole-tile [T, Qt] f32 score buffer plus the
    # top-2 chain's live temporaries blows the 16M scoped limit (measured
    # 19.7-25.6M at T=2048). Sub-tile the matmul instead: each 512-row
    # sub-dot is reduced to its [sub/cb, Qt] block stats before the next
    # sub-tile's scores exist, bounding the live set at ~2MB + operands.
    sub = min(T, 512 if cb <= 512 else cb)
    assert T % sub == 0 and sub % cb == 0, (T, sub, cb)
    f = 8
    g = cb // f
    spb = sub // cb
    q = q_ref[:]

    def body(i, _):
        # fori_loop, NOT an unrolled python loop: Mosaic allocates every
        # unrolled iteration's score/temp buffers separately (measured
        # 21-25M scoped VMEM); the loop body's buffers are reused across
        # trips and the live set stays ~2MB + operands
        c_sub = c_ref[pl.dslice(i * sub, sub), :]
        scores = jax.lax.dot_general(
            c_sub,
            q,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [sub, Qt]
        # two-stage top-2: 8-step chain within fine groups, then merge
        s3 = scores.reshape(sub // f, f, Qt)
        fb = s3[:, 0, :]
        fs = jnp.full_like(fb, -jnp.inf)
        fa = jnp.zeros((sub // f, Qt), jnp.int32)
        for r in range(1, f):
            s = s3[:, r, :]
            m = s > fb
            fs = jnp.where(m, fb, jnp.maximum(fs, s))
            fb = jnp.where(m, s, fb)
            fa = jnp.where(m, r, fa)
        fb3 = fb.reshape(spb, g, Qt)
        fs3 = fs.reshape(spb, g, Qt)
        fa3 = fa.reshape(spb, g, Qt)
        best = fb3[:, 0, :]
        second = fs3[:, 0, :]
        arg = fa3[:, 0, :]
        for j in range(1, g):
            b2, s2, a2 = fb3[:, j, :], fs3[:, j, :], fa3[:, j, :]
            m = b2 > best
            second = jnp.where(
                m, jnp.maximum(best, s2), jnp.maximum(second, b2)
            )
            arg = jnp.where(m, a2 + j * f, arg)
            best = jnp.where(m, b2, best)
        bits = jax.lax.bitcast_convert_type(second, jnp.int32)
        packed = (bits & ~jnp.int32(63)) | arg
        best_ref[pl.dslice(i * spb, spb), :] = best
        pack_ref[pl.dslice(i * spb, spb), :] = (
            jax.lax.bitcast_convert_type(packed, jnp.float32)
        )
        return 0

    jax.lax.fori_loop(0, T // sub, body, 0)


def _top2_sweep(queries, corpus, tile, cb, q_tile, interpret):
    """One kernel pass -> (best [n_cb, Qp], packed-second [n_cb, Qp]),
    both corpus-major. Output traffic is Q*N/cb * 8 bytes — 4.5x less
    than the exact hierarchical sweep's fine+coarse pair at cb=64."""
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % tile == 0 and tile % cb == 0, (N, tile, cb)
    assert cb % 8 == 0 and cb <= 64, cb  # 6-bit arg pack, 8-row fine stage
    if not interpret:
        assert (tile // cb) % 8 == 0 and q_tile % 128 == 0, (
            tile, cb, q_tile,
        )
    n_tiles = N // tile
    qpad = (-Q) % q_tile
    if qpad:
        queries = jnp.pad(queries, ((0, qpad), (0, 0)))
    Qp = Q + qpad
    n_q_tiles = Qp // q_tile

    spec = pl.BlockSpec(
        (tile // cb, q_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
    )
    best_t, pack_t = pl.pallas_call(
        functools.partial(_sweep_kernel_top2, cb=cb),
        grid=(n_tiles, n_q_tiles),
        in_specs=[
            pl.BlockSpec(
                (q_tile, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((N // cb, Qp), jnp.float32),
            jax.ShapeDtypeStruct((N // cb, Qp), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * N * D,
            bytes_accessed=N * D * 2 + Qp * D * 2 + Qp * (N // cb) * 8,
            transcendentals=0,
        ),
    )(queries.astype(jnp.bfloat16), corpus.astype(jnp.bfloat16))
    return best_t, pack_t


def _clear6(x):
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jax.lax.bitcast_convert_type(bits & ~jnp.int32(63), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("n_real", "k", "tile", "cb", "supers",
                     "rescore_blocks", "q_tile", "interpret"),
)
def _exact2_core(queries, corpus_p, n_real: int, k: int, tile: int, cb: int,
                 supers: int, rescore_blocks: int, q_tile: int,
                 interpret: bool):
    """Jitted core of mips_topk_exact2. Returns (vals, ids, ok) where
    ok=False means some query flagged more than `rescore_blocks` coarse
    blocks and the host wrapper must fall back to the full rescore path
    (mips_topk_hierarchical). See mips_topk_exact2 for the argument."""
    Q, D = queries.shape
    Np = corpus_p.shape[0]
    N = int(n_real)
    R = rescore_blocks

    best_t, pack_t = _top2_sweep(
        queries, corpus_p, tile=tile, cb=cb, q_tile=q_tile,
        interpret=interpret,
    )  # [n_cb, Qp] each

    n_cb = Np // cb
    n_cb_real = -(-N // cb)
    col_real = (jnp.arange(n_cb) < n_cb_real)[:, None]
    bm = jnp.where(col_real, best_t, -jnp.inf).T[:Q]      # [Q, n_cb]
    pk = jnp.where(col_real, pack_t, -jnp.inf).T[:Q]      # [Q, n_cb]

    # super level: top-(k+slack) super blocks, then top-kc coarse blocks
    # among the survivors' coarse runs (coverage argument as in
    # _select_coarse_blocks)
    n_super = -(-n_cb // supers)
    pad_c = n_super * supers - n_cb
    if pad_c:
        bm_p = jnp.pad(bm, ((0, 0), (0, pad_c)), constant_values=-jnp.inf)
        pk_p = jnp.pad(pk, ((0, 0), (0, pad_c)), constant_values=-jnp.inf)
    else:
        bm_p, pk_p = bm, pk
    sup = jnp.max(bm_p.reshape(Q, n_super, supers), axis=2)
    # bound by the count of REAL supers: pallas_topk pads with finfo.min,
    # which outranks the -inf masked pad supers — selecting past the real
    # count would return the out-of-width sentinel index
    n_super_real = -(-n_cb_real // supers)
    ks = min(k + (1 if N % (cb * supers) else 0), n_super_real)
    _, sup_ids = pallas_topk(sup, ks, interpret=interpret)  # [Q, ks]

    best_runs = jnp.take_along_axis(
        bm_p.reshape(Q, n_super, supers), sup_ids[:, :, None], axis=1
    ).reshape(Q, ks * supers)
    pack_runs = jnp.take_along_axis(
        pk_p.reshape(Q, n_super, supers), sup_ids[:, :, None], axis=1
    ).reshape(Q, ks * supers)
    cand_blk = (
        sup_ids[:, :, None] * supers
        + jnp.arange(supers, dtype=jnp.int32)[None, None, :]
    ).reshape(Q, ks * supers)

    extra = 1 if N % cb else 0
    kc = min(k + extra, n_cb_real, ks * supers)
    vals, pos = pallas_topk(best_runs, kc, interpret=interpret)  # [Q, kc]
    blk = jnp.take_along_axis(cand_blk, pos, axis=1)             # [Q, kc]
    pks = jnp.take_along_axis(pack_runs, pos, axis=1)

    pk_bits = jax.lax.bitcast_convert_type(pks, jnp.int32)
    arg = jnp.where(jnp.isfinite(pks), pk_bits & 63, 0)
    second = jax.lax.bitcast_convert_type(
        jnp.where(
            jnp.isfinite(pks), pk_bits & ~jnp.int32(63), pk_bits
        ),
        jnp.float32,
    )
    doc = jnp.minimum(blk * cb + arg, N - 1)  # argmax doc, exact score vals

    # certificate: the kc selected blocks' argmax docs are kc DISTINCT
    # real docs with exact scores `vals`, so vals[:, k-1] is a true lower
    # bound on the k-th best score. Only blocks whose SECOND max clears
    # it can hide another top-k doc.
    s_lb = _clear6(vals[:, k - 1])
    flag = second >= s_lb[:, None]

    # rescore the top-R flagged blocks (whole cb-row gathers). Unflagged
    # slots carry -1e38: strictly above pallas_topk's finfo.min padding
    # AND its per-iteration mask value, so an all-unflagged row still
    # yields R DISTINCT in-width positions (values equal to the mask
    # value would be re-picked every iteration); strictly below any real
    # second, so flagged blocks always win the R slots
    key = jnp.where(flag, second, jnp.float32(-1e38))
    _, rpos = pallas_topk(key, R, interpret=interpret)     # [Q, R]
    resc_blk = jnp.take_along_axis(blk, rpos, axis=1)      # [Q, R]
    blocks = corpus_p.reshape(n_cb, cb, D)
    qq = queries.astype(jnp.bfloat16)

    def rescore_chunk(args):
        q_c, rb_c = args  # [C, D], [C, R]
        C = q_c.shape[0]
        rows = jnp.take(blocks, rb_c, axis=0).astype(jnp.bfloat16)
        s = jnp.einsum(
            "qd,qrmd->qrm", q_c, rows, preferred_element_type=jnp.float32
        ).reshape(C, R * cb)
        c2 = (
            rb_c[:, :, None] * cb
            + jnp.arange(cb, dtype=jnp.int32)[None, None, :]
        ).reshape(C, R * cb)
        return jnp.where(c2 < N, s, -jnp.inf), c2

    budget_rows = max(1, (512 * 1024 * 1024) // (R * cb * D * 2))
    chunk = max(128, min(Q, budget_rows))
    n_chunks = -(-Q // chunk)
    qpad2 = n_chunks * chunk - Q
    q_p = jnp.pad(qq, ((0, qpad2), (0, 0)))
    rb_p = jnp.pad(resc_blk, ((0, qpad2), (0, 0)))
    if n_chunks == 1:
        rs, rc = rescore_chunk((q_p, rb_p))
    else:
        rs, rc = jax.lax.map(
            rescore_chunk,
            (
                q_p.reshape(n_chunks, chunk, D),
                rb_p.reshape(n_chunks, chunk, R),
            ),
        )
        rs = rs.reshape(Q + qpad2, R * cb)
        rc = rc.reshape(Q + qpad2, R * cb)
    rs, rc = rs[:Q], rc[:Q]

    # suppress the argmax candidate of every RESCORED block (its rows —
    # including the argmax row with the same exact score — are all among
    # the rescored candidates), so no doc appears twice
    kc_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, kc), 1)
    sup_mask = jnp.any(kc_iota[:, :, None] == rpos[:, None, :], axis=2)
    argv = jnp.where(sup_mask, -jnp.inf, vals)
    # the certificate itself: EVERY flagged block made it into the R
    # rescore slots (the direct invariant — subsumes the count <= R check)
    ok = jnp.logical_not(jnp.any(flag & jnp.logical_not(sup_mask)))

    allv = jnp.concatenate([argv, rs], axis=1)     # [Q, kc + R*cb]
    alli = jnp.concatenate([doc, jnp.minimum(rc, N - 1)], axis=1)
    fv, fp = pallas_topk(allv, k, interpret=interpret)
    fi = jnp.take_along_axis(alli, fp, axis=1)
    return fv, fi, ok


def mips_topk_exact2(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    tile: int = 2048,
    cb: int = 64,
    supers: int = 8,
    rescore_blocks: int = 0,  # 0 = auto from the expected flag count
    q_tile: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via an argmax certificate — near-zero rescore volume.

    The sweep keeps, per 64-row coarse block, its exact max, the argmax
    row (6 packed bits) and the second-best value. Selection picks the
    top-(k+slack) blocks by max; their argmax rows are k+ DISTINCT docs
    with exact scores, so the k-th best of those is a true lower bound
    s_lb on the k-th result. A block can hide a further top-k doc ONLY if
    its second-best >= s_lb — expected ~C(k,2)*cb/N blocks per query
    (~0.3 at 1M docs, k=100) — so only those get the candidate gather the
    classic path pays for all k+ blocks (mips_topk_hierarchical rescores
    (k+1)*fine rows/query; FAISS IndexFlatIP heap-scans everything,
    ANCE/drivers/run_ann_data_gen.py:311-317). The flag count is checked
    ON DEVICE: if any query flags more than `rescore_blocks` blocks the
    wrapper falls back to mips_topk_hierarchical (exactness never rests
    on the estimate). Returned scores are the sweep's exact f32
    accumulations; ties resolve lowest-index-first like lax.top_k.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    k = min(k, N)
    n_cb_real = -(-N // cb)
    if n_cb_real < k + 2 or N < max(tile, cb * supers * 2):
        # small corpus: the certificate needs >= k selectable blocks and
        # the tile pipeline; the classic path is already fast here
        return mips_topk_hierarchical(queries, corpus, k, interpret=interpret)
    if rescore_blocks <= 0:
        lam = k * (k - 1) / 2 * cb / N
        rescore_blocks = int(min(32, max(4, lam + 6 * lam ** 0.5 + 3)))
    corpus_p = _pad_replicate(corpus, max(tile, cb * supers))
    q_tile = min(q_tile, max(128, -(-Q // 128) * 128))
    vals, ids, ok = _exact2_core(
        queries, corpus_p, n_real=N, k=k, tile=tile, cb=cb, supers=supers,
        rescore_blocks=rescore_blocks, q_tile=q_tile, interpret=interpret,
    )
    if not bool(ok):
        return mips_topk_hierarchical(queries, corpus, k, interpret=interpret)
    return vals, ids
