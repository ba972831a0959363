"""Train-step factory: all three loss modes run, losses decrease, and the
iDRO per-group-grad plumbing matches an explicit construction."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.losses import DroConfig, dro_greedy_init, idro_init
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.optim import lamb, warmup_linear
from cocodr_tpu.pipelines.train_step import (
    TrainStepConfig,
    build_train_step,
    split_last_k_layers,
)
from cocodr_tpu.utils.train_state import TrainState


def _setup(loss_kind, dro=None):
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    B, S = 8, 12
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 100, size=(B, S)).astype(np.int32)
    batch = {
        "q_ids": jnp.asarray(ids),
        "q_mask": jnp.ones((B, S), jnp.int32),
        "pos_ids": jnp.asarray(np.roll(ids, 1, 1)),
        "pos_mask": jnp.ones((B, S), jnp.int32),
        "neg_ids": jnp.asarray(ids[::-1].copy()),
        "neg_mask": jnp.ones((B, S), jnp.int32),
        "groups": jnp.asarray(rng.randint(0, 4, B)),
        "weights": jnp.ones((B,), jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["q_ids"][:1], batch["q_mask"][:1]
    )["params"]
    tx = lamb(warmup_linear(5e-4, 2, 100))
    extra = None
    if dro is not None:
        extra = dro_greedy_init(dro) if loss_kind == "dro-greedy" else idro_init(dro)
    state = TrainState.create(params, tx, extra=extra)
    step = build_train_step(
        model, tx, TrainStepConfig(loss_kind=loss_kind, dro=dro,
                                   idro_last_k_layers=1)
    )
    return state, step, batch, model


@pytest.mark.parametrize("loss_kind", ["nll", "dro-greedy", "idro"])
@pytest.mark.slow
def test_modes_run_and_learn(loss_kind):
    dro = DroConfig(n_groups=4) if loss_kind != "nll" else None
    state, step, batch, _ = _setup(loss_kind, dro)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[1], losses
    assert int(state.step) == 6
    if loss_kind != "nll":
        h = np.asarray(state.extra.h_fun)
        assert h.shape == (4,)
        assert np.isfinite(h).all()


def test_split_last_k_layers_roundtrip():
    bert = BertConfig.tiny()  # 2 layers
    model = build_dual_encoder("rdot_nll", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
    )["params"]
    lastk, rebuild = split_last_k_layers(params, 1)
    # every leaf of lastk is the [-1:] slice
    enc = params["encoder"]["encoder"]["layers"]["layer"]
    leaf = enc["intermediate"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(lastk["intermediate"]["kernel"]), np.asarray(leaf[-1:])
    )
    rebuilt = rebuild(lastk)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        rebuilt,
    )


@pytest.mark.slow
def test_idro_group_grads_only_last_k():
    """The per-group gradient buffer has the last-k-layers dimensionality."""
    from cocodr_tpu.losses import per_group_grads

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    B, S = 4, 8
    ids = jnp.ones((B, S), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    lastk, rebuild = split_last_k_layers(params, 1)

    def losses_fn(lk):
        p = rebuild(lk)
        q = model.apply({"params": p}, ids, mask, method=model.query_emb)
        return jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)

    _, pullback = jax.vjp(losses_fn, lastk)
    groups = jnp.asarray([0, 1, 0, 2])
    gg = per_group_grads(pullback, groups, 3)
    P = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(lastk))
    assert gg.shape == (3, P)
    assert np.isfinite(np.asarray(gg)).all()
    assert np.abs(np.asarray(gg)).max() > 0


@pytest.mark.slow
def test_nll_multichunk_trains_end_to_end():
    """Long-doc mode: rdot_nll_multi_chunk model + nll_multichunk step
    (reference NLL_MultiChunk, ANCE/model/models.py:307-399). Padded chunks
    must not influence the loss."""
    bert = BertConfig.tiny()
    L, C, B, Lq = 8, 3, 4, 6
    model = build_dual_encoder("rdot_nll_multi_chunk", bert, base_len=L)
    rng = np.random.RandomState(1)
    q_ids = rng.randint(1, 100, size=(B, Lq)).astype(np.int32)
    d_ids = rng.randint(1, 100, size=(B, C * L)).astype(np.int32)
    d_mask = np.ones((B, C * L), np.int32)
    d_mask[:, 2 * L:] = 0  # third chunk fully padded
    batch = {
        "q_ids": jnp.asarray(q_ids),
        "q_mask": jnp.ones((B, Lq), jnp.int32),
        "pos_ids": jnp.asarray(d_ids),
        "pos_mask": jnp.asarray(d_mask),
        "neg_ids": jnp.asarray(d_ids[::-1].copy()),
        "neg_mask": jnp.asarray(d_mask),
        "weights": jnp.ones((B,), jnp.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["q_ids"][:1], batch["q_mask"][:1]
    )["params"]
    tx = lamb(warmup_linear(5e-4, 2, 100))
    state = TrainState.create(params, tx)
    step = build_train_step(
        model, tx, TrainStepConfig(loss_kind="nll_multichunk")
    )
    losses = []
    for _ in range(6):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # padded-chunk invariance: garbage tokens under a zero mask change nothing
    batch2 = dict(batch)
    garbage = np.array(batch["pos_ids"])
    garbage[:, 2 * L:] = 7
    batch2["pos_ids"] = jnp.asarray(garbage)
    state2 = TrainState.create(params, tx)
    _, m1 = step(TrainState.create(params, tx), batch)
    _, m2 = step(state2, batch2)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )


@pytest.mark.quick
def test_idro_group_pass_variants_match():
    """The Gram fast path (per-sample top-K re-run, one backward) and the
    lane group pass (G vmapped top-K backward lanes) must agree exactly in
    deterministic mode: same robust loss, same h_fun update, same updated
    params."""
    dro = DroConfig(n_groups=4)
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    # queries shorter than docs, like the reference (q 64 vs doc 128):
    # exercises the mixed-length padding in the Gram group pass
    B, SQ, S = 8, 6, 12
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 100, size=(B, S)).astype(np.int32)
    batch = {
        "q_ids": jnp.asarray(ids[:, :SQ]),
        "q_mask": jnp.ones((B, SQ), jnp.int32),
        "pos_ids": jnp.asarray(np.roll(ids, 1, 1)),
        "pos_mask": jnp.ones((B, S), jnp.int32),
        "neg_ids": jnp.asarray(ids[::-1].copy()),
        "neg_mask": jnp.ones((B, S), jnp.int32),
        "groups": jnp.asarray(rng.randint(0, 4, B)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["pos_ids"][:1], batch["pos_mask"][:1]
    )["params"]
    tx = lamb(warmup_linear(5e-4, 2, 100))

    results = []
    # lane variants: f32 grad rows flat-vmapped (exact-equivalence
    # reference), plus the SHIPPED lane config — chunked lanes + bf16 row
    # storage (memory bounds that make G=50 bert-base compile, round 5)
    variants = [
        dict(idro_lane_group_pass=False),
        dict(idro_lane_group_pass=True, idro_lane_chunk=0,
             idro_lane_grad_dtype="float32"),
        dict(idro_lane_group_pass=True, idro_lane_chunk=3),
    ]
    for kw in variants:
        state = TrainState.create(params, tx, extra=idro_init(dro))
        step = build_train_step(
            model, tx,
            TrainStepConfig(
                loss_kind="idro", dro=dro, idro_last_k_layers=1, **kw
            ),
        )
        state, m = step(state, batch)
        results.append((state, m))
    (fast_s, fast_m), (full_s, full_m), (ship_s, ship_m) = results
    np.testing.assert_allclose(
        float(fast_m["loss"]), float(full_m["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fast_s.extra.h_fun), np.asarray(full_s.extra.h_fun),
        rtol=1e-5,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        ),
        fast_s.params, full_s.params,
    )
    # shipped lane config: bf16 rows only touch the h_fun statistic (the
    # chunking itself is exact) — bounded drift, same robust loss
    np.testing.assert_allclose(
        float(ship_m["loss"]), float(fast_m["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ship_s.extra.h_fun), np.asarray(fast_s.extra.h_fun),
        rtol=3e-3,
    )


@pytest.mark.quick
@pytest.mark.parametrize("lane", [False, True], ids=["gram", "lane"])
def test_idro_small_l_clamps_last_k(lane):
    """Regression (round-4 shipped crash): a model with num_hidden_layers <=
    idro_last_k_layers (2-layer test checkpoints, default K=3) must route to
    a clamped full-stack group pass — the reference's last-k selection
    (dro_loss.py:179-183) degenerates to all layers — not assert. The clamped
    K=3 step must equal an explicit K=L step bit-for-bit."""
    dro = DroConfig(n_groups=4)
    bert = BertConfig.tiny()  # 2 layers < default K=3
    assert bert.num_hidden_layers == 2
    model = build_dual_encoder("rdot_nll", bert)
    B, S = 8, 12
    rng = np.random.RandomState(4)
    ids = rng.randint(1, 100, size=(B, S)).astype(np.int32)
    batch = {
        "q_ids": jnp.asarray(ids),
        "q_mask": jnp.ones((B, S), jnp.int32),
        "pos_ids": jnp.asarray(np.roll(ids, 1, 1)),
        "pos_mask": jnp.ones((B, S), jnp.int32),
        "neg_ids": jnp.asarray(ids[::-1].copy()),
        "neg_mask": jnp.ones((B, S), jnp.int32),
        "groups": jnp.asarray(rng.randint(0, 4, B)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["q_ids"][:1], batch["q_mask"][:1]
    )["params"]
    tx = lamb(warmup_linear(5e-4, 2, 100))

    results = []
    for k in (3, 2):  # clamped vs explicit full-stack
        state = TrainState.create(params, tx, extra=idro_init(dro))
        step = build_train_step(
            model, tx,
            TrainStepConfig(loss_kind="idro", dro=dro, idro_last_k_layers=k,
                            idro_lane_group_pass=lane),
        )
        state, m = step(state, batch)
        results.append((state, m))
    (s3, m3), (s2, m2) = results
    assert np.isfinite(float(m3["loss"]))
    np.testing.assert_allclose(float(m3["loss"]), float(m2["loss"]), rtol=0)
    np.testing.assert_allclose(
        np.asarray(s3.extra.h_fun), np.asarray(s2.extra.h_fun), rtol=0
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        s3.params, s2.params,
    )


@pytest.mark.slow
def test_idro_lane_g50_two_tower_steps_on_mesh():
    """The reference's published n_groups=50 (ANCE/README.md
    hyperparameters) must compile and STEP for configs the Gram fast path
    can't serve. Two-tower (dpr, tanh pooler) exercises the lane group
    pass — G vmapped top-K backward lanes over BOTH towers' last-K
    params — under the 8-device DP mesh."""
    from cocodr_tpu.core.mesh import MeshConfig, create_mesh
    from cocodr_tpu.parallel.sharded_train import shard_train_init

    dro = DroConfig(n_groups=50)
    bert = BertConfig.tiny()
    model = build_dual_encoder("dpr", bert)
    B, SQ, S = 16, 6, 8
    rng = np.random.RandomState(2)
    batch = {
        "q_ids": jnp.asarray(rng.randint(1, 100, (B, SQ)).astype(np.int32)),
        "q_mask": jnp.ones((B, SQ), jnp.int32),
        "pos_ids": jnp.asarray(rng.randint(1, 100, (B, S)).astype(np.int32)),
        "pos_mask": jnp.ones((B, S), jnp.int32),
        "neg_ids": jnp.asarray(rng.randint(1, 100, (B, S)).astype(np.int32)),
        "neg_mask": jnp.ones((B, S), jnp.int32),
        "groups": jnp.asarray(rng.randint(0, 50, B)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["pos_ids"][:1], batch["pos_mask"][:1],
        method=lambda m, i, a: (m.query_emb(i, a), m.body_emb(i, a)),
    )["params"]
    tx = lamb(warmup_linear(5e-4, 2, 100))
    mesh = create_mesh(MeshConfig(), jax.devices()[:8])
    state, put_batch = shard_train_init(
        mesh, params, tx, extra=idro_init(dro)
    )
    step = build_train_step(
        model, tx,
        TrainStepConfig(loss_kind="idro", dro=dro, idro_last_k_layers=1),
    )
    with mesh:
        state, m = step(state, put_batch(batch))
        state, m = step(state, put_batch(batch))
    assert np.isfinite(float(m["loss"]))
    h = np.asarray(state.extra.h_fun)
    assert h.shape == (50,) and np.isfinite(h).all()
    assert int(state.step) == 2


@pytest.mark.slow
def test_idro_lane_multichunk_steps():
    """iDRO with the multi-chunk long-doc model: the lane pass re-runs the
    chunk-folded doc towers through the top-K stack and scores with the
    max-over-chunks NLL (ANCE/model/models.py:307-399)."""
    dro = DroConfig(n_groups=5)
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_multi_chunk", bert, base_len=8)
    B, SQ, S, Cn = 4, 6, 16, 2  # docs arrive as 2 chunks of 8
    rng = np.random.RandomState(3)
    pos_mask = np.ones((B, S), np.int32)
    pos_mask[0, 8:] = 0  # one doc with an all-pad second chunk
    batch = {
        "q_ids": jnp.asarray(rng.randint(1, 100, (B, SQ)).astype(np.int32)),
        "q_mask": jnp.ones((B, SQ), jnp.int32),
        "pos_ids": jnp.asarray(rng.randint(1, 100, (B, S)).astype(np.int32)),
        "pos_mask": jnp.asarray(pos_mask),
        "neg_ids": jnp.asarray(rng.randint(1, 100, (B, S)).astype(np.int32)),
        "neg_mask": jnp.ones((B, S), jnp.int32),
        "groups": jnp.asarray(rng.randint(0, 5, B)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["q_ids"][:1], batch["q_mask"][:1]
    )["params"]
    tx = lamb(warmup_linear(5e-4, 2, 100))
    state = TrainState.create(params, tx, extra=idro_init(dro))
    step = build_train_step(
        model, tx,
        TrainStepConfig(loss_kind="idro", dro=dro, idro_last_k_layers=1),
    )
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.isfinite(np.asarray(state.extra.h_fun)).all()
