"""Tensor-parallel sharding: a 4x2 (data x model) mesh train step must
compile, run, and match the replicated-params result numerically."""
import numpy as np

import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cocodr_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from cocodr_tpu.losses import triplet_nll
from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.parallel.tp import shard_params_tp, tp_param_shardings


def _mesh(data, model):
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def test_tp_specs_cover_hot_params():
    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32)
    )["params"]
    mesh = _mesh(4, 2)
    specs = tp_param_shardings(params, mesh)
    layer = specs["encoder"]["encoder"]["layers"]["layer"]
    assert layer["attention"]["query"]["kernel"].spec == P(
        None, None, MODEL_AXIS, None
    )
    assert layer["intermediate"]["kernel"].spec == P(None, None, MODEL_AXIS)
    assert layer["ffn_output"]["kernel"].spec == P(None, MODEL_AXIS, None)
    # embeddings replicated
    emb = specs["encoder"]["embeddings"]["word_embeddings"]["embedding"]
    assert emb.spec == P()


def test_tp_forward_matches_replicated():
    bert = BertConfig.tiny()  # 4 heads, intermediate 64: divisible by model=2
    model = build_dual_encoder("rdot_nll", bert)
    B, S = 8, 16
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 100, size=(B, S)).astype(np.int32))
    mask = jnp.ones((B, S), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]

    ref = model.apply({"params": params}, ids, mask, method=model.query_emb)

    mesh = _mesh(4, 2)
    with mesh:
        p_tp = shard_params_tp(params, mesh)
        ids_sh = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))
        mask_sh = jax.device_put(mask, NamedSharding(mesh, P(DATA_AXIS)))
        fn = jax.jit(
            lambda p, i, m: model.apply({"params": p}, i, m,
                                        method=model.query_emb)
        )
        out = fn(p_tp, ids_sh, mask_sh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_tp_train_step_runs():
    import optax

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll", bert)
    B, S = 8, 12
    ids = jnp.ones((B, S), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids[:1], mask[:1])["params"]
    tx = optax.adamw(1e-3)

    mesh = _mesh(4, 2)
    with mesh:
        p = shard_params_tp(params, mesh)
        opt_state = tx.init(p)
        dsh = NamedSharding(mesh, P(DATA_AXIS))
        batch = {
            "q": jax.device_put(ids, dsh),
            "a": jax.device_put(jnp.roll(ids, 1, 1), dsh),
            "b": jax.device_put(jnp.flip(ids, 0), dsh),
            "m": jax.device_put(mask, dsh),
        }

        @jax.jit
        def step(p, opt_state, batch):
            def loss_fn(p_):
                q = model.apply({"params": p_}, batch["q"], batch["m"],
                                method=model.query_emb)
                a = model.apply({"params": p_}, batch["a"], batch["m"],
                                method=model.body_emb)
                b = model.apply({"params": p_}, batch["b"], batch["m"],
                                method=model.body_emb)
                losses, _, _ = triplet_nll(q, a, b)
                return jnp.mean(losses)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt_state = tx.update(grads, opt_state, p)
            return optax.apply_updates(p, updates), opt_state, loss

        losses = []
        for _ in range(3):
            p, opt_state, loss = step(p, opt_state, batch)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    # params keep their TP shardings through the update
    k = p["encoder"]["encoder"]["layers"]["layer"]["intermediate"]["kernel"]
    assert MODEL_AXIS in str(k.sharding.spec)
