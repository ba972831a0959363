"""LAMB parity vs the reference torch implementation (ANCE/utils/lamb.py)."""
import importlib.util
import os

import numpy as np
import pytest

import jax.numpy as jnp
import optax

from cocodr_tpu.optim import lamb

torch = pytest.importorskip("torch")

REF = "/root/reference/ANCE/utils/lamb.py"


def _load_reference_lamb():
    if not os.path.exists(REF):
        pytest.skip("reference not available")
    spec = importlib.util.spec_from_file_location("ref_lamb", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.Lamb


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
@pytest.mark.parametrize("adam", [False, True])
def test_lamb_matches_reference(weight_decay, adam):
    Lamb = _load_reference_lamb()
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 7).astype(np.float32)
    b0 = rng.randn(7).astype(np.float32)
    lr = 1e-2

    t_w = torch.tensor(w0.copy(), requires_grad=True)
    t_b = torch.tensor(b0.copy(), requires_grad=True)
    opt = Lamb([t_w, t_b], lr=lr, weight_decay=weight_decay, adam=adam)

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx = lamb(lr, weight_decay=weight_decay, adam=adam)
    state = tx.init(params)

    for step in range(5):
        gw = rng.randn(5, 7).astype(np.float32)
        gb = rng.randn(7).astype(np.float32)

        t_w.grad = torch.tensor(gw)
        t_b.grad = torch.tensor(gb)
        opt.step()

        updates, state = tx.update(
            {"w": jnp.asarray(gw), "b": jnp.asarray(gb)}, state, params
        )
        params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), t_w.detach().numpy(), atol=1e-5, rtol=1e-4,
            err_msg=f"w step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(params["b"]), t_b.detach().numpy(), atol=1e-5, rtol=1e-4,
        )


def test_lamb_large_weight_norm_clamped():
    """Weight norm is clamped at 10 before the trust ratio."""
    Lamb = _load_reference_lamb()
    w0 = (np.ones((50, 50)) * 3.0).astype(np.float32)  # norm 150 >> 10
    t_w = torch.tensor(w0.copy(), requires_grad=True)
    opt = Lamb([t_w], lr=0.1)
    g = np.ones((50, 50), np.float32)
    t_w.grad = torch.tensor(g)
    opt.step()

    params = {"w": jnp.asarray(w0)}
    tx = lamb(0.1)
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
    params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), t_w.detach().numpy(), atol=1e-5, rtol=1e-4
    )
