"""Loss parity: triplet NLL and coCondenser contrastive vs torch reference math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cocodr_tpu.losses import (
    co_contrastive_loss,
    flipped_pair_targets,
    triplet_nll,
)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def test_triplet_nll_matches_torch():
    rng = np.random.RandomState(0)
    q, a, b = (rng.randn(8, 16).astype(np.float32) for _ in range(3))
    loss, acc, logits = triplet_nll(jnp.asarray(q), jnp.asarray(a), jnp.asarray(b))

    tq, ta, tb = map(torch.tensor, (q, a, b))
    logit_matrix = torch.cat(
        [(tq * ta).sum(-1).unsqueeze(1), (tq * tb).sum(-1).unsqueeze(1)], dim=1
    )
    lsm = F.log_softmax(logit_matrix, dim=1)
    ref_loss = (-1.0 * lsm[:, 0]).numpy()
    ref_argmax = torch.argmax(logit_matrix, dim=1).numpy()

    np.testing.assert_allclose(np.asarray(loss), ref_loss, atol=1e-6, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(acc), (ref_argmax == 0).astype(np.float32))


def test_flipped_pair_targets():
    np.testing.assert_array_equal(
        np.asarray(flipped_pair_targets(6)), [1, 0, 3, 2, 5, 4]
    )


def test_co_contrastive_matches_torch():
    rng = np.random.RandomState(1)
    cls = rng.randn(8, 12).astype(np.float32)
    loss = co_contrastive_loss(jnp.asarray(cls), reduction="none")

    t = torch.tensor(cls)
    sim = torch.matmul(t, t.transpose(0, 1))
    sim.fill_diagonal_(float("-inf"))
    target = (
        torch.arange(8, dtype=torch.long).view(-1, 2).flip([1]).flatten()
    )
    ref = F.cross_entropy(sim, target, reduction="none").numpy()
    np.testing.assert_allclose(np.asarray(loss), ref, atol=1e-5, rtol=1e-5)


def test_gathered_grad_matches_reference_hack():
    """The reference gathers CLS across ranks without gradient, re-inserts the
    local shard, and scales the loss by world_size (COCO/modeling.py:182-190,
    244-248); with DDP gradient averaging this equals the full gradient of the
    global-mean loss through a differentiable all_gather. Verify numerically
    on a 4-way split.
    """
    rng = np.random.RandomState(2)
    W = 4  # world size
    B = 2  # local batch (pairs -> 2 spans)
    D = 8
    cls_all = rng.randn(W * B, D).astype(np.float32)

    # ours: differentiable all_gather over a shard_map'd data axis
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    devs = jax.devices()[:W]
    mesh = Mesh(np.array(devs), ("data",))

    def local_loss(cls_local):
        return co_contrastive_loss(cls_local, axis_name="data")

    f = shard_map(
        lambda x: jax.grad(local_loss)(x),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
    )
    ours = np.asarray(f(jnp.asarray(cls_all)))

    # reference semantics: per-rank loss over gathered (no-grad except local),
    # scaled by world_size, then DDP averages gradients across ranks.
    t_all = torch.tensor(cls_all)
    grads = torch.zeros_like(t_all)
    for r in range(W):
        t = t_all.clone().detach()
        local = t[r * B : (r + 1) * B].clone().requires_grad_(True)
        gathered = torch.cat(
            [
                t[i * B : (i + 1) * B] if i != r else local
                for i in range(W)
            ]
        )
        sim = gathered @ gathered.T
        sim = sim.masked_fill(torch.eye(W * B, dtype=torch.bool), float("-inf"))
        target = (
            torch.arange(W * B, dtype=torch.long).view(-1, 2).flip([1]).flatten()
        )
        loss = F.cross_entropy(sim, target, reduction="none").mean() * W
        loss.backward()
        grads[r * B : (r + 1) * B] = local.grad
    ref = (grads / W).numpy()  # DDP mean over ranks

    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
