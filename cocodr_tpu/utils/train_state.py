"""Train state + checkpointing.

Replaces the reference's checkpoint-dir protocol (HF save_pretrained +
optimizer.pt + scheduler.pt per checkpoint-{step}, where `scheduler.pt`
written last doubles as the atomicity/validity marker — reference
ANCE/drivers/run_ann.py:51-67,376-403) with orbax checkpoints plus the same
latest-valid-checkpoint discovery semantics, and HF export for interop.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import flax.struct
import jax
import numpy as np
import optax

CKPT_PREFIX = "checkpoint-"
DONE_MARKER = "DONE"  # written last; plays scheduler.pt's validity role


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    extra: Any = None  # e.g. DroState

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, extra=None):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            extra=extra,
        )


def _ckpt_dir(root: str, step: int) -> str:
    return os.path.join(root, f"{CKPT_PREFIX}{step}")


def save_checkpoint(root: str, state: TrainState, keep: int = 0):
    """Atomic-enough save: payload first, DONE marker last."""
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = _ckpt_dir(root, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(path, "state")),
        jax.device_get(state),
    )
    with open(os.path.join(path, DONE_MARKER), "w") as f:
        json.dump({"step": step}, f)
    if keep > 0:
        prune_checkpoints(root, keep)
    return path


class AsyncSaver:
    """Non-blocking checkpoint writer preserving the DONE-marker protocol.

    `save()` snapshots the state to host and returns while orbax persists
    it on a background thread; the DONE marker (the validity signal every
    discovery path keys on — the reference's scheduler.pt-written-last
    protocol, ANCE/drivers/run_ann.py:56-59) is only written AFTER the
    payload commit, so a crash mid-save leaves an invisible, not a
    corrupt, checkpoint. A save waits for the previous one (at most one
    in flight); call `wait()` before exiting.
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        self._finalizer = None
        self._error = None

    def save(self, root: str, state: TrainState, keep: int = 0,
             on_complete=None) -> str:
        """on_complete() runs AFTER the DONE marker is durable — use it for
        any bookkeeping that must never run ahead of checkpoint validity
        (e.g. the ANCE loop's ann-progress record: writing it before the
        commit would skip a consumed-but-unsaved ann file on restart)."""
        import threading

        self.wait()
        step = int(state.step)
        path = _ckpt_dir(root, step)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
        host_state = jax.device_get(state)  # snapshot: training may proceed
        self._ckptr.save(
            os.path.abspath(os.path.join(path, "state")), host_state
        )

        def finalize():
            try:
                self._ckptr.wait_until_finished()
                with open(os.path.join(path, DONE_MARKER), "w") as f:
                    json.dump({"step": step}, f)
                if keep > 0:
                    prune_checkpoints(root, keep)
                if on_complete is not None:
                    on_complete()
            except Exception as e:  # surfaced by the next wait()/save()
                self._error = e

        self._finalizer = threading.Thread(target=finalize, daemon=True)
        self._finalizer.start()
        return path

    def wait(self):
        """Joins the in-flight save and RE-RAISES any commit failure — a
        checkpoint that silently failed to commit would otherwise be
        discovered only at a much later resume."""
        if self._finalizer is not None:
            self._finalizer.join()
            self._finalizer = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint commit failed") from err

    def close(self):
        self.wait()
        self._ckptr.close()


def list_checkpoints(root: str):
    """Valid (DONE-marked) checkpoints, ascending by step."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", name)
        if m and os.path.exists(os.path.join(root, name, DONE_MARKER)):
            out.append((int(m.group(1)), os.path.join(root, name)))
    return [p for _, p in sorted(out)]


def latest_checkpoint(root: str) -> Optional[str]:
    cks = list_checkpoints(root)
    return cks[-1] if cks else None


def prune_checkpoints(root: str, keep: int):
    cks = list_checkpoints(root)
    for path in cks[:-keep]:
        shutil.rmtree(path, ignore_errors=True)


def load_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(os.path.join(path, "state")),
        item=jax.device_get(template),
    )
    return jax.tree_util.tree_map(lambda t, r: r, template, restored)


def export_hf_bert(params_bert, cfg, out_dir: str, head_params=None,
                   extra_state=None):
    """Write an HF-format torch checkpoint of the backbone (parity with
    save_pretrained; Condenser head goes to model.pt like the reference,
    COCO/modeling.py:123-131).

    extra_state: extra top-level tensors merged into pytorch_model.bin —
    the rdot_nll family's `embeddingHead.*`/`norm.*` (reference
    ANCE/model/models.py:109-110) or MLM-head keys. head_params: the split
    `model.pt` dict (c_head). The config records the backbone flavor
    (bert/roberta position semantics) so a reload reconstructs the model."""
    import torch

    from cocodr_tpu.models.hf import bert_params_to_torch

    os.makedirs(out_dir, exist_ok=True)
    sd = {
        k: torch.tensor(v) for k, v in bert_params_to_torch(params_bert, cfg).items()
    }
    if extra_state:
        sd.update({
            k: torch.tensor(np.asarray(v)) for k, v in extra_state.items()
        })
    torch.save(sd, os.path.join(out_dir, "pytorch_model.bin"))
    roberta = getattr(cfg, "position_style", "bert") == "roberta"
    config = {
        "architectures": ["RobertaModel" if roberta else "BertModel"],
        "model_type": "roberta" if roberta else "bert",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "intermediate_size": cfg.intermediate_size,
        "hidden_act": cfg.hidden_act,
        "max_position_embeddings": cfg.max_position_embeddings,
        "type_vocab_size": cfg.type_vocab_size,
        "layer_norm_eps": cfg.layer_norm_eps,
        "pad_token_id": cfg.pad_token_id,
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    if head_params is not None:
        torch.save(
            {k: torch.tensor(np.asarray(v)) for k, v in head_params.items()},
            os.path.join(out_dir, "model.pt"),
        )
