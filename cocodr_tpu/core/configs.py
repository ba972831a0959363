"""Typed config tree with per-stage presets.

One coherent config system replacing the reference's two styles (HF
dataclasses for COCO, ~40-flag argparse blocks duplicated per driver —
SURVEY.md §5). Presets carry the hyperparameters of record from the READMEs
(reference COCO/README.md, warmup/README.md, ANCE/README.md,
warmup/commands/run_bm25_warmup.sh, BASELINE.md).
"""
from __future__ import annotations

import dataclasses
import json

from cocodr_tpu.losses.dro import DroConfig
from cocodr_tpu.models.bert import BertConfig


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "lamb"  # 'lamb' | 'adamw'
    lr: float = 1e-4
    warmup_steps: int = 1000
    total_steps: int = 100_000
    schedule: str = "linear"  # 'linear'|'cosine'|'episode-rewarmup'|'episode-decay'
    # episode-rewarmup: LR re-warms at each ANCE episode boundary while the
    # base LR decays with overall progress to a floor (reference
    # ANCE/drivers/run_ann.py:120-125 decay + :248-266 optional re-warmup)
    episode_steps: int = 0  # steps per ANCE episode (required for rewarmup)
    lr_floor: float = 0.2
    weight_decay: float = 0.0
    eps: float = 1e-6
    max_grad_norm: float = 1.0
    # gradient accumulation (DDP no_sync equivalent; reference
    # warmup/drivers/run_bm25_warmup.py:211-215). NOTE: cannot emulate a
    # larger CONTRASTIVE batch (the COCO/README warning) — use grad-cache
    # or mesh scale for that.
    grad_accum_steps: int = 1

    def build(self):
        import optax

        from cocodr_tpu.optim import lamb, warmup_cosine, warmup_linear
        from cocodr_tpu.optim.schedules import episode_decay, episode_rewarmup

        if self.schedule == "episode-decay":
            sched = episode_decay(
                self.lr,
                self.warmup_steps,
                self.total_steps,
                floor=self.lr_floor,
                episode_steps=self.episode_steps,
            )
        elif self.schedule == "episode-rewarmup":
            assert self.episode_steps > 0, "episode-rewarmup needs episode_steps"
            sched = episode_rewarmup(
                self.lr,
                self.warmup_steps,
                self.episode_steps,
                self.total_steps,
                floor=self.lr_floor,
            )
        else:
            sched = (
                warmup_linear if self.schedule == "linear" else warmup_cosine
            )(self.lr, self.warmup_steps, self.total_steps)
        if self.name == "lamb":
            tx = lamb(sched, eps=self.eps, weight_decay=self.weight_decay)
        elif self.name == "adamw":
            tx = optax.adamw(
                sched, eps=self.eps, weight_decay=self.weight_decay
            )
        else:
            raise ValueError(self.name)
        if self.grad_accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.grad_accum_steps)
        return tx


@dataclasses.dataclass(frozen=True)
class CocoStageConfig:
    """COCO pretraining (reference COCO/README.md Key Hyperparameter;
    field parity with COCO/arguments.py:20-134 — mlm_probability :66-68,
    n_head_layers/skip_from/late_mlm :120-122, warmup_ratio :127,
    cache_chunk_size :134)."""

    bert: BertConfig = BertConfig()
    optimizer: OptimizerConfig = OptimizerConfig(lr=1e-4, schedule="linear")
    per_device_batch_docs: int = 200  # x2 spans
    num_epochs: int = 8
    warmup_ratio: float = 0.1
    max_seq_length: int = 128
    mlm_probability: float = 0.15
    n_head_layers: int = 2
    skip_from: int = 6
    late_mlm: bool = True
    cache_chunk_size: int = 0
    # MLM decoder gather budget as a fraction of B*S. The WWM collator
    # caps masking at round(mlm_probability*len) PER SEQUENCE, so any
    # frac >= mlm_probability + 1/(2*max_seq_length) is deterministically
    # lossless; 0.17 vs the model default 0.25 is worth ~3% step
    # throughput at B=128 S=128 (scripts/ab_coco_step.py, round 4).
    mlm_budget_frac: float = 0.17

    def warmup_steps_for(self, total_steps: int) -> int:
        """warmup_ratio -> absolute warmup steps from the run's step budget
        (reference COCO/trainer.py:66-70: warmup_steps = num_training_steps
        * warmup_ratio, overriding any fixed warmup_steps)."""
        if self.warmup_ratio > 0 and total_steps > 0:
            return max(1, int(total_steps * self.warmup_ratio))
        return self.optimizer.warmup_steps

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def large(cls):
        return cls(
            bert=BertConfig.large(),
            optimizer=OptimizerConfig(lr=1e-5, schedule="linear"),
            per_device_batch_docs=100,
            skip_from=12,
        )


@dataclasses.dataclass(frozen=True)
class WarmupStageConfig:
    """BM25 warmup (reference warmup/README.md + run_bm25_warmup.sh:2-12)."""

    bert: BertConfig = BertConfig()
    model_type: str = "rdot_nll_condenser"
    optimizer: OptimizerConfig = OptimizerConfig(
        name="lamb", lr=2e-4, warmup_steps=1000, total_steps=410_000
    )
    per_device_batch: int = 256
    num_epochs: int = 3
    max_seq_len: int = 128
    save_steps: int = 10_000

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def large(cls):
        return cls(
            bert=BertConfig.large(),
            optimizer=OptimizerConfig(
                name="lamb", lr=5e-5, warmup_steps=5000, total_steps=1_640_000
            ),
            per_device_batch=64,
        )


@dataclasses.dataclass(frozen=True)
class AnceStageConfig:
    """ANCE + iDRO finetuning (reference ANCE/README.md Key Hyperparameters)."""

    bert: BertConfig = BertConfig()
    model_type: str = "rdot_nll_condenser"
    optimizer: OptimizerConfig = OptimizerConfig(
        name="lamb", lr=5e-6, warmup_steps=3000, total_steps=45_000
    )
    per_device_batch: int = 64
    eval_batch: int = 512
    dro: DroConfig = DroConfig(
        n_groups=50, alpha=0.25, ema=0.1, rho=0.05, eps=0.01
    )
    loss_kind: str = "idro"  # 'nll' | 'dro-greedy' | 'idro'
    idro_last_k_layers: int = 3
    topk_training: int = 200
    negative_sample: int = 30
    max_steps_per_episode: int = 45_000
    max_query_len: int = 64
    max_doc_len: int = 128

    @classmethod
    def base(cls):
        return cls()

    @classmethod
    def large(cls):
        return cls(
            bert=BertConfig.large(),
            optimizer=OptimizerConfig(
                name="lamb", lr=5e-6, warmup_steps=3000, total_steps=30_000
            ),
            per_device_batch=32,
            max_steps_per_episode=30_000,
            idro_last_k_layers=2,  # dro_loss.py:179-183
        )


def to_json(cfg) -> str:
    def default(o):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if hasattr(o, "dtype") or hasattr(o, "name"):
            return str(o)
        return str(o)

    return json.dumps(dataclasses.asdict(cfg), default=default, indent=2)


PRESETS = {
    "coco-base": CocoStageConfig.base,
    "coco-large": CocoStageConfig.large,
    "warmup-base": WarmupStageConfig.base,
    "warmup-large": WarmupStageConfig.large,
    "ance-base": AnceStageConfig.base,
    "ance-large": AnceStageConfig.large,
}
