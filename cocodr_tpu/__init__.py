"""cocodr_tpu — a TPU-native dense-retrieval framework.

From-scratch JAX/flax/pjit/Pallas rebuild of the capabilities of
OpenMatch/COCO-DR (EMNLP 2022): Condenser/coCondenser continuous contrastive
pretraining (COCO), BM25-warmup dual-encoder finetuning, ANCE asynchronous
hard-negative mining with exact MIPS, iDRO group-robust reweighting, and the
BEIR evaluation harness.

Layering (bottom-up):
  core/      mesh + precision runtime, typed configs
  ops/       Pallas kernels + XLA fallbacks (MIPS top-k, k-means)
  models/    flax BERT encoder, pooling heads, Condenser heads, HF interop
  losses/    contrastive / triplet-NLL / DRO losses as pure functions
  optim/     LAMB, schedules
  parallel/  sharding helpers, distributed top-k merge
  data/      binary record format, memmap caches, preprocessors, streams
  evals/     pure-numpy/JAX retrieval metrics (nDCG/MRR/MAP/recall/holes)
  pipelines/ stage drivers: coco_pretrain, warmup, ance (train+mine), eval_beir
"""

__version__ = "0.1.0"
