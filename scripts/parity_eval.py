#!/usr/bin/env python
"""Quality-parity harness: published COCO-DR checkpoint x BEIR task.

Superseded by the CLI subcommand (kept for single-task use):
    python -m cocodr_tpu.cli parity --checkpoint ... --beir-dir ...
which adds the built-in published-number table (reference README.md:72-81)
and multi-task averaging; see docs/commands.md.

This environment has no network egress, so the hub checkpoints and BEIR
datasets cannot be fetched here; this script is the ready-to-run parity
path for an environment where they are mounted:

    python scripts/parity_eval.py \
        --checkpoint /ckpts/cocodr-base-msmarco \
        --beir-dir   /data/beir/scifact \
        --task scifact --expect-ndcg 0.709

Expected numbers (reference README.md:72-81): cocodr-base-msmarco BEIR avg
nDCG@10 = 0.461; per-task values in the COCO-DR paper. The model loads via
the lossless torch->flax converter (verified bit-exact on random weights in
tests/test_bert_parity.py), tokenization matches the reference's lowercased
BEIR path, and retrieval is exact (bf16 sweep + consistent rescore, or
--exact-fp32 for FAISS-bit parity).
"""
import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="HF dir (config.json + weights)")
    ap.add_argument("--beir-dir", required=True)
    ap.add_argument("--work-dir", default="/tmp/parity_work")
    ap.add_argument("--task", default=None)
    ap.add_argument("--model-type", default="rdot_nll_condenser")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--top-k", type=int, default=1000)
    ap.add_argument("--exact-fp32", action="store_true")
    ap.add_argument("--expect-ndcg", type=float, default=None)
    ap.add_argument("--tolerance", type=float, default=0.005)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from cocodr_tpu.cli import _load_model_params, _load_tokenizer
    from cocodr_tpu.pipelines.eval_beir import eval_beir

    model, params, _ = _load_model_params(args.checkpoint, args.model_type)
    tokenizer = _load_tokenizer(args.tokenizer or args.checkpoint)
    metrics = eval_beir(
        model,
        params,
        args.beir_dir,
        args.work_dir,
        tokenizer,
        task=args.task,
        batch_size=args.batch_size,
        top_k=args.top_k,
        exact_fp32=args.exact_fp32,
    )
    print(json.dumps(metrics, indent=2))
    if args.expect_ndcg is not None:
        got = metrics["ndcg_cut_10"]
        ok = abs(got - args.expect_ndcg) <= args.tolerance
        print(
            f"parity {'PASS' if ok else 'FAIL'}: nDCG@10 {got:.4f} vs "
            f"expected {args.expect_ndcg:.4f} (+/-{args.tolerance})"
        )
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
