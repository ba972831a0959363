#!/usr/bin/env python
"""Verify the serve small-batch bucketing on the real chip: correctness of
single-query REPL calls (bucket 8, not max_batch 64) and the latency win."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import transformers

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig


def main():
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab = "[PAD] [UNK] [CLS] [SEP] [MASK]".split() + words
    with open("/tmp/serve_vocab.txt", "w") as f:
        f.write("\n".join(vocab))
    tok = transformers.BertTokenizerFast(
        vocab_file="/tmp/serve_vocab.txt", do_lower_case=True)

    bert = BertConfig.tiny()
    model = build_dual_encoder("rdot_nll_condenser", bert)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    texts = [f"{w} {w}" for w in words]
    enc = tok(texts, padding="max_length", truncation=True, max_length=8,
              return_tensors="np")
    corpus_emb = np.asarray(model.apply(
        {"params": params},
        jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        method=model.body_emb))
    # normalize rows: with a random-init model, raw dot products let a
    # larger-norm foreign doc outrank the self-match; unit norms make
    # self-similarity win (near-orthogonal random directions)
    corpus_emb = corpus_emb / np.linalg.norm(corpus_emb, axis=1, keepdims=True)

    svc = RetrievalService(
        model, params, tok, corpus_emb, doc_ids=[f"d{w}" for w in words],
        cfg=ServeConfig(top_k=2, max_query_len=8, max_batch=64))
    assert svc._bucket(1) == 8 and svc._bucket(64) == 64

    # correctness: the device search must agree with a host brute-force
    # argmax over the SAME query embeddings (random-init bf16 margins are
    # too tight for semantic self-match assertions)
    def brute_top1(texts):
        ids_m, mask = svc._tokenize(texts)
        emb = np.asarray(svc._encode(
            svc.params, jnp.asarray(ids_m), jnp.asarray(mask)))[:len(texts)]
        ref = np.asarray(svc.corpus, np.float32)
        return np.argmax(emb.astype(np.float32) @ ref.T, axis=1)

    for w in words:  # single-query REPL path (bucket 8)
        _, ids = svc.search([f"{w} {w}"])
        want = brute_top1([f"{w} {w}"])[0]
        assert ids[0][0] == f"d{words[want]}", (w, ids, want)
    print("single-query search == host brute force: OK", flush=True)
    bulk = [f"{w} {w}" for w in words] * 12  # nq=60 -> bucket 64
    _, ids = svc.search(bulk)
    want = brute_top1(bulk)
    assert [r[0] for r in ids] == [f"d{words[i]}" for i in want]
    print("bulk-batch search == host brute force: OK", flush=True)

    def lat(fn, reps=20):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps * 1e3

    one = lat(lambda: svc.search(["alpha alpha"]))
    bulk = lat(lambda: svc.search(["alpha alpha"] * 60))
    print(f"single-query REPL latency: {one:.1f} ms (bucket 8)", flush=True)
    print(f"60-query batch latency   : {bulk:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
