"""HTTP-level serving throughput at 1M docs on one real TPU chip
(VERDICT r03 item 3: the blocking-dispatch server capped at ~1,500 q/s;
the pipelined batcher should approach the search_stream number).

Run: python -u scripts/bench_http_serve.py
Numbers recorded in docs/performance.md (serving section).
"""
import http.client
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from cocodr_tpu.models.bert import BertConfig
from cocodr_tpu.models.dual_encoder import build_dual_encoder
from cocodr_tpu.pipelines.http_serve import make_server
from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

N, D = 1_000_000, 768
N_CLIENTS = 8
QUERIES_PER_POST = 64
POSTS_PER_CLIENT = 24
MAX_BATCH = int(os.environ.get("MAX_BATCH", "64"))


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    import transformers

    tok = transformers.BertTokenizerFast.from_pretrained(
        "bert-base-uncased"
    ) if os.path.exists(
        os.path.expanduser("~/.cache/huggingface")
    ) else None
    if tok is None:
        # offline fallback: synthetic wordpiece vocab
        vp = "/tmp/_bench_vocab.txt"
        with open(vp, "w") as f:
            f.write("\n".join(
                ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                + [f"w{i}" for i in range(30000)]
            ))
        tok = transformers.BertTokenizerFast(vocab_file=vp)
    cfg = BertConfig()  # bert-base
    model = build_dual_encoder("rdot_nll_condenser", cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )["params"]
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D), dtype=np.float32)
    svc = RetrievalService(
        model, params, tok, corpus,
        cfg=ServeConfig(top_k=10, max_batch=MAX_BATCH, max_query_len=32),
    )
    del corpus
    t0 = time.time()
    svc.search(["warm up the fused program"])
    print(f"warm compile: {time.time()-t0:.0f}s", flush=True)

    server, batcher = make_server(svc, port=0, window_s=0.002, depth=8)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    words = [f"w{i}" for i in range(1000)]
    payloads = []
    for c in range(N_CLIENTS):
        qs = [
            " ".join(rng.choice(words, 5).tolist())
            for _ in range(QUERIES_PER_POST)
        ]
        payloads.append(json.dumps({"queries": qs, "k": 10}))

    def client(ci, out):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        n = 0
        for _ in range(POSTS_PER_CLIENT):
            conn.request("POST", "/search", body=payloads[ci])
            r = conn.getresponse()
            body = json.loads(r.read())
            assert r.status == 200, body
            n += len(body["hits"])
        out[ci] = n

    # warm one full round (compiles the batch-64 bucket)
    out = [0] * N_CLIENTS
    client(0, out)

    out = [0] * N_CLIENTS
    threads = [
        threading.Thread(target=client, args=(i, out))
        for i in range(N_CLIENTS)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    total = sum(out)
    print(f"HTTP: {total} queries in {dt:.2f}s = {total/dt:,.0f} q/s "
          f"({batcher.batches} dispatches, "
          f"{batcher.requests / max(1, batcher.batches):.1f} q/dispatch)",
          flush=True)
    server.shutdown()
    batcher.stop()
    server.server_close()


if __name__ == "__main__":
    main()
