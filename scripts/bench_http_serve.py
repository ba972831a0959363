"""HTTP-level serving throughput at 1M docs on one real TPU chip
(VERDICT r03 item 3: the blocking-dispatch server capped at ~1,500 q/s;
the pipelined batcher should approach the search_stream number).

Clients run in SEPARATE PROCESSES (multiprocessing spawn): in-process
client threads share the GIL with the server's dispatcher/reader/handler
threads and throttle the number being measured (~25% at 8 clients).

Run: python -u scripts/bench_http_serve.py
Env knobs: MAX_BATCH (64), N_CLIENTS (8), WINDOW_MS (2), DEPTH (8).
Numbers recorded in docs/performance.md (serving section).
"""
import http.client
import json
import multiprocessing as mp
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

N, D = 1_000_000, 768
N_CLIENTS = int(os.environ.get("N_CLIENTS", "8"))
QUERIES_PER_POST = 64
POSTS_PER_CLIENT = 24
MAX_BATCH = int(os.environ.get("MAX_BATCH", "64"))
WINDOW_MS = float(os.environ.get("WINDOW_MS", "2"))
DEPTH = int(os.environ.get("DEPTH", "8"))


def _client(ci: int, port: int, payload: str, n_posts: int, out,
            start_evt=None, nq: int = QUERIES_PER_POST):
    """Runs in a separate process: keep-alive POST loop. Responses are
    read but NOT parsed (client-side json.loads of 640 hits competes for
    the single host core with the server — it is not server throughput);
    the warmup round parses and validates one response."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    if start_evt is not None:
        # connect + signal ready BEFORE the barrier: spawn re-imports the
        # module (numpy ~2s on the 1-core host) and that must stay
        # outside the timed window
        conn.connect()
        out.put(("ready", ci))
        start_evt.wait()
    n = 0
    for _ in range(n_posts):
        conn.request("POST", "/search", body=payload)
        r = conn.getresponse()
        raw = r.read()
        assert r.status == 200, raw[:200]
        n += nq
    out.put((ci, n))


def main():
    import jax
    import jax.numpy as jnp
    import transformers

    from cocodr_tpu.models.bert import BertConfig
    from cocodr_tpu.models.dual_encoder import build_dual_encoder
    from cocodr_tpu.pipelines.http_serve import make_server
    from cocodr_tpu.pipelines.serve import RetrievalService, ServeConfig

    print("platform:", jax.devices()[0].platform, flush=True)
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

    server, batcher = make_server(svc, port=0, window_s=WINDOW_MS / 1e3,
                                  depth=DEPTH)
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

    # warm one full round in-process, parsing + validating the response
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    for _ in range(2):
        conn.request("POST", "/search", body=payloads[0])
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 200 and len(body["hits"]) == QUERIES_PER_POST
        assert all(len(h) == 10 for h in body["hits"])
    conn.close()
    b0, r0 = batcher.batches, batcher.requests

    ctx = mp.get_context("spawn")
    outq = ctx.Queue()
    start_evt = ctx.Event()
    procs = [
        ctx.Process(target=_client,
                    args=(i, port, payloads[i], POSTS_PER_CLIENT, outq,
                          start_evt))
        for i in range(N_CLIENTS)
    ]
    for p in procs:
        p.start()
    for _ in procs:  # wait for every client's ready signal
        msg = outq.get()
        assert msg[0] == "ready", msg
    t0 = time.time()
    start_evt.set()
    total = sum(outq.get()[1] for _ in procs)
    dt = time.time() - t0
    for p in procs:
        p.join()
    nb = batcher.batches - b0
    nr = batcher.requests - r0
    print(f"HTTP: {total} queries in {dt:.2f}s = {total/dt:,.0f} q/s "
          f"({nb} dispatches, {nr / max(1, nb):.1f} q/dispatch; "
          f"max_batch={MAX_BATCH} window={WINDOW_MS}ms depth={DEPTH} "
          f"clients={N_CLIENTS})",
          flush=True)
    server.shutdown()
    batcher.stop()
    server.server_close()


if __name__ == "__main__":
    main()
