"""HTTP serving endpoint with dynamic batching.

The reference has no serving story at all; here `serve --http PORT` wraps
`RetrievalService` in a stdlib ThreadingHTTPServer. Concurrent requests
do NOT each pay a device dispatch: handler threads enqueue into a
dispatcher that coalesces everything waiting (up to `max_batch`, with a
short collection window) into ONE `service.search` call — the same
single fused encode+search program the bulk paths use — then fans the
rows back out. One dispatcher thread owns all device work, so jax is
driven from a single thread regardless of HTTP concurrency.

API:
  GET  /healthz            -> {"ok": true, "n_docs": N}
  POST /search             body {"query": "...", "k": 10}
                           or   {"queries": [...], "k": 10}
       -> {"hits": [[{"id": ..., "score": ...}, ...] per query]}
       (single-query form returns {"hits": [ ... one list ... ]})
"""
from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


class _Request:
    __slots__ = ("text", "k", "event", "hits", "error")

    def __init__(self, text: str, k: int):
        self.text = text
        self.k = k
        self.event = threading.Event()
        self.hits = None
        self.error = None


class Batcher:
    """Coalesces concurrent single queries into one device dispatch.

    window_s bounds added latency for the SECOND and later arrivals in a
    batch: the first request triggers an immediate drain attempt, then
    the dispatcher keeps collecting until the window closes or the batch
    is full. Under no concurrency a request costs window_s extra at most.
    """

    def __init__(self, service, window_s: float = 0.002):
        self.service = service
        self.window_s = window_s
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self.batches = 0  # observability: device dispatches issued
        self.requests = 0
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, text: str, k: int, timeout: Optional[float] = 60.0):
        return self.submit_many([text], k, timeout)[0]

    def submit_many(self, texts, k: int, timeout: Optional[float] = 60.0):
        """Enqueue all texts BEFORE waiting — a multi-query request rides
        one (or few) coalesced dispatches instead of serializing."""
        reqs = [_Request(t, k) for t in texts]
        for r in reqs:
            self.q.put(r)
        out = []
        for r in reqs:
            if not r.event.wait(timeout):
                raise TimeoutError("search timed out")
            if r.error is not None:
                raise RuntimeError(r.error)
            out.append(r.hits)
        return out

    def stop(self):
        self._stop = True
        self.q.put(None)  # wake the dispatcher
        self._thread.join(timeout=5)

    def _loop(self):
        max_batch = self.service.cfg.max_batch
        while True:
            first = self.q.get()
            if first is None:
                return
            if self._stop:
                # drain, don't drop: a request enqueued concurrently with
                # stop() still gets answered (or at least its event set)
                self._flush([first])
                return
            batch = [first]
            deadline = time.time() + self.window_s
            while len(batch) < max_batch:
                remaining = deadline - time.time()
                try:
                    item = self.q.get(
                        timeout=max(0.0, remaining)
                    ) if remaining > 0 else self.q.get_nowait()
                except queue.Empty:
                    break
                if item is None or self._stop:
                    self._flush(batch)
                    return
                batch.append(item)
            self._flush(batch)

    def _flush(self, batch):
        self.batches += 1
        self.requests += len(batch)
        k = min(max(r.k for r in batch), self.service.cfg.top_k)
        try:
            vals, ids = self.service.search(
                [r.text for r in batch], top_k=k
            )
            for i, r in enumerate(batch):
                kk = min(r.k, k)
                r.hits = [
                    {"id": d if isinstance(d, (int, type(None)))
                     else str(d), "score": float(v)}
                    for d, v in zip(ids[i][:kk], list(vals[i])[:kk])
                ]
        except Exception as e:  # pragma: no cover - surfaced per request
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
        finally:
            for r in batch:
                r.event.set()


def make_server(service, host: str = "127.0.0.1", port: int = 8080,
                window_s: float = 0.002):
    """Returns (ThreadingHTTPServer, Batcher). Caller runs
    server.serve_forever() (or in a thread) and server.shutdown()."""
    batcher = Batcher(service, window_s=window_s)
    # service.n_docs excludes sharded-mode pad rows; corpus.shape includes
    n_docs = getattr(service, "n_docs", None)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "n_docs": n_docs,
                    "batches": batcher.batches,
                    "requests": batcher.requests,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/search":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                except ValueError:
                    self._json(400, {"error": "invalid JSON body"})
                    return
                if not isinstance(req, dict):
                    self._json(400, {"error": "body must be an object"})
                    return
                # sharded programs are compiled for cfg.top_k; single-chip
                # programs specialize per k, bounded to keep the jit cache
                # and top-k kernel sane
                kmax = (
                    service.cfg.top_k
                    if getattr(service, "_sharded_search", None) is not None
                    else max(service.cfg.top_k, 1000)
                )
                k = req.get("k", service.cfg.top_k)
                if not isinstance(k, int) or not 1 <= k <= kmax:
                    self._json(400, {
                        "error": f"k must be an int in [1, {kmax}]"
                    })
                    return
                if "queries" in req:
                    texts = [str(t) for t in req["queries"]]
                    single = False
                elif "query" in req:
                    texts = [str(req["query"])]
                    single = True
                else:
                    self._json(400, {"error": "need 'query' or 'queries'"})
                    return
                hits = batcher.submit_many(texts, k)
                self._json(200, {"hits": hits[0] if single else hits})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    return server, batcher
