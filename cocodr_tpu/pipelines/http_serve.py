"""HTTP serving endpoint with dynamic batching and dispatch pipelining.

The reference has no serving story at all; here `serve --http PORT` wraps
`RetrievalService` in a stdlib ThreadingHTTPServer. Concurrent requests
do NOT each pay a device dispatch: handler threads enqueue into a
dispatcher that coalesces everything waiting (up to `max_batch`, with a
short collection window) into ONE `service.dispatch` call — the same
fused encode+search program the bulk paths use.

Pipelined readback: a blocking `service.search` per coalesced batch
caps HTTP throughput at the dispatch+readback round trip (~1,500 q/s at
1M docs — the round trip is ~7x the device time at batch 64). Instead
the dispatcher thread only DISPATCHES (async) and hands the pending
handle to a reader thread that blocks on `service.collect` and fans the
rows out — up to `depth` batches stay in flight, so throughput
approaches the device+host limit like `search_stream` (~5,200 q/s).

Hardening (bench harness != production excuse):
  * request bodies above `max_body_bytes` are rejected 413 before read
  * the pending-request queue is BOUNDED — a flooded server answers 503
    (Retry-After) instead of buffering unboundedly
  * every request carries a timeout -> 504

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
    """One HTTP request's query group: all its texts, one Event.

    Grouping matters on the single-core host: per-QUERY queue items cost
    64 lock round-trips + 64 Event waits for a 64-query POST — measured
    at ~25% of HTTP-level throughput. A group is one queue item and one
    Event; the dispatcher slices it across device batches when it spans
    a max_batch boundary (`done` counts completed rows; only the single
    reader thread mutates it).
    """

    __slots__ = ("texts", "k", "event", "hits", "error", "done")

    def __init__(self, texts, k: int):
        self.texts = texts
        self.k = k
        self.event = threading.Event()
        self.hits = [None] * len(texts)
        self.error = None
        self.done = 0


class QueueFullError(Exception):
    pass


class Batcher:
    """Coalesces concurrent query groups into batched device dispatches
    and pipelines their readback.

    Two threads own all jax work: the dispatcher collects waiting
    requests (window_s bounds the added latency for the second and later
    arrivals in a batch) and issues async `service.dispatch` calls; the
    reader blocks on `service.collect` for the oldest in-flight batch and
    completes its requests. Up to `depth` batches ride between them, so
    the dispatch round trip of batch i overlaps the device work of
    batches i+1..i+depth — the same pipeline as search_stream, fed by
    HTTP instead of a generator.

    queue_max bounds WAITING QUERIES (admission control): a submit that
    would push the waiting total past it fails QueueFullError after a
    short grace wait — the HTTP layer answers 503 — instead of buffering
    unboundedly. A single group larger than queue_max is rejected
    outright (the body-size cap keeps legitimate requests far below it).
    """

    def __init__(self, service, window_s: float = 0.002, depth: int = 8,
                 queue_max: int = 4096):
        self.service = service
        self.window_s = window_s
        self.queue_max = queue_max
        self.q: "queue.Queue" = queue.Queue()
        self.inflight: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self.batches = 0  # observability: device dispatches issued
        self.requests = 0  # observability: queries dispatched
        self._stop = False
        self._cond = threading.Condition()
        self._waiting = 0  # queries admitted but not yet dispatched
        self._dispatcher = threading.Thread(target=self._loop, daemon=True)
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._dispatcher.start()
        self._reader.start()

    def submit(self, text: str, k: int, timeout: Optional[float] = 60.0):
        return self.submit_many([text], k, timeout)[0]

    def submit_many(self, texts, k: int, timeout: Optional[float] = 60.0):
        """One queue item + one Event for the whole group. Raises
        QueueFullError when admission stays blocked (saturated server —
        the HTTP layer maps it to 503); admission is all-or-nothing."""
        if not texts:
            return []
        req = _Request(list(texts), k)
        self._admit(len(req.texts))
        self.q.put((req, 0))
        if not req.event.wait(timeout):
            raise TimeoutError("search timed out")
        if req.error is not None:
            if isinstance(req.error, QueueFullError):
                raise req.error
            raise RuntimeError(req.error)
        return req.hits

    def _admit(self, n: int, grace_s: float = 0.25):
        deadline = time.time() + grace_s
        with self._cond:
            while self._waiting + n > self.queue_max:
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise QueueFullError("request queue saturated")
                self._cond.wait(remaining)
            self._waiting += n

    def _drained(self, n: int):
        with self._cond:
            self._waiting -= n
            self._cond.notify_all()

    def stop(self):
        self._stop = True
        self.q.put(None)  # wake the dispatcher
        self._dispatcher.join(timeout=5)
        try:
            self.inflight.put_nowait(None)
        except queue.Full:
            pass
        self._reader.join(timeout=5)

    def _loop(self):
        max_batch = self.service.cfg.max_batch
        carry = None  # (req, start): group slice spilling past max_batch
        while True:
            if carry is not None:
                first, carry = carry, None
            else:
                first = self.q.get()
                if first is None:
                    self.inflight.put(None)
                    return
            # parts: (req, start, end) row slices making up this batch
            req, start = first
            take = min(len(req.texts) - start, max_batch)
            parts = [(req, start, start + take)]
            n = take
            if start + take < len(req.texts):
                carry = (req, start + take)
            deadline = time.time() + self.window_s
            stopping = False
            while n < max_batch and carry is None:
                remaining = deadline - time.time()
                try:
                    item = self.q.get(
                        timeout=max(0.0, remaining)
                    ) if remaining > 0 else self.q.get_nowait()
                except queue.Empty:
                    break
                if item is None or self._stop:
                    stopping = True
                    break
                req, start = item
                take = min(len(req.texts) - start, max_batch - n)
                parts.append((req, start, start + take))
                n += take
                if start + take < len(req.texts):
                    carry = (req, start + take)
            self._drained(n)
            self._dispatch(parts, n)
            if stopping:
                self.inflight.put(None)
                return

    def _dispatch(self, parts, n):
        self.batches += 1
        self.requests += n
        k = min(max(r.k for r, _, _ in parts), self.service.cfg.top_k)
        texts = []
        for r, s, e in parts:
            texts.extend(r.texts[s:e])
        try:
            pending = self.service.dispatch(texts, k)
        except Exception as e:  # pragma: no cover - surfaced per request
            for r, _, _ in parts:
                r.error = f"{type(e).__name__}: {e}"
                r.event.set()
            return
        # blocks when `depth` batches are already in flight: natural
        # backpressure into the request queue
        self.inflight.put((parts, k, pending))

    def _read_loop(self):
        collect_many = getattr(self.service, "collect_many", None)
        stop = False
        while not stop:
            # drain EVERYTHING in flight per readback: each device_get
            # costs a full host<->device round trip (the tunnel RTT is
            # several x the device time at batch 64), so collecting the
            # group in one bulk transfer is what lets throughput approach
            # the device limit instead of the round-trip limit
            group = [self.inflight.get()]
            while True:
                try:
                    group.append(self.inflight.get_nowait())
                except queue.Empty:
                    break
            if None in group:
                stop = True
                group = [g for g in group if g is not None]
            if not group:
                return
            try:
                if collect_many is not None:
                    results = collect_many([p for _, _, p in group])
                else:
                    results = [
                        self.service.collect(p) for _, _, p in group
                    ]
            except Exception as e:  # pragma: no cover
                for parts, _, _ in group:
                    for r, _, _ in parts:
                        r.error = f"{type(e).__name__}: {e}"
                        r.event.set()
                continue
            for (parts, k, _), (vals, ids) in zip(group, results):
                row = 0
                for r, s, e in parts:
                    kk = min(r.k, k)
                    for j in range(s, e):
                        # .tolist() rows: native float/int conversion is
                        # far cheaper than per-element float() casts
                        vrow = vals[row, :kk].tolist()
                        irow = ids[row][:kk]
                        r.hits[j] = [
                            {"id": d if isinstance(d, (int, type(None)))
                             else str(d), "score": v}
                            for d, v in zip(irow, vrow)
                        ]
                        row += 1
                    r.done += e - s
                    if r.done == len(r.texts):
                        r.event.set()


def make_server(service, host: str = "127.0.0.1", port: int = 8080,
                window_s: float = 0.002, depth: int = 8,
                queue_max: int = 4096,
                max_body_bytes: int = 1 << 20,
                request_timeout_s: float = 60.0):
    """Returns (ThreadingHTTPServer, Batcher). Caller runs
    server.serve_forever() (or in a thread) and server.shutdown()."""
    batcher = Batcher(service, window_s=window_s, depth=depth,
                      queue_max=queue_max)
    # service.n_docs excludes sharded-mode pad rows; corpus.shape includes
    n_docs = getattr(service, "n_docs", None)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _json(self, code: int, obj, headers=()):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
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
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    self._json(411, {"error": "invalid Content-Length"})
                    return
                if length > max_body_bytes:
                    # reject BEFORE reading: a single large POST must not
                    # allocate arbitrarily
                    self._json(413, {
                        "error": f"body exceeds {max_body_bytes} bytes"
                    })
                    return
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
                hits = batcher.submit_many(
                    texts, k, timeout=request_timeout_s
                )
                self._json(200, {"hits": hits[0] if single else hits})
            except QueueFullError:
                self._json(503, {"error": "server saturated"},
                           headers=(("Retry-After", "1"),))
            except TimeoutError:
                self._json(504, {"error": "search timed out"})
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher
    return server, batcher
