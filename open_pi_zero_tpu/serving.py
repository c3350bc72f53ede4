"""Dynamic-batching action-chunk server.

The reference serves policies by stepping `PiZeroInference` inside the
eval loop (one robot per process, src/agent/eval.py:97-131). On TPU one
chip serves many robots: batched `infer_action` measures 158 chunks/s at
B=16 vs 71 at B=1 (BENCH_THROUGHPUT.json), so the serving daemon batches
concurrent requests:

  - requests land on a queue; the worker drains up to `max_batch` of
    them, waiting at most `batch_window_ms` after the first arrival,
  - the batch is padded up to the nearest size in `batch_sizes` so XLA
    compiles one executable per bucket (static shapes — no recompiles
    at traffic-dependent batch sizes),
  - one jitted `infer_action` serves the whole bucket; each caller gets
    its row.

Transport is newline-delimited JSON over TCP (arrays as nested lists) —
a reference implementation of the protocol; swap the codec for msgpack /
grpc without touching the batching core. `scripts/serve.py` is the CLI.
"""

from __future__ import annotations

import json
import logging
import queue
import socket
import socketserver
import threading
import time
from typing import Callable, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

DEFAULT_BATCH_SIZES = (1, 4, 8, 16)


class _Request:
    __slots__ = ("inputs", "event", "result", "error")

    def __init__(self, inputs: dict):
        self.inputs = inputs
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None


class BatchingPolicy:
    """Owns the model function and the batching loop.

    `infer_fn(batch: dict) -> np.ndarray [B, A, act_dim]` must accept a
    dict of stacked numpy arrays {input_ids, pixel_values,
    attention_mask, proprios} and is assumed jit-backed (called with each
    padded bucket size exactly once to warm the cache)."""

    def __init__(
        self,
        infer_fn: Callable[[dict], np.ndarray],
        batch_sizes: Sequence[int] = DEFAULT_BATCH_SIZES,
        batch_window_ms: float = 3.0,
        queue_size: int = 256,
    ):
        self.infer_fn = infer_fn
        self.batch_sizes = tuple(sorted(batch_sizes))
        self.max_batch = self.batch_sizes[-1]
        self.batch_window_s = batch_window_ms / 1e3
        self._q: "queue.Queue[_Request]" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self.n_batches = 0
        self.n_requests = 0

    # ------------------------------------------------------------------ #
    def start(self):
        self._worker.start()
        return self

    def stop(self):
        self._stop.set()
        if self._worker.ident is not None:  # join() raises on unstarted threads
            self._worker.join(timeout=5)
        # fail still-enqueued requests fast instead of leaving their
        # submitters blocked for the full submit() timeout
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            req.error = "server shutting down"
            req.event.set()

    def submit(self, inputs: dict, timeout: float = 30.0) -> np.ndarray:
        """Blocking: enqueue one observation, wait for its action chunk."""
        req = _Request(inputs)
        self._q.put(req, timeout=timeout)
        if not req.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    def warmup(self, example: dict):
        """Compile every bucket size up front (over a tunnel the first
        compile is minutes — do it before accepting traffic)."""
        for b in self.batch_sizes:
            batch = {k: np.repeat(v[None], b, axis=0) for k, v in example.items()}
            self.infer_fn(batch)
            log.info("warmed batch size %d", b)

    # ------------------------------------------------------------------ #
    def _bucket(self, n: int) -> int:
        for b in self.batch_sizes:
            if b >= n:
                return b
        return self.max_batch

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            reqs = [first]
            deadline = time.monotonic() + self.batch_window_s
            while len(reqs) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    reqs.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run(reqs)

    def _run(self, reqs):
        try:
            n = len(reqs)
            b = self._bucket(n)
            batch = {
                k: np.stack(
                    [r.inputs[k] for r in reqs]
                    + [reqs[-1].inputs[k]] * (b - n)  # pad rows (discarded)
                )
                for k in reqs[0].inputs
            }
            chunks = np.asarray(self.infer_fn(batch))
            for i, r in enumerate(reqs):
                r.result = chunks[i]
                r.event.set()
            self.n_batches += 1
            self.n_requests += n
        except Exception as e:  # noqa: BLE001 — report to callers
            log.exception("batch failed")
            for r in reqs:
                r.error = f"{type(e).__name__}: {e}"
                r.event.set()


# --------------------------------------------------------------------------- #
# TCP transport (newline-delimited JSON)
# --------------------------------------------------------------------------- #


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        policy: BatchingPolicy = self.server.policy  # type: ignore[attr-defined]
        for line in self.rfile:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
                inputs = {
                    "input_ids": np.asarray(msg["input_ids"], np.int32),
                    "pixel_values": np.asarray(msg["pixel_values"], np.float32),
                    "attention_mask": np.asarray(msg["attention_mask"], np.int32),
                    "proprios": np.asarray(msg["proprios"], np.float32),
                }
                chunk = policy.submit(inputs)
                resp = {"action_chunk": np.asarray(chunk, np.float64).tolist()}
            except Exception as e:  # noqa: BLE001 — protocol-level error reply
                resp = {"error": f"{type(e).__name__}: {e}"}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()


class ActionServer(socketserver.ThreadingTCPServer):
    """One thread per connection; all inference funnels through the
    shared BatchingPolicy (concurrent robots => batched MXU work)."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, policy: BatchingPolicy):
        super().__init__(addr, _Handler)
        self.policy = policy


def serve_forever(host: str, port: int, policy: BatchingPolicy):
    policy.start()
    with ActionServer((host, port), policy) as srv:
        log.info("serving on %s:%d", host, port)
        srv.serve_forever()


# --------------------------------------------------------------------------- #
# client helper (also used by tests)
# --------------------------------------------------------------------------- #


def request_action(
    host: str, port: int, inputs: dict, timeout: float = 60.0
) -> np.ndarray:
    msg = {k: np.asarray(v).tolist() for k, v in inputs.items()}
    with socket.create_connection((host, port), timeout=timeout) as s:
        f = s.makefile("rwb")
        f.write((json.dumps(msg) + "\n").encode())
        f.flush()
        resp = json.loads(f.readline())
    if "error" in resp:
        raise RuntimeError(resp["error"])
    return np.asarray(resp["action_chunk"], np.float32)
