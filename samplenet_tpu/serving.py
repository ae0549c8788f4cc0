"""Serving utilities: AOT compilation, StableHLO export, request batching.

The reference has no deployment story (checkpoint + python graph rebuild);
here a trained sampler can be (a) AOT-compiled to a fixed-shape executable
with host-side padding for ragged batches, (b) serialized to a VERSIONED
portable artifact (StableHLO via jax.export) that any XLA runtime can
reload without the model code, and (c) served behind `MicroBatcher`, a
request-coalescing engine that turns many small concurrent requests into
one device dispatch (the daemon CLI lives in samplenet_tpu/serve.py).
"""

from __future__ import annotations

import json
import queue
import struct
import threading
from concurrent.futures import Future

import numpy as np


class BatchedSampler:
    """AOT-compiled fixed-shape sampler for serving.

    Pads incoming batches up to `max_batch` (replicating the last cloud so
    matching stays well-defined) and slices results back. One compile at
    construction; every call afterwards is dispatch-only.
    """

    def __init__(self, net, variables, *, max_batch: int, num_points: int):
        import jax
        import jax.numpy as jnp

        self.max_batch = max_batch
        self.num_points = num_points

        def fwd(v, x):
            simp, out = net.apply(v, x, training=False)
            return out

        dummy = jnp.zeros((max_batch, num_points, 3), jnp.float32)
        self._compiled = (
            jax.jit(fwd).lower(variables, dummy).compile()
        )
        self._variables = variables

    def dispatch(self, clouds: np.ndarray):
        """Enqueue one padded batch on the device WITHOUT waiting; returns an
        opaque handle for `fetch`. Splitting dispatch from fetch lets a
        server overlap device compute / result transfer of batch k with the
        dispatch of batch k+1 (essential behind a high-latency link)."""
        import jax.numpy as jnp

        b = len(clouds)
        if b > self.max_batch:
            raise ValueError(f"dispatch batch {b} > max_batch {self.max_batch}")
        if clouds.shape[1] != self.num_points:
            raise ValueError(
                f"expected {self.num_points} points, got {clouds.shape[1]}")
        if b < self.max_batch:
            pad = np.repeat(clouds[-1:], self.max_batch - b, axis=0)
            clouds = np.concatenate([clouds, pad])
        return self._compiled(self._variables, jnp.asarray(clouds)), b

    def fetch(self, handle) -> np.ndarray:
        """Block until a dispatched batch is done; return the real rows."""
        out, b = handle
        return np.asarray(out)[:b]

    def __call__(self, clouds: np.ndarray, *, window: int = 6) -> np.ndarray:
        b = len(clouds)
        if b > self.max_batch:
            # pipeline the chunks with a BOUNDED in-flight window: fetch
            # handle k-window while dispatching handle k, so device memory
            # holds O(window) padded batches instead of all of them (an
            # unbounded dispatch of a 1M-cloud call would enqueue ~12 GB).
            from collections import deque

            handles: deque = deque()
            outs = []
            for s in range(0, b, self.max_batch):
                handles.append(self.dispatch(clouds[s : s + self.max_batch]))
                if len(handles) >= window:
                    outs.append(self.fetch(handles.popleft()))
            while handles:
                outs.append(self.fetch(handles.popleft()))
            return np.concatenate(outs)
        return self.fetch(self.dispatch(clouds))


def export_stablehlo(net, variables, *, batch: int, num_points: int,
                     freeze_params: bool = False) -> bytes:
    """Serialize the eval forward to portable StableHLO bytes.

    With `freeze_params` the weights are constant-folded INTO the module, so
    the artifact is self-contained: reload gives fn(clouds) -> sampled with
    no model code or checkpoint needed (the serve-daemon deployment format).
    Without it, reload gives fn(variables, clouds) (weights hot-swappable).
    """
    import jax
    import jax.numpy as jnp

    def fwd(v, x):
        return net.apply(v, x, training=False)[1]

    dummy = jax.ShapeDtypeStruct((batch, num_points, 3), jnp.float32)
    if freeze_params:
        exported = jax.export.export(
            jax.jit(lambda x: fwd(variables, x)))(dummy)
    else:
        exported = jax.export.export(jax.jit(fwd))(variables, dummy)
    return exported.serialize()


def load_stablehlo(blob: bytes):
    """Reload an exported sampler; returns fn(variables, clouds) -> sampled."""
    import jax

    exported = jax.export.deserialize(blob)
    return exported.call


# ------------------------------------------------- versioned artifact files

ARTIFACT_MAGIC = b"SNTPU"
ARTIFACT_VERSION = 1


def save_exported(path: str, net, variables, *, batch: int,
                  num_points: int, metadata: dict | None = None,
                  freeze_params: bool = False) -> None:
    """Write a versioned sampler artifact: magic + format version + JSON
    header (shape contract, jax version, arbitrary metadata) + StableHLO
    bytes. The header travels with the artifact so a serving fleet can
    check compatibility before loading. `freeze_params` bakes the weights
    in (self-contained deployment artifact, loadable by ArtifactSampler)."""
    import jax

    blob = export_stablehlo(net, variables, batch=batch,
                            num_points=num_points,
                            freeze_params=freeze_params)
    header = {
        "artifact_version": ARTIFACT_VERSION,
        "batch": batch,
        "num_points": num_points,
        "frozen_params": freeze_params,
        "jax_version": jax.__version__,
        **(metadata or {}),
    }
    hbytes = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(ARTIFACT_MAGIC)
        f.write(struct.pack("<II", ARTIFACT_VERSION, len(hbytes)))
        f.write(hbytes)
        f.write(blob)


def load_exported(path: str):
    """Load a versioned artifact; returns (fn, header). Rejects unknown
    magic or a newer format version than this build understands."""
    with open(path, "rb") as f:
        raw = f.read()
    if not raw.startswith(ARTIFACT_MAGIC):
        raise ValueError(f"{path}: not a samplenet-tpu sampler artifact")
    off = len(ARTIFACT_MAGIC)
    version, hlen = struct.unpack_from("<II", raw, off)
    if version > ARTIFACT_VERSION:
        raise ValueError(
            f"{path}: artifact format v{version} is newer than this "
            f"build's v{ARTIFACT_VERSION}")
    off += 8
    header = json.loads(raw[off : off + hlen].decode())
    fn = load_stablehlo(raw[off + hlen :])
    return fn, header


class ArtifactSampler:
    """BatchedSampler-compatible front-end over a frozen-params artifact.

    Serves directly from a versioned StableHLO artifact file — no model
    code, flax, or checkpoint needed at the serving host; the shape contract
    comes from the artifact header. Drop-in for MicroBatcher/serve.py."""

    def __init__(self, path: str):
        fn, header = load_exported(path)
        if not header.get("frozen_params"):
            raise ValueError(
                f"{path}: artifact was exported without freeze_params — "
                "it needs variables at call time; serve from a checkpoint "
                "instead, or re-export with freeze_params=True")
        self._fn = fn
        self.header = header
        self.max_batch = int(header["batch"])
        self.num_points = int(header["num_points"])

    def dispatch(self, clouds: np.ndarray):
        import jax.numpy as jnp

        b = len(clouds)
        if b > self.max_batch:
            raise ValueError(f"dispatch batch {b} > max_batch {self.max_batch}")
        if clouds.shape[1] != self.num_points:
            raise ValueError(
                f"expected {self.num_points} points, got {clouds.shape[1]}")
        if b < self.max_batch:
            pad = np.repeat(clouds[-1:], self.max_batch - b, axis=0)
            clouds = np.concatenate([clouds, pad])
        return self._fn(jnp.asarray(clouds, jnp.float32)), b

    fetch = BatchedSampler.fetch
    __call__ = BatchedSampler.__call__


# --------------------------------------------------------- request batching

class MicroBatcher:
    """Coalesces concurrent single-cloud requests into one device dispatch.

    `submit(cloud)` returns a Future immediately; a drain thread gathers up
    to `max_batch` queued requests (waiting at most `max_wait_ms` after the
    first), stacks them, runs the AOT-compiled sampler once, and resolves
    every Future. Under load the device sees full batches; a lone request
    pays at most max_wait_ms extra latency.

    Dispatches are PIPELINED up to `pipeline_depth` in-flight batches:
    while batch k's result travels back, batch k+1 is already enqueued on
    the device, so sustained throughput is bounded by device rate — not by
    the host<->device round-trip latency (which dominates behind a tunnel;
    see BENCHMARKS.md serving table). When the request queue idles, every
    in-flight batch is flushed immediately, so the pipelining adds no
    latency to light traffic.
    """

    def __init__(self, sampler: BatchedSampler, *, max_wait_ms: float = 5.0,
                 pipeline_depth: int = 4):
        self._sampler = sampler
        self._max_wait = max_wait_ms / 1e3
        self._depth = max(1, pipeline_depth)
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def submit(self, cloud: np.ndarray) -> Future:
        if self._closed:
            # after close() the drain thread has exited (or is exiting); an
            # enqueued request would sit behind the None sentinel forever
            raise RuntimeError("MicroBatcher.submit() after close()")
        if cloud.shape != (self._sampler.num_points, 3):
            raise ValueError(
                f"expected [{self._sampler.num_points}, 3] cloud, "
                f"got {cloud.shape}")
        fut: Future = Future()
        self._queue.put((np.asarray(cloud, np.float32), fut))
        return fut

    def _drain(self) -> None:
        from collections import deque

        inflight: deque = deque()  # (batch, device handle)

        def flush_one() -> None:
            batch, handle = inflight.popleft()
            try:
                outs = self._sampler.fetch(handle)
                for (_, fut), out in zip(batch, outs):
                    fut.set_result(out)
            except Exception as exc:  # resolve, don't wedge callers
                for _, fut in batch:
                    fut.set_exception(exc)

        while True:
            # take new work if it is already waiting; otherwise flush any
            # in-flight batches before blocking (keeps light-traffic
            # latency identical to the unpipelined design)
            try:
                first = self._queue.get_nowait()
            except queue.Empty:
                if inflight:
                    flush_one()
                    continue
                try:
                    first = self._queue.get(timeout=0.1)
                except queue.Empty:
                    if self._closed:
                        return
                    continue
            if first is None:
                while inflight:
                    flush_one()
                return
            batch = [first]
            deadline = _now() + self._max_wait
            while len(batch) < self._sampler.max_batch:
                remaining = deadline - _now()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._closed = True
                    break
                batch.append(item)
            clouds = np.stack([c for c, _ in batch])
            try:
                inflight.append((batch, self._sampler.dispatch(clouds)))
            except Exception as exc:
                for _, fut in batch:
                    fut.set_exception(exc)
            while len(inflight) >= self._depth:
                flush_one()
            if self._closed:
                while inflight:
                    flush_one()
                return

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=5)


def _now() -> float:
    import time

    return time.monotonic()
