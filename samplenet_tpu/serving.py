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

    def __call__(self, clouds: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        b = len(clouds)
        if b > self.max_batch:
            parts = [self(clouds[s : s + self.max_batch])
                     for s in range(0, b, self.max_batch)]
            return np.concatenate(parts)
        if clouds.shape[1] != self.num_points:
            raise ValueError(
                f"expected {self.num_points} points, got {clouds.shape[1]}")
        if b < self.max_batch:
            pad = np.repeat(clouds[-1:], self.max_batch - b, axis=0)
            clouds = np.concatenate([clouds, pad])
        out = self._compiled(self._variables, jnp.asarray(clouds))
        return np.asarray(out)[:b]


def export_stablehlo(net, variables, *, batch: int, num_points: int) -> bytes:
    """Serialize the eval forward to portable StableHLO bytes."""
    import jax
    import jax.numpy as jnp

    def fwd(v, x):
        return net.apply(v, x, training=False)[1]

    dummy = jax.ShapeDtypeStruct((batch, num_points, 3), jnp.float32)
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
                  num_points: int, metadata: dict | None = None) -> None:
    """Write a versioned sampler artifact: magic + format version + JSON
    header (shape contract, jax version, arbitrary metadata) + StableHLO
    bytes. The header travels with the artifact so a serving fleet can
    check compatibility before loading."""
    import jax

    blob = export_stablehlo(net, variables, batch=batch,
                            num_points=num_points)
    header = {
        "artifact_version": ARTIFACT_VERSION,
        "batch": batch,
        "num_points": num_points,
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


# --------------------------------------------------------- request batching

class MicroBatcher:
    """Coalesces concurrent single-cloud requests into one device dispatch.

    `submit(cloud)` returns a Future immediately; a drain thread gathers up
    to `max_batch` queued requests (waiting at most `max_wait_ms` after the
    first), stacks them, runs the AOT-compiled sampler once, and resolves
    every Future. Under load the device sees full batches; a lone request
    pays at most max_wait_ms extra latency.
    """

    def __init__(self, sampler: BatchedSampler, *, max_wait_ms: float = 5.0):
        self._sampler = sampler
        self._max_wait = max_wait_ms / 1e3
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def submit(self, cloud: np.ndarray) -> Future:
        if cloud.shape != (self._sampler.num_points, 3):
            raise ValueError(
                f"expected [{self._sampler.num_points}, 3] cloud, "
                f"got {cloud.shape}")
        fut: Future = Future()
        self._queue.put((np.asarray(cloud, np.float32), fut))
        return fut

    def _drain(self) -> None:
        while True:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._closed:
                    return
                continue
            if first is None:
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
                outs = self._sampler(clouds)
                for (_, fut), out in zip(batch, outs):
                    fut.set_result(out)
            except Exception as exc:  # resolve, don't wedge callers
                for _, fut in batch:
                    fut.set_exception(exc)
            if self._closed:
                return

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=5)


def _now() -> float:
    import time

    return time.monotonic()
