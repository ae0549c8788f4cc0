"""Backend dispatch for Pallas kernels: use fused kernels on real TPU
backends, the pure-XLA formulations elsewhere (CPU tests, GPU)."""

from __future__ import annotations


def pallas_backend_ok() -> bool:
    try:
        import jax

        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False
