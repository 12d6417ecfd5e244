"""Kernel-routing helpers shared by the model wrapper and flax modules.

Pallas-vs-XLA path choices resolve at TRACE time (they depend only on
static shapes, the backend, and config), and each distinct decision is
logged ONCE on the `mucon_tpu.kernel_routing` logger so runs record which
path every shape actually took (CLI entries enable INFO).

Lives in its own module so `models/lstm.py` (imported by `models/mucon.py`,
which `models/model.py` imports) can route without a circular import.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger("mucon_tpu.kernel_routing")
_logged_routes = set()


def log_route(msg: str) -> None:
    """One-time INFO line per distinct kernel-path decision (runs at
    trace time, so without dedup every recompile would repeat it)."""
    if msg not in _logged_routes:
        _logged_routes.add(msg)
        logger.info(msg)


def resolve_pallas_flag(v) -> bool:
    """Tri-state pallas switches: "auto" -> kernels on for accelerator
    backends, XLA on CPU; True/False force. (CPU with True runs the
    kernels in slow interpret mode — used by tests.)"""
    if isinstance(v, str):
        if v == "auto":
            return jax.default_backend() != "cpu"
        raise ValueError(f"Invalid pallas flag {v!r} (use 'auto'|True|False)")
    return bool(v)
