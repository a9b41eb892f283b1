"""Device introspection helpers.

Replaces the reference's nvidia-smi GPU memory report
(``utils/__init__.py:52-64``) with JAX device memory stats, and provides the
wall-clock inference timer the reference's demo prints
(``demo.py:24-33``) as a reusable context manager that actually synchronizes.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict, List

import jax


def get_device_memory_usage() -> List[Dict]:
    """Per-device memory stats in MB (best-effort: not all backends report)."""
    out = []
    for d in jax.devices():
        stats = {}
        try:
            raw = d.memory_stats() or {}
            stats = {
                "bytes_in_use_mb": raw.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_in_use_mb": raw.get("peak_bytes_in_use", 0) / 2**20,
                "bytes_limit_mb": raw.get("bytes_limit", 0) / 2**20,
            }
        except Exception:
            pass
        out.append({"device": str(d), **stats})
    return out


@contextmanager
def device_timer(label: str = "", result: Dict | None = None):
    """Times a block including device completion (uses device_get on a probe
    if the caller stores one under result['probe'])."""
    t0 = time.perf_counter()
    store = result if result is not None else {}
    yield store
    if "probe" in store:
        jax.device_get(store["probe"])
    store["seconds"] = time.perf_counter() - t0
    if label:
        print(f"[{label}] {store['seconds']*1e3:.2f} ms")
