"""Structured per-stage metrics (SURVEY.md §5 observability).

The reference disables all logging (zerolog off in every init(),
prove_impl.go:61-63) and has no metrics; the north-star spec requires
per-stage timing (solve/NTT/MSM/serialize) and throughput counters.  This is
a minimal dependency-free implementation: nested timed stages collected into
a registry, dumped as JSON lines or a human summary.

Usage:
    from zktpu.utils.metrics import stage, snapshot
    with stage("prove.h_scalars"):
        ...
    print(snapshot())
"""

from __future__ import annotations

import contextlib
import json
import os
import threading
import time

_lock = threading.Lock()
_stats: dict[str, dict] = {}
_enabled = os.environ.get("ZKTPU_METRICS", "1") != "0"


def enabled() -> bool:
    """Whether per-stage metrics are on.  The prover only inserts
    device-sync points (block_until_ready) between stages when metrics are
    enabled — on a tunneled chip each sync costs a host round trip."""
    return _enabled


@contextlib.contextmanager
def stage(name: str, items: int | None = None):
    """Time a named stage; optional `items` accumulates a throughput count."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats.setdefault(
                name, {"calls": 0, "total_s": 0.0, "max_s": 0.0, "items": 0}
            )
            s["calls"] += 1
            s["total_s"] += dt
            s["max_s"] = max(s["max_s"], dt)
            if items:
                s["items"] += items


def observe(name: str, seconds: float, items: int | None = None):
    with _lock:
        s = _stats.setdefault(
            name, {"calls": 0, "total_s": 0.0, "max_s": 0.0, "items": 0}
        )
        s["calls"] += 1
        s["total_s"] += seconds
        s["max_s"] = max(s["max_s"], seconds)
        if items:
            s["items"] += items


def snapshot() -> dict:
    with _lock:
        out = {}
        for k, v in sorted(_stats.items()):
            d = dict(v)
            if d["calls"]:
                d["mean_s"] = d["total_s"] / d["calls"]
            if d["items"] and d["total_s"] > 0:
                d["items_per_s"] = d["items"] / d["total_s"]
            out[k] = d
        return out


def dump_json() -> str:
    return json.dumps(snapshot())


def reset():
    with _lock:
        _stats.clear()
