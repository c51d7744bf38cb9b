"""Profiling / tracing as a first-class module.

The reference's observability is tqdm bars and wall-clock prints
(SURVEY.md section 5 'Tracing'); here: jax profiler traces (xprof-compatible),
a stage timer that respects async dispatch (block_until_ready on exit), and
device-memory snapshots.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, List, Optional

import jax


class StageTimer:
    """Wall-clock stage timing with async-safe boundaries.

    with timer.stage("warp", result_ref): ... -- on exit blocks on the given
    arrays so the recorded time covers the device work, not just dispatch.
    """

    def __init__(self):
        self.records: List[Dict[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str, *block_on):
        t0 = time.perf_counter()
        holder: Dict[str, Any] = {}
        try:
            yield holder
        finally:
            for x in list(block_on) + list(holder.values()):
                try:
                    jax.block_until_ready(x)
                except Exception:
                    pass
            self.records.append({"stage": name, "seconds": time.perf_counter() - t0})

    def summary(self) -> str:
        total = sum(r["seconds"] for r in self.records)
        lines = [f"{r['stage']:24s} {r['seconds']:8.3f}s "
                 f"({100 * r['seconds'] / max(total, 1e-9):5.1f}%)"
                 for r in self.records]
        lines.append(f"{'total':24s} {total:8.3f}s")
        return "\n".join(lines)

    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.records, f, indent=2)


@contextlib.contextmanager
def trace(logdir: str):
    """jax profiler trace (open with xprof/tensorboard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Any]:
    """Per-device memory snapshot (bytes in use / limit when available)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = None
    return out
