"""Hierarchical region timers — `dart/performance/PerformanceLog` analog.

The reference wraps hot regions in scoped timers compiled in via
LOG_PERFORMANCE (`PerformanceLog.hpp:15-49`) and pretty-prints the tree per
MPC replan (`MPCLocal.cpp:194-251`). Device-side kernels are profiled with
`jax.profiler`; this module covers the HOST-side loop structure (replan
cadence, buffer swaps, IO) with the same tree semantics + json export.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from typing import Dict, List, Optional


class PerfNode:
    __slots__ = ("name", "total", "count", "children", "_start")

    def __init__(self, name: str):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: Dict[str, "PerfNode"] = {}
        self._start = 0.0

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "total_s": round(self.total, 6),
            "count": self.count,
            "children": [c.to_dict() for c in self.children.values()],
        }


class PerformanceLog:
    """startRun/end region tree; thread-compatible with one instance per
    host loop (the reference registers a global map of root logs)."""

    def __init__(self):
        self.root = PerfNode("root")
        self._stack: List[PerfNode] = [self.root]

    @contextmanager
    def run(self, name: str):
        parent = self._stack[-1]
        node = parent.children.get(name)
        if node is None:
            node = PerfNode(name)
            parent.children[name] = node
        node._start = time.perf_counter()
        self._stack.append(node)
        try:
            yield node
        finally:
            node.total += time.perf_counter() - node._start
            node.count += 1
            self._stack.pop()

    def to_json(self) -> str:
        return json.dumps(self.root.to_dict())

    def pretty(self, node: Optional[PerfNode] = None, indent: int = 0) -> str:
        node = node or self.root
        lines = []
        if node.name != "root":
            avg = node.total / max(node.count, 1)
            lines.append(
                "  " * indent
                + f"{node.name}: total {node.total*1e3:.2f}ms, "
                f"count {node.count}, avg {avg*1e3:.3f}ms"
            )
        for c in node.children.values():
            lines.append(self.pretty(c, indent + (0 if node.name == "root" else 1)))
        return "\n".join(lines)


@contextmanager
def device_trace(log_dir: str):
    """TPU-side profiling: wrap a region to capture an XLA trace viewable in
    TensorBoard/XProf (the device analog of the reference's scoped timers)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
