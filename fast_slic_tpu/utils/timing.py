"""Timing report with the reference's nested-JSON shape.

The reference wraps every pipeline phase in RAII fstimer::Scope objects and
serializes a thread-local section stack to nested JSON
``{"name": ..., "duration": <micros>, "children": [...]}``
(``/root/reference/src/timer.{h,cpp}``), surfaced as
``slic_model.last_timing_report``.

On TPU the phases inside the jit program are fused and scheduled by XLA, so
per-phase host timers are meaningless; instead the report carries the
host-visible phases (trace/compile, host->device, execute, device->host)
under the same JSON schema, and fine-grained per-kernel timing comes from
``jax.profiler`` traces.
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager


class Timer:
    """Stack-based section timer producing the reference JSON shape."""

    def __init__(self):
        self._stack = []
        self._last = None

    def begin(self, name: str):
        self._stack.append({"name": name, "start": time.perf_counter(),
                            "children": []})

    def end(self):
        if not self._stack:
            return
        sec = self._stack.pop()
        sec["duration"] = int((time.perf_counter() - sec.pop("start")) * 1e6)
        if self._stack:
            self._stack[-1]["children"].append(sec)
        else:
            self._last = sec

    @contextmanager
    def scope(self, name: str):
        self.begin(name)
        try:
            yield
        finally:
            self.end()

    def report(self) -> str:
        if self._last is None:
            return ""
        return json.dumps(self._last)
