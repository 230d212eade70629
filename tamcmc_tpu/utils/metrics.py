"""Structured metrics logging (JSONL).

Reference equivalent: console acceptance/swap prints + ben_timer wall-clock
segments (`ben_timer.cpp`, diagnostics prints [U]; SURVEY.md section 5.1/5.5).
Rebuild: every phase/chunk event is one JSON line in metrics.jsonl — machine
readable, append-only, cheap.  The headline effective-samples/s/chip numbers
in bench.py use the same schema.
"""

from __future__ import annotations

import json
import time
import pathlib


class MetricsLogger:
    def __init__(self, path: str, enabled: bool = True):
        # enabled=False: no-op logger for non-writer processes in multi-host
        # runs (one metrics.jsonl per run, owned by process 0)
        self.enabled = enabled
        self.path = pathlib.Path(path)
        if enabled:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, event: str, **fields):
        if not self.enabled:
            return
        rec = {"t": round(time.time() - self._t0, 3), "event": event}
        rec.update(fields)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self.enabled:
            self._f.close()
