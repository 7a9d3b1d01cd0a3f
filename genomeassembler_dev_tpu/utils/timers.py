"""Stage banners and timing, keeping the reference's log format
(lib/DeNovoAssembler.R:52-56: message dot-padded to 70 columns, then
'DONE! -- <t> <unit>') plus structured metrics collection."""

from __future__ import annotations

import time
from contextlib import contextmanager


class StageTimer:
    """Collects per-stage wall times; optionally prints reference-style
    banners. Timings are kept as data (the reference only printed them)."""

    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.times: dict[str, float] = {}
        self.metrics: dict[str, float] = {}

    @contextmanager
    def stage(self, msg: str):
        if self.verbose:
            pad = "." * max(0, 70 - len(msg))
            print(f"{msg}{pad}", end="", flush=True)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[msg] = self.times.get(msg, 0.0) + dt
            if self.verbose:
                unit, val = ("secs", dt) if dt < 60 else ("mins", dt / 60)
                print(f"DONE! -- {val:.3g} {unit}")

    def record(self, name: str, value: float):
        self.metrics[name] = value
