"""Leveled logger for the harness/tools (reference
benchmarks/harness/Logger with -v/-vv, SURVEY.md section 5)."""

from __future__ import annotations

import sys
import time


class Logger:
    LEVELS = ("error", "info", "debug", "trace")

    def __init__(self, verbosity: int = 0, stream=None):
        self.verbosity = verbosity
        self.stream = stream or sys.stderr
        self._t0 = time.time()

    def _emit(self, level: int, msg: str):
        # documented contract (bench_driver -v help): info needs -v,
        # debug -vv, trace -vvv; errors always print
        if level <= self.verbosity:
            tag = self.LEVELS[min(level, len(self.LEVELS) - 1)]
            print(f"[{time.time() - self._t0:8.2f}s {tag}] {msg}",
                  file=self.stream)

    def error(self, msg: str):
        print(f"[error] {msg}", file=self.stream)

    def info(self, msg: str):
        self._emit(1, msg)

    def debug(self, msg: str):
        self._emit(2, msg)

    def trace(self, msg: str):
        self._emit(3, msg)
