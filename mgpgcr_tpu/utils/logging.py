"""Structured logging: JSON-lines events + phase timers.

Replaces the reference's stdout printf reporting (GCR.h:213-216,
MG.h:139-284) with machine-readable events a run can archive next to its
results.
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class RunLogger:
    """Emit one JSON object per line: {"ts", "event", **fields}."""

    def __init__(self, stream: Optional[IO[str]] = None, path: Optional[str] = None):
        self._stream = stream
        self._file = open(path, "a") if path else None

    def log(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        line = json.dumps(rec, default=_jsonable)
        if self._stream is not None:
            print(line, file=self._stream, flush=True)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _jsonable(o):
    try:
        return float(o)
    except Exception:
        return str(o)


class Timer:
    """Phase timer; use as context manager, read ``.elapsed`` (seconds).

    Blocks on device work if given jax outputs via ``block_on``, so timings
    mean what they say under async dispatch.
    """

    def __init__(self, logger: Optional[RunLogger] = None, name: str = ""):
        self._logger = logger
        self._name = name
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self._logger is not None:
            self._logger.log("timer", name=self._name, seconds=round(self.elapsed, 6))

    @staticmethod
    def block_on(x):
        import jax

        jax.block_until_ready(x)
        return x
