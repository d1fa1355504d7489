"""Retry wrapper for transient tunnel / remote-compile failures.

The tunneled TPU backend occasionally drops a remote compile or transfer
mid-request ("response body closed", UNAVAILABLE, connection resets).
Those failures are not program errors: re-issuing the same traced call
compiles/runs fine, and XLA's compilation cache makes the retry cheap.
Multi-hour sweeps previously died to one such drop (the round-4 32^4
showdown lost its k=0.25 data point to exactly this — docs/ROADMAP.md
"Robustness"), with each benchmark driver carrying its own ad-hoc single
retry. This module centralises the policy: retry ONLY failures whose
message matches a known-transient marker, with exponential backoff;
genuine errors (shape mismatches, OOM with identical arguments twice,
assertion failures) propagate immediately.

The reference has no analogue (single-process CPU, main.cpp); this is
operational hardening the remote-accelerator deployment needs.
"""

from __future__ import annotations

import functools
import sys
import time

# substrings that mark a failure as transient-tunnel rather than a
# program error (observed on the axon v5e tunnel + generic gRPC retryables)
TRANSIENT_MARKERS = (
    "response body closed",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "connection closed",
    "Socket closed",
    "Broken pipe",
    "EOF",
    "stream removed",
    "transport",
    "proxy",
    "502",
    "503",
)


def is_transient(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(m.lower() in msg.lower() for m in TRANSIENT_MARKERS)


def with_tunnel_retry(
    fn,
    *args,
    retries: int = 3,
    base_delay: float = 5.0,
    label: str | None = None,
    **kwargs,
):
    """Call ``fn(*args, **kwargs)``; on a transient tunnel failure, wait
    ``base_delay * 2**attempt`` seconds and re-issue, up to ``retries``
    extra attempts. Non-transient exceptions propagate immediately."""
    name = label or getattr(fn, "__name__", "call")
    for attempt in range(retries + 1):
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if attempt >= retries or not is_transient(e):
                raise
            delay = base_delay * (2**attempt)
            print(
                f"# tunnel_retry[{name}]: transient failure "
                f"({type(e).__name__}: {str(e)[:160]}) — retry "
                f"{attempt + 1}/{retries} in {delay:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(delay)
    raise AssertionError("unreachable")


def tunnel_retry(retries: int = 3, base_delay: float = 5.0):
    """Decorator form of :func:`with_tunnel_retry`."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            return with_tunnel_retry(
                fn, *args, retries=retries, base_delay=base_delay, **kwargs
            )

        return wrapped

    return deco
