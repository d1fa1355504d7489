"""Tunnel-retry wrapper: transient failures re-issue, real errors don't."""

import pytest

from mgpgcr_tpu.utils.retry import is_transient, with_tunnel_retry


class FlakyTunnel:
    def __init__(self, fail_times: int, exc: Exception):
        self.calls = 0
        self.fail_times = fail_times
        self.exc = exc

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc
        return "ok"


def test_retries_transient_then_succeeds():
    f = FlakyTunnel(2, RuntimeError("INTERNAL: response body closed"))
    assert with_tunnel_retry(f, retries=3, base_delay=0.0) == "ok"
    assert f.calls == 3


def test_non_transient_propagates_immediately():
    f = FlakyTunnel(5, ValueError("shape mismatch (3,) vs (4,)"))
    with pytest.raises(ValueError):
        with_tunnel_retry(f, retries=3, base_delay=0.0)
    assert f.calls == 1


def test_exhausted_retries_raise_the_transient_error():
    f = FlakyTunnel(10, RuntimeError("UNAVAILABLE: connection closed"))
    with pytest.raises(RuntimeError):
        with_tunnel_retry(f, retries=2, base_delay=0.0)
    assert f.calls == 3


def test_is_transient_markers():
    assert is_transient(RuntimeError("http proxy said 502"))
    assert is_transient(OSError("Broken pipe"))
    assert not is_transient(AssertionError("solver diverged"))
