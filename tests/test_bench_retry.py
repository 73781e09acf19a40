"""bench.py transient-failure retry (VERDICT r8 item 1).

The round-8 official bench crashed (rc=1) because ONE streaming query
hit a Python-worker spawn timeout under ambient load. bench.py now
retries exactly such failures ONCE, annotated, while every other
failure — and a transient one that repeats — still fails the run.
No SparkSession needed: the retry policy is pure control flow.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    is_transient_worker_failure,
    run_with_transient_retry,
)

WORKER_TIMEOUT_MSG = (
    "org.apache.spark.SparkException: Python worker failed to connect "
    "back. Caused by: java.net.SocketTimeoutException: Timed out while "
    "waiting for the Python worker to connect back"
)


class _FlakyOnce:
    """Raises a worker-connect timeout on the first call, then works."""

    def __init__(self, exc: Exception):
        self.calls = 0
        self.exc = exc

    def __call__(self):
        self.calls += 1
        if self.calls == 1:
            raise self.exc
        return ("ok", self.calls)


def test_transient_detection_positive():
    assert is_transient_worker_failure(RuntimeError(WORKER_TIMEOUT_MSG))
    assert is_transient_worker_failure(
        RuntimeError("Python worker exited unexpectedly (crashed)")
    )


def test_transient_detection_chained_cause():
    # StreamingQueryException wraps the JVM error as __cause__; the
    # detector must walk the chain, not just str() the outermost.
    inner = RuntimeError(WORKER_TIMEOUT_MSG)
    outer = RuntimeError("Query q398 terminated with exception")
    outer.__cause__ = inner
    assert is_transient_worker_failure(outer)


def test_transient_detection_negative():
    assert not is_transient_worker_failure(
        RuntimeError("AnalysisException: column `nope` does not exist")
    )


def test_retry_once_then_success():
    fn = _FlakyOnce(RuntimeError(WORKER_TIMEOUT_MSG))
    retries_seen = []
    out = run_with_transient_retry(
        fn, retries=1, on_retry=retries_seen.append
    )
    assert out == ("ok", 2)
    assert fn.calls == 2
    assert len(retries_seen) == 1


def test_non_transient_propagates_without_retry():
    fn = _FlakyOnce(ValueError("real query bug"))
    with pytest.raises(ValueError, match="real query bug"):
        run_with_transient_retry(fn, retries=1)
    assert fn.calls == 1  # no retry burned on a deterministic failure


def test_transient_budget_is_bounded():
    calls = {"n": 0}

    def always_flaky():
        calls["n"] += 1
        raise RuntimeError(WORKER_TIMEOUT_MSG)

    with pytest.raises(RuntimeError, match="connect back"):
        run_with_transient_retry(always_flaky, retries=1)
    assert calls["n"] == 2  # initial + exactly one retry
