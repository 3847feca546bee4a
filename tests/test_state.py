"""Cache / retry / validation surfaces."""

import pyarrow.compute as pc
import pytest

from etlray.config import RetryConfig
from etlray.errors import IoError, LoadError, TransformError
from etlray.sources import MemorySource
from etlray.stages import ValidateTransform
from etlray.state import InMemoryCache, SharedCache, retry


def test_inmemory_cache():
    c = InMemoryCache()
    c.store("a", 1)
    assert c.retrieve("a") == 1
    c.remove("a")
    assert c.retrieve("a") is None
    c.store("b", 2)
    c.clear()
    assert len(c) == 0


def test_shared_cache_across_handles(ray_session):
    c1 = SharedCache("t-cache")
    c1.store("k", {"v": 42})
    c2 = SharedCache("t-cache")   # binds to the SAME actor
    assert c2.retrieve("k") == {"v": 42}
    c2.clear()
    assert len(c1) == 0


def test_retry_recoverable_then_success():
    calls = {"n": 0}

    @retry(RetryConfig(max_attempts=3, delay_ms=1, backoff_factor=1.0))
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IoError("connection reset")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retry_nonrecoverable_raises_immediately():
    calls = {"n": 0}

    @retry(RetryConfig(max_attempts=3, delay_ms=1))
    def bad():
        calls["n"] += 1
        raise LoadError("schema mismatch")

    with pytest.raises(LoadError):
        bad()
    assert calls["n"] == 1


def test_validate_policies(ray_session):
    rows = [{"id": 1, "age": 25}, {"id": 2, "age": -3}, {"id": 3, "age": None}]
    checks = {"age": lambda a: pc.greater_equal(a, 0)}
    ds = MemorySource(rows).read()
    ok = ValidateTransform(checks, policy="skip").apply(ds).take_all()
    assert [r["id"] for r in ok] == [1]
    logged = ValidateTransform(checks, policy="log").apply(ds).take_all()
    assert [r["__invalid"] for r in sorted(logged, key=lambda r: r["id"])] == \
        [False, True, True]
    with pytest.raises(Exception):
        ValidateTransform(checks, policy="fail").apply(ds).take_all()


def test_retry_rejects_nonpositive_attempts():
    import pytest as _pytest

    from etlray.config import RetryConfig
    from etlray.state.retry import retry

    with _pytest.raises(ValueError, match="max_attempts"):
        retry(RetryConfig(max_attempts=0))
