"""ensure_models lock lifecycle: orphaned locks are reclaimed, live
locks still block, and the waiter honors the original deadline."""

import os
import time

import pytest

from lingua_ray import models as M


def _fake_build(d):
    d.mkdir(parents=True, exist_ok=True)
    (d / "_SUCCESS").write_text("")


def test_ensure_models_reclaims_stale_lock(tmp_path, monkeypatch):
    """A lock whose holder died (mtime far older than the timeout) must
    be reclaimed instead of deadlocking every future run."""
    mdir = tmp_path / f"v{M.MODEL_VERSION}"
    lock = tmp_path / f"v{M.MODEL_VERSION}.lock"
    lock.write_text("")
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    built = []
    monkeypatch.setattr(M, "build_model_artifact",
                        lambda d: (_fake_build(d), built.append(d)))
    out = M.ensure_models(mdir, timeout_s=30.0)
    assert built == [mdir]
    assert (out / "_SUCCESS").exists()
    assert not lock.exists()


def test_ensure_models_fresh_lock_times_out(tmp_path, monkeypatch):
    """A recent lock means a live builder: the waiter must NOT steal it,
    and must raise once the caller's deadline passes."""
    mdir = tmp_path / f"v{M.MODEL_VERSION}"
    lock = tmp_path / f"v{M.MODEL_VERSION}.lock"
    lock.write_text("")
    monkeypatch.setattr(M, "build_model_artifact",
                        lambda d: pytest.fail("must not build"))
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        M.ensure_models(mdir, timeout_s=2.0)
    assert 1.5 < time.monotonic() - t0 < 10
    assert lock.exists()


def test_ensure_models_live_lock_older_than_caller_timeout(tmp_path,
                                                           monkeypatch):
    """Staleness is the FIXED _STALE_LOCK_S, never the caller's timeout:
    a lock older than timeout_s but younger than the stale threshold
    belongs to a live builder and must not be stolen."""
    mdir = tmp_path / f"v{M.MODEL_VERSION}"
    lock = tmp_path / f"v{M.MODEL_VERSION}.lock"
    lock.write_text("")
    mid = time.time() - 60  # older than timeout_s=2, far younger than stale
    os.utime(lock, (mid, mid))
    monkeypatch.setattr(M, "build_model_artifact",
                        lambda d: pytest.fail("must not steal a live lock"))
    with pytest.raises(TimeoutError):
        M.ensure_models(mdir, timeout_s=2.0)
    assert lock.exists()


def test_ensure_models_lock_released_mid_wait(tmp_path, monkeypatch):
    """Holder finishing (lock unlinked, _SUCCESS present) unblocks the
    waiter immediately."""
    mdir = tmp_path / f"v{M.MODEL_VERSION}"
    _fake_build(mdir)
    assert M.ensure_models(mdir, timeout_s=5.0) == mdir
