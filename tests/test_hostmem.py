"""linkgraph.hostmem: glibc malloc tuning for overcommitted KVM hosts."""

import os

from linkgraph.hostmem import _VARS, tune_worker_malloc


def test_tune_sets_vars(monkeypatch):
    for k in _VARS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.delenv("GRAFT_NO_MALLOC_TUNE", raising=False)
    assert tune_worker_malloc() is True
    for k, v in _VARS.items():
        assert os.environ[k] == v


def test_tune_respects_existing(monkeypatch):
    k = next(iter(_VARS))
    monkeypatch.setenv(k, "12345")
    assert tune_worker_malloc() is True
    assert os.environ[k] == "12345"  # setdefault, never clobbers


def test_tune_escape_hatch(monkeypatch):
    for k in _VARS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("GRAFT_NO_MALLOC_TUNE", "1")
    assert tune_worker_malloc() is False
    for k in _VARS:
        assert k not in os.environ
