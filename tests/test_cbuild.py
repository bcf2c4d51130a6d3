"""The shared kernel builder (sources/cbuild.py) must refuse unsafe
cache directories and always fail CLOSED to the pure-Python path."""

from __future__ import annotations

import ctypes
import os

from perl_data_validate_sanctions_spark.sources import cbuild

_TRIVIAL = "long pdvs_test_answer(void) { return 42; }\n"


def test_builds_and_loads_in_a_private_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PDVS_NATIVE_CACHE", str(tmp_path / "cache"))
    fn = cbuild.load_kernel(
        "pdvs_test", _TRIVIAL, "pdvs_test_answer", ctypes.c_long, []
    )
    if fn is None:  # pragma: no cover - no cc on this machine
        return
    assert fn() == 42
    # the dir was created private and no build intermediates remain
    d = str(tmp_path / "cache")
    assert os.stat(d).st_mode & 0o077 == 0
    leftovers = [p for p in os.listdir(d) if not p.endswith(".so")]
    assert leftovers == []


def test_refuses_world_writable_cache_dir(tmp_path, monkeypatch, capsys):
    d = tmp_path / "open_cache"
    d.mkdir()
    os.chmod(d, 0o777)
    monkeypatch.setenv("PDVS_NATIVE_CACHE", str(d))
    fn = cbuild.load_kernel(
        "pdvs_test_ww", _TRIVIAL, "pdvs_test_answer", ctypes.c_long, []
    )
    assert fn is None  # fails closed: callers stay on pure Python
    assert "unavailable" in capsys.readouterr().err
    assert not any(p.endswith(".so") for p in os.listdir(d))


def test_compile_failure_fails_closed(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("PDVS_NATIVE_CACHE", str(tmp_path / "cache2"))
    fn = cbuild.load_kernel(
        "pdvs_test_bad", "this is not C;", "nope", ctypes.c_long, []
    )
    assert fn is None
    assert "unavailable" in capsys.readouterr().err
