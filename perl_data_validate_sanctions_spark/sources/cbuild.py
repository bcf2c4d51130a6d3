"""Shared build-and-load helper for the optional compiled codec
kernels (jpeg_scan_c, png_unfilter_c).

One content-addressed ``cc -O2 -shared`` compile per machine into a
temp cache (override with ``PDVS_NATIVE_CACHE``), atomic-renamed so
concurrent executor workers race safely, then loaded with ctypes.  Any
failure — no compiler, read-only filesystem, odd libc — returns None
and the caller stays on its pure-Python reference path; the kernels
are never a correctness or deployment dependency."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile


def cache_dir() -> str:
    return os.environ.get(
        "PDVS_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "pdvs_native"),
    )


def load_kernel(stem: str, source: str, func: str, restype, argtypes):
    """Compile ``source`` (once, content-addressed) and return the
    ctypes function ``func``, or None on any failure (logged once)."""
    try:
        tag = hashlib.sha256(source.encode()).hexdigest()[:16]
        d = cache_dir()
        so_path = os.path.join(d, f"{stem}_{tag}.so")
        if not os.path.exists(so_path):
            os.makedirs(d, exist_ok=True)
            src = os.path.join(d, f"{stem}_{tag}.c")
            tmp = so_path + f".tmp.{os.getpid()}"
            with open(src, "w") as f:
                f.write(source)
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp, so_path)  # atomic: workers race safely
        lib = ctypes.CDLL(so_path)
        fn = getattr(lib, func)
        fn.restype = restype
        fn.argtypes = argtypes
        return fn
    except Exception as e:  # noqa: BLE001 - fall back to pure Python
        print(f"[cbuild] kernel {stem} unavailable ({e!r}); "
              "using the pure-Python path", file=sys.stderr)
        return None
