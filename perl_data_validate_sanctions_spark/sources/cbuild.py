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
    # per-uid path: dlopen-ing from a predictable world-writable
    # location would let another local user plant a library; the
    # uid suffix + 0o700 + ownership check below close that
    return os.environ.get(
        "PDVS_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), f"pdvs_native_{os.getuid()}"),
    )


def _secure_dir(d: str) -> None:
    """Create (0o700) and verify the cache dir is ours and not
    writable by others — raise otherwise so load_kernel falls back."""
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise PermissionError(
            f"native cache dir {d} is not exclusively ours "
            f"(uid {st.st_uid}, mode {oct(st.st_mode)})"
        )


def load_kernel(stem: str, source: str, func: str, restype, argtypes):
    """Compile ``source`` (once, content-addressed) and return the
    ctypes function ``func``, or None on any failure (logged once)."""
    try:
        tag = hashlib.sha256(source.encode()).hexdigest()[:16]
        d = cache_dir()
        so_path = os.path.join(d, f"{stem}_{tag}.so")
        _secure_dir(d)
        if not os.path.exists(so_path):
            # pid-unique source AND object paths: concurrent workers
            # never read a file another worker is still writing; the
            # final os.replace is the only shared-name operation
            # pid BEFORE the .c suffix — cc infers the language from it
            src = os.path.join(d, f"{stem}_{tag}.{os.getpid()}.c")
            tmp = so_path + f".tmp.{os.getpid()}"
            with open(src, "w") as f:
                f.write(source)
            try:
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                    check=True,
                    capture_output=True,
                    timeout=60,
                )
                os.replace(tmp, so_path)  # atomic publish
            finally:
                for p in (src, tmp):
                    try:
                        os.remove(p)
                    except OSError:
                        pass
        lib = ctypes.CDLL(so_path)
        fn = getattr(lib, func)
        fn.restype = restype
        fn.argtypes = argtypes
        return fn
    except Exception as e:  # noqa: BLE001 - fall back to pure Python
        print(f"[cbuild] kernel {stem} unavailable ({e!r}); "
              "using the pure-Python path", file=sys.stderr)
        return None
