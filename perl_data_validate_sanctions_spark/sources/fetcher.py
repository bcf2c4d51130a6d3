"""Remote-source fetch path — the reference's retry loop and URL
token scrub (previously the repo's two declared-N/A rows, S1/P10).

Mirrors Fetcher.pm exactly where it specifies behavior:

- retry mechanism: up to ``retries`` attempts (default 3), keeping the
  LAST error for the final message (Fetcher.pm:889-918);
- bounded redirects: ``MAX_REDIRECTS = 3`` (Fetcher.pm:20,901);
- timeouts: 15 s connect / 60 s inactivity (Fetcher.pm:899-900);
- an HTTP error status is "File not downloaded" (Fetcher.pm:909);
- exhausted retries raise ``FetchError("An error occurred while
  fetching data from '<url>' due to <last error>")`` (Fetcher.pm:917)
  — with one deliberate hardening: the URL in OUR error message is
  token-scrubbed first, so a secret can't leak through an exception
  (the reference scrubs at the lineage handler, Fetcher.pm:854, but
  dies with the raw URL; we scrub both);
- ``clean_url`` strips ``[?&]token=...`` (Fetcher.pm:949-956) — the
  P10 scrub, applied to every URL this module reports anywhere.

The transport is PLUGGABLE: ``fetch_url(url, transport=...)`` takes a
callable ``(url, timeout_s) -> (status, body, redirect_location)``.
The default transport serves ``file://`` paths directly (the
reference's own local shortcut, Fetcher.pm:834-836) and ``http(s)://``
via urllib with redirects disabled so THIS module owns the redirect
bound. This sandbox has no network, so the full retry/redirect/scrub
surface is pinned by tests injecting fake transports — the http leg
is exercised for real the moment a deployment has connectivity."""

from __future__ import annotations

import re
from collections.abc import Callable

MAX_REDIRECTS = 3            # Fetcher.pm:20
CONNECT_TIMEOUT_S = 15.0     # Fetcher.pm:899
INACTIVITY_TIMEOUT_S = 60.0  # Fetcher.pm:900

# (status, body, redirect_location)
Transport = Callable[[str, float], tuple[int, bytes | None, str | None]]


class FetchError(RuntimeError):
    """Terminal fetch failure (retries exhausted / redirect loop)."""


def clean_url(url: str) -> str:
    """Strip the token query parameter (Fetcher.pm:949-956)."""
    return re.sub(r"[?&]token=[^&]+", "", url)


def _default_transport(url: str, timeout_s: float):
    if url.startswith("file://"):
        with open(url[len("file://"):], "rb") as f:
            return 200, f.read(), None
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            return None  # surface 3xx to the caller; we bound redirects

    opener = urllib.request.build_opener(_NoRedirect)
    try:
        # urllib exposes ONE timeout applied to every blocking socket
        # op: pass the (strict) connect timeout to open(), then re-arm
        # the underlying socket to the laxer inactivity timeout for the
        # body read (Fetcher.pm:899-900 keeps the two distinct). If the
        # socket isn't reachable on this Python build, the connect
        # timeout simply governs reads too — strictly safer.
        resp = opener.open(url, timeout=timeout_s)
        try:
            sock = resp.fp.raw._sock  # noqa: SLF001
            sock.settimeout(INACTIVITY_TIMEOUT_S)
        except AttributeError:
            pass
        return resp.status, resp.read(), None
    except urllib.error.HTTPError as e:
        loc = e.headers.get("Location") if e.headers else None
        return e.code, None, loc


def fetch_url(
    url: str,
    retries: int = 3,
    max_redirects: int = MAX_REDIRECTS,
    transport: Transport | None = None,
    connect_timeout_s: float = CONNECT_TIMEOUT_S,
) -> bytes:
    """Fetch ``url`` with the reference's retry/redirect semantics and
    return the body bytes."""
    t = transport or _default_transport
    last_error: object = "Unknown Error"  # Fetcher.pm:896
    for _ in range(max(int(retries), 1)):
        try:
            cur = url
            for _hop in range(max_redirects + 1):
                status, body, location = t(cur, connect_timeout_s)
                if 300 <= status < 400 and location:
                    cur = location
                    continue
                if status >= 400 or body is None:
                    raise FetchError(f"File not downloaded for {cur}")
                return body
            raise FetchError(
                f"redirect limit ({max_redirects}) exceeded"
            )
        except Exception as e:  # noqa: BLE001 - retry any failure
            last_error = e
    raise FetchError(
        f"An error occurred while fetching data from "
        f"'{clean_url(url)}' due to {last_error}"
    )


def fetch_to_file(
    url: str,
    retries: int = 3,
    transport: Transport | None = None,
) -> str:
    """Fetch a URL to a temp file and return the path (parsers read
    paths). The suffix is preserved so .zip dispatch keeps working."""
    import os
    import tempfile

    body = fetch_url(url, retries=retries, transport=transport)
    suffix = os.path.splitext(clean_url(url).split("?")[0])[1] or ".dat"
    fd, path = tempfile.mkstemp(prefix="pdvs_fetch_", suffix=suffix)
    with os.fdopen(fd, "wb") as f:
        f.write(body)
    return path
