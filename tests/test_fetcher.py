"""Remote-fetch path semantics (sources/fetcher.py — Fetcher.pm's
retry loop, redirect bound, timeouts, and the URL token scrub), pinned
entirely offline via injected transports, plus the registry
integration: an http feed fetched through a fake transport parses
end-to-end and a failing feed stays error-isolated with a scrubbed
message."""

from __future__ import annotations

import pytest

from perl_data_validate_sanctions_spark.sources.fetcher import (
    MAX_REDIRECTS,
    FetchError,
    clean_url,
    fetch_to_file,
    fetch_url,
)

DATA = "/root/repo/tests/data"


def test_clean_url_strips_token():
    # Fetcher.pm:949-956 literal semantics
    assert clean_url("https://x.io/f.csv?token=SECRET") == "https://x.io/f.csv"
    assert (clean_url("https://x.io/f.csv?a=1&token=SECRET&b=2")
            == "https://x.io/f.csv?a=1&b=2")
    assert clean_url("https://x.io/f.csv?a=1") == "https://x.io/f.csv?a=1"


def test_retry_succeeds_after_transient_failures():
    calls = []

    def flaky(url, timeout):
        calls.append(url)
        if len(calls) < 3:
            raise OSError("connection reset")
        return 200, b"payload", None

    assert fetch_url("https://x.io/f", transport=flaky) == b"payload"
    assert len(calls) == 3  # default retries = 3 (Fetcher.pm:893)


def test_retries_exhausted_raises_scrubbed_last_error():
    def always_down(url, timeout):
        raise OSError("boom")

    with pytest.raises(FetchError) as ei:
        fetch_url("https://x.io/f?token=SECRET", transport=always_down)
    msg = str(ei.value)
    assert "An error occurred while fetching data from" in msg
    assert "boom" in msg           # LAST error is reported
    assert "SECRET" not in msg     # the P10 scrub covers exceptions


def test_http_error_status_is_file_not_downloaded():
    def gone(url, timeout):
        return 404, None, None

    with pytest.raises(FetchError, match="File not downloaded"):
        fetch_url("https://x.io/f", retries=1, transport=gone)


def test_redirects_followed_up_to_bound():
    chain = {f"https://x.io/{i}": f"https://x.io/{i + 1}"
             for i in range(MAX_REDIRECTS)}

    def redirecting(url, timeout):
        if url in chain:
            return 302, None, chain[url]
        return 200, b"final", None

    # exactly MAX_REDIRECTS hops: allowed
    assert fetch_url("https://x.io/0", retries=1,
                     transport=redirecting) == b"final"

    loop = lambda url, timeout: (302, None, url)  # noqa: E731
    with pytest.raises(FetchError, match="redirect limit"):
        fetch_url("https://x.io/loop", retries=1, transport=loop)


def test_file_url_transport_and_fetch_to_file(tmp_path):
    p = tmp_path / "feed.csv"
    p.write_bytes(b"a,b\n1,2\n")
    assert fetch_url(f"file://{p}") == b"a,b\n1,2\n"
    out = fetch_to_file(f"file://{p}")
    assert out.endswith(".csv")
    with open(out, "rb") as f:
        assert f.read() == b"a,b\n1,2\n"


def test_fetch_sources_http_feed_end_to_end(spark):
    """An http feed served by a fake transport parses through the real
    registry; a permanently-failing feed is error-isolated with a
    token-scrubbed message (Fetcher.pm:830-859 + 854)."""
    from perl_data_validate_sanctions_spark.sources.parsers import (
        fetch_sources,
    )

    with open(f"{DATA}/hmt.csv", "rb") as f:
        hmt_bytes = f.read()

    def transport(url, timeout):
        if "hmt" in url:
            return 200, hmt_bytes, None
        raise OSError("no route to host")

    union, updated, errors = fetch_sources(
        spark,
        {
            "HMT-Sanctions": "https://ofsi.test/hmt.csv?token=SECRET",
            "EU-Sanctions": "https://eu.test/feed.xml?token=SECRET",
        },
        transport=transport,
    )
    assert union is not None and union.count() > 0
    assert "HMT-Sanctions" in updated
    assert set(errors) == {"EU-Sanctions"}
    assert "SECRET" not in errors["EU-Sanctions"]
    assert "no route to host" in errors["EU-Sanctions"]
