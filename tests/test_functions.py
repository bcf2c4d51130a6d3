"""Unit tests for the scalar function layer.

The DOB truth table is ported verbatim from the reference's
t/04_fetcher.t:318-362; tokenization/cleaning semantics from
lib/Data/Validate/Sanctions.pm:412-419 and Fetcher.pm:111-115,239.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from perl_data_validate_sanctions_spark.functions import (
    classify_dob,
    clean_full_name,
    clean_name_tokens,
    country_code,
    date_to_epoch,
    epoch_to_date,
    process_name,
    strip_commas,
    strip_trailing_parenthetical,
    ucfirst,
)

# (raw, expected_epoch) — t/04_fetcher.t:318-362
DATE_TO_EPOCH_TABLE = [
    ("2025-02-04T17:53:20+08:00", 1738627200),
    ("2025-02-04T09:53:20Z", 1738627200),
    ("2025-02-04T17:53:20+0800", 1738627200),
    ("2025-02-04T17:53:20", 1738627200),
    ("2025-02-04", 1738627200),
    ("2023-12-31", 1703980800),
    ("2024-01-01", 1704067200),
    ("04/02/2025", 1738627200),
    ("04-02-2025", 1738627200),
    ("31/12/2023", 1703980800),
    ("01/01/2024", 1704067200),
    ("4/2/2025", 1738627200),
    ("4-2-2025", 1738627200),
    (None, None),
    ("", None),
    ("   ", None),
    ("invalid-date", None),
    ("2025/02/04", None),
    ("Feb 4, 2025", None),
    ("2025.02.04", None),
    ("2025-13-01", None),
    ("2025-02-30", None),
    ("32/01/2025", None),
    ("01/13/2025", None),
    ("29/02/2024", 1709164800),
    ("29/02/2023", None),
    ("2024-02-29", 1709164800),
    ("1970-01-01", 0),
    ("01/01/1970", 0),
    ("2038-01-19", 2147472000),
]


def _eval(spark, col, rows, in_type="string"):
    df = spark.createDataFrame([(r,) for r in rows], f"v {in_type}")
    return [r[0] for r in df.select(col).collect()]


def test_date_to_epoch_truth_table(spark):
    raws = [r for r, _ in DATE_TO_EPOCH_TABLE]
    got = _eval(spark, date_to_epoch("v"), raws)
    for (raw, want), g in zip(DATE_TO_EPOCH_TABLE, got):
        assert g == want, f"date_to_epoch({raw!r}) = {g}, want {want}"


def test_date_to_epoch_far_future_and_epoch_passthrough(spark):
    got = _eval(spark, date_to_epoch("v"), ["2050-01-01", "-253411200", "174614567"])
    assert got[0] is not None and got[0] > 0
    assert got[1] == -253411200  # epoch passthrough (probe DOBs may be epochs)
    assert got[2] == 174614567


def test_epoch_to_date(spark):
    got = _eval(
        spark, epoch_to_date("v"), [1672444800, 1609459200, -315619200], "long"
    )
    assert got == ["2022-12-31", "2021-01-01", "1960-01-01"]


def test_epoch_functions_are_timezone_free(spark):
    """Under a non-UTC session, epoch_year/epoch_to_date must still be
    GMT-based (the reference's Date::Utility is) — a tz-shifted year
    silently kills the dob_year match tier."""
    from perl_data_validate_sanctions_spark.functions.dates import epoch_year

    tz_key = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_key)
    try:
        spark.conf.set(tz_key, "America/New_York")
        # 1980-01-01T00:00Z is 1979-12-31 19:00 in New York — a session-
        # tz implementation would answer 1979
        got_y = _eval(spark, epoch_year("v"),
                      [315532800, 0, -253411200], "long")
        assert got_y == [1980, 1970, 1961]
        got_d = _eval(spark, epoch_to_date("v"), [315532800, 0], "long")
        assert got_d == ["1980-01-01", "1970-01-01"]
    finally:
        spark.conf.set(tz_key, old)


# classification cases from Fetcher.pm:205-226 + t/04_fetcher.t goldens
def test_classify_dob(spark):
    cases = [
        # raw -> (epoch, years, text)
        ("1999", (None, [1999], None)),
        ("0-0-1999", (None, [1999], None)),
        ("00/00/1999", (None, [1999], None)),
        ("1999-00-12", (None, [1999], None)),
        ("Mar-1984", (None, [1984], None)),
        ("1950 to 1953", (None, [1950, 1951, 1952, 1953], None)),
        ("1953 to 1950", (None, [], None)),  # Perl ($1..$2) empty when $1>$2
        ("1999-01-05", (-30412800 + 946080000 - 915580800, None, None)),
        ("circa 1951", (None, None, "circa-1951")),
        ("other info", (None, None, "other-info")),
        ("", (None, None, None)),
        (None, (None, None, None)),
        ("04/02/2025", (1738627200, None, None)),
    ]
    # fix the one computed entry: 1999-01-05 epoch
    import calendar

    e = calendar.timegm((1999, 1, 5, 0, 0, 0))
    cases[7] = ("1999-01-05", (e, None, None))

    raws = [r for r, _ in cases]
    got = _eval(spark, classify_dob("v"), raws)
    for (raw, want), g in zip(cases, got):
        assert (g["epoch"], g["years"], g["text"]) == want, f"{raw!r}: {g}"


def test_clean_name_tokens(spark):
    rows = [
        "Sergei Ivanovich NEVEROV",
        " zaki , izzat  ZAKI 123 ahmad!",
        "Jean-Claude O'Brien",
        "",
    ]
    got = _eval(spark, clean_name_tokens("v"), rows)
    assert got[0] == ["SERGEI", "IVANOVICH", "NEVEROV"]
    assert got[1] == ["ZAKI", "IZZAT", "ZAKI", "AHMAD"]
    assert got[2] == ["JEANCLAUDE", "OBRIEN"]  # Perl strips '-' and "'" too
    assert got[3] == []


def test_clean_full_name_preserves_whitespace(spark):
    got = _eval(spark, clean_full_name("v"), ["Zaki, Izzat Zaki AHMAD", "a  b"])
    assert got[0] == "ZAKI IZZAT ZAKI AHMAD"
    assert got[1] == "A  B"


def test_misc_string_helpers(spark):
    df = spark.createDataFrame([("ali", "baba")], "a string, b string")
    row = df.select(
        process_name("a", "b").alias("p"),
        ucfirst("a").alias("u"),
        strip_commas(F.lit(" a,b,c ")).alias("c"),
        strip_trailing_parenthetical(F.lit("Name (alias)")).alias("t"),
    ).collect()[0]
    assert row["p"] == "ali baba"
    assert row["u"] == "Ali"
    assert row["c"] == "abc"
    assert row["t"] == "Name "


def test_country_code(spark):
    cases = [
        ("Iran", "ir"),
        ("France", "fr"),
        ("Germany", "de"),
        ("Russia", "ru"),
        ("Israel", "il"),
        ("IR", "ir"),
        ("us", "us"),
        ("United Kingdom", "gb"),
        ("Narnia", ""),
        ("Viet Nam", "vn"),
        ("Vietnam", "vn"),
    ]
    got = _eval(spark, country_code("v"), [c for c, _ in cases])
    for (raw, want), g in zip(cases, got):
        assert g == want, f"country_code({raw!r}) = {g!r}, want {want!r}"
