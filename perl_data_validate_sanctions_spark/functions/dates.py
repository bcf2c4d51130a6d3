"""Date-of-birth normalization as Catalyst expressions.

Reference semantics reproduced exactly (truth table pinned by
/root/reference/t/04_fetcher.t:318-362):

``_date_to_epoch`` (/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:124-141)
  1. if the value starts with ``YYYY-MM-DD`` (2-digit month/day), keep
     only the date part (time/zone dropped — epochs are UTC midnight);
  2. elif it is exactly ``D/M/YYYY`` or ``D-M-YYYY`` (1-2 digit day and
     month), reorder to Y-M-D;
  3. parse; an invalid calendar date (2025-13-01, 29/02/2023) → NULL;
  4. a bare (optionally negative) integer is an epoch passthrough
     (Date::Utility accepts epochs — probe DOBs may be epochs,
     Sanctions.pm:274);
  5. anything else → NULL.

``classify_dob`` — the per-value branch of ``_process_sanction_entry``
(Fetcher.pm:205-226):
  - blanks skipped; `` `` and ``/`` → ``-``;
  - ``D-M-YYYY`` with day==0 or month==0 → year only;
  - ``YYYY-M0-D`` with the month matching ``\\d0{1,2}`` and month==0 or
    day==0 → year only (the reference regex is idiosyncratic:
    one digit followed by 1-2 zeros — reproduced verbatim);
  - ``Mon-YYYY`` (e.g. ``Mar-1984``) → year only;
  - ``YYYY`` → year; ``YYYY ... to ... YYYY`` → inclusive year range;
  - else epoch via ``_date_to_epoch``; unparseable → raw text
    (``dob_text``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ISO_PREFIX = r"^(\d{4})-(\d{2})-(\d{2})"
_DMY_FULL = r"^(\d{1,2})[/\-](\d{1,2})[/\-](\d{4})$"
_INT_FULL = r"^-?\d+$"

_SECONDS_PER_DAY = 86400


def _g(c: Column, pattern: str, i: int) -> Column:
    return F.regexp_extract(c, pattern, i)


def date_to_epoch(col: Column | str) -> Column:
    """``_date_to_epoch``: string date → UTC-midnight epoch seconds, or NULL.

    Pure Column expression. Requires ``spark.sql.ansi.enabled=false`` so
    ``make_date`` yields NULL on invalid components (the reference wraps
    parsing in ``eval`` and returns undef).
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)

    is_iso = c.rlike(_ISO_PREFIX)
    is_dmy = c.rlike(_DMY_FULL)
    is_int = c.rlike(_INT_FULL)

    iso_date = F.make_date(
        _g(c, _ISO_PREFIX, 1).cast("int"),
        _g(c, _ISO_PREFIX, 2).cast("int"),
        _g(c, _ISO_PREFIX, 3).cast("int"),
    )
    dmy_date = F.make_date(
        _g(c, _DMY_FULL, 3).cast("int"),
        _g(c, _DMY_FULL, 2).cast("int"),
        _g(c, _DMY_FULL, 1).cast("int"),
    )
    date = F.when(is_iso, iso_date).when(is_dmy, dmy_date)
    epoch_from_date = F.unix_date(date).cast("long") * _SECONDS_PER_DAY

    return (
        F.when(c.isNull() | (c == ""), F.lit(None).cast("long"))
        .when(is_iso | is_dmy, epoch_from_date)
        .when(is_int, c.cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )


def epoch_to_date(col: Column | str) -> Column:
    """``_epoch_to_date`` (Fetcher.pm:928-939): epoch → 'YYYY-MM-DD' (UTC)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.timestamp_seconds(c), "yyyy-MM-dd")


def epoch_year(col: Column | str) -> Column:
    """Year of an epoch at UTC (probe-side dob_year, Sanctions.pm:276)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(F.timestamp_seconds(c).cast("date"))


# --- classification (_process_sanction_entry, Fetcher.pm:205-226) ---

_DMY_ZERO = r"^(\d{1,2})-(\d{1,2})-(\d{4})$"
# reference regex verbatim: m/^(\d{4})-(\d0{1,2})-(\d{1,2})$/ — group 2 is
# one digit followed by one or two literal zeros
_YMD_ZERO = r"^(\d{4})-(\d0{1,2})-(\d{1,2})$"
_MON_YEAR = r"^[A-Z][a-z]{2}-(\d{4})$"
_YEAR_ONLY = r"^\d{4}$"
_YEAR_RANGE = r"(\d{4}).*to.*(\d{4})$"

DOB_STRUCT = T.StructType(
    [
        T.StructField("epoch", T.LongType(), True),
        T.StructField("years", T.ArrayType(T.IntegerType()), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def classify_dob(col: Column | str) -> Column:
    """One raw DOB string → struct(epoch, years, text) — exactly one of
    the three is non-null; all three null for blank input (skipped).
    """
    raw = F.trim(F.col(col) if isinstance(col, str) else col)
    dob = F.regexp_replace(raw, "[ /]", "-")

    dmy = dob.rlike(_DMY_ZERO)
    dmy_d = _g(dob, _DMY_ZERO, 1).cast("int")
    dmy_m = _g(dob, _DMY_ZERO, 2).cast("int")
    dmy_y = _g(dob, _DMY_ZERO, 3)

    ymd = dob.rlike(_YMD_ZERO)
    ymd_y = _g(dob, _YMD_ZERO, 1)
    ymd_m = _g(dob, _YMD_ZERO, 2).cast("int")
    ymd_d = _g(dob, _YMD_ZERO, 3).cast("int")

    # zero month/day → bare year (Fetcher.pm:211-216)
    dob2 = (
        F.when(dmy & ((dmy_d == 0) | (dmy_m == 0)), dmy_y)
        .when(ymd & ((ymd_m == 0) | (ymd_d == 0)), ymd_y)
        .otherwise(dob)
    )
    # Mon-YYYY → year (Fetcher.pm:217)
    dob3 = F.when(dob2.rlike(_MON_YEAR), _g(dob2, _MON_YEAR, 1)).otherwise(dob2)

    y1 = _g(dob3, _YEAR_RANGE, 1).cast("int")
    y2 = _g(dob3, _YEAR_RANGE, 2).cast("int")
    epoch = date_to_epoch(dob3)

    null_l = F.lit(None).cast("long")
    null_a = F.lit(None).cast("array<int>")
    null_s = F.lit(None).cast("string")

    return (
        F.when(
            raw.isNull() | (raw == ""),
            F.struct(
                null_l.alias("epoch"), null_a.alias("years"), null_s.alias("text")
            ),
        )
        .when(
            dob3.rlike(_YEAR_ONLY),
            F.struct(
                null_l.alias("epoch"),
                F.array(dob3.cast("int")).alias("years"),
                null_s.alias("text"),
            ),
        )
        .when(
            dob3.rlike(_YEAR_RANGE),
            F.struct(
                null_l.alias("epoch"),
                # Perl range ($1..$2) is empty when $1 > $2
                F.when(y1 <= y2, F.sequence(y1, y2))
                .otherwise(F.array().cast("array<int>"))
                .alias("years"),
                null_s.alias("text"),
            ),
        )
        .when(
            epoch.isNotNull(),
            F.struct(
                epoch.alias("epoch"), null_a.alias("years"), null_s.alias("text")
            ),
        )
        .otherwise(
            F.struct(null_l.alias("epoch"), null_a.alias("years"), dob3.alias("text"))
        )
    )
