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
# ≤18 digits so the epoch-passthrough cast can never overflow a long
# (overflow would throw under ANSI sessions)
_INT_FULL = r"^-?\d{1,18}$"

_SECONDS_PER_DAY = 86400


def _g(c: Column, pattern: str, i: int) -> Column:
    return F.regexp_extract(c, pattern, i)


def _let(value: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``value`` once and
    reference it many times WITHOUT duplicating its expression tree —
    a higher-order-function lambda variable is a shared reference,
    whereas plain Column composition re-inlines the whole subtree at
    every use (exponential tree growth; the unbound version of
    classify_dob took >100s to analyze/compile and overflowed Janino
    under ANSI)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _is_leap(y: Column) -> Column:
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def _valid_ymd(y: Column, m: Column, d: Column) -> Column:
    """Calendar validity in pure arithmetic (no throwing functions — the
    expression must behave identically under ANSI and non-ANSI
    sessions; the driver's session config is not ours to choose)."""
    days_in_month = (
        F.when(m.isin(1, 3, 5, 7, 8, 10, 12), F.lit(31))
        .when(m.isin(4, 6, 9, 11), F.lit(30))
        .when(m == 2, F.when(_is_leap(y), F.lit(29)).otherwise(F.lit(28)))
        .otherwise(F.lit(0))
    )
    return (m >= 1) & (m <= 12) & (d >= 1) & (d <= days_in_month)


def _days_from_civil(y: Column, m: Column, d: Column) -> Column:
    """Days since 1970-01-01 for a valid proleptic-Gregorian date —
    Howard Hinnant's public ``days_from_civil`` algorithm, in integer
    Column arithmetic (no make_date, so no ANSI throw path)."""
    yy = (y - (m <= 2).cast("int")).cast("long")
    era = F.floor(yy / 400.0).cast("long")
    yoe = yy - era * 400
    mp = F.when(m > 2, m - 3).otherwise(m + 9).cast("long")
    doy = F.floor((F.lit(153) * mp + 2) / 5.0).cast("long") + d - 1
    doe = (
        yoe * 365
        + F.floor(yoe / 4.0).cast("long")
        - F.floor(yoe / 100.0).cast("long")
        + doy
    )
    return era * 146097 + doe - 719468


def _ymd_epoch(y: Column, m: Column, d: Column) -> Column:
    """epoch-or-null of a y/m/d triple, let-bound so the component
    expressions appear once each in the tree."""
    return _let(
        F.struct(y.alias("y"), m.alias("m"), d.alias("d")),
        lambda s: F.when(
            _valid_ymd(s["y"], s["m"], s["d"]),
            _days_from_civil(s["y"], s["m"], s["d"]) * _SECONDS_PER_DAY,
        ),
    )


def date_to_epoch(col: Column | str) -> Column:
    """``_date_to_epoch``: string date → UTC-midnight epoch seconds, or
    NULL for anything unparseable/invalid (the reference wraps parsing
    in ``eval`` and returns undef). Pure, non-throwing Column
    expression — safe under both ANSI modes."""
    raw = F.trim(F.col(col) if isinstance(col, str) else col)

    def body(c: Column) -> Column:
        iso_epoch = _ymd_epoch(
            _g(c, _ISO_PREFIX, 1).cast("int"),
            _g(c, _ISO_PREFIX, 2).cast("int"),
            _g(c, _ISO_PREFIX, 3).cast("int"),
        )
        dmy_epoch = _ymd_epoch(
            _g(c, _DMY_FULL, 3).cast("int"),
            _g(c, _DMY_FULL, 2).cast("int"),
            _g(c, _DMY_FULL, 1).cast("int"),
        )
        return (
            F.when(c.isNull() | (c == ""), F.lit(None).cast("long"))
            .when(c.rlike(_ISO_PREFIX), iso_epoch)
            .when(c.rlike(_DMY_FULL), dmy_epoch)
            .when(c.rlike(_INT_FULL), c.cast("long"))
            .otherwise(F.lit(None).cast("long"))
        )

    return _let(raw, body)


def _epoch_day(c: Column) -> Column:
    """epoch seconds → DateType via pure date arithmetic. Deliberately
    NOT timestamp_seconds(..).cast('date'), which resolves in the
    SESSION timezone: under e.g. America/New_York that shifts every
    UTC-midnight epoch to the previous civil day, silently breaking the
    dob_year tier (the reference's Date::Utility is GMT-based).
    floor-division keeps pre-1970 epochs on the correct day."""
    return F.date_add(
        F.to_date(F.lit("1970-01-01")),
        F.floor(c / F.lit(86400)).cast("int"),
    )


def epoch_to_date(col: Column | str) -> Column:
    """``_epoch_to_date`` (Fetcher.pm:928-939): epoch → 'YYYY-MM-DD',
    GMT-based regardless of the session timezone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(_epoch_day(c), "yyyy-MM-dd")


def epoch_year(col: Column | str) -> Column:
    """Year of an epoch at UTC (probe-side dob_year, Sanctions.pm:276),
    timezone-free (see _epoch_day)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(_epoch_day(c))


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

    Every intermediate rewrite (dash normalization → zero-date rule →
    Mon-YYYY rule) is let-bound, keeping the expression tree linear.
    """
    raw0 = F.trim(F.col(col) if isinstance(col, str) else col)

    def final(raw: Column, dob3: Column) -> Column:
        null_l = F.lit(None).cast("long")
        null_a = F.lit(None).cast("array<int>")
        null_s = F.lit(None).cast("string")
        y1 = _g(dob3, _YEAR_RANGE, 1).cast("int")
        y2 = _g(dob3, _YEAR_RANGE, 2).cast("int")
        epoch = date_to_epoch(dob3)

        return (
            F.when(
                raw.isNull() | (raw == ""),
                F.struct(
                    null_l.alias("epoch"),
                    null_a.alias("years"),
                    null_s.alias("text"),
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
                    epoch.alias("epoch"),
                    null_a.alias("years"),
                    null_s.alias("text"),
                ),
            )
            .otherwise(
                F.struct(
                    null_l.alias("epoch"),
                    null_a.alias("years"),
                    dob3.alias("text"),
                )
            )
        )

    return _let(
        raw0,
        lambda raw: _let(
            mon_rule_chain(raw),
            lambda dob3: final(raw, dob3),
        ),
    )


def mon_rule_chain(raw: Column) -> Column:
    """dash-normalize → zero-date rule → Mon-YYYY rule, each let-bound."""
    return _let(
        F.regexp_replace(raw, "[ /]", "-"),
        lambda dob1: _let(
            _zero_rules_impl(dob1),
            lambda dob2: F.when(
                dob2.rlike(_MON_YEAR), _g(dob2, _MON_YEAR, 1)
            ).otherwise(dob2),
        ),
    )


def _zero_rules_impl(dob: Column) -> Column:
    dmy = dob.rlike(_DMY_ZERO)
    ymd = dob.rlike(_YMD_ZERO)
    return (
        F.when(
            dmy
            & (
                (_g(dob, _DMY_ZERO, 1).cast("int") == 0)
                | (_g(dob, _DMY_ZERO, 2).cast("int") == 0)
            ),
            _g(dob, _DMY_ZERO, 3),
        )
        .when(
            ymd
            & (
                (_g(dob, _YMD_ZERO, 2).cast("int") == 0)
                | (_g(dob, _YMD_ZERO, 3).cast("int") == 0)
            ),
            _g(dob, _YMD_ZERO, 1),
        )
        .otherwise(dob)
    )
