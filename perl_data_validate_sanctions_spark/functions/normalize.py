"""Name normalization as Catalyst expressions.

Reference semantics:
- ``_clean_names`` (/root/reference/lib/Data/Validate/Sanctions.pm:412-419):
  strip every char that is not a letter or whitespace, uppercase, split on
  whitespace runs. Perl ``[[:alpha:]]`` ≙ ``\\p{L}`` (Unicode letters), so
  non-Latin aliases tokenize identically.
- full-name equality cleaning for the dob_text fallback
  (Sanctions.pm:303): same strip+upper but NO tokenization — whitespace
  runs are preserved verbatim.
- ``_process_name`` (Fetcher.pm:111-115): join parts with ' ', trim.
- comma strip on names (Fetcher.pm:239), trailing-parenthetical strip
  for HMT cells (Fetcher.pm:357), ``ucfirst`` at index time
  (Sanctions.pm:371).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Perl: s/[^[:alpha:]\s]//gr  — remove anything that is not a letter or
# whitespace. \p{L} is the Unicode letter class in Java regex.
_NON_ALPHA = r"[^\p{L}\s]"


def clean_full_name(col: Column | str) -> Column:
    """Uppercased, non-alpha-stripped full name, whitespace preserved.

    Used for the exact-equality fallback tier (Sanctions.pm:303-305).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.regexp_replace(c, _NON_ALPHA, ""))


def clean_name_tokens(col: Column | str) -> Column:
    """``_clean_names``: array of uppercase alpha-only tokens.

    Perl's ``split " "`` discards leading/empty fields; we filter them.
    """
    return F.filter(
        F.split(clean_full_name(col), r"\s+"),
        lambda t: t != F.lit(""),
    )


def process_name(*cols: Column | str) -> Column:
    """``_process_name`` (Fetcher.pm:111-115): space-join + trim."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.trim(F.concat_ws(" ", *cs))


def strip_commas(col: Column | str) -> Column:
    """Fetcher.pm:239: trim then remove every comma."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), ",", "")


def strip_trailing_parenthetical(col: Column | str) -> Column:
    """Fetcher.pm:357 (HMT): remove a trailing ``(...)`` group."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"\([^(]*\)$", "")


def ucfirst(col: Column | str) -> Column:
    """Perl ``ucfirst`` (Sanctions.pm:371): uppercase the first char only."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.upper(F.substring(c, 1, 1)), F.substring(c, 2, 2_000_000_000)
    )
