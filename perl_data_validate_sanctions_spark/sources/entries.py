"""The entry-normalization funnel: all sources converge here, exactly as
the reference's six parsers all converge on ``_process_sanction_entry``
(/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:199-256;
call sites 310, 378, 431, 535, 635, 790).

Input: a DataFrame with raw multi-valued fields::

    source string, names array<string>, date_of_birth array<string>,
    place_of_birth/residence/nationality/citizen array<string>,
    postal_code/national_id/passport_no array<string>

Output: ENTRY_SCHEMA rows. Entire funnel is Column expressions
(higher-order ``transform``/``filter`` over the arrays) — one narrow
map stage, no shuffle, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.country import country_code
from ..functions.dates import classify_dob
from ..functions.normalize import strip_commas

_COUNTRY_FIELDS = ("place_of_birth", "residence", "nationality", "citizen")
_VERBATIM_FIELDS = ("postal_code", "national_id", "passport_no")


def _nonempty_or_null(arr: Column) -> Column:
    """Fetcher.pm:251: a field whose array became empty is deleted —
    our encoding of 'deleted' is NULL (schema.py docstring)."""
    return F.when(F.size(arr) > 0, arr)


def _prune_strings(arr: Column) -> Column:
    """uniq + drop falsy values (Fetcher.pm:242-249)."""
    return F.filter(F.array_distinct(arr), lambda x: x.isNotNull() & (x != ""))


def normalize_entries(df: DataFrame) -> DataFrame:
    dobs = F.transform(
        F.coalesce(F.col("date_of_birth"), F.array().cast("array<string>")),
        classify_dob,
    )
    dob_epoch = F.filter(
        F.transform(dobs, lambda s: s.getField("epoch")), lambda e: e.isNotNull()
    )
    dob_year = F.flatten(
        F.filter(
            F.transform(dobs, lambda s: s.getField("years")),
            lambda y: y.isNotNull(),
        )
    )
    dob_text = F.filter(
        F.transform(dobs, lambda s: s.getField("text")), lambda t: t.isNotNull()
    )

    out = df.withColumn(
        "names",
        _prune_strings(F.transform(F.col("names"), lambda n: strip_commas(n))),
    )
    # dob_epoch: values deduped but 0 NOT pruned (Fetcher.pm:244-246)
    out = out.withColumn("dob_epoch", _nonempty_or_null(F.array_distinct(dob_epoch)))
    # dob_year / dob_text: Perl `grep { $_ }` drops falsy (0 / '')
    out = out.withColumn(
        "dob_year",
        _nonempty_or_null(
            F.filter(F.array_distinct(dob_year), lambda y: y != 0)
        ),
    )
    out = out.withColumn("dob_text", _nonempty_or_null(_prune_strings(dob_text)))

    for f in _COUNTRY_FIELDS:
        arr = F.coalesce(F.col(f), F.array().cast("array<string>"))
        # name → ISO2, unknowns become '' and are pruned (Fetcher.pm:232-236)
        out = out.withColumn(
            f,
            _nonempty_or_null(
                _prune_strings(F.transform(arr, lambda v: country_code(v)))
            ),
        )
    for f in _VERBATIM_FIELDS:
        arr = F.coalesce(F.col(f), F.array().cast("array<string>"))
        out = out.withColumn(f, _nonempty_or_null(_prune_strings(arr)))

    # entry dropped when names emptied out (Fetcher.pm:253)
    out = out.filter(F.size(F.col("names")) > 0)

    # stable surrogate key for candidate dedup downstream
    out = out.withColumn(
        "entry_id",
        F.xxhash64(
            F.col("source"),
            F.to_json(
                F.struct(
                    "names", "dob_epoch", "dob_year", "dob_text",
                    "place_of_birth", "residence", "nationality", "citizen",
                    "postal_code", "national_id", "passport_no",
                )
            ),
        ),
    )
    return out.select(
        "entry_id", "source", "names", "dob_epoch", "dob_year", "dob_text",
        "place_of_birth", "residence", "nationality", "citizen",
        "postal_code", "national_id", "passport_no",
    )
