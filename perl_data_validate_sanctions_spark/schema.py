"""Canonical StructTypes for the engine.

The entry schema mirrors the reference's normalized sanction entry
(``_process_sanction_entry``,
/root/reference/lib/Data/Validate/Sanctions/Fetcher.pm:199-256): every
field is a multi-valued array and may be absent — here "absent" is a
NULL array (the reference deletes empty-array fields entirely,
Fetcher.pm:251; readers must treat missing as "no constraint",
Sanctions.pm:151).

The images schema is the BASELINE.json ``input_hint`` verbatim.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- input table: image + caption pairs (BASELINE.json input_hint) ---
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# --- reference dimension: normalized sanction entries (Fetcher.pm:199-256) ---
_arr_s = T.ArrayType(T.StringType())
ENTRY_SCHEMA = T.StructType(
    [
        T.StructField("entry_id", T.LongType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("names", _arr_s, False),
        T.StructField("dob_epoch", T.ArrayType(T.LongType()), True),
        T.StructField("dob_year", T.ArrayType(T.IntegerType()), True),
        T.StructField("dob_text", _arr_s, True),
        T.StructField("place_of_birth", _arr_s, True),
        T.StructField("residence", _arr_s, True),
        T.StructField("nationality", _arr_s, True),
        T.StructField("citizen", _arr_s, True),
        T.StructField("postal_code", _arr_s, True),
        T.StructField("national_id", _arr_s, True),
        T.StructField("passport_no", _arr_s, True),
    ]
)

# fields checked conjunctively by the reference's _match_other_fields
# (/root/reference/lib/Data/Validate/Sanctions.pm:147)
OPTIONAL_MATCH_FIELDS = (
    "place_of_birth",
    "residence",
    "nationality",
    "citizen",
    "postal_code",
    "national_id",
    "passport_no",
)

# --- probe record: the query arguments of get_sanctioned_info
# (/root/reference/lib/Data/Validate/Sanctions.pm:229-240) ---
PROBE_SCHEMA = T.StructType(
    [
        T.StructField("probe_id", T.StringType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("date_of_birth", T.StringType(), True),
        T.StructField("place_of_birth", T.StringType(), True),
        T.StructField("residence", T.StringType(), True),
        T.StructField("nationality", T.StringType(), True),
        T.StructField("citizen", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("national_id", T.StringType(), True),
        T.StructField("passport_no", T.StringType(), True),
    ]
)

# --- verdict: the reference's _possible_match struct
# (/root/reference/lib/Data/Validate/Sanctions.pm:401-410) ---
MATCHED_ARGS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), True),
        T.StructField("place_of_birth", T.StringType(), True),
        T.StructField("residence", T.StringType(), True),
        T.StructField("nationality", T.StringType(), True),
        T.StructField("citizen", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("national_id", T.StringType(), True),
        T.StructField("passport_no", T.StringType(), True),
        T.StructField("dob_epoch", T.LongType(), True),
        T.StructField("dob_year", T.IntegerType(), True),
    ]
)

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("matched", T.IntegerType(), False),
        T.StructField("list", T.StringType(), True),
        T.StructField("matched_args", MATCHED_ARGS_SCHEMA, True),
        T.StructField("comment", T.StringType(), True),
    ]
)

# --- lineage / checkpoint row (generalizes the reference's per-source
# handler callback (id, url, date, sha256, count), Fetcher.pm:853-854,
# and the Redis per-source hash updated/verified/error fields,
# Redis.pm:113-120) ---
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("source", T.StringType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("n_pass", T.LongType(), True),
        T.StructField("n_fail", T.LongType(), True),
        T.StructField("updated", T.LongType(), True),
        T.StructField("verified", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# --- violation row emitted by every check ---
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("check", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)
