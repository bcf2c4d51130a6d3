"""perl_data_validate_sanctions_spark — a PySpark-native schema + constraint
validation engine.

A from-scratch re-expression (NOT a port) of the query/data-processing
capabilities of the reference ``deriv-com/perl-Data-Validate-Sanctions``
(a Perl sanctions-screening library), rebuilt as a distributed validation
engine over Parquet/Iceberg-style tables of image+caption pairs::

    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

Subpackages
-----------
functions/   scalar Column-expression helpers (name cleaning, DOB
             normalization, country codes, canonical hashing) —
             reference semantics from lib/Data/Validate/Sanctions.pm and
             Fetcher.pm re-expressed as Catalyst expressions.
sources/     deterministic synthetic data generators (seeded, distributed)
             and the entry-normalization funnel equivalent of the
             reference's six source parsers.
operators/   the tiered fuzzy match cascade (native Catalyst + Arrow
             variants), dedup / similarity / text-analysis operators for
             training-data pipelines.
checks/      constraint checks: column stats, uniqueness (salted),
             referential, distribution drift (KS / chi-square), payload
             integrity (PSNR), schema conformance.
plans/       the check registry + runner emitting per-partition
             pass/fail verdicts and violation rows.
streaming/   incremental update (merge/diff semantics), checkpointed
             lineage + resume.
"""

__version__ = "0.1.0"
