"""Constraint checks. Each check consumes the images DataFrame (plus an
optional dimension) and produces violation rows (schema.VIOLATION_SCHEMA)
and/or a metrics table; the runner (plans/runner.py) rolls them up into
per-partition pass/fail verdicts — the engine generalization of the
reference's per-source {updated, verified, error} bookkeeping
(/root/reference/lib/Data/Validate/Sanctions.pm:59-82)."""

from .stats import column_quantiles, column_stats  # noqa: F401
from .unique import duplicate_keys, uniqueness_violations  # noqa: F401
from .phash_check import phash_column_violations  # noqa: F401
from .referential import referential_violations  # noqa: F401
from .drift import drift_check  # noqa: F401
from .integrity import integrity_violations  # noqa: F401
from .schema_check import schema_violations  # noqa: F401
