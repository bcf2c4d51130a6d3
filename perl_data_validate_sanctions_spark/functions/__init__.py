"""Scalar Column-expression helpers (reference §2.2 P1-P11, §2.8).

Everything here is a pure Catalyst expression — no UDFs — so the whole
normalization pipeline stays inside whole-stage codegen.
"""

from .normalize import (  # noqa: F401
    clean_full_name,
    clean_name_tokens,
    process_name,
    strip_commas,
    strip_trailing_parenthetical,
    ucfirst,
)
from .dates import (  # noqa: F401
    classify_dob,
    date_to_epoch,
    epoch_to_date,
    epoch_year,
)
from .country import country_code  # noqa: F401
from .hashing import canonical_row_hash, content_hash_agg  # noqa: F401
