"""Sources: deterministic synthetic generators, the entry-normalization
funnel (the engine's equivalent of the reference's six source parsers
converging on ``_process_sanction_entry``), and parquet readers."""

from .synth import (  # noqa: F401
    synth_images,
    synth_entries,
    synth_probes,
    expected_caption,
    ref_pixel_seed,
)
from .entries import normalize_entries  # noqa: F401
from . import codec  # noqa: F401
