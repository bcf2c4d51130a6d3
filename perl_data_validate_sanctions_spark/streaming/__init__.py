from .checkpoint import CheckpointStore, run_with_resume  # noqa: F401
from .incremental import merge_source_states  # noqa: F401
