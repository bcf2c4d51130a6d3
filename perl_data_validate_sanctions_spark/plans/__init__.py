from .runner import ValidationReport, run_validation  # noqa: F401
