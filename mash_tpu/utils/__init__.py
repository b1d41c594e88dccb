"""Cross-cutting utilities (profiling, timing)."""

from mash_tpu.utils.profiling import maybe_trace, stage, stage_report

__all__ = ["maybe_trace", "stage", "stage_report"]
