"""End-to-end pipelines: flagship run, incremental tier maintenance,
and the document-curation corpus pipeline."""

from .curation import run_curation
from .flagship import run_flagship
from .incremental import update_tiers

__all__ = ["run_curation", "run_flagship", "update_tiers"]
