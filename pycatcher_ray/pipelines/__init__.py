"""End-to-end pipelines: flagship run + incremental tier maintenance."""

from .flagship import run_flagship
from .incremental import update_tiers

__all__ = ["run_flagship", "update_tiers"]
