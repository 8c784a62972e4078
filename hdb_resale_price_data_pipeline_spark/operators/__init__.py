"""Composable DataFrame→DataFrame operators (SURVEY.md §2 + §7 phase 4)."""

from .enrich import enrich

__all__ = ["enrich"]
