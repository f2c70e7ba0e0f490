"""Batch/stream sources and catalog registration."""

from .tables import TABLE_NAMES, load_table, load_tables, register_temp_views  # noqa: F401
