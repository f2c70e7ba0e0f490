"""Tier A query keys — populated next."""
