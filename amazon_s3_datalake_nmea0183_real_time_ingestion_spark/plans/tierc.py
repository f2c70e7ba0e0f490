"""Tier C query keys — populated next."""
