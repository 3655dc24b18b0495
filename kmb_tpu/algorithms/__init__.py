"""Harness-facing algorithm wrappers (lifecycle API implementations)."""
