"""Composed logical plans (multi-operator pipelines)."""
