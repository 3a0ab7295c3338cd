"""Utilities: optimizer factory, checkpointing, profiling."""
