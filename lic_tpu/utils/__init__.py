"""Utilities: checkpointing, logging, analysis/visualization, profiling."""
