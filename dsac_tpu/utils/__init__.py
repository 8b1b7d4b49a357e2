"""Utilities: native IO bindings, timing, checkpointing, metric logging."""
