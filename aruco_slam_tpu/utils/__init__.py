"""Cross-cutting utilities: checkpointing, profiling, logging."""
