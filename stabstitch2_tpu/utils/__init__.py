"""Runtime utilities: checkpointing, torch weight import, profiling, logging."""
