"""Config, checkpointing, weight conversion, logging, profiling utilities."""
