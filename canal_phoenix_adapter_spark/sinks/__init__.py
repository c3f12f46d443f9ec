"""Executor-side sinks: the write half of the sync pipeline."""
