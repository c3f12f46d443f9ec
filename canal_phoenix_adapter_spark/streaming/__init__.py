"""Structured Streaming glue: the reference's sync() hot path
(SURVEY §3.1) driven per micro-batch epoch over the batch merge kernel."""
