"""Structured Streaming surface (event-time operators, incremental cube
updates). The reference is batch-only; this is the scale-path extension
for continuously arriving scenes/events."""
