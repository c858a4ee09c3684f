"""Structured Streaming layer (SURVEY.md §2B O-03, O-18..O-22, O-34).

The streaming twin of the reference's watchdog loop (restart.sh:68-158):
sources produce probe/metric events, watermarked window aggregations compute
stream health, the stateful watchdog emits remediation actions, and
foreachBatch sinks route alerts — replacing the reference's process-global
mutable counters with per-key fault-tolerant state (RocksDB state store,
see session.py)."""
