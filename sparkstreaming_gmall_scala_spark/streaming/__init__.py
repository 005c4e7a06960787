"""Structured Streaming forms of the reference's nine DStream apps.

The reference hand-manages Kafka offsets in Redis/MySQL and keeps all
operator state in external Redis with TTLs (SURVEY.md §2.9). Structured
Streaming replaces that entire subsystem: checkpointing owns offsets and
state recovery atomically; watermarks own TTL eviction.

Modules:
  sources.py          - streaming sources (file for tests, kafka gated)
  dau.py              - A2 streaming distinct (watermark + dropDuplicates)
  join.py             - J1 watermarked stream-stream join
  allocation_state.py - A4-a exact-parity stateful allocation
  sinks.py            - foreachBatch sink helpers (idempotent / txn / topic)
"""
