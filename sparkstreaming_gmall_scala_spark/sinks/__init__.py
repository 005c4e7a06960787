from .batch import (  # noqa: F401
    IdempotentBatchWriter,
    kafka_fanout,
    upsert_parquet,
)
