from .batch import (  # noqa: F401
    IdempotentBatchWriter,
    kafka_fanout,
    upsert_parquet,
)
from .corpus import (  # noqa: F401
    read_training_shard,
    write_training_shards,
)
