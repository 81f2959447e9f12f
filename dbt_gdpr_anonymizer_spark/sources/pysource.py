"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): the
engine's extension point for systems that have no JVM connector — internal
REST APIs, bespoke binary feeds, message buses with Python-only SDKs.

The reference's ingest is exactly such a path: ``download_data.py`` pulls
JSONL from the French public-services HTTP API with `requests` and parses
it driver-side in pandas. Re-expressed here as a first-class DataFrame
SOURCE: `spark.read.format("jsonl_dir")` plans one InputPartition per
payload file, so fetching AND parsing run distributed on executors —
the driver never holds the corpus.

Scale/when-to-use:

* A custom Python source pays one Python→Arrow hop per batch. For formats
  Spark already speaks (json/csv/parquet/orc), the JVM reader with schema
  pushdown is strictly better — `sources/ingest.py` uses those. Reach for
  this API only when the protocol itself needs Python.
* Partition granularity = parallelism: `partitions()` returns one split
  per file (a production API source splits by page range / shard id).
  Spark schedules them like any other scan tasks — locality, retries,
  and speculative execution apply to Python sources too.
* Readers must be lazy: `read(partition)` yields tuples; nothing is
  materialized driver-side except the partition listing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = ["JsonlDirDataSource", "register_jsonl_dir",
           "RangeBusDataSource", "register_range_bus"]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _JsonlDirReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["path"]

    def partitions(self):
        files = sorted(
            os.path.join(self.root, f)
            for f in os.listdir(self.root)
            if not f.startswith(("_", "."))
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        names = [f.name for f in self.schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class JsonlDirDataSource(DataSource):
    """``spark.read.format("jsonl_dir").schema(...).option("path", dir)``:
    one partition per payload file, records parsed executor-side."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self):
        # schema must be supplied by the caller (.schema(...)); the API
        # calls this only when none was given
        raise NotImplementedError(
            "jsonl_dir requires an explicit .schema(...) — schema inference "
            "would need a driver-side pre-scan of the payload"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _JsonlDirReader(schema, self.options)


def register_jsonl_dir(spark) -> None:
    """Idempotently register the source with the session."""
    spark.dataSource.register(JsonlDirDataSource)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _RangeBusStreamReader(DataSourceStreamReader):
    """Offset-tracked stream reader over a deterministic record bus —
    the message-queue stand-in (same role as the rate-source in
    streaming/anonymize.py, but through the CUSTOM source API, so offset
    bookkeeping is ours): Spark asks for (initialOffset → latestOffset)
    ranges, we split each range into executor partitions, and commit()
    is the hook where a real bus would ack consumed offsets."""

    def __init__(self, options: dict):
        self.end_off = int(options.get("end", "1000"))
        self.splits = int(options.get("splits", "4"))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        return {"offset": self.end_off}

    def partitions(self, start, end):
        s, e = start["offset"], end["offset"]
        step = max(1, (e - s) // self.splits)
        out, i = [], s
        while i < e:
            out.append(_RangePartition(i, min(i + step, e)))
            i += step
        return out

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            # deterministic payload: Knuth multiplicative hash mod a prime
            yield (i, (i * 2654435761) % 997)

    def commit(self, end):
        # a real bus acks offsets <= end here; the deterministic range
        # needs no ack
        pass


class RangeBusDataSource(DataSource):
    """``spark.readStream.format("range_bus").option("end", n)``: a
    deterministic offset-ranged stream source (message-bus stand-in)
    built on the Python streaming DataSource API — initial/latest offset
    negotiation, per-microbatch partition planning, executor-side reads,
    commit acks. Deterministic by construction, so the drained stream is
    oracle-checkable."""

    @classmethod
    def name(cls) -> str:
        return "range_bus"

    def schema(self):
        return "offset long, k long"

    def streamReader(self, schema):
        return _RangeBusStreamReader(self.options)


def register_range_bus(spark) -> None:
    spark.dataSource.register(RangeBusDataSource)
