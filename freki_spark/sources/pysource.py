"""Spark 4 custom PYTHON DATA SOURCE (the `pyspark.sql.datasource`
API): the sanctioned connector surface for systems with no JVM reader
— internal REST feeds, bespoke binary stores, queue snapshots.  This
is connector-boundary Python (the API's whole purpose), not a hot-path
UDF: Spark plans partitions through `partitions()` and runs `read()`
once per partition task, so parallelism and data locality stay under
engine control exactly like a JVM source.

The source here synthesizes a deterministic document feed (doc_id,
owning partition, md5 payload) so the DuckDB oracle can mirror it in
closed form — the verified artifact is the SOURCE CONTRACT: schema
projection, option passing, the partition fan-out, and per-partition
row ownership (doc_id % SYNTH_PARTS == partition id).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

SYNTH_N = 200
SYNTH_PARTS = 4


class SynthDocsSource(DataSource):
    """spark.read.format("freki_synth").option("n", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "freki_synth"

    def schema(self) -> str:
        return "doc_id bigint, part int, payload string"

    def reader(self, schema):
        return _SynthReader(int(self.options.get("n", SYNTH_N)))


class _SynthReader(DataSourceReader):
    def __init__(self, n: int):
        self.n = n

    def partitions(self):
        return [InputPartition(i) for i in range(SYNTH_PARTS)]

    def read(self, partition):
        i = partition.value
        for doc_id in range(i, self.n, SYNTH_PARTS):
            yield (
                doc_id,
                i,
                hashlib.md5(str(doc_id).encode()).hexdigest(),
            )
