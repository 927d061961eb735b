"""`flowgen` — a custom PySpark data source generating synthetic IPFIX
flows.

Spark 4's Python DataSource API lets a source live entirely in Python
while executors read its partitions in parallel — the extension surface
a deployment without a Kafka archive uses for load tests, demo
clusters, and app-pipeline soak runs. This one emits schema-complete
`FLOW_SCHEMA` records, seeded and deterministic (same options → same
rows, any cluster), split evenly across `partitions` input splits so
generation scales with the executor count like a real source.

    spark.dataSource.register(FlowGenDataSource)
    flows = (spark.read.format("flowgen")
             .option("rows", 1_000_000).option("partitions", 64).load())

Options: rows (default 1000), partitions (default 8), seed (default 7),
start_ms (epoch ms of the first flow, default 1.6e12), span_ms (time
range covered, default 3_600_000). Every app in `apps/` runs unchanged
on the result — the generator exists so the full pipeline can be
exercised with zero external input.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from stream4flow_spark.schema import FLOW_SCHEMA


def _mix(*xs: int) -> int:
    """Deterministic 64-bit mixer (splitmix-style) over the inputs."""
    h = 0x9E3779B97F4A7C15
    for x in xs:
        h = (h ^ (x * 0xBF58476D1CE4E5B9)) & 0xFFFFFFFFFFFFFFFF
        h = ((h >> 31) ^ h) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return (h >> 7) & 0x7FFFFFFFFFFFFFFF


def _flow_row(seed: int, r: int, rows: int, start_ms: int, span_ms: int):
    """Row ``r`` of the deterministic flow corpus — shared by the batch
    reader (per-partition stride) and the streaming reader (per-batch
    row ranges), so ``readStream`` emits EXACTLY the batch rows."""
    h = _mix(seed, r)
    proto = (6, 17, 1)[h % 10 % 3] if h % 10 < 9 else 6
    src = f"10.{(h >> 8) % 64}.{(h >> 16) % 256}.{(h >> 24) % 256}"
    dst = f"192.168.{(h >> 32) % 16}.{(h >> 40) % 256}"
    t0 = start_ms + (r * span_ms) // max(rows, 1)
    pkts = 1 + h % 1000
    is_dns = proto == 17 and h % 5 == 0
    return (
        src, dst, None, None,
        proto,
        1024 + (h >> 12) % 60000,
        (53 if is_dns else (80, 443, 22, 8080)[(h >> 5) % 4]),
        pkts,
        pkts * (40 + h % 1460),
        t0,
        t0 + h % 60_000,
        (h % 64) if proto == 6 else None,
        (f"host{h % 97}.example.com" if is_dns else None),
        (1 if is_dns else None),
        ((h >> 3) % 32768 if is_dns else None),
        None, None, None, None,
        None,
        None,
    )


class _FlowGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 7))
        self.start_ms = int(options.get("start_ms", 1_600_000_000_000))
        self.span_ms = int(options.get("span_ms", 3_600_000))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        p = partition.value
        for r in range(p, self.rows, self.n_parts):
            yield _flow_row(self.seed, r, self.rows, self.start_ms, self.span_ms)


class FlowGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "flowgen"

    def schema(self):
        return FLOW_SCHEMA

    def reader(self, schema):
        return _FlowGenReader(self.options)

    def simpleStreamReader(self, schema):
        return _FlowGenStreamReader(self.options)


class _FlowGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming flowgen: a LIVE synthetic flow source with exactly-once
    offsets (Spark 4 Python SimpleDataSourceStreamReader API) — the
    zero-input way to soak the streaming apps without files or a broker.

    The offset is simply the next global row index; each ``read(start)``
    call emits rows [start, start + rows_per_batch) clamped to ``rows``
    (the corpus bound — set it huge for an endless soak). Rows come
    from the SAME ``_flow_row`` generator as the batch reader, so a
    drained stream equals ``spark.read.format("flowgen")`` with the same
    options row-for-row.

    Restart-safe by construction — and only because pacing DERIVES from
    the checkpointed start offset: the simple-reader API hands ``read``
    the offset Spark recovered, so a fresh reader instance after a query
    restart continues at exactly the committed row (an earlier
    DataSourceStreamReader version paced with an in-memory counter that
    reset to 0 on restart, making latestOffset non-monotone vs the
    recovered offset — offsets regressed and committed rows re-emitted).
    ``readBetweenOffsets`` replays any in-flight batch deterministically
    (row content is a pure function of (seed, index)). The trade: simple
    readers generate each micro-batch driver-side, which is exactly the
    low-volume soak-source profile; the batch reader keeps full
    executor-parallel partitioning."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.per_batch = int(options.get("rows_per_batch", 250))
        self.seed = int(options.get("seed", 7))
        self.start_ms = int(options.get("start_ms", 1_600_000_000_000))
        self.span_ms = int(options.get("span_ms", 3_600_000))

    def initialOffset(self):
        return {"row": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST-iterator, not a generator: Spark's prefetch cache both
        # next()s the returned value and copy.copy()s it when planning
        # partitions — generators aren't copyable, bare lists aren't
        # iterators
        return iter(
            [
                _flow_row(self.seed, r, self.rows, self.start_ms, self.span_ms)
                for r in range(lo, hi)
            ]
        )

    def read(self, start: dict):
        lo = min(start["row"], self.rows)
        hi = min(lo + self.per_batch, self.rows)
        return self._rows(lo, hi), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["row"], end["row"])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: content is a pure function of offsets
