"""Structured Streaming surface (SURVEY.md §2.1, §2.5, §2.6).

- ``streaming.kafka``  — Kafka source/sink wiring (S1-S3), fully
  distributed (the reference pinned ingest to one partition and produced
  results from the driver).
- ``streaming.runner`` — file-source harness proving batch/stream parity:
  every app is a source-agnostic ``DataFrame -> DataFrame`` function, so
  the same transformation graph runs incrementally.
- ``streaming.state``  — ``applyInPandasWithState`` suppression twin of
  ``operators.suppression`` (ST1-ST3).
- ``streaming.llmingest`` — dedup-on-arrival for the training-data tier
  (watermark-bounded keep-first per content hash).
"""

from stream4flow_spark.streaming.runner import (  # noqa: F401
    run_stream_to_table,
    stream_events,
    stream_flows_df,
)
from stream4flow_spark.streaming.ddos import detection_ddos_stream  # noqa: F401
from stream4flow_spark.streaming.llmingest import (  # noqa: F401
    dedup_documents_stream,
)
from stream4flow_spark.streaming.state import suppress_reports_stream  # noqa: F401
