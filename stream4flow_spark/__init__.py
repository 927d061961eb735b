"""stream4flow_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CSIRT-MU/Stream4Flow, re-expressed Spark-first.

Layout:
    session       SparkSession factory tuned for local + cluster use
    schema        the IPFIX flow-record StructType (nullable columns)
    functions/    scalar Column functions (SURVEY.md §2.7 C1-C18)
    operators/    reusable operator library (top-k, distinct, fan-out,
                  interval join, suppression state)
    apps/         one module per reference application, each a pure
                  DataFrame -> DataFrame function usable in batch AND streaming
    fixtures/     deterministic `flows` derivation from the driver testdata
    llmdata/      large-scale training-data pipeline ops (dedup, ANN,
                  text analysis, multimodal plumbing)
    streaming/    Structured Streaming wiring (sources, sinks, stateful run)
    plans/        read-side SQL views (SURVEY.md §2.9 Q1-Q9)
"""

__version__ = "0.1.0"
