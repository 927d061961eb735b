"""TLS cipher-suite functions (SURVEY.md §2.7 C9-C10).

C9 `format_cipher_suites` — reference tls_classification.py:142-163: strip
the ``0x`` prefix, split into 4-hex-char suite codes, swap the two byte
pairs inside each code (wire order → registry order), drop the all-zero
code, join with ','. Re-expressed as pure Column ops (regexp + higher-order
array functions), no UDF.

C10 classification — reference tls_classification.py:44-73 loaded a CSV
into a broadcast dict; here the dimension is a small DataFrame and the
lookup is a broadcast hash join (S6/J1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def format_cipher_suites(suites: Column) -> Column:
    """'0x2bc01301' → 'c02b,0113' (byte-pair swap per 4-char group,
    all-zero groups dropped).

    Pure substring arithmetic — a regexp_extract_all formulation was ~5×
    slower per row (regex engine per value vs codegen'd substr). Note
    ``sequence(1, 0)`` counts DOWN in Spark, so the group index range is
    guarded for strings shorter than one 4-char group."""
    hexstr = F.lower(
        F.when(
            suites.startswith("0x"),
            suites.substr(F.lit(3), F.length(suites)),
        ).otherwise(suites)
    )
    n = (F.length(hexstr) / 4).cast("int")
    idx = F.when(n > 0, F.sequence(F.lit(1), F.greatest(n, F.lit(1)))).otherwise(
        F.array().cast("array<int>")
    )
    groups = F.transform(idx, lambda i: hexstr.substr((i - 1) * 4 + 1, F.lit(4)))
    swapped = F.transform(
        groups, lambda g: F.concat(F.substring(g, 3, 2), F.substring(g, 1, 2))
    )
    kept = F.filter(swapped, lambda g: g != "0000")
    return F.array_join(kept, ",")


#: Registry-order suite code → (device_type, operating_system, application,
#: browser). A deliberately small deterministic dimension; a production
#: deployment swaps in the full CSV (reference
#: tls_classification_dictionary.csv) via `tls_dimension_from_csv`.
TLS_DICT_ROWS: list[tuple[str, str, str, str, str]] = [
    ("c02b", "Desktop", "Linux", "Web browser", "Firefox"),
    ("c02f,0113", "Desktop", "Windows", "Web browser", "Chrome"),
    ("1314", "Mobile", "Android", "Application", "Unknown"),
]

TLS_DIM_SCHEMA = (
    "suites string, device_type string, operating_system string, "
    "application string, browser string"
)


def tls_dimension(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TLS_DICT_ROWS, TLS_DIM_SCHEMA)


def tls_dimension_from_csv(spark: SparkSession, path: str) -> DataFrame:
    """Load the reference-format ';'-separated dictionary CSV (S5)."""
    df = spark.read.option("header", True).option("sep", ";").csv(path)
    return df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])


def classify(formatted: DataFrame, dim: DataFrame, on: str = "suites") -> DataFrame:
    """Broadcast-join classification; unmatched rows keep NULL attributes
    (counted as 'Unknown' downstream, reference tls_classification.py:110-134)."""
    return formatted.join(F.broadcast(dim), on=on, how="left")
