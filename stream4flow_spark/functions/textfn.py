"""Text scalar functions that genuinely need Python — Pandas UDFs only
(Arrow-batched; never row-at-a-time).

C12 ``element_entropy`` — reference
pattern_finder/spark/modules/vector_definition/element_entropy.py:30-40:
Shannon entropy (log2) of a string's character distribution. No Spark
built-in computes per-string char entropy, so this is one of the few
legitimate UDFs in the engine.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def element_entropy(s: pd.Series) -> pd.Series:
    def ent(x: str | None) -> float | None:
        if x is None:
            return None
        if not x:
            return 0.0
        counts: dict[str, int] = {}
        for ch in x:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(x)
        return -sum((c / n) * math.log2(c / n) for c in counts.values())

    return s.map(ent)
