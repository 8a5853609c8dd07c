"""User-defined function surface: Arrow-vectorized pandas UDFs as the
engine's extension point (the Spark analog of the reference's
ValueTransformer/Processor extension API for stateless per-record
logic, KStreamDistinct.java:42 / KStreamDistinct_example.java:39).

Policy (enforced by example here): row-at-a-time Python UDFs are
forbidden in the hot path — every UDF is a @pandas_udf over Arrow
batches (10-100× the row-at-a-time throughput), and anything
expressible with built-in expressions should be an expression instead
(JVM-side, codegen, pushdown-friendly). UDFs exist for logic Catalyst
can't express: model calls, codec libraries, bespoke numerics.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

# NOTE: return types are concrete DataType objects, not DDL strings —
# a DDL string makes the @pandas_udf decorator parse it at module
# import, which requires an ACTIVE SparkSession and breaks any import
# that happens before session creation.


@pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalizer: lowercase, trim, collapse internal
    whitespace — the canonical pre-fingerprint cleanup. (Expressible as
    expressions too; kept as the minimal real pandas-UDF example and
    registered for SQL use.)"""
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


@pandas_udf(DoubleType())
def byte_entropy(s: pd.Series) -> pd.Series:
    """Shannon entropy of each string's bytes — a quality signal that
    genuinely needs numpy (histogram + log), i.e. a UDF with a reason
    to exist."""
    import numpy as np

    def one(x: str) -> float:
        if not x:
            return 0.0
        counts = np.bincount(np.frombuffer(x.encode(), dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / counts.sum()
        return float(-(p * np.log2(p)).sum())

    return s.map(one)


def make_term_counts_udtf():
    """Python UDTF (table function): one input row → (term, n) rows of
    per-document token counts. The UDTF API is the third extension tier
    next to pandas UDFs (scalar) and applyInPandasWithState (stateful):
    arbitrary row→rows expansion driven from SQL via LATERAL. Tokenizer
    matches functions.text.tokenize's [a-z0-9]+ contract, so the output
    is oracle-checkable against unnest+GROUP BY.

    Built lazily (decorator applied inside the function) so importing
    this module never needs an active session.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    @udtf(
        returnType=StructType(
            [StructField("term", StringType()), StructField("n", LongType())]
        ),
        # Arrow-batched I/O, same policy as every pandas UDF here: the
        # pickle row path is the slow tier and stays out of hot paths
        useArrow=True,
    )
    class TermCounts:
        def __init__(self):
            # bind once per worker instance: eval() runs per row, and
            # re-resolving re.findall + the pattern cache lookup per
            # document is measurable at corpus scale
            import re
            from collections import Counter

            self._findall = re.compile("[a-z0-9]+").findall
            self._counter = Counter

        def eval(self, text: str):
            if text:
                for term, n in self._counter(self._findall(text.lower())).items():
                    yield term, n

    return TermCounts


def register_udfs(spark: SparkSession) -> None:
    """Expose the UDF/UDTF library to the SQL surface."""
    spark.udf.register("normalize_text", normalize_text)
    spark.udf.register("byte_entropy", byte_entropy)
    spark.udtf.register("term_counts", make_term_counts_udtf())
