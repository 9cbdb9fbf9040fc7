"""Arrow-vectorized pandas UDFs wrapping the pure extraction core.

One UDF does the whole T1→T4/T13/T14 dispatch per batch (SURVEY §2.4):
the per-format parsers are pure functions, so a single struct-returning
UDF avoids N separate Python round-trips per row. Batch size is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so a batch
of ~100KB payloads stays in memory comfortably.

No state is shared across batches — determinism across partitioning /
resume boundaries is by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions.extractors import extract

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
        ]
    )
)

EXTRACT_TYPE = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("extracted", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("error", T.StringType()),
    ]
)


def make_extract_udf(settings: ExtractSettings):
    """Build the dispatch+extract pandas UDF for a settings snapshot.

    Settings are captured by value in the closure (serialized once to each
    executor) — the per-job parser isolation analog of
    TikaInstance.java:66-117.
    """
    limit = settings.indexed_chars
    pct = settings.indexed_chars_percent

    @F.pandas_udf(EXTRACT_TYPE)
    def extract_udf(text: pd.Series) -> pd.DataFrame:
        mimes: list[str] = []
        extracted: list[str | None] = []
        spans: list[list[dict] | None] = []
        errors: list[str | None] = []
        for t in text:
            if t is not None and not isinstance(t, str):
                t = str(t)
            lim = limit
            if pct is not None and t is not None:
                import math

                lim = math.ceil(len(t) * pct)
            r = extract(t, lim)
            mimes.append(r.mime)
            extracted.append(r.extracted)
            spans.append([{"start": s, "end": e} for s, e in r.spans])
            errors.append(r.error)
        return pd.DataFrame(
            {"mime": mimes, "extracted": extracted, "spans": spans, "error": errors}
        )

    return extract_udf
