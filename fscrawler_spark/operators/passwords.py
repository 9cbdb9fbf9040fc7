"""T6 — encrypted-document password retry.

Reference: TikaDocParser.java:522-578 — when a parse yields ENCRYPTED,
ask the password-provider SPI for candidate passwords and re-parse until
one works (plugins password-{static,disk,chained,noop}).

Spark shape: encrypted turns are a dispatch BRANCH, not a retry loop in
the hot path. The (tiny) password table broadcasts; decryption + re-
extraction happens in a second Arrow UDF over only the encrypted subset,
with bounded candidates per conv. Our synthetic 'encryption' is the
'ENC:' || payload marker; a password p 'decrypts' iff
sha256(p)[:8] == payload prefix — stands in for real crypto while keeping
the dataflow (branch, broadcast join, bounded retry, re-extract) real.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.config import ExtractSettings
from fscrawler_spark.functions.extractors import extract
from fscrawler_spark.functions.udfs import EXTRACT_TYPE


def encrypt_payload(password: str, plaintext: str) -> str:
    """Deterministic fake 'encryption' used by fixtures: key-tag + reversed
    text (reversible, clearly not real crypto)."""
    tag = hashlib.sha256(password.encode()).hexdigest()[:8]
    return f"ENC:{tag}:{plaintext[::-1]}"


def make_decrypt_udf(settings: ExtractSettings):
    limit = settings.indexed_chars

    @F.arrow_udf(EXTRACT_TYPE)
    def decrypt_udf(text: pa.Array, candidates: pa.Array) -> pa.Array:
        mimes, extracted, errors, titles = [], [], [], []
        packed: list[int] = []
        offsets = [0]
        n = 0
        for t, cands in zip(text.to_pylist(), candidates.to_pylist()):
            plain = None
            if t and t.startswith("ENC:") and t.count(":") >= 2:
                tag = t.split(":", 2)[1]
                for p in cands or []:
                    if hashlib.sha256(p.encode()).hexdigest()[:8] == tag:
                        plain = t.split(":", 2)[2][::-1]
                        break
            if plain is None:
                r = extract(t, limit)  # stays encrypted -> (None, 'encrypted')
            else:
                r = extract(plain, limit)
            mimes.append(r.mime)
            extracted.append(r.extracted)
            errors.append(r.error)
            titles.append(r.title)
            for s, e in r.spans:
                packed.append((s << 32) | e)
            n += len(r.spans)
            offsets.append(n)
        spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(packed, pa.int64()))
        return pa.StructArray.from_arrays(
            [
                pa.array(mimes, pa.string()),
                pa.array(extracted, pa.string()),
                spans,
                pa.array(errors, pa.string()),
                pa.array(titles, pa.string()),
                pa.array([None] * len(titles), pa.map_(pa.string(), pa.string())),
            ],
            ["mime", "extracted", "spans", "error", "title", "raw"],
        )

    return decrypt_udf


def retry_encrypted(
    docs: DataFrame,
    src: DataFrame,
    passwords: DataFrame,
    settings: ExtractSettings | None = None,
) -> DataFrame:
    """Re-extract turns that failed with error='encrypted' using per-conv
    password candidates; leave everything else untouched.

    docs: extraction output (needs conv_id, turn_idx, error columns).
    src:  the raw input (conv_id, turn_idx, text).
    passwords: (conv_id, passwords: array<string>) — broadcast side.
    """
    settings = settings or ExtractSettings()
    enc = docs.filter(F.col("error") == "encrypted").select("conv_id", "turn_idx")
    if not enc.head(1):
        return docs
    udf = make_decrypt_udf(settings)
    retried = (
        enc.join(src, ["conv_id", "turn_idx"])
        .join(F.broadcast(passwords), "conv_id", "left")
        .withColumn("ex", udf(F.col("text"), F.coalesce(F.col("passwords"), F.array())))
        .select(
            "conv_id",
            "turn_idx",
            F.col("ex.mime").alias("mime"),
            F.col("ex.extracted").alias("extracted"),
            F.col("ex.spans").alias("spans"),
            F.col("ex.error").alias("error"),
        )
    )
    keep_cols = ["mime", "extracted", "spans", "error"]
    others = docs.filter((F.col("error").isNull()) | (F.col("error") != "encrypted"))
    patched = (
        docs.filter(F.col("error") == "encrypted")
        .drop(*keep_cols)
        .join(retried, ["conv_id", "turn_idx"])
        .select(*docs.columns)
    )
    return others.unionByName(patched)
