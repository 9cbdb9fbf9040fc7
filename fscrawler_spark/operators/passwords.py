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
    from fscrawler_spark.functions.udfs import build_extract_batch, limit_for

    def _one(t: str | None, cands) -> tuple[str | None, "object"]:
        plain = None
        if t and t.startswith("ENC:") and t.count(":") >= 2:
            tag = t.split(":", 2)[1]
            for p in cands or []:
                if hashlib.sha256(p.encode()).hexdigest()[:8] == tag:
                    plain = t.split(":", 2)[2][::-1]
                    break
        if plain is None:
            # stays encrypted -> (None, 'encrypted')
            return t, extract(t, limit_for(settings, t))
        return plain, extract(plain, limit_for(settings, plain))

    @F.arrow_udf(EXTRACT_TYPE)
    def decrypt_udf(text: pa.Array, candidates: pa.Array) -> pa.Array:
        return build_extract_batch(
            (_one(t, c) for t, c in zip(text.to_pylist(), candidates.to_pylist())),
            settings,
        )

    return decrypt_udf


# ---------------------------------------------------------------------------
# Password provider SPI — plugins/password-{static,disk,chained,noop}
# (FsCrawlerExtensionPasswordProvider; chained session semantics in
# PasswordChainedPlugin.java: providers consulted IN ORDER, each one's
# candidates exhausted before the next, nested 'chained' rejected).
# A provider yields the candidate table (conv_id, passwords array<string>)
# that retry_encrypted broadcasts; candidate ORDER in the array is the
# order the decrypt UDF attempts them.
# ---------------------------------------------------------------------------


class PasswordProvider:
    """SPI: build the per-conversation candidate table. ``convs`` is the
    conversation universe (a DataFrame with a conv_id column) so global
    providers can enumerate it."""

    def candidates(self, convs: DataFrame) -> DataFrame:
        raise NotImplementedError


class NoopPasswordProvider(PasswordProvider):
    """password-noop-plugin analog: never yields a candidate."""

    def candidates(self, convs: DataFrame) -> DataFrame:
        return convs.select("conv_id").distinct().withColumn(
            "passwords", F.array().cast("array<string>")
        )


class StaticPasswordProvider(PasswordProvider):
    """password-static-plugin analog: fixed candidates from config —
    a global list (every conversation) and/or a per-conv mapping."""

    def __init__(
        self,
        passwords: list[str] | None = None,
        per_conv: dict[str, list[str]] | None = None,
    ):
        self.passwords = list(passwords or [])
        self.per_conv = dict(per_conv or {})

    def candidates(self, convs: DataFrame) -> DataFrame:
        base = convs.select("conv_id").distinct()
        glob = F.array(*[F.lit(p) for p in self.passwords]).cast("array<string>")
        if not self.per_conv:
            return base.withColumn("passwords", glob)
        spark = convs.sparkSession
        mapping = spark.createDataFrame(
            [(k, list(v)) for k, v in self.per_conv.items()],
            "conv_id string, _pc array<string>",
        )
        return (
            base.join(F.broadcast(mapping), "conv_id", "left")
            .withColumn(
                "passwords",
                F.concat(F.coalesce(F.col("_pc"), F.array().cast("array<string>")), glob),
            )
            .drop("_pc")
        )


class DiskPasswordProvider(PasswordProvider):
    """password-disk-plugin analog: sidecar password files on disk —
    ``<root>/<conv_id>.password``, one candidate per line (the reference
    reads a '.password' sidecar next to each document). Files are tiny
    and read driver-side; the result broadcasts like any candidate table.
    """

    SIDECAR_SUFFIX = ".password"

    def __init__(self, root: str):
        self.root = root

    def candidates(self, convs: DataFrame) -> DataFrame:
        import os

        rows = []
        if os.path.isdir(self.root):
            # RECURSIVE walk: conv_ids are virtual paths elsewhere
            # (include/exclude globs match '/' segments), so the sidecar
            # for conv 'teamA/conv1' lives at <root>/teamA/conv1.password
            # — a flat listdir could never see it
            sidecars = []
            for dirpath, dirnames, files in os.walk(self.root):
                dirnames.sort()
                for name in sorted(files):
                    if name.endswith(self.SIDECAR_SUFFIX):
                        sidecars.append(os.path.join(dirpath, name))
            for path in sidecars:
                rel = os.path.relpath(path, self.root)
                conv_id = rel[: -len(self.SIDECAR_SUFFIX)].replace(os.sep, "/")
                with open(path) as f:
                    # text-mode open already normalizes CRLF to \n
                    # (universal newlines); rstrip covers \r anyway so a
                    # future newline=''/binary reader can't regress this
                    pws = [ln.rstrip("\r\n") for ln in f if ln.strip()]
                if pws:
                    rows.append((conv_id, pws))
        spark = convs.sparkSession
        base = convs.select("conv_id").distinct()
        if not rows:
            return base.withColumn("passwords", F.array().cast("array<string>"))
        found = spark.createDataFrame(rows, "conv_id string, passwords array<string>")
        return base.join(F.broadcast(found), "conv_id", "left").withColumn(
            "passwords", F.coalesce(F.col("passwords"), F.array().cast("array<string>"))
        )


class ChainedPasswordProvider(PasswordProvider):
    """password-chained-plugin analog: consult providers IN ORDER; an
    earlier provider's candidates are attempted before a later one's
    (the decrypt UDF walks the array left to right). Duplicates keep
    their FIRST position (array_distinct preserves first occurrence).
    Nesting a chained provider is rejected, like the reference's
    'providers cannot contain [chained]' validation."""

    def __init__(self, providers: list[PasswordProvider]):
        if not providers:
            raise ValueError("ChainedPasswordProvider requires at least one provider")
        if any(isinstance(p, ChainedPasswordProvider) for p in providers):
            raise ValueError("chained password providers cannot nest a chained provider")
        self.providers = list(providers)

    def candidates(self, convs: DataFrame) -> DataFrame:
        out = None
        for p in self.providers:
            nxt = p.candidates(convs).withColumnsRenamed({"passwords": "_nxt"})
            if out is None:
                out = nxt.withColumnsRenamed({"_nxt": "passwords"})
            else:
                out = (
                    out.join(nxt, "conv_id", "full")
                    .withColumn(
                        "passwords",
                        F.concat(
                            F.coalesce(F.col("passwords"), F.array().cast("array<string>")),
                            F.coalesce(F.col("_nxt"), F.array().cast("array<string>")),
                        ),
                    )
                    .drop("_nxt")
                )
        return out.withColumn("passwords", F.array_distinct("passwords"))


def passwords_for_encrypted(provider: "PasswordProvider", docs: DataFrame) -> DataFrame:
    """Build the candidate table over ONLY conversations that still hold
    encrypted turns. Providers enumerate (and Static fan-outs per-conv
    rows over) whatever universe they receive, and retry_encrypted
    broadcasts the result — passing the full corpus universe makes that
    broadcast corpus-conversation-sized. This keeps it genuinely tiny:
    candidates for the rows the retry can actually fix."""
    enc_convs = (
        docs.filter(F.col("error") == "encrypted").select("conv_id").distinct()
    )
    return provider.candidates(enc_convs)


def retry_encrypted(
    docs: DataFrame,
    src: DataFrame,
    passwords: DataFrame,
    settings: ExtractSettings,
) -> DataFrame:
    """Re-extract turns that failed with error='encrypted' using per-conv
    password candidates; leave everything else untouched.

    docs: extraction output (needs conv_id, turn_idx, error columns).
    src:  the raw input (conv_id, turn_idx, text).
    passwords: (conv_id, passwords: array<string>) — broadcast side.
    settings: REQUIRED, and must be the settings ``docs`` was extracted
    with — a defaulted ExtractSettings() here would silently re-extract
    the decrypted rows without parse_object/lang_detect/raw_metadata,
    leaving exactly those rows unenriched. The object-column guard below
    catches the detectable half of that mismatch.
    """
    if ("object" in docs.columns) != settings.parse_object:
        raise ValueError(
            f"settings.parse_object={settings.parse_object} but docs "
            f"{'carries' if 'object' in docs.columns else 'lacks'} an "
            "'object' column — pass the SAME settings the table was "
            "extracted with"
        )
    # NOTE: fully lazy — no action is triggered here. An earlier version
    # ran enc.head(1) to short-circuit the no-encrypted-rows case, which
    # executed the whole upstream extraction plan once (and the union
    # branches re-executed it twice more). An empty join is cheap; in the
    # job flow this runs over the already-materialized output table, so
    # the branches share one parquet scan. Pinned by
    # test_retry_encrypted_is_lazy.
    enc = docs.filter(F.col("error") == "encrypted").select("conv_id", "turn_idx")
    udf = make_decrypt_udf(settings)
    retried = (
        enc.join(src, ["conv_id", "turn_idx"])
        .join(F.broadcast(passwords), "conv_id", "left")
        .withColumn("ex", udf(F.col("text"), F.coalesce(F.col("passwords"), F.array())))
        .select(
            "conv_id",
            "turn_idx",
            F.col("ex.mime").alias("mime"),
            # metadata-only tables stay metadata-only: the decrypted
            # content must not leak where index_content=False nulled it
            (
                F.col("ex.extracted") if settings.index_content
                else F.lit(None).cast("string")
            ).alias("extracted"),
            (
                F.col("ex.spans") if settings.index_content
                else F.array().cast("array<bigint>")
            ).alias("spans"),
            F.col("ex.error").alias("error"),
            F.col("ex.title").alias("_new_title"),
            F.col("ex.raw").alias("_new_raw"),
            F.col("ex.object").alias("_new_object"),
        )
    )
    keep_cols = ["mime", "extracted", "spans", "error"]
    others = docs.filter((F.col("error").isNull()) | (F.col("error") != "encrypted"))
    patched = (
        docs.filter(F.col("error") == "encrypted")
        .drop(*keep_cols)
        .join(retried, ["conv_id", "turn_idx"])
    )
    if "object" in docs.columns:
        # the object map must describe the decrypted payload
        patched = patched.withColumn("object", F.col("_new_object"))
    if "meta" in docs.columns:
        # meta must describe the DECRYPTED content, not the sealed payload
        if settings.lang_detect:
            from fscrawler_spark.functions.text_analysis import langid_udf

            language = (
                F.when(F.col("extracted").isNotNull(), langid_udf()(F.col("extracted")))
                .otherwise(F.lit(None).cast("string"))
                .alias("language")
            )
        else:
            language = F.lit(None).cast("string").alias("language")
        patched = patched.withColumn(
            "meta",
            F.struct(
                F.col("_new_title").alias("title"),
                language,
                F.col("mime").alias("format"),
                F.col("_new_raw").alias("raw"),
            ),
        )
    patched = patched.select(*docs.columns)
    return others.unionByName(patched)
