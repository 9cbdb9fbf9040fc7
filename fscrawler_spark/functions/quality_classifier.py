"""Learned quality filtering: a hashed-bag-of-ngrams multinomial Naive
Bayes classifier trained on labeled seed sets (positive = "looks like
the data I want", negative = "looks like junk"), the distributed
re-derivation of the fastText-style filters used to curate LLaMA / CCNet
/ FineWeb-Edu training corpora (Joulin et al. 2016, arXiv:1607.01759;
Touvron et al. 2023 §2 "classifier trained on Wikipedia-referenced
pages").

Deliberately a thin composition over the DSIR machinery
(mixing.train_importance_model / score_importance) rather than a second
gram pipeline: a multinomial NB log-odds is EXACTLY the DSIR importance
weight with labels — per-bucket ``log p(b|pos) − log p(b|neg)`` summed
over a doc's gram buckets, plus the class-prior log-odds. Everything
scale-shaped about DSIR (one explode + hash-agg per labeled set,
complete bucket space so scoring has no OOV branch, broadcast
model join, one id-keyed agg, all JVM) is inherited, not re-implemented;
so are its determinism and its md5/xxhash64 oracle story.

Seed sets are small by definition (10^3..10^6 labeled examples — a
config-sized input next to the corpus), so training cost is trivial;
the corpus-scale work is the scoring pass, which shuffles once on id
carrying (id, log_ratio) rows only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QualityModel:
    """A trained quality classifier: the per-bucket log-likelihood-ratio
    table (buckets-sized, one row per feature bucket) plus the class
    prior log-odds and the feature params scoring MUST reuse (the model
    is positional — mismatched buckets/ns/hash_family scores against the
    wrong features, same caller's-contract as in mixing)."""

    table: DataFrame
    prior_log_odds: float
    buckets: int
    ns: tuple[int, ...]
    hash_family: str


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    ns: tuple[int, ...] = (1, 2),
    alpha: float = 1.0,
    hash_family: str = "fast",
) -> QualityModel:
    """Train the NB quality model from labeled seed frames. The
    per-bucket table is ``train_importance_model(raw=negative,
    target=positive)`` verbatim (add-``alpha`` smoothed likelihood
    ratios over the complete bucket space); the prior is
    ``log(n_pos / n_neg)`` from the seed counts — two count() jobs over
    the config-sized seed sets (eager, documented: seeds are small;
    never call this with the full corpus as a "seed")."""
    from fscrawler_spark.functions.mixing import train_importance_model

    # count exactly what the gram pipeline will train on: a doc
    # contributes grams only if it has at least min(ns) whitespace words
    # (an n-gram needs n words; _gram_bucket_rows additionally drops
    # blank text). An all-too-short seed set must fail THIS guard, not
    # silently train a zero-mass side; and non-contributing seeds must
    # not inflate the prior without contributing likelihood mass.
    min_n = min(ns)
    has_grams = (F.trim(F.col(text_col)) != "") & (
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")) >= min_n
    )
    n_pos = positive.filter(has_grams).count()
    n_neg = negative.filter(has_grams).count()
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"both seed sets need at least one example with >= {min_n} "
            f"words of non-blank text (got positive={n_pos}, negative={n_neg})"
        )
    import math

    table = train_importance_model(
        raw=negative,
        target=positive,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        ns=ns,
        alpha=alpha,
        hash_family=hash_family,
    )
    return QualityModel(
        table=table,
        prior_log_odds=math.log(n_pos / n_neg),
        buckets=buckets,
        ns=tuple(ns),
        hash_family=hash_family,
    )


def classify_quality(
    df: DataFrame,
    model: QualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """(id, log_odds, keep): per-doc NB log-odds = prior + sum of the
    model's per-bucket log-ratios over the doc's gram buckets;
    ``keep = log_odds > threshold`` (0.0 = the Bayes decision boundary;
    raise it for higher precision, the standard quality-filter knob).

    Gram-less docs (null/empty text) inherit score_importance's neutral
    0.0 likelihood, so they land exactly on the prior — decide them with
    the threshold, or filter empties beforehand with the rule-based
    gates (curation.gopher_quality_flags).

    Shape: score_importance verbatim — explode -> broadcast model join
    -> one id-keyed agg; the corpus shuffles once, on id."""
    from fscrawler_spark.functions.mixing import score_importance

    scored = score_importance(
        df,
        model.table,
        id_col=id_col,
        text_col=text_col,
        buckets=model.buckets,
        ns=model.ns,
        hash_family=model.hash_family,
    )
    log_odds = F.col("log_weight") + F.lit(model.prior_log_odds)
    # score_importance returns the id column as "id"; restore the
    # caller's name so the result joins back to the corpus naturally
    return scored.select(
        F.col("id").alias(id_col),
        log_odds.alias("log_odds"),
        (log_odds > F.lit(threshold)).alias("keep"),
    )
