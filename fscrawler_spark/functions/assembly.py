"""Transcript assembly for training-data prep: stitch per-turn rows into
conversation-level training documents and (prompt, response) SFT
examples.

The input is the transcript shape itself — (conv_id, turn_idx, role,
text) — and the unit of training text is the conversation, not the
turn. The reference's analog is its folder rollup (one summary document
per directory, FsParser.java:214-260 / FsCrawlerDocumentService); here
the rollup concatenates the turns' text under a role template instead of
just counting them (stats.conversation_summary keeps the counting role).

Both operators are pure DataFrame compositions — no Python anywhere.
The role template lowers to concat() inside whole-stage codegen, turn
ordering comes from sort_array over (turn_idx, rendered) structs or a
per-conversation window, and the ONLY exchange is the one hash shuffle
on conv_id that the grouping key demands. Ordering is stable because
(conv_id, turn_idx) is the table's identity (BASELINE input_hint), so
output bytes never depend on partitioning or task order — pinned by the
repartition-stability tests.

Scale notes (100 TB): one output row per conversation means a
mega-conversation concentrates its whole text on one row — ``max_turns``
is the production cap for that (same knob family as
curation.pack_sequences' ``max_group_rows``); the skewed GROUP BY itself
is AQE skew-join territory, and the collected struct carries exactly
(turn_idx, rendered) so the exchange never ships columns the operator
does not read. ``sft_examples`` with a bounded ``context_turns`` keeps
per-row work O(context) rather than O(conversation prefix) — unbounded
context on a 10^6-turn conversation would build O(n^2) characters, so
production callers should always bound it (the default mirrors a model
context window, not the whole conversation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# role template: "<|{role}|>\n{text}" — the neutral chat-markup shape;
# kept as plain concat pieces so it stays inside codegen
ROLE_OPEN = "<|"
ROLE_CLOSE = "|>\n"
TURN_SEP = "\n"


def _rendered(role_col, text_col, tool_col=None) -> F.Column:
    """One turn rendered under the role template, NULL-safe on both
    sides (a NULL role or text renders as empty, never poisons the
    concat into NULL — DuckDB's string_agg would silently drop a NULL
    element and the engines would desynchronize). With ``tool_col``,
    tool-call turns render a ``tool=`` attribute in the header —
    ``<|assistant tool=search|>`` — so agent-training data keeps the
    tool dispatch visible; NULL tool renders the plain header."""
    if tool_col is not None:
        header = F.concat(
            F.coalesce(role_col, F.lit("")),
            F.when(tool_col.isNull(), F.lit("")).otherwise(
                F.concat(F.lit(" tool="), tool_col)
            ),
        )
    else:
        header = F.coalesce(role_col, F.lit(""))
    return F.concat(
        F.lit(ROLE_OPEN),
        header,
        F.lit(ROLE_CLOSE),
        F.coalesce(text_col, F.lit("")),
    )


def assemble_conversations(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str | None = None,
    sep: str = TURN_SEP,
    max_turns: int | None = None,
    spans_role: str | None = None,
) -> DataFrame:
    """Concatenate each conversation's turns, in stable turn order, into
    ONE training document: ``<|role|>\\ntext`` per turn joined by
    ``sep``. Returns (conv_col, doc, n_turns, n_chars).

    ``max_turns``: keep only the FIRST ``max_turns`` turns of each
    conversation (document truncation — the bound that keeps a
    mega-conversation from concentrating unbounded text on one row).
    ``n_turns`` counts the turns KEPT, not the raw turns.

    ``spans_role``: additionally emit ``train_spans`` — [start, end)
    char offsets into ``doc`` covering the TEXT region (header
    excluded, separator excluded) of every kept turn whose role equals
    ``spans_role``. This is the loss mask an SFT trainer needs over the
    assembled representation: train on the assistant's text, mask the
    prompt/tool turns and the role markup — without re-tokenizing or
    re-finding the regions downstream. Slicing ``doc`` at each span
    reproduces the turn's text exactly (the pinned invariant); offsets
    count Unicode code points (both Spark's length() and Python's len
    agree, astral chars included). Computed by ONE fold over the same
    sorted struct array the doc itself is built from — same single
    Exchange, per-row cost O(n_turns), zero when unset.

    Plan shape: slim projection -> map-side render (codegen) -> one
    hash Exchange on conv_col -> sort_array over (idx, rendered)
    structs -> array_join. No global Sort, no Python.
    """
    if max_turns is not None and max_turns < 1:
        raise ValueError(f"max_turns must be >= 1, got {max_turns}")
    with_spans = spans_role is not None
    slim = turns.select(
        F.col(conv_col),
        F.col(idx_col).alias("_i"),
        _rendered(
            F.col(role_col),
            F.col(text_col),
            F.col(tool_col) if tool_col is not None else None,
        ).alias("_r"),
        *(
            []
            if not with_spans
            else [
                (
                    F.length(
                        _rendered(
                            F.col(role_col),
                            F.col(text_col),
                            F.col(tool_col) if tool_col is not None else None,
                        )
                    )
                    - F.length(F.coalesce(F.col(text_col), F.lit("")))
                ).alias("_hl"),
                F.coalesce(
                    F.col(role_col) == F.lit(spans_role), F.lit(False)
                ).alias("_m"),
            ]
        ),
    )
    if max_turns is not None:
        # bound the aggregation BUFFER, not just the output: drop past-cap
        # turns with a partition-local row_number BEFORE collect_list, so
        # a mega-conversation never accumulates (then discards) its whole
        # text in one ObjectHashAggregate buffer. The window shares the
        # groupBy's hashpartitioning(conv_col), so this is still ONE
        # Exchange (plan-pinned). Tie-break on the rendered text too —
        # the uncapped path's sort_array orders (_i, _r) structs, and a
        # duplicate turn_idx at the cap boundary must not make which row
        # survives depend on partitioning (output-bytes stability).
        w = Window.partitionBy(conv_col).orderBy("_i", "_r")
        slim = (
            slim.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_turns)
            .drop("_rn")
        )
    # extra span fields ride BEHIND (_i, _r) in the struct, so sort_array
    # still orders by (_i, _r) first — they only break ties between rows
    # whose (_i, _r) are already identical, where they are functionally
    # determined by _r anyway (output-bytes stability preserved)
    fields = ["_i", "_r"] + (["_hl", "_m"] if with_spans else [])
    arr = F.sort_array(F.collect_list(F.struct(*fields)))
    agg = slim.groupBy(conv_col).agg(arr.alias("_turns"))
    doc = F.array_join(F.transform("_turns", lambda t: t["_r"]), sep)
    out = [
        conv_col,
        doc.alias("doc"),
        F.size("_turns").cast("long").alias("n_turns"),
        F.length(doc).cast("long").alias("n_chars"),
    ]
    if with_spans:
        # one fold over the SAME sorted array the doc is built from:
        # walk the turns accumulating the cursor (rendered length + sep)
        # and emit [cursor + header_len, cursor + rendered_len) for
        # matching turns — the text region, header and separator excluded
        sep_len = len(sep)
        spans = F.aggregate(
            "_turns",
            F.struct(
                F.lit(0).cast("bigint").alias("pos"),
                F.array().cast("array<struct<start:bigint,end:bigint>>").alias("sp"),
            ),
            lambda acc, t: F.struct(
                (acc["pos"] + F.length(t["_r"]) + F.lit(sep_len))
                .cast("bigint")
                .alias("pos"),
                F.when(
                    t["_m"],
                    F.concat(
                        acc["sp"],
                        F.array(
                            F.struct(
                                (acc["pos"] + t["_hl"]).cast("bigint").alias("start"),
                                (acc["pos"] + F.length(t["_r"]))
                                .cast("bigint")
                                .alias("end"),
                            )
                        ),
                    ),
                )
                .otherwise(acc["sp"])
                .alias("sp"),
            ),
            lambda acc: acc["sp"],
        )
        out.append(spans.alias("train_spans"))
    return agg.select(*out)


def sft_examples(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str | None = None,
    target_role: str = "assistant",
    context_turns: int | None = 8,
    sep: str = TURN_SEP,
    require_context: bool = True,
    max_unbounded_context: int = 10_000,
) -> DataFrame:
    """One (prompt, response) SFT example per ``target_role`` turn: the
    prompt is the rendered concatenation of the preceding turns (all of
    them, or the last ``context_turns`` — a model-context-window bound),
    the response is that turn's raw text. Returns
    (conv_col, idx_col, prompt, response).

    ``require_context=True`` drops target turns with no preceding
    context (a response with an empty prompt teaches nothing).

    Plan shape: slim projection -> one hash Exchange on conv_col ->
    partition-local sort on idx -> window collect_list over the bounded
    frame -> codegen filter. The frame bound makes per-row prompt cost
    O(context_turns); ``context_turns=None`` is exact-prefix semantics —
    O(n^2) characters per conversation, so it is guarded: a target turn
    whose prefix exceeds ``max_unbounded_context`` turns fails the job
    loudly (per-row codegen comparison over the same window buffer, ~free)
    instead of silently rendering a gigabyte prompt on one executor — the
    same validated-knob contract as export.py's curriculum-stage guard.
    Raise the limit deliberately if a mega-conversation prefix is truly
    intended; with a bounded ``context_turns`` the guard is inactive.
    """
    if context_turns is not None and context_turns < 1:
        raise ValueError(f"context_turns must be >= 1, got {context_turns}")
    if max_unbounded_context < 1:
        raise ValueError(
            f"max_unbounded_context must be >= 1, got {max_unbounded_context}"
        )
    lo = Window.unboundedPreceding if context_turns is None else -context_turns
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(lo, -1)
    )
    slim = turns.select(
        F.col(conv_col),
        F.col(idx_col),
        F.col(role_col).alias("_role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_text"),
        *([F.col(tool_col).alias("_tool")] if tool_col is not None else []),
    )
    prompt = F.array_join(
        F.collect_list(
            _rendered(
                F.col("_role"),
                F.col("_text"),
                F.col("_tool") if tool_col is not None else None,
            )
        ).over(w),
        sep,
    )
    if context_turns is None:
        nprev = F.count(F.lit(1)).over(w)
        # the raise must fire ONLY for rows that become examples: the
        # target-role filter sits above this projection and Catalyst is
        # not guaranteed to push it below the Window, so an unguarded
        # raise would fail the job on a NON-target turn whose prefix is
        # long (e.g. the user turn after 10k assistant turns) even though
        # every emitted example is within the bound — exactly what the
        # docstring promises cannot happen. Non-target overflow rows get
        # an empty prompt (dropped by the filter either way). eqNullSafe:
        # role is nullable, and a plain != is NULL (not true) for a
        # NULL-role turn — it would fall through to the raise even though
        # the downstream target-role filter drops that row too.
        prompt = (
            F.when(nprev <= max_unbounded_context, prompt)
            .when(~F.col("_role").eqNullSafe(F.lit(target_role)), F.lit(""))
            .otherwise(
                F.raise_error(
                F.concat(
                    F.lit(
                        "sft_examples(context_turns=None): prefix of "
                    ),
                    nprev.cast("string"),
                    F.lit(
                        f" turns exceeds max_unbounded_context={max_unbounded_context}"
                        " — bound context_turns or raise the limit deliberately"
                    ),
                    )
                )
            )
        )
    out = slim.select(
        conv_col,
        idx_col,
        "_role",
        prompt.alias("prompt"),
        F.col("_text").alias("response"),
    ).filter(F.col("_role") == target_role)
    if require_context:
        out = out.filter(F.length("prompt") > 0)
    return out.drop("_role")


def preference_pairs(
    examples: DataFrame,
    *,
    prompt_col: str = "prompt",
    response_col: str = "response",
    score=None,
    min_margin: float = 0.0,
) -> DataFrame:
    """(prompt, chosen, rejected) preference pairs for DPO/RM training:
    group (prompt, response) examples by IDENTICAL prompt and pick the
    best- and worst-scored distinct responses as chosen/rejected.
    Returns (prompt, chosen, rejected, chosen_score, rejected_score,
    n_candidates); groups whose best and worst response coincide (a
    single distinct response, or all responses byte-equal) emit nothing
    — a pair that teaches no preference is not a pair.

    ``score`` is a Column over the response text (default
    ``text_analysis.quality_score``); rows whose score is NULL are
    dropped before pairing (an unscorable response can be neither chosen
    nor rejected). ``min_margin`` keeps only pairs whose score gap is
    >= the margin — the knob that trades pair count for label
    confidence. Ties on score break on the response bytes (struct
    lexicographic order), so the output is deterministic under any
    partitioning.

    Plan shape: codegen score projection -> ONE Exchange keyed on a
    16-byte md5 digest of the prompt -> partial-combining aggregate.
    Chosen/rejected are lexicographic max/min over (score, response)
    structs — struct buffers aren't hash-map eligible, so Spark lowers
    this to SortAggregate; grouping on the digest instead of the raw
    prompt keeps that sort prefix-decisive (random 8-byte prefixes)
    rather than comparing long, common-prefix prompt strings, and the
    exchange key is 16 bytes regardless of prompt length. Both sides
    partial-aggregate, so a skewed mega-prompt (the "hi" of preference
    data) combines map-side and never concentrates its group in one
    buffer, unlike a collect_list/row_number formulation. The prompt
    itself is recovered as min(prompt) — every member of a group is
    byte-identical by construction (an md5 collision merging two
    distinct prompts is cryptographically negligible). No Python, no
    window, no second shuffle.

    Upstream of this, "identical prompt" is the caller's contract:
    route near-identical prompts through normalize/near-dup first, or
    feed a cluster id as ``prompt_col``. Reference analog: the
    reference dedups by path identity (FsParser checksum loop); pairing
    by prompt identity is the training-data counterpart.
    """
    from .text_analysis import quality_score

    resp = F.col(response_col)
    s = (score if score is not None else quality_score(resp)).cast("double")
    scored = examples.select(
        # NULL prompt digests to NULL, so NULL prompts still form one
        # group exactly as a raw-prompt groupBy would
        F.unhex(F.md5(F.col(prompt_col))).alias("_pk"),
        F.col(prompt_col).alias("prompt"),
        F.struct(s.alias("s"), resp.alias("r")).alias("_sr"),
    ).filter(F.col("_sr.s").isNotNull() & F.col("_sr.r").isNotNull())
    agg = scored.groupBy("_pk").agg(
        F.min("prompt").alias("prompt"),
        F.max("_sr").alias("_hi"),
        F.min("_sr").alias("_lo"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return (
        agg.filter(
            (F.col("_hi.r") != F.col("_lo.r"))
            & (F.col("_hi.s") - F.col("_lo.s") >= F.lit(float(min_margin)))
        )
        .select(
            "prompt",
            F.col("_hi.r").alias("chosen"),
            F.col("_lo.r").alias("rejected"),
            F.col("_hi.s").alias("chosen_score"),
            F.col("_lo.s").alias("rejected_score"),
            "n_candidates",
        )
    )
