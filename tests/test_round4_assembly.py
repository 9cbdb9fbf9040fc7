"""Conversation assembly + SFT pair extraction (functions/assembly.py).

Value checks are hand-computed strings and a DuckDB string_agg twin;
plan pins hold the operators to one hash Exchange and zero Python;
repartition-stability pins the stable-turn-order claim (output bytes
independent of partitioning — the north rule's ordering invariant).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from fscrawler_spark.functions.assembly import assemble_conversations, sft_examples

SF = "/root/testdata/sf0.001"

ROWS = [
    ("c1", 1, "user", "hi", None),
    ("c1", 0, "system", "sys", None),
    ("c1", 2, "assistant", "hello!", "search"),
    ("c2", 0, "user", None, None),
    ("c2", 1, "assistant", "resp", None),
    ("c3", 0, "assistant", "lone", None),
]
SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string"


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_assemble_hand_computed(turns):
    got = {r["conv_id"]: r.asDict() for r in assemble_conversations(turns).collect()}
    assert got["c1"]["doc"] == "<|system|>\nsys\n<|user|>\nhi\n<|assistant|>\nhello!"
    assert got["c1"]["n_turns"] == 3
    assert got["c1"]["n_chars"] == len(got["c1"]["doc"])
    # NULL text renders empty, never drops the turn or poisons the doc
    assert got["c2"]["doc"] == "<|user|>\n\n<|assistant|>\nresp"
    assert got["c3"]["doc"] == "<|assistant|>\nlone"


def test_assemble_max_turns_truncates_from_the_front(turns):
    got = {
        r["conv_id"]: r.asDict()
        for r in assemble_conversations(turns, max_turns=2).collect()
    }
    assert got["c1"]["doc"] == "<|system|>\nsys\n<|user|>\nhi"
    assert got["c1"]["n_turns"] == 2  # turns KEPT, not raw turns
    assert got["c3"]["n_turns"] == 1


def test_sft_hand_computed(turns):
    got = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in sft_examples(turns, context_turns=2).collect()
    }
    assert got[("c1", 2)]["prompt"] == "<|system|>\nsys\n<|user|>\nhi"
    assert got[("c1", 2)]["response"] == "hello!"
    assert got[("c2", 1)]["prompt"] == "<|user|>\n"
    # c3's assistant turn has no context -> dropped by require_context
    assert ("c3", 0) not in got
    assert len(got) == 2


def test_sft_context_window_bounds_the_prompt(spark):
    t = spark.createDataFrame(
        [("c", i, "user" if i % 2 == 0 else "assistant", f"t{i}") for i in range(6)],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {
        r["turn_idx"]: r["prompt"]
        for r in sft_examples(t, context_turns=2).collect()
    }
    # turn 5 sees only turns 3 and 4, not the whole prefix
    assert got[5] == "<|assistant|>\nt3\n<|user|>\nt4"
    unbounded = {
        r["turn_idx"]: r["prompt"] for r in sft_examples(t, context_turns=None).collect()
    }
    assert unbounded[5].startswith("<|user|>\nt0\n")
    assert unbounded[5].count("<|") == 5


def test_sft_keep_contextless_and_other_role(turns):
    got = sft_examples(turns, context_turns=2, require_context=False).collect()
    assert ("c3", 0, "", "lone") in {
        (r["conv_id"], r["turn_idx"], r["prompt"], r["response"]) for r in got
    }
    users = sft_examples(turns, target_role="user", context_turns=2).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in users} == {("c1", 1)}


def test_validation_errors(turns):
    with pytest.raises(ValueError, match="max_turns"):
        assemble_conversations(turns, max_turns=0)
    with pytest.raises(ValueError, match="context_turns"):
        sft_examples(turns, context_turns=0)


def test_assembly_duckdb_twin(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    t = d.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        "text",
    )
    sdf = assemble_conversations(t, max_turns=40)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = con.execute("""
        WITH t AS (
          SELECT source AS conv_id, doc_id AS turn_idx,
                 CASE WHEN doc_id % 3 = 0 THEN 'user' ELSE 'assistant' END AS role, text
          FROM documents
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn FROM t
        ),
        a AS (
          SELECT conv_id,
                 string_agg('<|' || role || '|>' || chr(10) || coalesce(text, ''),
                            chr(10) ORDER BY turn_idx) AS doc,
                 count(*)::BIGINT AS n_turns
          FROM ranked WHERE rn <= 40 GROUP BY conv_id
        )
        SELECT conv_id, doc, n_turns, length(doc)::BIGINT AS n_chars FROM a
    """).fetchall()
    got = sorted(tuple(r) for r in sdf.collect())
    assert got == sorted(exp)


def test_plan_one_exchange_no_python(turns):
    # max_turns pre-filters with a window that must SHARE the groupBy's
    # hashpartitioning — the buffer bound may not cost a second Exchange
    for df in (
        assemble_conversations(turns),
        assemble_conversations(turns, max_turns=2),
        sft_examples(turns, context_turns=4),
    ):
        plan = plan_of(df)
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan, plan
        # window/group sort stays partition-local: never a global sort
        assert "global=true" not in plan, plan


def test_partition_stability(spark, turns):
    base_a = sorted(tuple(r) for r in assemble_conversations(turns).collect())
    base_s = sorted(tuple(r) for r in sft_examples(turns, context_turns=2).collect())
    for reshaped in (turns.repartition(7), turns.coalesce(1), turns.repartition(3, "role")):
        assert sorted(tuple(r) for r in assemble_conversations(reshaped).collect()) == base_a
        assert (
            sorted(tuple(r) for r in sft_examples(reshaped, context_turns=2).collect())
            == base_s
        )


# --- property: engine == a trivial Python fold, any input shape ----------------

from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

_texts = st.one_of(st.none(), st.text(max_size=24))
_roles = st.sampled_from(["user", "assistant", "system", "tool"])
_convs = st.lists(
    st.tuples(st.sampled_from(["ca", "cb", "cc"]), _roles, _texts),
    min_size=1,
    max_size=24,
)


def _py_render(role, text):
    return f"<|{role or ''}|>\n{text or ''}"


@hsettings(max_examples=25, deadline=None)
@given(rows=_convs, ctx=st.integers(min_value=1, max_value=4))
def test_assembly_matches_python_fold(spark, rows, ctx):
    # unique (conv, idx): idx = position within its conversation
    seen: dict = {}
    data = []
    for conv, role, text in rows:
        idx = seen.get(conv, 0)
        seen[conv] = idx + 1
        data.append((conv, idx, role, text))
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string"
    ).repartition(5)

    by_conv: dict = {}
    for conv, idx, role, text in data:
        by_conv.setdefault(conv, []).append((idx, role, text))
    exp_docs = {
        c: "\n".join(_py_render(r, t) for _, r, t in sorted(v))
        for c, v in by_conv.items()
    }
    got = {r["conv_id"]: r for r in assemble_conversations(df).collect()}
    assert {c: g["doc"] for c, g in got.items()} == exp_docs
    for c, g in got.items():
        assert g["n_turns"] == len(by_conv[c]) and g["n_chars"] == len(exp_docs[c])

    exp_sft = {}
    for c, v in by_conv.items():
        ordered = sorted(v)
        for i, (idx, role, text) in enumerate(ordered):
            if role != "assistant":
                continue
            prompt = "\n".join(
                _py_render(r, t) for _, r, t in ordered[max(0, i - ctx) : i]
            )
            if prompt:
                exp_sft[(c, idx)] = (prompt, text or "")
    got_sft = {
        (r["conv_id"], r["turn_idx"]): (r["prompt"], r["response"])
        for r in sft_examples(df, context_turns=ctx).collect()
    }
    assert got_sft == exp_sft


def test_tool_rendering(spark):
    t = spark.createDataFrame(
        [
            ("c", 0, "user", "find it", None),
            ("c", 1, "assistant", "searching", "search"),
            ("c", 2, "assistant", "done", None),
        ],
        SCHEMA,
    )
    doc = assemble_conversations(t, tool_col="tool").collect()[0]["doc"]
    assert doc == (
        "<|user|>\nfind it\n<|assistant tool=search|>\nsearching\n<|assistant|>\ndone"
    )
    # without tool_col the template is unchanged (template stability)
    plain = assemble_conversations(t).collect()[0]["doc"]
    assert "tool=" not in plain
    sft = {
        r["turn_idx"]: r["prompt"]
        for r in sft_examples(t, tool_col="tool", context_turns=4).collect()
    }
    assert sft[2] == "<|user|>\nfind it\n<|assistant tool=search|>\nsearching"
    # still pure-JVM single-exchange with the tool column threaded
    plan = plan_of(assemble_conversations(t, tool_col="tool"))
    assert plan.count("Exchange") == 1 and "Python" not in plan


def test_max_turns_tie_break_is_partition_stable(spark):
    """Duplicate turn_idx at the cap boundary: which row survives must
    not depend on partitioning (ties order by rendered text, matching
    the uncapped sort_array tie-break)."""
    rows = [("c", 0, "user", "first"), ("c", 1, "user", "aaa"),
            ("c", 1, "user", "zzz"), ("c", 2, "user", "last")]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    docs = {
        assemble_conversations(shaped, max_turns=2).collect()[0]["doc"]
        for shaped in (t, t.coalesce(1), t.repartition(7), t.orderBy(F.desc("text")))
    }
    assert docs == {"<|user|>\nfirst\n<|user|>\naaa"}


# --- train_spans (SFT loss mask over the assembled doc) -----------------------


def _py_spans(rows, role, sep="\n", tool=False):
    """Independent oracle: render + walk with plain Python strings."""
    def rend(r, t, tl):
        h = (r or "") + ((" tool=" + tl) if (tool and tl is not None) else "")
        return "<|" + h + "|>\n" + (t or "")

    ordered = sorted(rows, key=lambda x: (x[0], rend(x[1], x[2], x[3] if tool else None)))
    doc, spans, pos = [], [], 0
    for idx, r, t, tl in ordered:
        s = rend(r, t, tl if tool else None)
        if r == role:
            hl = len(s) - len(t or "")
            spans.append((pos + hl, pos + len(s)))
        doc.append(s)
        pos += len(s) + len(sep)
    return sep.join(doc), spans


def test_train_spans_match_python_oracle_and_slice_back(spark):
    rows = [
        (0, "user", "hello there", None),
        (1, "assistant", "hi! how can I help", None),
        (2, "user", "what's 2+2 🙂", None),          # astral char before a span
        (3, "assistant", "4 and a 🚀 emoji", None),
        (4, "tool", "result: 4", None),
        (5, "assistant", None, None),                # NULL text -> empty span
    ]
    turns = spark.createDataFrame(
        [("c1", i, r, t) for i, r, t, _ in rows],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = assemble_conversations(turns, spans_role="assistant").collect()[0]
    want_doc, want_spans = _py_spans(rows, "assistant")
    assert got.doc == want_doc
    assert [(s.start, s.end) for s in got.train_spans] == want_spans
    # the pinned invariant: slicing doc at each span reproduces the text
    texts = [t or "" for _, r, t, _ in rows if r == "assistant"]
    assert [got.doc[s.start:s.end] for s in got.train_spans] == texts


def test_train_spans_max_turns_tools_and_no_match(spark):
    rows = [
        (0, "user", "q1", None),
        (1, "assistant", "a1", "search"),
        (2, "user", "q2", None),
        (3, "assistant", "a2", None),
    ]
    turns = spark.createDataFrame(
        [("c1", i, r, t, tl) for i, r, t, tl in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    # tool header shifts the span start; max_turns drops the later span
    got = assemble_conversations(
        turns, tool_col="tool", max_turns=2, spans_role="assistant"
    ).collect()[0]
    want_doc, want_spans = _py_spans(
        [r for r in rows[:2]], "assistant", tool=True
    )
    assert got.doc == want_doc
    assert [(s.start, s.end) for s in got.train_spans] == want_spans
    assert got.doc[got.train_spans[0].start:got.train_spans[0].end] == "a1"
    # a role that never occurs -> empty array, not null
    got = assemble_conversations(turns, spans_role="nobody").collect()[0]
    assert list(got.train_spans) == []
    # unset -> the column does not exist (schema unchanged for old callers)
    assert "train_spans" not in assemble_conversations(turns).columns


def test_train_spans_plan_still_one_exchange_no_python(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "user", "x"), ("c1", 1, "assistant", "y")],
        "conv_id string, turn_idx int, role string, text string",
    )
    plan = plan_of(assemble_conversations(turns, spans_role="assistant"))
    assert plan.count("Exchange") == 1
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_train_spans_repartition_stability(spark):
    rows = [("c%d" % (i % 5), i, ["user", "assistant"][i % 2], f"text {i}")
            for i in range(40)]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    a = {
        r.conv_id: (r.doc, [(s.start, s.end) for s in r.train_spans])
        for r in assemble_conversations(turns, spans_role="assistant").collect()
    }
    b = {
        r.conv_id: (r.doc, [(s.start, s.end) for s in r.train_spans])
        for r in assemble_conversations(
            turns.repartition(13), spans_role="assistant"
        ).collect()
    }
    assert a == b
