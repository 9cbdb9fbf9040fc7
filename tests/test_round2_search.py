"""Round-2 search-algebra additions: highlighters + Semantic query."""

from pyspark.sql import functions as F

from fscrawler_spark.operators.search import (
    Bool,
    Match,
    Prefix,
    SearchRequest,
    Semantic,
    Term,
    _terms_for_field,
    execute_search,
)

SF_DIR = "/root/testdata/sf0.001"


def test_terms_collected_from_bool_tree_excluding_must_not():
    q = Bool(
        must=(Match("text", "alpha beta"), Term("text", "Gamma"), Term("lang", "en")),
        should=(Match("text", "delta"),),
        must_not=(Match("text", "omitted"),),
    )
    assert sorted(_terms_for_field(q, "text")) == ["alpha", "beta", "delta", "gamma"]
    assert _terms_for_field(q, "lang") == ["en"]
    assert _terms_for_field(Prefix("text", "pre"), "text") == []


def test_highlight_wraps_whole_words_only(spark):
    df = spark.createDataFrame(
        [(1, "spark sparkle data and spark again")], "doc_id int, text string"
    )
    req = SearchRequest(
        query=Match("text", "spark data"), fields=("doc_id",), highlight=("text",)
    )
    row = execute_search(df, req).collect()[0]
    assert row["text_highlight"] == (
        "<em>spark</em> sparkle <em>data</em> and <em>spark</em> again"
    )


def test_highlight_case_insensitive_and_no_terms_passthrough(spark):
    df = spark.createDataFrame([(1, "Spark DATA x")], "doc_id int, text string")
    req = SearchRequest(query=Match("text", "spark data"), highlight=("text",), size=10)
    row = execute_search(df, req).collect()[0]
    assert row["text_highlight"] == "<em>Spark</em> <em>DATA</em> x"
    # a query with no terms on the field leaves it untagged
    req2 = SearchRequest(query=Term("doc_id", 1), highlight=("text",), size=10)
    assert execute_search(df, req2).collect()[0]["text_highlight"] == "Spark DATA x"


def test_semantic_exact_matches_brute_force(spark):
    from fscrawler_spark.functions import embeddings

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vec = e.filter(F.col("vec_id") == 3).select("embedding").first()[0]
    req = SearchRequest(
        query=Semantic("embedding", tuple(vec), k=5, id_col="vec_id", exact=True),
        size=5,
        fields=("vec_id",),
    )
    got = [r["vec_id"] for r in execute_search(e, req).collect()]
    # brute_force_topk excludes only query_id (-1), so the query row itself
    # ranks first with sim 1.0
    assert got[0] == 3
    qdf = spark.createDataFrame([(-1, [float(x) for x in vec])], "vec_id long, embedding array<float>")
    want = [r["neighbor_id"] for r in embeddings.brute_force_topk(e, qdf, k=5).collect()]
    assert got == want


def test_semantic_lsh_route_smoke(spark):
    """The default (non-exact) route goes through hyperplane LSH: hits
    are a ranked subset of the corpus that always contains the query row
    itself (identical vector -> same bucket in every table)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vec = e.filter(F.col("vec_id") == 3).select("embedding").first()[0]
    req = SearchRequest(
        query=Semantic("embedding", tuple(vec), k=5, id_col="vec_id"), size=5
    )
    rows = execute_search(e, req).collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["vec_id"] == 3 and rows[0]["rank"] == 1
