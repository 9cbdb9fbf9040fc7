"""Co-located bucketed join: the incremental diff runs with NO shuffle on
either side when both tables are bucketed on the join key."""

import os

from pyspark.sql import functions as F

from fscrawler_spark.plans.bucketed import colocated_changed_keys, write_bucketed


def test_colocated_join_has_no_shuffle(spark, transcripts_dir, tmp_path):
    src = spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    prev = src.filter(F.col("turn_idx") % 7 != 0)  # some rows "new"
    write_bucketed(src, "cur_b", buckets=8)
    write_bucketed(prev, "prev_b", buckets=8)
    # at test scale Spark would broadcast; force the SMJ path the planner
    # takes at 100 TB so the bucketed no-shuffle property is what's pinned
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        diff = colocated_changed_keys(spark, "cur_b", "prev_b")
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        # correctness: exactly the rows absent from prev
        expected = src.filter(F.col("turn_idx") % 7 == 0).count()
        assert diff.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS cur_b")
        spark.sql("DROP TABLE IF EXISTS prev_b")
