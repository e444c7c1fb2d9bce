"""Differential tests for the temporal operators (as-of join, bucketed
range join, time-bucket rollup) and n-gram decontamination — all vs DuckDB
on the sf0.001 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from bullet_spark_spark.operators import temporal as tp
from bullet_spark_spark.operators import text as tx
from bullet_spark_spark.operators.sampling import hash_sample, oracle_keep_sql

from tests.util import assert_match


# ---------------------------------------------------------------- asof join

ASOF_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.value,
       c.ts AS ts_matched, c.value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def test_asof_join_matches_duckdb(spark, tables, duck):
    ev = tables["events"]
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    out = tp.asof_join(
        left, right, ["user_id"], "ts", "ts", ["click_value"]
    ).select("event_id", "user_id", "value", "ts_matched", "click_value")
    assert_match(out, duck, ASOF_ORACLE)


def test_asof_join_inclusive_tie_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c")],
        "k int, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10.0, 100.0), (1, 12.0, 200.0), (2, 9.0, 300.0)],
        "k int, ts double, v double",
    )
    out = {
        r["tag"]: (r["v"], r["ts_matched"])
        for r in tp.asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }
    assert out["a"] == (100.0, 10.0)  # inclusive: right at equal ts matches
    assert out["b"] == (200.0, 12.0)  # latest <= 20
    assert out["c"] == (None, None)  # right ts 9 > left ts 5 → no match

    tol = {
        r["tag"]: r["v"]
        for r in tp.asof_join(
            left, right, ["k"], "ts", "ts", ["v"], tolerance_sec=5.0
        ).collect()
    }
    assert tol["a"] == 100.0  # staleness 0 <= 5
    assert tol["b"] is None  # staleness 8 > 5 → voided


# ---------------------------------------------------------- range join

BANDS = [
    ("low", 0.0, 100000.0),
    ("mid", 100000.0, 250000.0),
    ("high", 250000.0, 600000.0),
]

RANGE_ORACLE = """
WITH bands(band, lo, hi) AS (VALUES
  ('low', 0.0, 100000.0), ('mid', 100000.0, 250000.0), ('high', 250000.0, 600000.0))
SELECT band, o_orderkey FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi
"""


def test_range_join_both_modes_match_duckdb(spark, tables, duck):
    bands = spark.createDataFrame(BANDS, "band string, lo double, hi double")
    pts = tables["orders"].select("o_orderkey", "o_totalprice")
    for kw in (dict(broadcast_intervals=True), dict(bucket_width=50000.0)):
        out = tp.range_join_bucketed(
            pts, bands, "o_totalprice", "lo", "hi", **{"bucket_width": 0.0, **kw}
        ).select("band", "o_orderkey")
        assert_match(out, duck, RANGE_ORACLE)


def test_range_join_bucket_edges(spark):
    """Points/interval bounds exactly on bucket edges: hi exclusive, lo
    inclusive, intervals spanning many buckets."""
    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 10.0, 19.999, 20.0, 35.0])],
        "id int, p double",
    )
    iv = spark.createDataFrame(
        [("a", 0.0, 20.0), ("b", 20.0, 40.0), ("c", 5.0, 36.0)],
        "name string, lo double, hi double",
    )
    got = sorted(
        (r["id"], r["name"])
        for r in tp.range_join_bucketed(pts, iv, "p", "lo", "hi", 10.0).collect()
    )
    assert got == [
        (0, "a"),
        (1, "a"), (1, "c"),
        (2, "a"), (2, "c"),
        (3, "b"), (3, "c"),
        (4, "b"), (4, "c"),
    ]


# ------------------------------------------------------ time-bucket rollup

ROLLUP_ORACLE = """
WITH d AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS bucket_start,
         count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
  FROM orders GROUP BY 1),
m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS bucket_start,
         count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
  FROM orders GROUP BY 1),
y AS (
  SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS bucket_start,
         count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
  FROM orders GROUP BY 1)
SELECT 'day' AS level, * FROM d
UNION ALL SELECT 'month', * FROM m
UNION ALL SELECT 'year', * FROM y
"""


def test_time_bucket_rollup_matches_duckdb(spark, tables, duck):
    out = tp.time_bucket_rollup(
        tables["orders"],
        "o_orderdate",
        ["day", "month", "year"],
        [("count", "", "n"), ("sum", "o_totalprice", "total")],
    )
    assert_match(out, duck, ROLLUP_ORACLE)


def test_time_bucket_rollup_reuses_fine_partials(spark, tables):
    """The coarser levels must re-aggregate the finer level's partials —
    the physical plan reuses the fine-level exchange instead of scanning
    the base table once per level."""
    out = tp.time_bucket_rollup(
        tables["orders"], "o_orderdate", ["day", "month"], [("count", "", "n")]
    )
    out.collect()  # AQE applies ReuseExchange at runtime, not in the draft plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


# ------------------------------------------------------- decontamination

CONTAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks,
         {oracle_keep_sql('doc_id', 0.05, 7)} AS is_eval
  FROM documents),
ng AS (
  SELECT doc_id, is_eval,
         list_distinct([array_to_string(toks[i:i+2], ' ')
                        FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)]) AS grams
  FROM tok),
ev AS (SELECT DISTINCT unnest(grams) AS gram FROM ng WHERE is_eval),
tr AS (SELECT doc_id, unnest(grams) AS gram FROM ng WHERE NOT is_eval)
SELECT tr.doc_id, count(*) AS n_grams, count(ev.gram) AS n_hit,
       round(count(ev.gram) * 1.0 / count(*), 6) AS contamination
FROM tr LEFT JOIN ev ON tr.gram = ev.gram
GROUP BY tr.doc_id
"""


def test_ngram_contamination_matches_duckdb(spark, tables, duck):
    docs = tables["documents"]
    eval_set = hash_sample(docs, "doc_id", 0.05, seed=7)
    corpus = docs.join(eval_set.select("doc_id"), on="doc_id", how="left_anti")
    out = tx.ngram_contamination(corpus, eval_set, "doc_id", "text", n=3).select(
        "doc_id", "n_grams", "n_hit", F.round("contamination", 6).alias("contamination")
    )
    assert_match(out, duck, CONTAM_ORACLE)


def test_contamination_self_is_total(spark, tables):
    """A document evaluated against an eval set containing itself is 100%
    contaminated — the sanity anchor for the metric."""
    docs = tables["documents"].limit(20)
    out = tx.ngram_contamination(docs, docs, "doc_id", "text", n=3)
    assert out.count() == 20
    assert out.filter(F.col("contamination") < 1.0).count() == 0


# ------------------------------------------- relational coverage (units)

def test_cube_and_rollup_agg_match_duckdb(spark, tables, duck):
    """Native DataFrame cube()/rollup() forms (the driver slot runs the SQL
    facade; these keep the programmatic surface covered)."""
    from bullet_spark_spark.operators import relational as rel

    cube = rel.cube_agg(
        tables["orders"],
        ["o_orderstatus", "o_orderpriority"],
        [F.count(F.lit(1)).alias("n")],
    )
    assert_match(
        cube,
        duck,
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    )
    roll = rel.rollup_agg(
        tables["orders"],
        ["o_orderstatus", "o_orderpriority"],
        [F.count(F.lit(1)).alias("n")],
    )
    assert_match(
        roll,
        duck,
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    )


DISTINCT_ROLLUP_ORACLE = """
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
         count(DISTINCT user_id) AS n_distinct, count(*) AS n_rows
  FROM events GROUP BY 1),
m AS (
  SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS bucket_start,
         count(DISTINCT user_id) AS n_distinct, count(*) AS n_rows
  FROM events GROUP BY 1)
SELECT 'day' AS level, * FROM d
UNION ALL SELECT 'month', * FROM m
"""


def test_distinct_rollup_matches_duckdb(spark, tables, duck):
    out = tp.distinct_rollup(tables["events"], "ts", ["day", "month"], "user_id")
    assert_match(out, duck, DISTINCT_ROLLUP_ORACLE)


def test_distinct_rollup_single_base_scan(spark, tables):
    """Coarser levels dedup the finer level's (bucket, key) pairs — the
    executed plan reuses the pair-dedup exchange instead of re-scanning."""
    out = tp.distinct_rollup(tables["events"], "ts", ["day", "month"], "user_id")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


# ------------------------------------------- stream-stream interval join

def test_stream_stream_interval_join_parity(spark, tables, tmp_path):
    """Two real file streams (purchases, clicks) joined on user_id with an
    event-time interval bound drain to the same rows as the equivalent
    batch join — and the streaming plan carries watermarks on both sides
    (bounded state)."""
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    ev = tables["events"]
    lb = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("u"), F.col("ts").alias("p_ts")
    )
    rb = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    )

    ls = file_drip(spark, lb, str(tmp_path / "l"), chunks=2)
    rs = file_drip(spark, rb, str(tmp_path / "r"), chunks=2)
    joined = tp.stream_stream_interval_join(
        ls, rs, ["u"], "p_ts", "c_ts", max_delay="1 hour", lookback_sec=1800
    ).select("event_id", "c_ts", "click_value")

    sink = MemorySink()
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = (
        lb.join(rb, on="u")
        .filter(
            (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1800 SECONDS"))
        )
        .select("event_id", "c_ts", "click_value")
    )
    got = sorted(sink.rows)
    want = sorted((r["event_id"], r["c_ts"], r["click_value"]) for r in batch.collect())
    assert len(got) > 0
    assert got == want


# ----------------------------------------- property-based asof differential

def test_asof_join_property_random_data(spark):
    """Randomized as-of differential: arbitrary (key, ts) layouts — keys
    with no right rows, rights after every left, exact-tie timestamps —
    against DuckDB's native ASOF LEFT JOIN. Right (key, ts) pairs are
    unique so the match is well-defined in both engines."""
    import duckdb

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @st.composite
    def dataset(draw):
        keys = draw(st.lists(st.integers(0, 4), min_size=1, max_size=6))
        left = [
            (i, k, float(draw(st.integers(0, 30))))
            for i, k in enumerate(keys)
        ]
        n_right = draw(st.integers(0, 10))
        pairs = draw(
            st.lists(
                st.tuples(st.integers(0, 4), st.integers(0, 30)),
                min_size=n_right,
                max_size=n_right,
                unique=True,
            )
        )
        right = [(k, float(ts), float(draw(st.integers(0, 99)))) for k, ts in pairs]
        return left, right

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(data=dataset())
    def run(data):
        left_rows, right_rows = data
        left = spark.createDataFrame(left_rows, "lid int, k int, ts double")
        right = (
            spark.createDataFrame(right_rows, "k int, ts double, v double")
            if right_rows
            else spark.createDataFrame([], "k int, ts double, v double")
        )
        got = sorted(
            (r["lid"], r["ts_matched"], r["v"])
            for r in tp.asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE l(lid INT, k INT, ts DOUBLE)")
        con.execute("CREATE TABLE r(k INT, ts DOUBLE, v DOUBLE)")
        if left_rows:
            con.executemany("INSERT INTO l VALUES (?, ?, ?)", left_rows)
        if right_rows:
            con.executemany("INSERT INTO r VALUES (?, ?, ?)", right_rows)
        want = sorted(
            tuple(row)
            for row in con.execute(
                "SELECT l.lid, r.ts, r.v FROM l ASOF LEFT JOIN r"
                " ON l.k = r.k AND l.ts >= r.ts"
            ).fetchall()
        )
        con.close()
        assert got == want, (left_rows, right_rows)

    run()


def test_streaming_decontamination(spark, tables, tmp_path):
    """Decontamination over a LIVE corpus stream against a static broadcast
    eval set (stream-static): the drained complete-mode result equals the
    batch operator's output — incoming training shards can be scored for
    eval contamination as they arrive."""
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    docs = tables["documents"]
    eval_set = hash_sample(docs, "doc_id", 0.05, seed=7)
    corpus = docs.join(eval_set.select("doc_id"), on="doc_id", how="left_anti")

    stream = file_drip(spark, corpus, str(tmp_path / "corpus"), chunks=3)
    out = tx.ngram_contamination(stream, eval_set, "doc_id", "text", n=3)

    sink = MemorySink()
    q = (
        out.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(sink.batches[-1])  # complete mode: last batch = full result
    want = sorted(
        tuple(r)
        for r in tx.ngram_contamination(corpus, eval_set, "doc_id", "text", n=3).collect()
    )
    assert got == want


def test_stream_stream_join_same_ts_name(spark, tables, tmp_path):
    """Both streams naming their event-time column identically ('ts') must
    resolve side-qualified — the natural call shape."""
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    ev = tables["events"]
    lb = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    rb = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    ls = file_drip(spark, lb, str(tmp_path / "l2"), chunks=1)
    rs = file_drip(spark, rb, str(tmp_path / "r2"), chunks=1)
    joined = tp.stream_stream_interval_join(
        ls, rs, ["user_id"], "ts", "ts", max_delay="1 hour", lookback_sec=1800
    )
    sink = MemorySink()
    q = (
        joined.select("event_id", "click_value")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    want = (
        lb.join(rb.withColumnRenamed("ts", "c_ts"), on="user_id")
        .filter(
            (F.col("c_ts") <= F.col("ts"))
            & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1800 SECONDS"))
        )
        .count()
    )
    assert len(sink.rows) == want > 0


def test_range_join_degenerate_and_edge_intervals(spark):
    """Empty (hi == lo) and reversed (hi < lo) intervals match nothing and,
    critically, never explode a descending bucket sequence; an interval
    with hi exactly on a bucket edge excludes that bucket exactly."""
    pts = spark.createDataFrame([(0, 5.0), (1, 20.0)], "id int, p double")
    iv = spark.createDataFrame(
        [("empty", 7.0, 7.0), ("reversed", 3_600_000.0, 0.0), ("edge", 0.0, 20.0)],
        "name string, lo double, hi double",
    )
    got = sorted(
        (r["id"], r["name"])
        for r in tp.range_join_bucketed(pts, iv, "p", "lo", "hi", 10.0).collect()
    )
    assert got == [(0, "edge")]  # p=20.0 excluded: hi exclusive


def test_bm25_matches_duckdb_and_ranks_sanely(spark, tables, duck):
    """BM25 scored pairs hash-match the DuckDB oracle (per-term 8-dp
    rounding + decimal sums neutralize libm/sum-order divergence), and a
    document made of exactly the query terms outranks the corpus."""
    docs = tables["documents"].select("doc_id", "text")
    qdf = spark.createDataFrame(
        [(1, "hash join strategy"), (2, "stream window agg")],
        ["query_id", "query_text"],
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"])
        for r in tx.bm25_scores(docs, qdf)
        # exact HALF_UP on the decimal, then double — round(double) diverges
        .withColumn("score", F.round("score", 6).cast("double"))
        .collect()
    )
    expected = sorted(
        tuple(r)
        for r in duck.execute(
            r"""WITH q(query_id, query_text) AS (VALUES (1, 'hash join strategy'), (2, 'stream window agg')),
           toks AS (SELECT doc_id, unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS term FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
           stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
           qt AS (SELECT DISTINCT query_id, term FROM
                    (SELECT query_id, unnest(string_split(trim(lower(query_text)), ' ')) AS term FROM q)),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                  WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
           dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
           contrib AS (
             SELECT qt.query_id, tf.doc_id,
                    CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                               * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 8)
                         AS DECIMAL(18,8)) AS c
             FROM tf JOIN dfreq USING (term) JOIN qt USING (term)
                     JOIN dl USING (doc_id) CROSS JOIN stats)
           SELECT query_id, doc_id, CAST(round(sum(c), 6) AS DOUBLE) AS score
           FROM contrib GROUP BY 1, 2"""
        ).fetchall()
    )
    assert got == expected

    # ranking sanity: a pure-query-terms doc dominates its query
    probe = spark.createDataFrame(
        [(999_001, "hash join strategy hash join strategy")], ["doc_id", "text"]
    )
    top = tx.bm25_topk(docs.unionByName(probe), qdf, k=1).collect()
    best = {r["query_id"]: r["doc_id"] for r in top}
    assert best[1] == 999_001


def test_pii_scrub_and_spans(spark):
    """Typed placeholders land where PII was; clean text passes untouched;
    repeated spans finds exactly the planted cross-doc 10-word span."""
    rows = [
        (1, "reach me at jane.doe+x@corp.io or 192.168.1.4 tomorrow"),
        (2, "ssn 123-45-6789 phone 555-867-5309 end"),
        (3, "no personal data in this row at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r["id"]: r["s"] for r in df.select("id", tx.scrub_pii(F.col("t")).alias("s")).collect()}
    assert got[1] == "reach me at <EMAIL> or <IP> tomorrow"
    assert got[2] == "ssn <ID> phone <PHONE> end"
    assert got[3] == rows[2][1]

    span = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, f"alpha {span} beta"), (2, f"gamma {span} delta"), (3, "unrelated words only here")],
        ["doc_id", "text"],
    )
    out = tx.repeated_spans(docs, w=10, min_docs=2).collect()
    assert [r["span"] for r in out] == [span]
    assert out[0]["n_docs"] == 2 and out[0]["n_occurrences"] == 2


def test_zscore_anomalies_flags_spike(spark):
    """A planted 10x spike on day 9 must flag; steady days must not."""
    import datetime as dt

    from bullet_spark_spark.operators import temporal as tmp

    rows = []
    for d in range(12):
        v = 100.0 if d != 9 else 1000.0
        for i in range(5):
            rows.append(
                (dt.datetime(2024, 1, 1 + d, 6 + i), v + (i - 2) * 0.5)
            )
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = {r["bucket"].day: r for r in tmp.zscore_anomalies(df, trailing=7, z_thresh=3.0).collect()}
    # the baseline is flat (std 0): z is undefined but the shift FLAGS
    assert out[10]["is_anomaly"] is True and out[10]["z"] is None
    # warmup days (insufficient history) give no verdict, not a flag
    assert out[1]["z"] is None and out[1]["is_anomaly"] is False
    for d in (5, 6, 7, 8):
        assert out[d]["is_anomaly"] is False


def test_zscore_anomalies_noisy_baseline(spark):
    """With a noisy (non-degenerate) baseline the z path itself flags."""
    import datetime as dt

    from bullet_spark_spark.operators import temporal as tmp

    means = [100, 102, 98, 101, 99, 103, 97, 100, 101, 180]  # day 10 spikes
    rows = [
        (dt.datetime(2024, 2, 1 + d, 12), float(m))
        for d, m in enumerate(means)
    ]
    df = spark.createDataFrame(rows, ["ts", "value"])
    out = {r["bucket"].day: r for r in tmp.zscore_anomalies(df, trailing=7, z_thresh=3.0).collect()}
    assert out[10]["is_anomaly"] is True and out[10]["z"] > 3
    assert all(out[d]["is_anomaly"] is False for d in range(4, 10))
