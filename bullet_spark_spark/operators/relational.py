"""Relational extension operators: joins, set ops, rollup/cube, analytic
window functions, global top-k.

Absent from the reference (SURVEY §2.5 gap ledger — verified absent across
all 27 Scala files); expressed as native DataFrame ops so Catalyst picks the
physical strategy. Scale posture:

- dimension joins take an explicit ``broadcast()`` hint (region/nation/
  customer/supplier/part are small dims even at 100 TB fact scale);
- fact-fact joins shuffle on the join key and rely on AQE skew-join
  splitting (enabled in session.py);
- global top-k is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
  a per-partition heap + driver merge of k rows, never a full sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/theta join. ``how`` ∈ inner/left/right/full/left_semi/left_anti/
    cross. ``broadcast_right=True`` hints the small side (dimension)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    return a.exceptAll(b) if all else a.subtract(b)


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def global_topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Top-k by arbitrary measure (vs bullet's frequency-only TOP K).
    Plans as TakeOrderedAndProject: O(k) memory per partition."""
    return df.orderBy(*order).limit(k)


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant grouped aggregation: two-phase (salted partial →
    unsalted final) for decomposable aggregates.

    ``aggs``: (op, in_col, out_name) with op ∈ count/sum/min/max.
    Spark's HashAggregate already combines map-side, which defuses most agg
    skew; the explicit salt matters when the partial state itself is heavy
    (wide composite state, agg over exploded containers) or when feeding a
    downstream stage that must not see one giant key partition. AQE splits
    skewed JOIN partitions but does not re-balance aggregation keys."""
    _partial = {
        "count": lambda c: F.count(F.lit(1)),
        "sum": lambda c: F.sum(F.col(c)),
        "min": lambda c: F.min(F.col(c)),
        "max": lambda c: F.max(F.col(c)),
    }
    _merge = {
        "count": F.sum,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    salted = df.withColumn(
        "__salt", (F.spark_partition_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[_partial[op](c).alias(f"__p_{out}") for op, c, out in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[_merge[op](F.col(f"__p_{out}")).alias(out) for op, c, out in aggs]
    )


def salted_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join for when AQE's skew split can't help: the
    fact side salts each row into one of ``salt_buckets`` sub-keys
    (deterministically, from a hash of the whole row), the dim side
    replicates every row across all buckets, and the join runs on
    (key, salt) — a hot key's rows spread over ``salt_buckets`` tasks
    instead of landing on one straggler.

    Cost: dim side × salt_buckets (so keep the dim/replicated side the
    smaller one — at broadcast size you'd just broadcast; this is for the
    mid-range where dim is too big to broadcast and fact keys are skewed).
    AQE's OptimizeSkewedJoin only splits partitions of a *shuffle* whose
    sizes it can observe; it cannot split a single giant key being built
    into one hash-table bucket on the build side, and it is disabled for
    some join/plan shapes (e.g. under required distributions) — the salt
    works everywhere because it changes the KEY, not the planner.

    Result equals the plain join exactly for the supported fact-preserving
    join types (every (fact_row, dim_row) match pairs on exactly one salt
    value, and every fact row carries exactly one salt). Dim-preserving
    types (right/full_outer) are NOT supported: the dim side is replicated
    across all salts, so an unmatched dim row would surface once per salt
    bucket instead of once — raise rather than silently duplicate."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_skew_join supports fact-preserving joins {sorted(allowed)}; "
            f"got {how!r} (dim-preserving types would emit one row per salt "
            "bucket for unmatched dim rows)"
        )
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)).cast("int"),
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(replicated_dim, [key, "__salt"], how)
    return out.drop("__salt")


def events_to_scd2(
    events: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] = (),
) -> DataFrame:
    """Collapse a change-event log into SCD Type-2 dimension history ->
    (keys..., attrs..., valid_from, valid_to, is_current): one row per
    CONSECUTIVE attribute state per key, valid over [valid_from,
    valid_to), open-ended (valid_to NULL, is_current true) for the latest
    state. The warehouse-dimension derivation from a CDC/event stream --
    consecutive duplicate states (events that change nothing) collapse
    into their first occurrence. Attribute-state equality uses the
    unit-separator/NUL encoding of quality.row_fingerprint, so NULL,
    empty string, and separator-containing values stay distinct.

    ``tiebreak_cols`` must make (key, ts, tiebreaks) a total order when
    one key can emit several events at the same timestamp -- the collapse
    depends on event order, so determinism requires it.

    Incremental apply is re-derivation: union the existing history's
    (valid_from, attrs) version-start rows with the new change batch and
    run this again -- idempotent by construction. At 100 TB pair it with
    write.merge_upsert keyed on the dimension key so only touched keys'
    partitions rewrite.

    Shape: ONE shuffle on the key; both the consecutive-dedup (lag) and
    the validity chaining (lead) are windows over that same partitioning
    -- Catalyst plans a single Exchange + sorts."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = W.partitionBy(*key_cols).orderBy(*order)
    parts: list[Column] = []
    for i, c in enumerate(attr_cols):
        if i:
            parts.append(F.lit("\u001f"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\u0000")))
    changed = (
        events.withColumn("__fp", F.concat(*parts))
        .withColumn("__prev", F.lag("__fp").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__fp") != F.col("__prev")))
    )
    return (
        changed.withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
        .select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot/melt — wide metrics to tidy (ids…, metric, value) rows, the
    inverse of pivot and the shape every per-metric groupBy/window wants.
    Built on Spark's native ``DataFrame.unpivot`` (Expand: one scan, rows
    ×len(value_cols), no shuffle); values are cast to a common type by
    Spark's least-common-type rule, so mixed int/double metric sets
    surface as double."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def group_snapshot_agg(
    rows: DataFrame,
    keys: list[str],
    sum_cols: list[tuple[str, str]],
) -> DataFrame:
    """The maintainable grouped aggregate: (keys..., n_rows, sums...) with
    every sum an EXACT DECIMAL(28,6) — the representation
    incremental_group_update can patch without float drift (a double base
    plus double deltas diverges from a fresh re-aggregation in the last
    bits; exact decimals make incremental ≡ recompute, provable by
    hash)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).cast("decimal(28,6)"))
        .cast("decimal(28,6)")
        .alias(out)
        for c, out in sum_cols
    ]
    return rows.groupBy(*keys).agg(*aggs)


def incremental_group_update(
    base: DataFrame,
    old_rows: DataFrame,
    new_rows: DataFrame,
    keys: list[str],
    sum_cols: list[tuple[str, str]],
) -> DataFrame:
    """Materialized-view maintenance for decomposable aggregates: patch a
    group_snapshot_agg table with a CDC change set instead of rescanning
    the corpus — ``old_rows`` are the before-images of changed/removed
    rows, ``new_rows`` the after-images of changed/added rows (pair with
    quality.snapshot_diff to find them). count and sum only: they admit
    retraction (min/max do not — a deleted minimum needs a rescan of its
    group; callers needing min/max re-aggregate affected groups via
    write.merge_upsert instead).

    Work is Δ-sized: one union of the change rows → one groupBy(keys)
    producing per-key deltas (negative for before-images) → one
    full-outer join against the base (key-partitioned both sides; a
    bucketed base joins with zero exchange). Groups whose row count
    reaches zero disappear, new groups appear — the result equals
    group_snapshot_agg over the post-change corpus EXACTLY (decimal
    arithmetic end-to-end)."""
    def tagged(df: DataFrame, sign: int) -> DataFrame:
        return df.select(
            *keys,
            F.lit(sign).cast("long").alias("__dn"),
            *[
                (F.col(c).cast("decimal(28,6)") * sign).alias(f"__ds_{out}")
                for c, out in sum_cols
            ],
        )

    delta = (
        tagged(old_rows, -1)
        .unionByName(tagged(new_rows, 1))
        .groupBy(*keys)
        .agg(
            F.sum("__dn").alias("__dn"),
            *[
                F.sum(f"__ds_{out}").cast("decimal(28,6)").alias(f"__ds_{out}")
                for _, out in sum_cols
            ],
        )
    )
    joined = base.join(delta, keys, "full_outer")
    zero = F.lit(0).cast("decimal(28,6)")
    out_cols = [
        (
            # preserve SQL NULL-sum semantics so the result equals a fresh
            # group_snapshot_agg recompute EXACTLY: a group whose values
            # are all NULL sums to NULL, not 0 (r4 advisory) — coalesce
            # only when at least one side carries a real sum
            F.when(
                F.col(out).isNull() & F.col(f"__ds_{out}").isNull(),
                F.lit(None).cast("decimal(28,6)"),
            )
            .otherwise(
                F.coalesce(F.col(out), zero) + F.coalesce(F.col(f"__ds_{out}"), zero)
            )
            .cast("decimal(28,6)")
            .alias(out)
        )
        for _, out in sum_cols
    ]
    n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
    return (
        joined.select(*keys, n.alias("n_rows"), *out_cols)
        .filter(F.col("n_rows") > 0)
    )


def incremental_join_delta(
    a_old: DataFrame,
    a_new: DataFrame,
    b_old: DataFrame,
    b_new: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental view maintenance for an INNER JOIN view V = A ⋈ B:
    given both relations' old and new snapshots, return the view's
    CHANGE SET — (row columns…, __delta ∈ {+1, −1}) multiset — without
    recomputing the full join:

        ΔV  =  ΔA ⋈ B_new  ∪  A_old ⋈ ΔB

    (signed multiset union: each output row carries the sign of its
    delta-side row). The identity: A_new⋈B_new − A_old⋈B_old =
    ΔA⋈B_old + A_old⋈ΔB + ΔA⋈ΔB, and ΔA⋈B_new folds the ΔA⋈ΔB corner
    into the first term exactly once — the standard two-term form of the
    counting algorithm (Gupta–Mumick). ΔA/ΔB are signed row multisets
    (per-row count differences, so duplicate rows maintain correctly);
    applying the change set to the old view equals a fresh recompute
    EXACTLY, multiplicities included (asserted by the oracle row and
    test).

    Scale shape: every term joins a DELTA-sized side against a snapshot
    — with CDC-sized deltas the join work is proportional to the CHANGE,
    not the view; delta sides are marked broadcast-eligible via their
    size (AQE), snapshots never join snapshots. Multiset diffs are one
    groupBy per relation over (all columns) with map-side combine."""

    def multiset_delta(old: DataFrame, new: DataFrame) -> DataFrame:
        cols = new.columns
        o = old.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c_old"))
        n = new.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c_new"))
        j = o.join(n, cols, "full_outer").select(
            *cols,
            (F.coalesce("__c_new", F.lit(0)) - F.coalesce("__c_old", F.lit(0))).alias(
                "__d"
            ),
        )
        return j.filter(F.col("__d") != 0)

    da = multiset_delta(a_old, a_new)
    db = multiset_delta(b_old, b_new)
    da_pos = da.filter(F.col("__d") > 0)
    da_neg = da.filter(F.col("__d") < 0)
    db_pos = db.filter(F.col("__d") > 0)
    db_neg = db.filter(F.col("__d") < 0)

    def expand(df: DataFrame, sign: int) -> DataFrame:
        # a multiset delta of magnitude k expands to k unit rows so the
        # join multiplicities come out exactly (bounded: |k| = CDC burst)
        return df.select(
            *[c for c in df.columns if c != "__d"],
            F.explode(F.sequence(F.lit(1), F.abs(F.col("__d")))).alias("__i"),
        ).drop("__i").withColumn("__delta", F.lit(sign))

    terms = [
        # ΔA (both signs) against the NEW B snapshot
        expand(da_pos, 1).join(b_new, on),
        expand(da_neg, -1).join(b_new, on),
        # ΔB (both signs) against the OLD A snapshot
        a_old.withColumn("__delta", F.lit(1)).join(expand(db_pos, 1).drop("__delta"), on),
        a_old.withColumn("__delta", F.lit(-1)).join(expand(db_neg, -1).drop("__delta"), on),
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t, allowMissingColumns=False)
    return out


def key_skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 5,
) -> DataFrame:
    """Shuffle-key SKEW diagnostic → one row per hot key plus a
    ``__TOTAL__`` summary row: the pre-flight check a pipeline runs
    BEFORE keying a 100 TB join/agg on a candidate column, to decide
    between the plain path, :func:`salted_skew_join`, or AQE skew-split.

    Output columns: ``key`` (the composite key rendered as a string, or
    ``__TOTAL__``), ``cnt`` (rows under that key; for the total row, the
    max key count), ``frac`` (share of all rows), ``skew_ratio``
    (cnt / mean-rows-per-key — the straggler multiplier: a task handling
    this key does ``skew_ratio``× the average task's work), and
    ``suggested_salt`` (ceil(skew_ratio), the bucket count that levels
    the hot key back to mean size; 1 = no salting needed). With a very
    large key space the mean is tiny and the raw suggestion can exceed
    any useful parallelism (measured: a 10% hot key over 1M keys
    suggests 90k buckets) — cap it at the stage's task count in
    practice (``min(suggested_salt, shuffle_partitions)`` levels the
    key to task granularity, which is all a scheduler can use).

    Scale shape: ONE count-by-key aggregate (map-side combinable) over
    the input, then all statistics derive from the key-count frame —
    key-space-sized, not row-space-sized; the top-N selection is a
    TakeOrderedAndProject (O(top_n) per partition, no global sort). No
    sampling: skew estimation by sampling misses exactly the long-tail
    keys it is supposed to find when the hot key is rare in row order.
    Deterministic (ties on cnt break by key string), so oracle-checkable."""
    # NULL-distinct rendering: concat_ws SKIPS nulls, which would merge
    # ('a', NULL) with ('a', '') and diverge from any engine that keeps
    # NULL — render each component explicitly, NULL as a sentinel
    key_str = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
            for c in key_cols
        ],
    )
    # eager checkpoint: the count frame is KEY-space-sized (it is the
    # report's own granularity) and has three consumers (stats, top-N,
    # total row) — without it each consumer re-runs the full input scan
    # (caught by tools/audit_scans.py: 3 scans -> 1)
    counts = (
        df.groupBy(key_str.alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    stats = counts.agg(
        F.sum("cnt").alias("__rows"),
        F.count(F.lit(1)).alias("__keys"),
        F.max("cnt").alias("__max"),
    )
    top = (
        counts.orderBy(F.desc("cnt"), "key")
        .limit(top_n)
        .crossJoin(F.broadcast(stats))  # 1-row stats frame
    )
    mean = F.col("__rows").cast("double") / F.col("__keys")
    per_key = top.select(
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("__rows"), 6).alias("frac"),
        F.round(F.col("cnt") / mean, 6).alias("skew_ratio"),
        F.ceil(F.col("cnt") / mean).cast("long").alias("suggested_salt"),
    )
    total = stats.select(
        F.lit("__TOTAL__").alias("key"),
        F.col("__max").alias("cnt"),
        F.round(F.col("__max") / F.col("__rows"), 6).alias("frac"),
        F.round(F.col("__max") / mean, 6).alias("skew_ratio"),
        F.ceil(F.col("__max") / mean).cast("long").alias("suggested_salt"),
    )
    return per_key.unionByName(total)


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column statistics → one row per column: (column, n,
    n_null, ndv, min_v, max_v, q25, q50, q75) — the optimizer-stats /
    data-profiling panel a pipeline collects before choosing join
    strategies, bucket counts, or zone-map dimensions (the repo's own
    layout and skew tooling consumes exactly these numbers). Exact, not
    sampled: NDV is a true distinct count, quantiles are discrete
    (percentile-disc semantics: the value at rank ceil(p·n) of the
    non-null sort — deterministic and engine-portable, no interpolation
    arithmetic to diverge).

    Scale shape: columns MELT into (column, value) rows — one projected
    explode, k× row amplification bounded by the requested column count
    — then a RANGE-partitioned global rank (the exact_quantiles_distributed
    posture): repartitionByRange on (column, v) spreads each column's
    values across many contiguous-range partitions, per-(column,
    partition) counts roll up to per-column offsets via a window over the
    tiny column×partition metadata frame, and global rank = offset +
    row_number within the (column, partition) slice. No task ever sorts
    an entire column's row set — the naive `row_number over (partition by
    column order by v)` window funnels each column through ONE reducer
    (per-column straggler/OOM at scale), which is exactly what this
    layout avoids while computing the identical exact ranks. One final
    aggregate: counts/min/max are map-side combinable, each quantile is
    a conditional max over ranks ≤ its target. Values surface as DOUBLE
    rounded 6 dp (numeric columns only, by contract)."""
    spark = df.sparkSession
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.column", "m.v")
    n_range = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    from pyspark import StorageLevel

    from bullet_spark_spark.operators._cache import persist_generation

    ranged = (
        melted.where(F.col("v").isNotNull())
        .repartitionByRange(n_range, "column", "v")
        .withColumn("__pid", F.spark_partition_id())
    )
    # MUST be persisted: repartitionByRange samples boundaries with a
    # fresh seed per execution, so the per-(column, pid) counts and the
    # rank join are only consistent reading the SAME materialization —
    # previously this relied on Spark's exchange reuse, which any plan
    # divergence (pruning, AQE) silently breaks (r11, found via the
    # group_quantiles skew differential).
    (ranged,) = persist_generation(
        "relational.column_stats.ranged",
        ranged,
        storage_level=StorageLevel.MEMORY_AND_DISK,
    )
    pc = ranged.groupBy("column", "__pid").agg(F.count(F.lit(1)).alias("__pc"))
    # offsets: window over the column×partition METADATA frame (≤ k·P rows)
    offsets = pc.select(
        "column",
        "__pid",
        (
            F.sum("__pc").over(
                W.partitionBy("column").orderBy("__pid")
            )
            - F.col("__pc")
        ).alias("__off"),
        F.sum("__pc").over(W.partitionBy("column")).alias("__n"),
    )
    ranked = ranged.join(F.broadcast(offsets), ["column", "__pid"]).select(
        "column",
        "v",
        (
            F.col("__off")
            + F.row_number().over(
                W.partitionBy("column", "__pid").orderBy("v")
            )
        ).alias("__r"),
        "__n",
    )
    nulls = (
        melted.groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("__total"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
        )
    )

    def q_at(p: float):
        target = F.ceil(F.lit(p) * F.col("__n"))
        return F.max(F.when(F.col("__r") <= target, F.col("v")))

    stats = ranked.groupBy("column").agg(
        F.count(F.lit(1)).alias("__nn"),
        F.count_distinct(F.col("v")).alias("ndv"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
        F.round(q_at(0.25), 6).alias("q25"),
        F.round(q_at(0.5), 6).alias("q50"),
        F.round(q_at(0.75), 6).alias("q75"),
    )
    return (
        nulls.join(stats, "column", "left")
        .select(
            "column",
            F.col("__total").alias("n"),
            "n_null",
            F.coalesce(F.col("ndv"), F.lit(0)).alias("ndv"),
            "min_v",
            "max_v",
            "q25",
            "q50",
            "q75",
        )
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
) -> DataFrame:
    """Association-rule mining for item PAIRS → one row per co-occurring
    (item_a < item_b): (item_a, item_b, n_a, n_b, n_ab, support,
    conf_a_b, conf_b_a, lift). The market-basket read for data curation:
    which domains co-occur in the same user's history, which tags ride
    together, which brands share customers — `lift > 1` is genuine
    affinity, `lift < 1` is avoidance, and confidence gives the rule
    direction (Agrawal–Srikant 1994 semantics restricted to 2-itemsets,
    which is the size that matters for co-occurrence panels and the one
    that stays oracle-exact).

    support = n_ab/N (N = distinct baskets), conf_a_b = n_ab/n_a,
    lift = n_ab·N/(n_a·n_b) — all single IEEE expressions over exact
    bigint counts, rounded 6 dp. Presence-based: duplicate (basket,
    item) rows collapse first.

    Scale shape: one distinct + two hash aggregates + ONE per-basket
    self-join whose fan-out is Σ basket_size² — bounded when the item
    vocabulary is a facet (brands, tags, domains); for unbounded items
    cap the basket first (top-N per basket), exactly like the posting-
    join family's df caps. The basket count N rides a broadcast
    one-row frame — nothing collects."""
    baskets = (
        df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i"))
        .filter(F.col("b").isNotNull() & F.col("i").isNotNull())
        .distinct()
        .persist()
    )
    nb = baskets.select(F.count_distinct(F.col("b")).alias("__nb"))
    item_counts = baskets.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b")) & (F.col("a.i") < F.col("b.i")),
        )
        .groupBy(
            F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_count))
    )
    enriched = (
        pair_counts.join(
            item_counts.select(
                F.col("i").alias("item_a"), F.col("n").alias("n_a")
            ),
            "item_a",
        )
        .join(
            item_counts.select(
                F.col("i").alias("item_b"), F.col("n").alias("n_b")
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
    )
    return enriched.select(
        "item_a",
        "item_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.round(F.col("n_ab").cast("double") / F.col("__nb"), 6).alias(
            "support"
        ),
        F.round(F.col("n_ab").cast("double") / F.col("n_a"), 6).alias(
            "conf_a_b"
        ),
        F.round(F.col("n_ab").cast("double") / F.col("n_b"), 6).alias(
            "conf_b_a"
        ),
        F.round(
            F.col("n_ab").cast("double")
            * F.col("__nb")
            / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ).alias("lift"),
    )


def record_linkage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str] | None = None,
    prefix_len: int = 48,
    block_width: int = 6,
    max_dist: int = 8,
    length_col: str | None = None,
    length_band: int | None = None,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked fuzzy RECORD LINKAGE (entity resolution): emit candidate
    record pairs whose normalized ``text_col`` prefixes sit within
    ``max_dist`` edit operations — the match step of the classic
    Fellegi-Sunter pipeline, with multi-pass blocking standing in for
    the O(n²) compare-everything matrix a 100 TB corpus can never afford.

    Blocking (two passes, union'd): records agree on ``block_cols`` plus
    one of two disjoint ``block_width``-char windows of the normalized
    prefix (chars [0, w) or [w, 2w)) — a single early edit moves a record
    out of window 1 but leaves window 2 intact, so near-identical records
    survive one disruption anywhere in the first window. An optional
    ``length_band`` on ``length_col`` prunes candidates whose raw lengths
    differ by more than the band (a blocking decision, mirrored verbatim
    in any oracle — NOT claimed as distance-equivalent, because the band
    reads the full-record length while the distance reads the prefix).

    Matching: ``levenshtein(norm_a, norm_b) <= max_dist`` with Spark's
    bounded form (``levenshtein(l, r, threshold)`` early-exits the DP
    once the band is exceeded — O(len·band) per pair, not O(len²)).

    Scale shape: candidate generation is two self-equi-joins that shuffle
    on (block_cols, window) — block-sized, never corpus-sized; the UNION
    dedups pairs found by both passes. Hot blocks (one language + one
    boilerplate prefix dominating a crawl) are the skew risk: pass
    ``max_block`` to DROP blocks larger than the cap before pairing — a
    deterministic recall trade, the banding analogue of dedup's df caps;
    the drop count surfaces in Spark metrics, and any oracle must apply
    the same rule.
    """
    from bullet_spark_spark.operators._cache import persist_generation

    block_cols = list(block_cols or [])
    norm = F.lower(F.substring(F.col(text_col), 1, prefix_len))
    base = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c).alias(f"__b{i}") for i, c in enumerate(block_cols)],
        norm.alias("__norm"),
        *(
            [F.col(length_col).cast("long").alias("__len")]
            if length_band is not None and length_col is not None
            else []
        ),
    )
    # the normalized projection feeds 4 consumers (2 blocking passes x 2
    # join sides): persisted (bounded generation) or each re-scans the
    # corpus — the audit_scans double-consumer hazard
    (base,) = persist_generation("relational.record_linkage.base", base)

    def pass_pairs(offset: int) -> DataFrame:
        keyed = base.withColumn(
            "__blk", F.substring(F.col("__norm"), offset + 1, block_width)
        )
        if max_block is not None:
            sizes = keyed.groupBy(
                *[f"__b{i}" for i in range(len(block_cols))], "__blk"
            ).agg(F.count(F.lit(1)).alias("__n"))
            keyed = keyed.join(
                F.broadcast(sizes.filter(F.col("__n") <= max_block)),
                [f"__b{i}" for i in range(len(block_cols))] + ["__blk"],
                "left_semi",
            )
        a = keyed.select(
            *[F.col(c).alias(c + "_a") for c in keyed.columns]
        )
        b = keyed.select(
            *[F.col(c).alias(c + "_b") for c in keyed.columns]
        )
        cond = (F.col("__blk_a") == F.col("__blk_b")) & (
            F.col("__id_a") < F.col("__id_b")
        )
        for i in range(len(block_cols)):
            cond &= F.col(f"__b{i}_a") == F.col(f"__b{i}_b")
        if length_band is not None and length_col is not None:
            cond &= (
                F.abs(F.col("__len_a") - F.col("__len_b")) <= length_band
            )
        return a.join(b, cond).select(
            "__id_a", "__id_b", "__norm_a", "__norm_b"
        )

    cand = pass_pairs(0).union(pass_pairs(block_width)).distinct()
    scored = cand.withColumn(
        "dist", F.levenshtein(F.col("__norm_a"), F.col("__norm_b"), max_dist)
    ).filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    return scored.select(
        F.col("__id_a").alias("id_a"),
        F.col("__id_b").alias("id_b"),
        F.col("dist").cast("long").alias("dist"),
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: dict[str, Column],
    insert_cols: dict[str, Column],
    delete_cond: Column | None = None,
) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg warehouse upsert) as ONE
    full-outer join — no table format required, the same row algebra:

    - MATCHED and ``delete_cond``        → row dropped
    - MATCHED otherwise                  → target row with ``update_cols``
      expressions applied (reference ``t.<col>`` / ``s.<col>``)
    - NOT MATCHED BY SOURCE (target-only)→ target row unchanged
    - NOT MATCHED BY TARGET (source-only)→ inserted via ``insert_cols``

    Output schema is the TARGET schema (key columns + non-key columns);
    every non-key target column must appear in both ``update_cols`` and
    ``insert_cols``. Match detection uses a source-side literal flag, not
    key nullability, so NULL join keys in data can't masquerade as
    non-matches.

    Scale shape: one shuffle on the merge keys for the full-outer join
    (broadcast if the source delta is small — the usual case for daily
    upserts); all branch logic is per-row CASE projections, codegen'd,
    no second pass. This is exactly the physical plan Delta's MERGE
    executes under the hood (join + per-row branch), minus the
    transaction-log commit.
    """
    tcols = target.columns
    non_keys = [c for c in tcols if c not in keys]
    missing = [c for c in non_keys if c not in update_cols or c not in insert_cols]
    if missing:
        raise ValueError(f"update/insert specs must cover target columns: {missing}")
    t = target.alias("t").withColumn("__t_present", F.lit(1))
    s = source.alias("s").withColumn("__s_present", F.lit(1))
    j = t.join(s, keys, "full_outer")
    matched = F.col("__t_present").isNotNull() & F.col("__s_present").isNotNull()
    t_only = F.col("__s_present").isNull()
    if delete_cond is not None:
        j = j.filter(~(matched & delete_cond))
    out_cols = []
    for c in keys:
        out_cols.append(F.col(c).alias(c))  # coalesced by the USING join
    for c in non_keys:
        out_cols.append(
            F.when(matched, update_cols[c])
            .when(t_only, F.col(f"t.{c}"))
            .otherwise(insert_cols[c])
            .alias(c)
        )
    return j.select(*out_cols)


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    bucket_counts: Sequence[int] = (256, 4096),
) -> DataFrame:
    """Pre-flight equi-join OUTPUT-SIZE estimate → one row with the
    bucketed-histogram estimates beside the exact size: the companion of
    :func:`key_skew_report` for the OTHER pre-flight question — not "is
    one key hot" but "how many rows will this join emit" (shuffle-write
    sizing, AQE broadcast-threshold sanity, cost gating a 100 TB join
    before paying for it).

    Estimator: hash keys into ``m`` buckets (md5-derived — portable, so
    any engine reproduces the exact same estimate), count per bucket on
    each side, estimate = Σ_b |L_b|·|R_b|. That is the classic
    equi-width hash-histogram bound: an OVERestimate that tightens to
    the exact Σ_k l(k)·r(k) as m grows past the distinct-key count
    (each bucket → one key); reporting two resolutions shows the
    convergence. Cost: one combinable count-agg per side per resolution
    over m-row frames — metadata-scale against the join itself. The
    EXACT side is Σ_k l(k)·r(k) via per-key counts + an inner join on
    the (distinct-key-sized) count frames — never materializing the
    join. All integer arithmetic: the whole panel is engine-exact."""

    def _bucket(col: Column, m: int) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("bigint"),
            F.lit(m),
        )

    l_k = left.select(F.col(key_col).alias("k")).filter(F.col("k").isNotNull())
    r_k = right.select(F.col(key_col).alias("k")).filter(F.col("k").isNotNull())
    lc = l_k.groupBy("k").agg(F.count(F.lit(1)).alias("cl"))
    rc = r_k.groupBy("k").agg(F.count(F.lit(1)).alias("cr"))
    exact = (
        lc.join(rc, "k")
        .agg(
            F.sum(
                F.col("cl").cast("decimal(38,0)") * F.col("cr")
            ).alias("exact")
        )
        .select(F.col("exact").cast("bigint").alias("exact_size"))
    )
    ests = []
    for m in bucket_counts:
        lb = l_k.groupBy(_bucket(F.col("k"), m).alias("b")).agg(
            F.count(F.lit(1)).alias("cl")
        )
        rb = r_k.groupBy(_bucket(F.col("k"), m).alias("b")).agg(
            F.count(F.lit(1)).alias("cr")
        )
        ests.append(
            lb.join(rb, "b")
            .agg(
                F.sum(
                    F.col("cl").cast("decimal(38,0)") * F.col("cr")
                ).alias("e")
            )
            .select(F.col("e").cast("bigint").alias(f"est_{m}"))
        )
    tot = (
        l_k.agg(F.count(F.lit(1)).cast("bigint").alias("n_left"))
        .crossJoin(F.broadcast(r_k.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_right")
        )))
    )
    # 1-row frames: broadcast crossJoins are stat-panel assembly, bounded
    out = tot.crossJoin(F.broadcast(exact))
    for e in ests:
        out = out.crossJoin(F.broadcast(e))
    cols = [F.col("n_left"), F.col("n_right"), F.col("exact_size")]
    for m in bucket_counts:
        cols.append(F.col(f"est_{m}"))
        cols.append(
            F.round(
                (F.col(f"est_{m}") - F.col("exact_size")).cast("double")
                / F.col("exact_size"),
                6,
            ).alias(f"overest_{m}")
        )
    return out.select(*cols)
