"""Data-quality validation — Deequ-style declarative constraint checks
(Schelter et al., "Automating Large-Scale Data Quality Verification",
VLDB 2018) over DataFrames: completeness, ranges, patterns, accepted
values, and uniqueness, reported as one tidy violations frame.

The reference engine has no validation surface (records are schema-less
and unchecked, MockDeserializer.scala:15); a storage-owning engine wants
the pipeline gate: validate a batch BEFORE it lands, quarantine or fail
on violations — the same posture as the dead-letter split in
sources/streaming.py, but rule-driven and declarative.

Scale shape: all row-level rules evaluate in ONE aggregation pass over
one scan — each rule is a conditional count riding the same
partial/final split, so adding rules adds codegen expressions, not jobs.
Uniqueness needs its own shuffle per distinct key set (it is a grouped
cardinality question), aggregated to one row each. Everything is
engine-portable arithmetic — the report is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def complete(col: str) -> Column:
    """Rule: column is non-null."""
    return F.col(col).isNotNull()


def in_range(col: str, lo: float, hi: float) -> Column:
    """Rule: lo <= col <= hi (NULL violates — range implies presence)."""
    return F.col(col).isNotNull() & F.col(col).between(lo, hi)


def matches(col: str, pattern: str) -> Column:
    """Rule: column fully matches the regex (NULL violates)."""
    return F.col(col).isNotNull() & F.col(col).rlike(pattern)


def accepted_values(col: str, values: list) -> Column:
    """Rule: column is one of the accepted values (NULL violates)."""
    return F.col(col).isin(*values)


def non_negative(col: str) -> Column:
    """Rule: col >= 0 (NULL violates)."""
    return F.col(col).isNotNull() & (F.col(col) >= 0)


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate row-level rules in ONE aggregation pass: returns
    (rule, n_rows, violations, pass_fraction) — one row per rule,
    pass_fraction rounded to 6 dp. A rule is any boolean Column; NULL
    rule results count as violations (SQL three-valued logic would
    silently pass them)."""
    if not rules:
        raise ValueError("validate() needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, pred) in enumerate(rules.items()):
        aggs.append(
            F.sum(
                F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v{i}")
        )
    row = df.agg(*aggs)
    # ONE plan consuming the aggregate once: the tidy per-rule frame is an
    # explode over an array of structs (a per-rule select + union would
    # physically re-run the whole aggregation — and its scan — per rule)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"), F.col(f"__v{i}").alias("violations")
            )
            for i, name in enumerate(rules)
        ]
    )
    return (
        row.select(F.col("__n"), F.explode(entries).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col("e.violations").alias("violations"),
            F.when(
                F.col("__n") > 0,
                F.round(1.0 - F.col("e.violations") / F.col("__n"), 6),
            )
            .otherwise(F.lit(1.0))
            .alias("pass_fraction"),
        )
    )


def uniqueness(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness report for one key set: (key, n_rows, n_distinct,
    n_dup_rows, unique_fraction) — n_dup_rows counts every row whose key
    tuple occurs more than once (the rows a dedup would have to
    arbitrate). One shuffle on the key; the second aggregation runs over
    the reduced (one row per key) frame."""
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return per_key.agg(
        F.lit(",".join(cols)).alias("key"),
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
            "n_dup_rows"
        ),
        F.round(F.count(F.lit(1)) / F.sum("__c"), 6).alias("unique_fraction"),
    )
