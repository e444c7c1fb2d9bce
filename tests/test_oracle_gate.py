"""Regression tests for the local oracle gate's r5 blind spots.

CORRECTNESS_r05 went 45/50 red on queries the local gate green-lit: raw
DECIMAL output columns (driver hasher fetches decimals differently per
engine) and ARRAY output columns (driver's pandas canonicalizer raises
``unhashable type: 'list'``). tools/check_oracle.py now carries a surface
audit + strict type classes + a container-refusing canon(); these tests pin
each of those behaviors so the blind spot cannot silently reopen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tools.check_oracle import canon, surface_violations, type_mismatches


def test_surface_audit_flags_decimal(spark):
    df = spark.range(3).select(
        F.col("id"), F.col("id").cast("decimal(28,6)").alias("total")
    )
    viol = surface_violations(df)
    assert viol == ["total: decimal(28,6)"]


def test_surface_audit_flags_array_map_struct(spark):
    df = spark.range(2).select(
        F.array(F.col("id")).alias("a"),
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.struct(F.col("id")).alias("s"),
    )
    names = [v.split(":")[0] for v in surface_violations(df)]
    assert names == ["a", "m", "s"]


def test_surface_audit_passes_driver_safe_schema(spark):
    df = spark.range(2).select(
        F.col("id"),
        F.col("id").cast("double").alias("d"),
        F.lit("x").alias("s"),
        F.lit(True).alias("b"),
        F.current_date().alias("dt"),
    )
    assert surface_violations(df) == []


def test_canon_refuses_containers():
    with pytest.raises(TypeError, match="driver-unhashable"):
        canon([1.0, 2.0])
    with pytest.raises(TypeError):
        canon((1, 2))


def test_typed_audit_no_decimal_whitelist(spark, duck):
    """r5 red #3 class: spark decimal vs duck decimal used to be whitelisted
    even though the driver hash-mismatches it. Now it only passes when BOTH
    sides agree AND the surface audit would separately reject the decimal —
    here we assert the strict class compare flags decimal-vs-float."""
    sdf = spark.range(1).select(F.lit(1).cast("decimal(18,6)").alias("v"))
    cur = duck.execute("SELECT CAST(1 AS DOUBLE) AS v")
    assert type_mismatches(sdf, cur) == ["v: spark=decimal duck=float"]


def test_typed_audit_flags_hugeint(spark, duck):
    """The original r4 class: DuckDB sum(int) OVER → HUGEINT vs Spark LONG.
    HUGEINT arrives through Arrow as decimal128(38,0) — either label must
    fail the strict class compare against spark=int."""
    sdf = spark.range(1).select(F.lit(170).cast("long").alias("v"))
    cur = duck.execute("SELECT CAST(170 AS HUGEINT) AS v")
    mis = type_mismatches(sdf, cur)
    assert len(mis) == 1 and mis[0].startswith("v: spark=int duck=")


def test_fixed_scale_csv_matches_across_engines(spark, duck):
    """The array-serialization convention: fixed-scale DECIMAL(18,6)→string
    renders identically in Spark and DuckDB (padding included)."""
    vals = [0.5, -1.25, 0.0, 123.456789, -0.000001]
    srow = (
        spark.createDataFrame([(vals,)], "a array<double>")
        .select(
            F.array_join(
                F.transform(
                    "a", lambda x: x.cast("decimal(18,6)").cast("string")
                ),
                ",",
            ).alias("csv")
        )
        .first()["csv"]
    )
    drow = duck.execute(
        "SELECT array_to_string([CAST(CAST(x AS DECIMAL(18,6)) AS VARCHAR)"
        " FOR x IN [0.5, -1.25, 0.0, 123.456789, -0.000001]], ',') AS csv"
    ).fetchone()[0]
    assert srow == drow
    assert srow == "0.500000,-1.250000,0.000000,123.456789,-0.000001"


def test_r11_window_occupies_driver_slots():
    """The driver certifies the FIRST 50 registrations; the current
    round's window list must exactly occupy those slots under BOTH
    window interpretations (first-50-registrations and first-50-oracle-
    eligible — the r11 list is all-oracle-eligible, so the 11 queued
    rows, the 2 skewed-fixture rows, and every changed-implementation
    re-certification sit inside the gate either way; a stray
    registration reordering would silently rotate an uncertified query
    out)."""
    import re

    import __spark_entry__ as entry

    src = open(entry.__file__).read()
    win = re.search(r"_WINDOW_R11 = \[(.*?)\]\n_rotate_window", src, re.S).group(1)
    names = re.findall(r'"([^"]+)"', win)
    assert len(names) == 56
    regs = list(entry.queries())
    assert regs[:56] == names
    oracles = entry.oracle_sql()
    first50_oracle = [n for n in regs if n in oracles][:50]
    # the 11 queued oracle rows lead the window, then the 2 skewed
    # fixtures, then the changed-impl re-certifications (closure fast
    # path + df-cap memo epoch consumers) — all inside the gate under
    # either reading
    queued = names[:11]
    skewed = names[11:13]
    recerts = names[13:22]
    assert all(n in oracles for n in names)  # r11: no rows-only in-window
    assert set(queued) <= set(first50_oracle)
    assert set(skewed) <= set(first50_oracle)
    assert set(recerts) <= set(first50_oracle)
    assert set(queued + skewed + recerts) <= set(regs[:50])
    assert recerts == [
        "dedup_neardup_components",
        "dedup_minhash_survivors",
        "dedup_semantic_survivors",
        "dedup_ensemble_survivors",
        "sampling_split_leakage",
        "dedup_weighted_jaccard",
        "dedup_containment_pairs",
        "dedup_winnow_pairs",
        "dedup_fuzzy_pairs",
    ]


# ---------------------------------------------------------------------------
# r11: rows-only meta-gate (VERDICT r10 "what's wrong" #2)
# ---------------------------------------------------------------------------

def test_meta_gate_flags_unasserted_rows_only_fixture():
    from tools.check_oracle import unasserted_rows_only

    qs = {"a": None, "b": None, "c": None}
    oracles = {"a": "SELECT 1"}
    asserts = {"b": None}
    # "c" is rows-only with no quality assert -> the sweep must fail on it
    assert unasserted_rows_only(qs, oracles, asserts) == ["c"]
    # covering "c" clears the gate
    assert unasserted_rows_only(qs, oracles, {"b": None, "c": None}) == []


def test_meta_gate_exits_nonzero_on_unasserted_registration(monkeypatch, capsys):
    # end-to-end: main() must sys.exit(2) BEFORE running any query when
    # the live inventory is polluted with an unasserted rows-only entry
    import sys as _sys

    import __spark_entry__ as entry
    from tools import check_oracle

    polluted = dict(entry.queries())
    polluted["__r11_unasserted__"] = lambda spark, sf: None
    monkeypatch.setattr(entry, "queries", lambda: polluted)
    monkeypatch.setattr(_sys, "argv", ["check_oracle.py"])
    with pytest.raises(SystemExit) as exc:
        check_oracle.main()
    assert exc.value.code == 2
    assert "__r11_unasserted__" in capsys.readouterr().out


def test_meta_gate_clean_on_live_inventory():
    import __spark_entry__ as entry
    from tools.check_oracle import unasserted_rows_only

    missing = unasserted_rows_only(
        entry.queries(), entry.oracle_sql(), entry.quality_asserts()
    )
    assert missing == [], f"rows-only queries without asserts: {missing}"
