"""Property-based differentials for the layout arithmetic: random key
sets and bounds run through the Spark columns AND pure-Python
references in one job per example — exact integer scaling (the
(a - a%b)/b identity vs Python //), Morton interleave at 2 and 3
dimensions, round-trip monotonicity (scaling preserves order), and the
RRF fusion order against an exact-decimal reference on random partial
rankings."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bullet_spark_spark.operators import layout as lay
from bullet_spark_spark.operators import similarity as sim


def _morton_py(vals: tuple[int, ...], bits: int) -> int:
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * len(vals) + i)
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=25, unique=True),
    st.integers(0, 1000),
    st.integers(2, 16),
)
def test_scale_int_matches_python_floor_div(spark, xs, lo_off, bits):
    lo = min(xs) - lo_off
    hi = max(xs)
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = dict(
        (r["x"], r["s"])
        for r in df.select(
            "x",
            lay.scale_int(
                F.col("x"), F.lit(lo).cast("long"), F.lit(hi).cast("long"), bits
            ).alias("s"),
        ).collect()
    )
    top = (1 << bits) - 1
    span = max(1, hi - lo)
    for x in xs:
        want = ((x - lo) * top) // span
        assert got[x] == want, (x, lo, hi, bits)
        assert 0 <= got[x] <= top
    # order preservation: scaling is monotone non-decreasing
    ordered = sorted(xs)
    scaled = [got[x] for x in ordered]
    assert scaled == sorted(scaled)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=25,
    ),
    st.integers(2, 3),
)
def test_interleave_matches_python_reference_2d_3d(spark, triples, ndims):
    rows = [t[:ndims] + (i,) for i, t in enumerate(triples)]
    schema = ", ".join(f"c{i} long" for i in range(ndims)) + ", i long"
    df = spark.createDataFrame(rows, schema)
    got = {
        r["i"]: r["z"]
        for r in df.withColumn(
            "z",
            lay.interleave_bits([F.col(f"c{i}") for i in range(ndims)], bits=8),
        ).collect()
    }
    for i, t in enumerate(triples):
        assert got[i] == _morton_py(t[:ndims], 8), (t[:ndims], ndims)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(
        st.sampled_from(["r1", "r2", "r3"]),
        st.lists(st.integers(0, 30), min_size=1, max_size=8, unique=True),
        min_size=1,
        max_size=3,
    )
)
def test_rrf_fuse_order_matches_decimal_reference(spark, rankings):
    # rankings: ranker -> list of doc ids in rank order (rank = position+1)
    frames = []
    ref: dict[int, Decimal] = {}
    for name, ids in sorted(rankings.items()):
        frames.append(
            (
                name,
                spark.createDataFrame(
                    [(1, d, i + 1) for i, d in enumerate(ids)],
                    "query_id long, doc_id long, rank long",
                ),
            )
        )
        for i, d in enumerate(ids):
            ref[d] = ref.get(d, Decimal(0)) + Decimal(
                str(round(1.0 / (60 + i + 1), 9))
            )
    got = sim.rrf_fuse(frames, k=100).orderBy("rank").collect()
    want = sorted(ref, key=lambda d: (-ref[d], d))
    assert [r["doc_id"] for r in got] == want
    for r in got:
        assert abs(r["rrf"] - float(ref[r["doc_id"]])) < 1e-6
