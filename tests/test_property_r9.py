"""Property-based differentials for the round-9 families:

- cusum_path vs the textbook sequential recurrence on random integer
  series (the windowed reflection closed form must be EXACTLY the
  recurrence, not an approximation);
- _greedy_pair_drops vs a pure-Python first-occurrence-wins reference on
  random pair graphs, fed in RANDOM orientation (the r9 canonicalization
  contract: unordered/symmetric input resolves identically).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import temporal as tmp


def _py_cusum(vals, k=0.5, dp=9):
    """Textbook recurrence folded in EXACT rational arithmetic. The
    operator accumulates exact decimals (that is the whole point of its
    reflection closed form), so the replica must too: a float fold
    drifts an ulp per step and the 1e-6 output floor amplifies exactly
    at grid boundaries — hypothesis found vals=[189,373,723,260,...]
    where the float replica reads 1.032976 against the exact 1.032977."""
    from fractions import Fraction

    n = len(vals)
    mean = sum(vals) / n
    var = max(sum(v * v for v in vals) / n - mean * mean, 0.0)

    def q(x, d=dp):
        return math.floor(x * 10**d) / 10**d

    mean, std = q(mean), q(math.sqrt(var))
    out = []
    sp = sn = Fraction(0)
    kf = Fraction(1, 2) if k == 0.5 else Fraction(repr(k))
    for v in vals:
        # z is quantized to the 1e-9 grid by the SAME float expression
        # the operator codegens; from here on everything is exact
        zi = math.floor((v - mean) / (std if std > 0 else 1.0) * 10**dp)
        z = Fraction(zi, 10**dp)
        sp = max(Fraction(0), sp + z - kf)
        sn = max(Fraction(0), sn - z - kf)
        out.append(
            (
                (zi // 10 ** (dp - 6)) / 1e6,
                math.floor(sp * 10**6) / 1e6,
                math.floor(sn * 10**6) / 1e6,
            )
        )
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(0, 1000), min_size=2, max_size=30))
def test_cusum_reflection_equals_recurrence(spark, vals):
    fvals = [float(v) for v in vals]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(fvals)], "ts long, v double"
    )
    got = {
        r["ts"]: (r["z"], r["s_pos"], r["s_neg"])
        for r in tmp.cusum_path(df, "ts", "v", k_slack=0.5).collect()
    }
    for i, exp in enumerate(_py_cusum(fvals)):
        assert got[i] == exp, (i, got[i], exp)


def _py_greedy_drops(pairs):
    """First-occurrence-wins over canonicalized pairs: id drops iff some
    KEPT smaller id is adjacent."""
    adj = {}
    ids = set()
    for a, b in pairs:
        lo, hi = min(a, b), max(a, b)
        if lo == hi:
            continue
        adj.setdefault(hi, set()).add(lo)
        ids.update((lo, hi))
    kept = set()
    dropped = set()
    for i in sorted(ids):
        if any(j in kept for j in adj.get(i, ())):
            dropped.add(i)
        else:
            kept.add(i)
    return dropped


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=15,
    )
)
def test_greedy_pair_drops_matches_python_reference(spark, pairs):
    sdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"] for r in dd._greedy_pair_drops(sdf).collect()}
    assert got == _py_greedy_drops(pairs)
