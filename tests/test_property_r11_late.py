"""Property-based differentials for the round-11-late families:

- bfs_distances / shortest_paths vs pure-Python BFS / bounded
  Bellman-Ford references on random directed multigraphs (cycles, self
  loops filtered, parallel edges, unreachable nodes);
- merge_upsert vs a dict-based MERGE reference on random target/source
  key sets (all four branches exercised by construction);
- cdc_chunks laws on random byte-ish text: lossless contiguous cover,
  interior clamps, determinism (the hash-parity and suffix-stability
  pins live in test_r11_late_operators).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bullet_spark_spark.operators import graph as gr
from bullet_spark_spark.operators import relational as rel


def _py_bfs(edges, sources, max_hops):
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = {
            d
            for s in frontier
            for d in adj[s]
            if d not in dist
        }
        if not nxt:
            break
        for d in nxt:
            dist[d] = h
        frontier = nxt
    return dist


def _py_sssp(edges, sources, max_hops):
    # bounded Bellman-Ford: best cost over paths of <= max_hops edges
    best = {s: 0 for s in sources}
    for _ in range(max_hops):
        relaxed = dict(best)
        for s, d, w in edges:
            if s in best and best[s] + w < relaxed.get(d, float("inf")):
                relaxed[d] = best[s] + w
        if relaxed == best:
            break
        best = relaxed
    return best


_edge = st.tuples(st.integers(0, 12), st.integers(0, 12))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_edge, min_size=1, max_size=40), st.integers(1, 4))
def test_bfs_matches_python_reference(spark, raw_edges, max_hops):
    edges = [(f"n{s}", f"n{d}") for s, d in raw_edges if s != d]
    if not edges:
        return
    sources = ["n0", "n5"]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    srcs = spark.createDataFrame([(s,) for s in sources], "node string")
    got = {
        r["node"]: r["dist"]
        for r in gr.bfs_distances(sdf, srcs, max_hops=max_hops).collect()
    }
    assert got == _py_bfs(edges, sources, max_hops)


_wedge = st.tuples(st.integers(0, 10), st.integers(0, 10), st.integers(1, 9))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_wedge, min_size=1, max_size=40), st.integers(1, 4))
def test_sssp_matches_python_reference(spark, raw_edges, max_hops):
    edges = [(f"n{s}", f"n{d}", w) for s, d, w in raw_edges if s != d]
    if not edges:
        return
    sources = ["n0", "n3"]
    sdf = spark.createDataFrame(edges, "src string, dst string, w long")
    srcs = spark.createDataFrame([(s,) for s in sources], "node string")
    got = {
        r["node"]: r["cost"]
        for r in gr.shortest_paths(sdf, srcs, max_hops=max_hops).collect()
    }
    # the python reference relaxes ALL edges per round (classic BF), the
    # operator relaxes cheapest-parallel-edge from improved nodes only —
    # both compute min cost over <= max_hops-edge paths
    assert got == _py_sssp(edges, sources, max_hops)


def _py_merge(tgt, src, delete_gt):
    out = {}
    for k, v in tgt.items():
        if k in src:
            if src[k] > delete_gt:
                continue  # matched-delete
            out[k] = v + src[k]  # matched-update
        else:
            out[k] = v  # target passthrough
    for k, dv in src.items():
        if k not in tgt:
            out[k] = dv  # insert
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.dictionaries(st.integers(0, 15), st.integers(0, 100), max_size=12),
    st.dictionaries(st.integers(0, 15), st.integers(0, 100), max_size=12),
    st.integers(20, 80),
)
def test_merge_upsert_matches_dict_reference(spark, tgt, src, delete_gt):
    if not tgt or not src:
        return
    tdf = spark.createDataFrame(list(tgt.items()), "k long, v long")
    sdf = spark.createDataFrame(list(src.items()), "k long, delta long")
    out = rel.merge_upsert(
        tdf,
        sdf,
        ["k"],
        update_cols={"v": F.col("t.v") + F.col("s.delta")},
        insert_cols={"v": F.col("s.delta")},
        delete_cond=F.col("s.delta") > delete_gt,
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == _py_merge(tgt, src, delete_gt)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            min_size=0,
            max_size=600,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_cdc_laws_on_random_text(spark, texts):
    from bullet_spark_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    rows = cdc_chunks(df, "id", "t", min_size=8, max_size=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(r)
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_pos"])
        if not raw:
            assert not chunks
            continue
        end = 0
        for j, r in enumerate(chunks):
            assert r["chunk_pos"] == end  # contiguous cover
            assert r["chunk_idx"] == j
            assert r["chunk_len"] >= 1
            assert r["chunk_len"] <= 64
            if j < len(chunks) - 1:
                assert r["chunk_len"] >= 8  # interior min clamp
            end += r["chunk_len"]
        assert end == len(raw)  # lossless


def _py_attribution(touches, convs, lookback):
    # touches: (user, tid, tts, channel); convs: (user, cid, cts, value)
    out = {}
    for u, cid, cts, val in convs:
        win = sorted(
            [
                (tts, tid, ch)
                for (tu, tid, tts, ch) in touches
                if tu == u and tts <= cts and tts >= cts - lookback
            ]
        )
        if not win:
            continue
        first_ch, last_ch = win[0][2], win[-1][2]
        n = len(win)
        for _, _, ch in win:
            d = out.setdefault(ch, [0, 0, 0.0, 0.0])
            d[2] += round(1.0 / n, 9)
        out[first_ch][0] += 1
        out[last_ch][1] += 1
        out[last_ch][3] += val
    return {
        ch: (f, l, round(lin, 6), round(v, 6))
        for ch, (f, l, lin, v) in out.items()
    }


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),      # user
            st.integers(0, 500),    # touch time (seconds)
            st.integers(0, 2),      # channel
        ),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 3),      # user
            st.integers(0, 500),    # conversion time
            st.integers(1, 50),     # value
        ),
        min_size=1,
        max_size=10,
        unique=True,
    ),
)
def test_attribution_matches_python_reference(spark, raw_touch, raw_conv):
    from datetime import datetime, timedelta

    import bullet_spark_spark.operators.behavior as bh

    t0 = datetime(2024, 1, 1)
    touches = [
        (u, i + 1000, t0 + timedelta(seconds=s), f"ch{c}")
        for i, (u, s, c) in enumerate(raw_touch)
    ]
    convs = [
        (u, i + 9000, t0 + timedelta(seconds=s), float(v))
        for i, (u, s, v) in enumerate(raw_conv)
    ]
    lookback = 120
    tdf = spark.createDataFrame(
        touches, "user_id long, touch_id long, touch_ts timestamp, channel string"
    )
    cdf = spark.createDataFrame(
        convs, "user_id long, conv_id long, conv_ts timestamp, value double"
    )
    got = {
        r["channel"]: (
            r["first_touch_convs"],
            r["last_touch_convs"],
            r["linear_credit"],
            r["last_touch_value"],
        )
        for r in bh.attribution(
            tdf, cdf, "user_id", "channel",
            value_col="value", lookback_sec=lookback,
        ).collect()
    }
    want = _py_attribution(
        [(u, tid, ts, ch) for u, tid, ts, ch in touches],
        [(u, cid, ts, v) for u, cid, ts, v in convs],
        timedelta(seconds=lookback),
    )
    assert got == want
