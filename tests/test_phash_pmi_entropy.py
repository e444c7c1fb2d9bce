"""Perceptual-hash image dedup, PMI collocations, char-entropy quality."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from bullet_spark_spark.operators import dedup as dd
from bullet_spark_spark.operators import multimodal as mm
from bullet_spark_spark.operators import text as tx


def _media_df(spark, images):
    """images: list[(media_id, HxWx3 uint8 array)] -> MEDIA_SCHEMA frame."""
    rows = [
        (mid, "image/png", bytearray(mm.encode_png(arr)), {})
        for mid, arr in images
    ]
    return spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)


def test_phash_invariant_to_brightness_and_separates_content(spark):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, size=(24, 24, 3), dtype=np.uint8)
    brighter = np.clip(base.astype(np.int16) + 30, 0, 255).astype(np.uint8)
    other = rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
    df = _media_df(spark, [(1, base), (2, brighter), (3, other)])
    hashes = {
        r["media_id"]: r["phash"]
        for r in mm.phash_images(mm.decode_image(df)).collect()
    }
    assert len(hashes) == 3
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(hashes[1], hashes[2]) <= 3  # uniform brightness: same structure
    assert ham(hashes[1], hashes[3]) > 10  # unrelated content


def test_phash_neardup_pairs_via_pigeonhole(spark):
    rng = np.random.default_rng(11)
    base = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    copy = np.clip(base.astype(np.int16) + 12, 0, 255).astype(np.uint8)
    others = [
        (i, rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8))
        for i in range(3, 7)
    ]
    df = _media_df(spark, [(1, base), (2, copy)] + others)
    fps = mm.phash_images(mm.decode_image(df))
    pairs = dd.hamming_near_dup_pairs(fps, "media_id", "phash", max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    # unrelated random images must not collide within hamming 3
    assert all(p == (1, 2) for p in got)


def test_hamming_near_dup_pairs_matches_brute_force(spark):
    rng = np.random.default_rng(3)
    sigs = []
    base = int(rng.integers(0, 1 << 62))
    sigs.append((0, base))
    for i in range(1, 6):  # flip i low bits
        sigs.append((i, base ^ ((1 << i) - 1)))
    sigs.append((6, -(1 << 63) + 5))  # negative long: sign-extension path
    sigs.append((7, -(1 << 63) + 4))
    df = spark.createDataFrame(sigs, ["id", "sig"])
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dd.hamming_near_dup_pairs(df, "id", "sig", 3).collect()
    }
    expected = {}
    for i, (ia, sa) in enumerate(sigs):
        for ib, sb in sigs[i + 1:]:
            h = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                expected[(ia, ib)] = h
    assert got == expected
    assert (6, 7) in got  # negative signatures handled


def test_collocations_pmi_finds_glued_pair(spark):
    # 'alpha beta' always adjacent; filler words rotate per doc so no
    # filler adjacency repeats >= min_count times
    rows = [
        (i, "alpha beta " + " ".join(f"w{(j * (i + 3)) % 17}" for j in range(10)))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = tx.collocations_pmi(df, min_count=5, top_n=5).collect()
    pairs = [(r["w1"], r["w2"]) for r in top]
    assert ("alpha", "beta") in pairs
    r = next(r for r in top if (r["w1"], r["w2"]) == ("alpha", "beta"))
    assert r["pair_count"] == 20 and r["pmi"] > 0


def test_collocations_pmi_oracle_differential(spark, tables, duck):
    got = [
        (r["w1"], r["w2"], r["pair_count"], r["pmi"])
        for r in tx.collocations_pmi(
            tables["documents"], min_count=10, top_n=20
        ).collect()
    ]
    oracle = duck.execute("""
        WITH t AS (SELECT string_split_regex(trim(lower(text)), '\\s+') tk
                   FROM documents),
             w AS (SELECT unnest(tk) w FROM t),
             uni AS (SELECT w, count(*) cu FROM w GROUP BY 1),
             tot AS (SELECT CAST(count(*) AS DOUBLE) t FROM w),
             p AS (SELECT tk[i] w1, tk[i+1] w2
                   FROM t, UNNEST(generate_series(1, len(tk)-1)) g(i)),
             nn AS (SELECT CAST(count(*) AS DOUBLE) n FROM p),
             big AS (SELECT w1, w2, count(*) pair_count FROM p
                     GROUP BY 1, 2 HAVING count(*) >= 10)
        SELECT b.w1, b.w2, b.pair_count,
               round(ln((b.pair_count / nn.n) /
                        ((u1.cu / tot.t) * (u2.cu / tot.t))), 6) pmi
        FROM big b JOIN uni u1 ON u1.w = b.w1
                   JOIN uni u2 ON u2.w = b.w2, nn, tot
        ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20
    """).fetchall()
    assert [(a, b, c, round(p, 6)) for a, b, c, p in oracle] == [
        (a, b, c, round(p, 6)) for a, b, c, p in got
    ]


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, None), (5, "abcd")],
        ["id", "t"],
    )
    got = {
        r["id"]: r["h"]
        for r in df.select("id", tx.char_entropy(F.col("t")).alias("h")).collect()
    }
    assert got[1] == 0.0
    assert abs(got[2] - round(math.log(2), 6)) < 2e-6
    assert got[3] == 0.0 and got[4] == 0.0
    assert abs(got[5] - round(math.log(4), 6)) < 2e-6


def test_char_entropy_oracle_differential(spark, tables, duck):
    got = {
        r["doc_id"]: r["entropy"]
        for r in tables["documents"]
        .select("doc_id", tx.char_entropy(F.col("text")).alias("entropy"))
        .collect()
    }
    oracle = duck.execute("""
        WITH c AS (SELECT doc_id, unnest(string_split(text, '')) ch,
                          len(text) n
                   FROM documents WHERE len(text) > 0),
             f AS (SELECT doc_id, ch, n, count(*) cnt FROM c GROUP BY 1, 2, 3)
        SELECT doc_id,
               round(CAST(sum(CAST(round(
                     -(cnt * 1.0 / n) * ln(cnt * 1.0 / n), 9)
                  AS DECIMAL(28,9))) AS DOUBLE), 6) entropy
        FROM f GROUP BY doc_id
    """).fetchall()
    assert len(oracle) > 0
    for doc_id, h in oracle:
        assert abs(got[doc_id] - h) < 1e-9, doc_id


def test_url_normalization_cases(spark):
    from bullet_spark_spark.operators import text as tx

    cases = [
        ("HTTPS://WWW.Site.COM:443/A/B/?utm_source=x&q=1&fbclid=z#top",
         "https://site.com/A/B/?q=1"),
        ("http://Example.org:80/", "http://example.org"),
        ("http://example.org:8080/x", "http://example.org:8080/x"),
        ("https://a.co.uk/path/", "https://a.co.uk/path"),
        ("https://b.com/?utm_medium=m", "https://b.com"),
        ("https://c.com/p?id=3&utm_term=t&key=v", "https://c.com/p?id=3&key=v"),
        ("https://d.com/CaseSensitive/Path", "https://d.com/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["n"] for r in df.select(tx.normalize_url(F.col("u")).alias("n")).collect()]
    assert got == [w for _, w in cases]


def test_url_registrable_domain(spark):
    from bullet_spark_spark.operators import text as tx

    cases = [
        ("https://www.news.bbc.co.uk/story", "bbc.co.uk"),
        ("http://a.b.example.com/x", "example.com"),
        ("https://example.org", "example.org"),
        ("https://deep.sub.gov.ac.jp/", "gov.ac.jp"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [
        r["d"]
        for r in df.select(tx.url_registrable_domain(F.col("u")).alias("d")).collect()
    ]
    assert got == [w for _, w in cases]
