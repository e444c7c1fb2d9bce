"""Deduplication operators for training-data pipelines (north-star M5).

Five dedup families, all shuffle-conscious:

- exact: hash-groupBy on a normalized key — one shuffle, map-side partial.
- minhash + LSH: shingle → k minhashes → band buckets → candidate pairs only
  within buckets (never all-pairs). The exact-verify step re-checks Jaccard
  on candidates. All hashing is xxhash64 (JVM, codegen).
- simhash: 64-bit sign-aggregated token hashes; near-dups share most bits.
- n-gram Jaccard: exact pairwise similarity, bounded by a shared-shingle
  pre-join (blocking) so the pair space is data-driven, not quadratic.
- embedding cosine near-dup: delegated to operators.similarity.

At 100 TB: every family keys its shuffle by doc/bucket id, avoids driver
collects, and keeps candidate generation linear in (docs × shingles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def normalize_text(text: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


_MERSENNE_P = (1 << 31) - 1  # minhash value space; a·h + b < 2^62 fits a long


def _perm_params(i: int) -> tuple[int, int]:
    """Seeded affine-permutation coefficients over Z_p (splitmix64-style
    seeding): a ∈ [1, p−1], b ∈ [0, p). Shared by the JVM and numpy
    signature paths so both draw from the same minwise family."""
    s = (i * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) % (1 << 63)
    return (s % (_MERSENNE_P - 1)) + 1, (s >> 32) % _MERSENNE_P


# (A branch-free Mersenne-fold Column variant of the permutation mod was
# measured here: ~20% faster on the isolated signature aggregate, but the
# when/otherwise chains ×64 blow whole-stage codegen past the JIT method
# limit inside the full pipeline plan and regress it 2.5×. pmod stays.)


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact key. Single shuffle on
    the key hash; min() aggregates map-side first."""
    # NULL gets a sentinel distinct from the empty string (concat_ws would
    # silently drop nulls, colliding ("a", NULL) with ("a", ""))
    key = F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.when(F.col(c).isNull(), F.lit("\x00<NULL>"))
                .otherwise(F.col(c).cast("string"))
                for c in key_cols
            ],
        )
    )
    keep = (
        df.withColumn("__key", key)
        .groupBy("__key")
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def exact_dedup_representatives(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One representative id (min) per normalized-text md5 — the common
    'keep first copy' shape of corpus dedup. One shuffle on the 128-bit key."""
    key = F.md5(normalize_text(F.col(text_col)))
    return (
        df.groupBy(key.alias("__k"))
        .agg(F.min(F.col(id_col)).alias(id_col))
        .select(id_col)
    )


def dedup_keep_best(
    df: DataFrame,
    id_col: str,
    text_col: str,
    quality_col: str,
) -> DataFrame:
    """Dedup keeping the BEST representative per normalized-text key (by a
    quality column, ties broken by id — deterministic). One window pass
    partitioned by the content hash; at scale this is a single shuffle with
    per-partition top-1 (rank short-circuits)."""
    key = F.md5(normalize_text(F.col(text_col)))
    w = W.partitionBy(key).orderBy(F.col(quality_col).desc(), F.col(id_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def streaming_dedup(
    df: DataFrame, key_cols: list[str], event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup keyed on ``key_cols`` only; with an event-time
    column + watermark the dedup state is bounded (keys older than the
    watermark are evicted via ``dropDuplicatesWithinWatermark``) — without
    it, state grows with distinct keys forever, which is exactly the
    reference's tombstone leak (JoinStreaming.scala:60-62) we refuse to
    replicate."""
    if event_time_col:
        from bullet_spark_spark.sources.streaming import ensure_event_time

        return ensure_event_time(df, event_time_col).withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def widen_thin_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster parallelism if (and only if) it
    arrives in fewer partitions. The shingling/hashing stages below inherit
    the scan's partitioning; a corpus landing as a handful of files would
    run them near-serially. Already-wide inputs (the 100 TB case) pass
    through without a shuffle. Streaming frames pass through unchanged (no
    static partition count to inspect; micro-batch parallelism comes from
    the source).

    The fan-out is capped by the optimizer's size estimate (~16 KB of scan
    bytes per task): a tiny corpus keeps a small task count instead of
    paying full-cluster scheduling overhead, while anything
    benchmark-sized (sf0.1's documents ≈ 580 KB compressed) still widens
    to every core — measured equal-or-better at both ends."""
    if df.isStreaming:
        return df
    if target is None:
        target = df.sparkSession.sparkContext.defaultParallelism
        try:
            size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            target = max(1, min(target, size // (16 * 1024)))
        except Exception:
            pass  # stats unavailable (non-classic DataFrame) → full fan-out
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def char_shingles(text: Column, n: int = 5) -> Column:
    """Character n-gram shingle set of normalized text (distinct). Built-ins
    only: sequence + transform + substring, then array_distinct."""
    norm = normalize_text(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(norm, i, n)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams; documents with fewer than n tokens produce an
    EMPTY set (no partial shingles) — the same convention as
    text.word_ngrams and the DuckDB oracle comprehensions, so short
    documents cannot silently diverge between engine and oracle."""
    # arrays_zip of n shifted slices, NOT slice-inside-the-lambda: HOF
    # lambdas are interpreted, so a tokenizer captured in the lambda body
    # re-normalizes+re-splits the document once PER SHINGLE — O(tokens²)
    # chars/doc (same fix as text.word_ngrams; measured ~5× on the
    # curation funnel). The zip form evaluates the split n times per ROW.
    toks = F.split(normalize_text(text), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, cnt) for i in range(n)])
    return F.array_distinct(
        F.transform(
            zipped,
            lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(n)]),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle_n: int = 5
) -> DataFrame:
    """(id, sig: array<bigint>[num_hashes]) — per-permutation min of
    affine permutations of one xxhash64. Explode→groupBy(id) with k partial
    mins: one shuffle keyed by doc id, state is k longs per doc.

    Each shingle is hashed ONCE (xxhash64), reduced into the Mersenne-31
    field, and the k permutations are ``(a_i·h + b_i) mod (2³¹−1)`` with
    seeded multipliers — the standard minwise-hashing construction over a
    32-bit value space. vs hashing the string k times this cuts the
    per-row work from k full string hashes to one hash + k multiply-adds.
    Products stay below 2⁶² so ANSI-mode long arithmetic never overflows.

    Shingles are hashed POSITIONALLY — explode the position range, hash
    ``substring(t, i, n)`` directly — rather than materializing
    ``char_shingles``'s distinct string array per document: a min over a
    multiset equals the min over its set, so dropping ``array_distinct``
    (a per-doc hash set of ~|text| strings) and the array materialization
    changes nothing in the output (pinned by test) and saves ~15% wall on
    the signature stage at sf0.1."""
    df = widen_thin_input(df)
    _P = _MERSENNE_P

    norm = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__t"))
    pos = norm.select(
        F.col(id_col),
        F.col("__t"),
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.length("__t") - (shingle_n - 1), F.lit(1))
            )
        ).alias("__i"),
    )
    shingled = pos.select(
        F.col(id_col),
        F.pmod(
            F.xxhash64(F.substring(F.col("__t"), F.col("__i"), shingle_n)), F.lit(_P)
        ).alias("h"),
    )
    mins = shingled.groupBy(id_col).agg(
        *[
            F.min(
                F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_P))
            ).alias(f"h{i}")
            for i, (a, b) in ((j, _perm_params(j)) for j in range(num_hashes))
        ]
    )
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_signatures_np(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle_n: int = 5
) -> DataFrame:
    """(id, sig) minhash signatures as a MAP-ONLY stage: Arrow-batched numpy
    over ``mapInPandas``, zero shuffle.

    The JVM path's groupBy exists only to reduce the exploded shingle rows
    back to one row per doc; computing each doc's k mins inside the batch
    removes that exchange entirely — at 100 TB the signature stage becomes
    embarrassingly parallel over input splits, and locally it measures ~3×
    faster than the exploded aggregate (per-row agg-buffer updates and the
    substring/hash churn dominate there, not arithmetic).

    Same affine minwise family as :func:`minhash_signatures` (identical
    ``_perm_params``); the base shingle hash is a polynomial over the
    normalized utf-8 bytes pushed through a splitmix64 avalanche finalizer
    instead of xxhash64, so signatures are not byte-identical across the
    two paths — both are engine-specific hashes with the same estimator
    contract (tolerance-tested for each). The finalizer matters: raw
    polynomial hashes of overlapping shingles form a small lattice, which
    correlates the argmins across affine permutations and inflates LSH
    band collisions ~3.5× on repetitive corpora (measured); one avalanche
    pass restores xxhash-like candidate rates.
    Normalization happens JVM-side via :func:`normalize_text`, so the
    shingle universe matches the JVM path, including the short-document
    convention (len < n ⇒ the whole text is the single shingle)."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    df = widen_thin_input(df)
    norm = df.select(F.col(id_col), normalize_text(F.col(text_col)).alias("__t"))
    out_schema = StructType(
        [norm.schema[id_col], StructField("sig", ArrayType(LongType()))]
    )
    P = _MERSENNE_P
    params = [_perm_params(i) for i in range(num_hashes)]

    def gen(batches):
        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
        B = np.array([b for _, b in params], dtype=np.int64)[:, None]
        coeff = np.array(
            [pow(257, j, P) for j in range(shingle_n)], dtype=np.int64
        )
        for pdf in batches:
            sigs = []
            for t in pdf["__t"]:
                raw = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                if raw.size >= shingle_n:
                    win = np.lib.stride_tricks.sliding_window_view(raw, shingle_n)
                    h = win.astype(np.int64) @ coeff  # < 255·p·n ≪ 2^63
                elif raw.size:
                    h = np.atleast_1d(raw.astype(np.int64) @ coeff[: raw.size])
                else:
                    h = np.zeros(1, dtype=np.int64)
                # splitmix64 finalizer: decorrelate the polynomial lattice
                u = h.astype(np.uint64)
                u ^= u >> np.uint64(30)
                u *= np.uint64(0xBF58476D1CE4E5B9)
                u ^= u >> np.uint64(27)
                u *= np.uint64(0x94D049BB133111EB)
                u ^= u >> np.uint64(31)
                h = (u & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
                h %= P
                x = A * h[None, :] + B  # < 2^62: Mersenne folds stay exact
                x = (x >> 31) + (x & P)
                x = (x >> 31) + (x & P)
                x -= (x >= P) * P
                sigs.append(x.min(axis=1))
            yield pd.DataFrame({id_col: pdf[id_col].values, "sig": sigs})

    return norm.mapInPandas(gen, schema=out_schema)


def _banded(
    sigs: DataFrame, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band_idx, band_hash) — one row per signature band; the hash is
    xxhash64 of the band's joined component string, so equal bands collide
    regardless of the signature's element type (long or md5-hex string)."""
    return sigs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band_idx", "band_hash"),
    )


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    bands: int = 16,
    rows_per_band: int = 4,
    deduplicate: bool = True,
) -> DataFrame:
    """Band the signatures and emit candidate pairs that collide in ≥1 band.
    (id_a, id_b) with id_a < id_b. The band join is an equi-join on
    (band_idx, band_hash) — shuffle keyed by bucket, quadratic only within a
    bucket (bounded by collision rate, not corpus size).

    ``deduplicate=False`` skips the pair-level distinct (a pair colliding in
    b bands appears b times, so output multiplicity is bounded by ``bands``);
    callers that filter candidates down before materializing (the verify
    step does) can dedupe the far smaller post-filter set instead and save
    a full exchange over the candidate space."""
    banded = _banded(sigs, id_col, bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band_idx") == F.col(f"b.band_idx"))
            & (F.col(f"a.band_hash") == F.col(f"b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    return pairs.distinct() if deduplicate else pairs


def minhash_similarity(sigs: DataFrame, candidates: DataFrame, id_col: str) -> DataFrame:
    """Estimated Jaccard = fraction of matching minhash components, for the
    candidate pairs only. The denominator is the signature array's own
    length — self-consistent for any num_hashes the signatures were built
    with, no parameter to keep in sync. (Measured note: the zip_with fold
    beats a num_hashes-term static-index unroll here — the unrolled
    expression blows past codegen method limits and falls back to slower
    interpreted evaluation plus a long janino compile.)"""
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = candidates.join(sa, "id_a").join(sb, "id_b")
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    return joined.select(
        "id_a", "id_b", (matches / F.size(F.col("sig_a"))).alias("est_jaccard")
    )


_live_sigs: DataFrame | None = None  # last persisted signature frame (see below)


def _persist_sigs(sigs: DataFrame) -> DataFrame:
    """Persist a signature frame, releasing the previous one. A
    mapInPandas/UDF-derived plan carries fresh expression ids per call, so
    the CacheManager can never dedupe it: without this release, every
    invocation leaks one InMemoryRelation for the lifetime of the session (a
    long-lived driver calling dedup in a loop accumulates them). The eager
    count materializes the cache so AQE plans the downstream joins from real
    InMemoryRelation stats instead of the no-estimate default.

    A previously returned pair frame that is re-executed later simply
    recomputes its signatures through the lineage — slower, never wrong."""
    global _live_sigs
    if _live_sigs is not None:
        _live_sigs.unpersist()
    sigs = sigs.persist()
    _live_sigs = sigs
    sigs.count()
    return sigs


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    signature_engine: str = "np",
) -> DataFrame:
    """End-to-end MinHash/LSH near-dup pairs above an estimated-Jaccard
    threshold.

    ``signature_engine="np"`` (default) computes signatures with the
    shuffle-free numpy map stage; ``"jvm"`` keeps the pure-built-ins
    exploded aggregate (bit-stable vs the array construction, pinned by
    test). Banding, candidate join, and verify are identical either way.

    The signature frame feeds both the band join and the verify step, so it
    is persisted (memory+disk) rather than recomputed through the lineage —
    at scale this is the difference between one and three corpus scans."""
    sig_fn = minhash_signatures_np if signature_engine == "np" else minhash_signatures
    sigs = _persist_sigs(sig_fn(df, id_col, text_col, num_hashes))
    # Raw (multi-band-duplicated) candidates feed the verify directly; the
    # distinct runs AFTER the threshold filter, on the near-dup pairs
    # themselves rather than the whole candidate space. est_jaccard is a
    # pure function of the pair, so duplicates collapse exactly. This
    # trades ≤``bands``× verify work on duplicated pairs (measured ~3% on
    # real corpora — a pair rarely collides in many bands) for removing an
    # exchange over every candidate, and keeps verify at scan parallelism.
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, deduplicate=False
    )
    sims = minhash_similarity(sigs, cands, id_col)
    return sims.filter(F.col("est_jaccard") >= threshold).distinct()


def minhash_signatures_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<string>[num_hashes]) — ENGINE-PORTABLE minhash
    signatures: permutation ``j``'s component is the lexicographic min of
    ``md5('j:' || shingle)`` hex strings over the document's distinct word
    n-gram shingles. Any SQL engine with ``md5()`` reproduces the exact
    bytes (ASCII hex compares identically everywhere), which makes the
    WHOLE minhash/LSH pipeline — banding, candidate join, verify,
    threshold — hash-checkable against an external oracle, not just
    rows-counted. The production paths (:func:`minhash_signatures` /
    ``_np``) keep their faster engine-specific hashes; this variant pays k
    md5 string hashes per shingle for cross-engine determinism.

    Same plan shape as the JVM path: explode(shingles) → one groupBy(id)
    with k partial mins — a single shuffle keyed by doc id, k·32-char state
    per doc. Documents with fewer than ``shingle_n`` words produce no
    shingles and are absent from the output (same convention as
    :func:`word_shingles` and the DuckDB oracle comprehension)."""
    df = widen_thin_input(df)
    exploded = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__sh"),
    )
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("__sh")))).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"),
    )


def minhash_dedup_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """:func:`minhash_dedup_pairs` on the engine-portable md5 signature
    stage — banding, candidate join, and verify are the shared code paths.
    Output (id_a, id_b, est_jaccard) is deterministic across engines, so an
    external SQL oracle can hash-match it exactly.

    One caveat keeps this honest: band keys are xxhash64 of the band's
    component string (minhash_lsh_candidates), so Spark's candidate set
    could in principle differ from an exact-string-equality oracle by a
    64-bit hash collision — ~2⁻⁶⁴ per band pair, the same collision budget
    every hash-partitioned join already accepts."""
    sigs = _persist_sigs(minhash_signatures_md5(df, id_col, text_col, num_hashes, shingle_n))
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, deduplicate=False
    )
    sims = minhash_similarity(sigs, cands, id_col)
    return sims.filter(F.col("est_jaccard") >= threshold).distinct()


_CWS_MASK30 = (1 << 30) - 1


def weighted_minhash_signatures_cws(
    tf: DataFrame,
    id_col: str = "id",
    gram_col: str = "gram",
    weight_col: str = "tf",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig: array<string>[num_hashes]) — Ioffe CONSISTENT WEIGHTED
    SAMPLING signatures over a (id, gram, weight) posting frame:
    P[sig_A[j] = sig_B[j]] = Σ_g min(w_A, w_B) / Σ_g max(w_A, w_B), the
    generalized (real-weight) Jaccard, for every j independently
    [Ioffe, ICDM 2010, "Improved Consistent Sampling, Weighted Minhash
    and L1 Sketching"].

    Why this exists beside :func:`weighted_minhash_dedup_pairs_md5`'s
    integer-expansion reduction: the expansion materializes tf posting
    copies per gram (``gram#0..#(tf-1)``) — linear in corpus TOKENS,
    which degrades badly on heavy-tailed tf (a gram repeated 10⁵ times
    in one document expands into 10⁵ hash inputs for that document
    alone). CWS samples in O(num_hashes) work per DISTINCT gram
    regardless of its weight, and accepts real-valued weights (tf-idf,
    length-normalized tf) the multiset reduction cannot express.

    Per hash j and posting (id, g, w>0), all hash-seeded and
    deterministic (no RNG — resume/retry safe):

        r    ~ Gamma(2,1)  = −ln u₁ − ln u₂      (seeded by (j,'r',g))
        c    ~ Gamma(2,1)  = −ln u₃ − ln u₄      (seeded by (j,'c',g))
        β    ~ Uniform(0,1)                      (seeded by (j,'b',g))
        t    = ⌊ln w / r + β⌋
        ln a = ln c − r·(t − β) − r

    The j-th sample is the (g, t) of the gram minimizing ln a — two
    documents collide on hash j iff they pick the same gram AT the same
    quantization level t, which is exactly what makes the estimator
    weight-aware where plain minhash sees only set membership.

    Plan shape — the hash index j is a ROW dimension, not a column
    dimension: postings explode to k rows (pipelined straight into the
    partial aggregate — the exploded frame never shuffles raw), each row
    computes 3 xxhash64 (each yields TWO 30-bit (k+0.5)/2³⁰ uniforms,
    strictly inside (0,1), all codegen arithmetic, zero Python), then
    groupBy(id, j) ``min(struct(ln_a, gram, t))`` + groupBy(id) collect.
    Map-side combine bounds BOTH shuffles at docs×k / docs rows, so this
    two-exchange shape moves the same bytes as a single k-column
    aggregate — and the k-wide single-projection alternative was
    MEASURED 5× slower per row at 2M postings (4.0 s vs 0.8 s warm;
    the ~6000-node codegen unit is both slow to compile — ~8 s per
    fresh plan — and slow to run). Rows with non-positive or NULL
    weight are dropped (ln w undefined — and a zero-weight gram carries
    no mass by definition)."""
    rows = tf.where(F.col(weight_col).cast("double") > 0).select(
        F.col(id_col),
        F.col(gram_col).alias("__g"),
        F.col(weight_col).cast("double").alias("__w"),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("__j"),
    )

    def _u2(tag: str):
        # seed bytes identical to the per-column form: "<j><tag><gram>"
        h = F.xxhash64(
            F.concat(F.col("__j").cast("string"), F.lit(tag), F.col("__g"))
        )
        lo = F.shiftrightunsigned(h, 2).bitwiseAND(F.lit(_CWS_MASK30))
        hi = F.shiftrightunsigned(h, 34).bitwiseAND(F.lit(_CWS_MASK30))
        scale = F.lit(float(1 << 30))
        return (
            (lo.cast("double") + F.lit(0.5)) / scale,
            (hi.cast("double") + F.lit(0.5)) / scale,
        )

    u1, u2 = _u2(":r:")
    u3, u4 = _u2(":c:")
    beta, _unused = _u2(":b:")
    r = -(F.log(u1) + F.log(u2))
    ln_c = F.log(-(F.log(u3) + F.log(u4)))
    t = F.floor(F.log(F.col("__w")) / r + beta)
    ln_a = ln_c - r * (t.cast("double") - beta) - r
    per_j = rows.groupBy(id_col, "__j").agg(
        F.min(
            F.struct(
                ln_a.alias("ln_a"), F.col("__g").alias("g"), t.alias("t")
            )
        ).alias("m")
    )
    return per_j.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__j", "m"))),
            lambda s: F.concat_ws(
                "@", s["m"]["g"], s["m"]["t"].cast("string")
            ),
        ).alias("sig")
    )


def weighted_minhash_dedup_pairs_cws(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """WEIGHTED near-dup pairs via Ioffe CWS signatures — estimates the
    same tf-weighted Jaccard :func:`weighted_jaccard_pairs` computes
    exactly and :func:`weighted_minhash_dedup_pairs_md5` estimates by
    integer expansion, but in O(num_hashes) per DISTINCT gram (the
    heavy-tail-safe scale path: signature cost is independent of tf).
    Banding, candidate join, and verify are the shared LSH code paths;
    output (id_a, id_b, est_jaccard). Engine-seeded (xxhash64), so this
    is a rows-only surface — its correctness currency is the
    differential test against the exact operator."""
    # _gram_tf standardizes the id column to "id"; surface the caller's name
    tf = _gram_tf(df, id_col, text_col, shingle_n).select(
        F.col("id").alias(id_col), "gram", "tf"
    )
    # materialize the postings BEFORE the k-explode signature aggregate:
    # fused fresh, the (id,gram) final aggregate + ×k explode + (id,j)
    # partial aggregate run as ONE reduce-side codegen stage and measure
    # ~3× slower than the same explode reading columnar cached postings
    # (sf0.1: 4.4 s vs 0.9 s persist + 1.5 s signatures — r11, guide
    # §1.1/§5). Plain persist (not the _persist_sigs slot: that would be
    # evicted mid-materialization when the SIGNATURE frame takes the
    # slot below), released as soon as the signatures are materialized.
    tf = tf.persist()
    sigs = _persist_sigs(
        weighted_minhash_signatures_cws(
            tf, id_col, "gram", "tf", num_hashes
        )
    )
    tf.unpersist()
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, deduplicate=False
    )
    sims = minhash_similarity(sigs, cands, id_col)
    return sims.filter(F.col("est_jaccard") >= threshold).distinct()


def cross_corpus_minhash(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    signature_engine: str = "md5",
) -> DataFrame:
    """NEAR-DUP decontamination across two corpora: (corpus_id, eval_id,
    est_jaccard) for every training document whose estimated Jaccard
    against some eval document clears ``threshold``. Exact-n-gram
    decontamination (text.ngram_contamination) misses paraphrased or
    lightly-edited benchmark leaks; minhash similarity catches them.

    Shape at 100 TB: the eval side is tiny, so its banded signatures AND
    its full signatures broadcast — the corpus is signature-scanned once,
    candidates come from a broadcast band join (no corpus shuffle beyond
    the signature groupBy), and the verify step is another broadcast join.
    The corpus never self-joins: cost is corpus × (collision rate), not
    corpus².

    ``signature_engine="md5"`` (default) keeps the pipeline oracle-exact
    cross-engine; "np"/"jvm" swap in the production hashes."""
    rows_per_band = num_hashes // bands
    if signature_engine == "md5":
        def sig_fn(d):
            return minhash_signatures_md5(d, id_col, text_col, num_hashes, shingle_n)
    elif signature_engine == "np":
        def sig_fn(d):
            return minhash_signatures_np(d, id_col, text_col, num_hashes, shingle_n)
    else:
        def sig_fn(d):
            return minhash_signatures(d, id_col, text_col, num_hashes, shingle_n)

    c_sigs = _persist_sigs(sig_fn(corpus))
    e_sigs = sig_fn(eval_set)

    c_band = _banded(c_sigs, id_col, bands, rows_per_band)
    e_band = _banded(e_sigs, id_col, bands, rows_per_band)
    cands = c_band.join(
        F.broadcast(e_band.withColumnRenamed(id_col, "__eval_id")),
        ["band_idx", "band_hash"],
    ).select(F.col(id_col).alias("corpus_id"), F.col("__eval_id").alias("eval_id"))

    ca = c_sigs.select(F.col(id_col).alias("corpus_id"), F.col("sig").alias("sig_a"))
    eb = e_sigs.select(F.col(id_col).alias("eval_id"), F.col("sig").alias("sig_b"))
    matches = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    return (
        cands.join(ca, "corpus_id")
        .join(F.broadcast(eb), "eval_id")
        .select(
            "corpus_id",
            "eval_id",
            (matches / F.size(F.col("sig_a"))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    use_words: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing ≥1 shingle (blocking join —
    the SQL-oracle-checkable exact counterpart of minhash_dedup_pairs).

    intersection via shingle-match counting, union = |A|+|B|-∩; never
    materializes the quadratic pair space."""
    sh = word_shingles(F.col(text_col), n) if use_words else char_shingles(F.col(text_col), n)
    df = widen_thin_input(df)
    docs = df.select(F.col(id_col).alias("id"), sh.alias("shingles")).withColumn(
        "n_sh", F.size("shingles")
    )
    exploded = docs.select("id", "n_sh", F.explode("shingles").alias("sh"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = inter.select(
        "id_a",
        "id_b",
        (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: bit i of the fingerprint is the sign
    of Σ_tokens (±1 per token depending on bit i of xxhash64(token)).

    Explode → one groupBy(id) with `bits` integer sums (map-side partial) —
    a single shuffle, fixed 64-counter state per doc."""
    # two's-complement care: bit 63 is the sign bit, so its mask/weight is
    # the *negative* long -(1<<63); 1<<63 itself overflows a Java long
    def mask(i: int) -> int:
        return -(1 << 63) if i == 63 else (1 << i)

    df = widen_thin_input(df)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64(F.col("tok")))
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(mask(i))) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fp = sums.select(
        F.col(id_col),
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(mask(i))).otherwise(F.lit(0)) for i in range(bits)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return fp


_HEX = "0123456789abcdef"


def simhash_md5(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """ENGINE-PORTABLE 64-bit SimHash: token hash = first 16 hex chars of
    md5(token); bit i of the fingerprint is the sign (ties → 0) of
    Σ_tokens (±1 by bit i of the token hash). The fingerprint is emitted as
    FOUR 16-bit integer blocks ``blk0..blk3`` (bit i lives in block i//16
    at weight 1<<(i%16), hex chars MSB-first) — small enough for exact
    integer arithmetic in any SQL engine, and the blocks double as the
    pigeonhole keys for the near-dup join.

    Same plan shape as :func:`simhash`: explode tokens → one groupBy(id)
    with 64 integer sums (map-side partial) → 4 block columns. The
    production :func:`simhash` keeps xxhash64; this variant buys
    cross-engine bit-exactness for the oracle harness."""
    df = widen_thin_input(df)
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.substring(F.md5(F.col("tok")), 1, 16))
    # hex digit value per char (1-indexed); shared by the 4 bits of the char
    digits = toks.select(
        F.col(id_col),
        *[
            (F.instr(F.lit(_HEX), F.substring(F.col("h"), p, 1)) - 1).alias(f"d{p}")
            for p in range(1, 17)
        ],
    )

    def bit(i: int) -> Column:  # bit i of the 64-bit token hash
        c, s = i // 4 + 1, 3 - i % 4
        return F.shiftright(F.col(f"d{c}"), s).bitwiseAND(F.lit(1))

    sums = digits.groupBy(id_col).agg(
        *[F.sum(bit(i) * 2 - 1).alias(f"s{i}") for i in range(64)]
    )
    return sums.select(
        F.col(id_col),
        *[
            sum(
                [
                    F.when(F.col(f"s{16 * k + j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
                    for j in range(16)
                ],
                F.lit(0),
            ).alias(f"blk{k}")
            for k in range(4)
        ],
    )


def simhash_md5_near_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """ALL pairs within Hamming distance ``max_hamming`` (≤ 3) of their
    portable simhash fingerprints — (id_a, id_b, hamming).

    Pigeonhole blocking with guaranteed recall: a pair differing in ≤3 of
    64 bits must agree EXACTLY on ≥1 of the 4 16-bit blocks, so candidates
    are an equi-join on (block_idx, block_value) — linear blocking, never
    all-pairs — and the output is independent of the blocking scheme. That
    makes the result oracle-checkable: any engine computing "pairs with
    hamming ≤ 3" by any method produces the same rows (unlike the
    production prefix-blocked :func:`simhash_near_dup_pairs`, whose recall
    depends on the prefix choice)."""
    if max_hamming > 3:
        raise ValueError("4-block pigeonhole guarantees recall only for max_hamming <= 3")
    fps = _persist_sigs(simhash_md5(df, id_col, text_col))
    blocked = fps.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"blk{k}") for k in range(4)])).alias(
            "block_idx", "block_val"
        ),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
    )
    fa = fps.select(
        F.col(id_col).alias("id_a"), *[F.col(f"blk{k}").alias(f"a{k}") for k in range(4)]
    )
    fb = fps.select(
        F.col(id_col).alias("id_b"), *[F.col(f"blk{k}").alias(f"b{k}") for k in range(4)]
    )
    hamming = sum(
        [F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))) for k in range(4)],
        F.lit(0),
    )
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    driver_uf_threshold: int = 1_000_000,
) -> DataFrame:
    """Resolve near-dup PAIRS into transitive clusters: (node, component)
    where component = the smallest node id reachable through any chain of
    pairs — the canonical keep-one-per-cluster semantics. Pair-local
    policies ('drop the larger of each pair') under-merge chains whose
    endpoints share no direct edge: pairs (b,d),(c,d) leave b and c both
    surviving although they are transitive near-dups; the component view
    keeps exactly one representative per cluster.

    Min-label propagation: every node starts as its own label; each
    iteration a node adopts the smallest label among itself and its
    neighbors; converges in graph-diameter iterations (near-dup clusters
    are shallow). Exceeding ``max_iterations`` raises — a pathological
    chain becomes an error, not an endless job.

    Scale shape: each iteration is one shuffle join of the label frame
    against the edge list — both PAIR-space frames (collision-bounded,
    never corpus-bounded); convergence is a driver-side count of changed
    labels. Each iteration's frame is localCheckpoint'ed (eager), which
    BOTH caches it and truncates the logical plan — plain persist() keeps
    the full nested lineage, and on graphs with diameter ≳8 the
    compounding plan tree overflows the JVM stack during analysis (found
    by the union-find property differential). This is the standard
    large-graph CC loop (GraphX/GraphFrames posture) expressed in
    DataFrames; the returned frame is checkpoint-backed, so downstream
    consumers never replay the iteration lineage.

    SMALL-GRAPH fast path (r11, VERDICT r10 task 8): the loop's cost is
    per-iteration FIXED overhead (eager checkpoint + convergence count ≈
    3 driver jobs × diameter), which dwarfs the data cost on the
    collision-bounded edge sets near-dup verify thresholds actually
    produce (the sf0.1 ensemble: ~1.4k directed edges, ~12 s of loop for
    <1 ms of union-find). When the DEDUPED directed edge count is ≤
    ``driver_uf_threshold`` (default 1M rows ≈ tens of MB — an explicit,
    commented driver-side collect; the count that gates it is on the
    already-persisted edge frame), the components are resolved with an
    exact in-driver union-find (min-label semantics identical to the
    loop, pinned by the existing property differential) and returned as
    one small createDataFrame. Webby corpora whose pair space exceeds
    the threshold take the distributed loop unchanged — the 100 TB path
    is the loop, the fast path is for the fixed-overhead regime."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    n_edges = edges.count()
    if n_edges <= driver_uf_threshold:
        # bounded by the gate above: one collect of the pair-space frame,
        # then path-compressed union-find with min-label representatives
        rows = edges.collect()
        edges.unpersist()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in rows:
            a, b = row[0], row[1]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-label union: the smaller id roots the tree, so the
                # final representative is the component minimum (the
                # keep-one semantics the distributed loop converges to)
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        from pyspark.sql.types import StructField, StructType

        spark = pairs.sparkSession
        node_type = pairs.schema[id_a].dataType
        out_schema = StructType(
            [StructField("node", node_type), StructField("comp", node_type)]
        )
        return spark.createDataFrame(
            [(n, find(n)) for n in parent], out_schema
        )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    labels.count()
    converged = False
    for _ in range(max_iterations):
        neighbor_min = edges.join(
            labels, edges["dst"] == labels["node"]
        ).groupBy("src").agg(F.min("comp").alias("__ncomp"))
        # union-with-self instead of labels LEFT JOIN neighbor_min (r11
        # continuation, the pagerank/HITS iteration shape with min as the
        # merge): min(old comp, neighbor mins) ≡ least(comp,
        # coalesce(__ncomp, comp)) — the node's own label IS the
        # absorbing row, so isolated-this-round nodes keep their comp
        # through the SAME aggregate and the per-iteration node-scale
        # join of two stat-less checkpoint-backed frames (an SMJ at
        # plan time) is gone
        new_labels = (
            labels.select("node", "comp")
            .unionByName(
                neighbor_min.select(
                    F.col("src").alias("node"), F.col("__ncomp").alias("comp")
                )
            )
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            # eager localCheckpoint: caches AND cuts the plan tree — the
            # nested per-iteration lineage otherwise overflows the JVM
            # stack at diameter ≳8
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    global _live_cc
    if _live_cc is not None:
        _live_cc.unpersist()
    _live_cc = labels
    return labels


_live_cc: DataFrame | None = None


def neardup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str,
    id_a: str = "id_a", id_b: str = "id_b",
) -> DataFrame:
    """Keep-one-per-cluster near-dup DEDUP: resolve ``pairs`` into
    transitive components (:func:`connected_components`) and drop every
    doc whose component representative is a different (smaller) id;
    unpaired docs pass through untouched. The drop set is pair-space-
    bounded but can be a large corpus fraction on webby data, so the
    anti-join is left unhinted — AQE broadcasts it when it is small."""
    comps = connected_components(pairs, id_a, id_b)
    drops = comps.filter(F.col("comp") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drops, id_col, "left_anti")


def simhash_near_dup_pairs(
    fps: DataFrame, id_col: str, max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup candidates: block on the top ``prefix_bits`` of the simhash
    (near-dups very likely share them), then filter by exact Hamming distance.
    bit_count is a JVM built-in."""
    blocked = fps.withColumn("block", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits))
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def _sig_store_epochs(spark, sig_store: str) -> list[int]:
    """List the ``epoch=N`` partition values present in the signature store
    via the Hadoop FileSystem API — the check follows the path's ACTUAL
    filesystem (S3/HDFS/local alike). A driver-local ``os.listdir`` would
    silently see nothing on a remote store and every batch would skip
    history dedup without an error."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.sc().hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(sig_store)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("epoch="):
            try:
                out.append(int(name[len("epoch="):]))
            except ValueError:
                pass
    return out


def _compact_sig_store(
    spark, sig_store: str, keep_epoch: int, target_file_rows: int = 4_000_000
) -> None:
    """Fold every CLOSED epoch partition (epoch != keep_epoch) into one
    consolidated ``epoch=-1`` partition so the store stays a bounded file
    set instead of a one-dir-per-micro-batch small-file farm. keep_epoch
    (the in-flight epoch) stays its own partition so the retry-safety
    filter ``epoch != epoch_id`` keeps excluding it after a replay.

    Not crash-atomic: the final delete+rename is two filesystem metadata
    ops (same posture as sources/write.compact_small_files) — a
    transactional table format is the real answer for a 24/7 store; for
    AvailableNow cron intakes the exposure window is two metadata calls."""
    closed = [e for e in _sig_store_epochs(spark, sig_store) if e != keep_epoch]
    if len(closed) <= 1:
        return
    hist = (
        spark.read.option("basePath", sig_store).parquet(sig_store)
        .filter(F.col("epoch") != keep_epoch)
        .drop("epoch")
    )
    n = hist.count()
    files = max(1, -(-n // target_file_rows))
    tmp = sig_store.rstrip("/") + "__compacting"
    hist.repartition(files).write.mode("overwrite").parquet(tmp)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.sc().hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(sig_store).getFileSystem(hconf)
    for e in closed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(sig_store, f"epoch={e}"), True)
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(sig_store, "epoch=-1"),
    )


def _greedy_pair_drops(
    pairs: DataFrame,
    pre_dropped: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve close PAIRS (id_a < id_b) into the GREEDY first-occurrence-
    wins drop set → one column ``id``: id i drops iff some KEPT smaller id
    is close to it. Dropping the larger id of EVERY pair (the naive
    pairwise rule) over-deletes on transitive chains — for X<Y<Z with
    close(X,Y) and close(Y,Z) but not close(X,Z), greedy keeps {X, Z}
    (Y's deletion un-condemns Z) while pairwise deletes both Y and Z.

    Fixed point of K_{t+1} = {i : no close j < i with j ∈ K_t}, K_0 =
    everything: by induction, after t rounds the keep/drop decision is
    FINAL for every id whose smaller-id dependency chain is ≤ t deep, so
    the iteration converges in (longest chain) rounds — the same bound
    family as connected_components' diameter loop; exceeding
    ``max_iterations`` raises rather than silently mis-deleting.
    ``pre_dropped`` ids (e.g. already condemned by a history store whose
    members are ALL kept and smaller) start outside K and can never
    condemn anyone. Each round is two pair-space joins; every frame here
    is pair-bounded, never corpus-bounded.

    Input orientation is CANONICALIZED here (least/greatest + self-pair
    drop), not assumed: both current callers already emit id_a < id_b,
    but a future caller passing unordered or symmetric pairs would
    otherwise get a silently wrong drop set (a pair present both ways
    condemns BOTH members — mutual condemnation — instead of the greedy
    larger-only rule)."""
    p = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("__a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("__b"),
        )
        .where(F.col("__a") < F.col("__b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ids = (
        p.select(F.col("__a").alias("id"))
        .unionByName(p.select(F.col("__b").alias("id")))
        .distinct()
    )
    if pre_dropped is not None:
        pre = pre_dropped.select(F.col("id")).distinct()
        kept = ids.join(pre, "id", "left_anti").localCheckpoint(eager=True)
    else:
        pre = None
        kept = ids.localCheckpoint(eager=True)
    base = kept  # ids eligible to be kept at all (pre-dropped excluded)
    for _ in range(max_iterations):
        condemned = (
            p.join(kept, p["__a"] == kept["id"])
            .select(F.col("__b").alias("id"))
            .distinct()
        )
        new_kept = base.join(condemned, "id", "left_anti").localCheckpoint(
            eager=True
        )
        # converged when the kept set is stable (symmetric difference empty)
        if (
            kept.join(new_kept, "id", "left_anti").isEmpty()
            and new_kept.join(kept, "id", "left_anti").isEmpty()
        ):
            kept = new_kept
            break
        kept = new_kept
    else:
        raise RuntimeError(
            f"greedy pair resolution did not converge in {max_iterations} "
            "rounds (pathologically deep near-dup chain)"
        )
    drops = ids.join(kept, "id", "left_anti")
    return drops


def streaming_neardup_ingest(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    checkpoint_dir: str | None = None,
    signature_engine: str = "np",
    compact_every: int | None = 16,
):
    """CONTINUOUS corpus near-dup ingest: every micro-batch is minhash-
    deduplicated against (a) itself and (b) every document ever accepted,
    using a persisted signature store — the realistic training-data intake
    shape where history is unbounded but is never rescanned as text.

    Per batch (foreachBatch, batch-mode DataFrames):
      1. signature the batch once (persisted for its three uses);
      2. within-batch LSH pairs ≥ threshold resolve GREEDILY
         (first-occurrence-wins under monotone ids: an id drops iff a
         KEPT smaller id is close — _greedy_pair_drops; naive pairwise
         dropping over-deletes on transitive chains);
      3. batch bands join the STORE's bands — the batch side broadcasts
         (a micro-batch is small; history is big), so history is touched
         only through its compact signature table, cost ∝ collisions;
      4. survivors append their signatures to the store and their rows to
         ``out_dir`` — both written per-epoch with overwrite, so a retried
         epoch is idempotent (the write is the batch's only side effect).

    State per accepted doc is num_hashes longs — at 100 TB of text the
    store is ~0.05% of corpus bytes, and it is itself a parquet table any
    batch job can reuse. Every ``compact_every`` closed epochs the store's
    epoch partitions fold into one consolidated ``epoch=-1`` partition
    (:func:`_compact_sig_store`) so file count stays bounded across
    unbounded epochs. Returns the StreamingQuery (Available-Now
    trigger: drains what exists, then stops — call repeatedly for a cron
    intake, or swap the trigger for 24/7)."""
    import os

    spark = stream.sparkSession
    sig_store = os.path.join(state_dir, "signatures")
    rpb = num_hashes // bands
    sig_fn = {
        "np": minhash_signatures_np,
        "jvm": minhash_signatures,
        "md5": minhash_signatures_md5,
    }[signature_engine]

    def verify(cands: DataFrame, a_sigs: DataFrame, b_sigs: DataFrame) -> DataFrame:
        sa = a_sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
        sb = b_sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
        joined = cands.join(sa, "id_a").join(sb, "id_b")
        matches = F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
        )
        return joined.filter(
            (matches / F.size(F.col("sig_a"))) >= threshold
        )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_sigs = sig_fn(batch_df, id_col, text_col, num_hashes).persist()
        new_band = _banded(new_sigs, id_col, bands, rpb)

        # (2) history FIRST (store members are all kept and smaller under
        # monotone ids): a batch id close to accepted history is condemned
        # outright, and must not condemn its own within-batch neighbors
        # (greedy semantics — _greedy_pair_drops docstring).
        # Existence check via the Hadoop FS API so it follows the store's
        # actual filesystem (S3/HDFS), not the driver's local disk.
        hist_dups = None
        if _sig_store_epochs(spark, sig_store):
            hist = (
                spark.read.option("basePath", sig_store).parquet(sig_store)
                .filter(F.col("epoch") != epoch_id)  # retry safety
                .select(id_col, "sig")
            )
            hist_band = _banded(hist, id_col, bands, rpb)
            hist_cands = (
                hist_band.join(
                    F.broadcast(
                        new_band.withColumnRenamed(id_col, "__new_id")
                    ),
                    ["band_idx", "band_hash"],
                )
                .select(
                    F.col(id_col).alias("id_a"), F.col("__new_id").alias("id_b")
                )
            )
            hist_dups = (
                verify(hist_cands, hist, new_sigs)
                .select(F.col("id_b").alias(id_col))
                .distinct()
                .localCheckpoint(eager=True)
            )

        # (3) within-batch: GREEDY first-occurrence-wins over the verified
        # close pairs (pairwise larger-id dropping over-deletes on
        # transitive chains); history-condemned ids are pre-dropped
        self_cands = minhash_lsh_candidates(
            new_sigs, id_col, bands, rpb, deduplicate=False
        )
        batch_pairs = verify(self_cands, new_sigs, new_sigs).select(
            "id_a", "id_b"
        )
        pre = (
            hist_dups.select(F.col(id_col).alias("id"))
            if hist_dups is not None
            else None
        )
        dup_ids = _greedy_pair_drops(batch_pairs, pre_dropped=pre).select(
            F.col("id").alias(id_col)
        )
        if hist_dups is not None:
            dup_ids = dup_ids.unionByName(hist_dups)

        dup_ids = dup_ids.distinct()
        survivors = batch_df.join(dup_ids, id_col, "left_anti")
        surviving_sigs = new_sigs.join(dup_ids, id_col, "left_anti")

        # (4) idempotent per-epoch writes
        surviving_sigs.write.mode("overwrite").parquet(f"{sig_store}/epoch={epoch_id}")
        survivors.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        new_sigs.unpersist()

        # (5) periodic maintenance: bound the store's file count
        if compact_every:
            closed = [e for e in _sig_store_epochs(spark, sig_store) if e != epoch_id]
            if len(closed) >= compact_every:
                _compact_sig_store(spark, sig_store, keep_epoch=epoch_id)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def streaming_span_scrub_ingest(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    checkpoint_dir: str | None = None,
    compact_every: int | None = 16,
):
    """CONTINUOUS span-level exact-substring scrubbing (VERDICT r6 task 6):
    the signature-store pattern of :func:`streaming_neardup_ingest`
    applied to word-k-gram hashes — every micro-batch's documents are
    scrubbed of passages already seen, either earlier in the stream or
    within the same batch, and emit with the
    ``scrub_duplicated_spans(keep_first=True, max_df=1)`` surface
    (id, n_tokens, dup_tokens, text_clean).

    DRIP ≡ BATCH: with ids monotone in arrival order (the same contract
    streaming_neardup_ingest's first-occurrence-wins relies on), the
    emitted corpus equals the one-shot batch
    ``scrub_duplicated_spans(keep_first=True, max_df=1)`` over the full
    input, exactly — a gram's keeper is its min id, which under monotone
    arrival is the first holder ever seen: already-emitted keepers keep
    their (unscrubbed) spans, later holders scrub them, and within-batch
    election picks the same min-id keeper the global run would. The
    parity holds ONLY for max_df=1 (at higher thresholds a document can
    be emitted before its gram's corpus-wide df crosses the bar — emitted
    docs are final), which is why the knob is pinned.

    Per batch (foreachBatch):
      1. gram the batch once (linear (id, pos, gh) frame, persisted);
      2. batch grams ∈ the historical gram store → those positions scrub
         (their keeper already shipped in an earlier epoch);
      3. grams new to the store but held by ≥2 batch docs → min-id doc
         keeps, other holders scrub (the same election batch runs);
      4. rebuild each doc's text from uncovered tokens (shared
         ``_scrub_rebuild``) and write per-epoch; append the batch's
         distinct gram hashes to the store per-epoch (both overwrite →
         retried epochs are idempotent; the store read excludes the
         in-flight epoch).

    State per DISTINCT corpus gram is one long — ~8 bytes/token worst
    case, a bounded parquet table any batch job can reuse; every
    ``compact_every`` closed epochs the store folds into the consolidated
    ``epoch=-1`` partition (:func:`_compact_sig_store`, schema-agnostic).
    History is only ever touched through the gram-hash table — the
    accepted TEXT is never rescanned. Returns the StreamingQuery
    (Available-Now trigger, same cron-intake posture as
    streaming_neardup_ingest)."""
    import os

    from pyspark import StorageLevel

    spark = stream.sparkSession
    gram_store = os.path.join(state_dir, "grams")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks_f, grams = _span_gram_frames(batch_df, id_col, text_col, k)
        toks_f = toks_f.persist(StorageLevel.MEMORY_AND_DISK)
        grams = grams.persist(StorageLevel.MEMORY_AND_DISK)

        # (3) within-batch election: min-id holder keeps, the rest scrub
        dup_batch = (
            grams.groupBy("gh")
            .agg(F.count_distinct("id").alias("__df"), F.min("id").alias("__keeper"))
            .filter(F.col("__df") > 1)
            .select("gh", "__keeper")
        )
        hits = (
            grams.join(dup_batch, "gh")
            .filter(F.col("id") != F.col("__keeper"))
            .select("id", "pos")
        )

        # (2) vs the gram store (absent on the first epoch); the batch side
        # of the semi-join is the small side — history grams are touched
        # only through the compact hash table
        if _sig_store_epochs(spark, gram_store):
            hist = (
                spark.read.option("basePath", gram_store).parquet(gram_store)
                .filter(F.col("epoch") != epoch_id)  # retry safety
                .select("gh")
            )
            hits = hits.unionByName(
                grams.join(hist, "gh", "left_semi").select("id", "pos")
            )

        out = _scrub_rebuild(toks_f, hits.distinct(), k)

        # (4) idempotent per-epoch writes: scrubbed docs + the batch's grams
        # (RAW grams — a scrubbed span still counts toward future dedup,
        # matching batch df semantics over the raw corpus)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        grams.select("gh").distinct().write.mode("overwrite").parquet(
            f"{gram_store}/epoch={epoch_id}"
        )
        toks_f.unpersist()
        grams.unpersist()

        if compact_every:
            closed = [e for e in _sig_store_epochs(spark, gram_store) if e != epoch_id]
            if len(closed) >= compact_every:
                _compact_sig_store(spark, gram_store, keep_epoch=epoch_id)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def text_segments(text: Column, seg_words: int = 10) -> Column:
    """Non-overlapping ``seg_words``-word segments of a document, in
    order. The unit of cross-document exact-substring dedup: fine enough
    to catch shared boilerplate, coarse enough that the duplicated-segment
    set stays small. Pure array expressions (split → sequence → slice →
    join) — whole-stage codegen, no UDF."""
    words = F.split(F.trim(text), r"\s+")
    n_seg = F.ceil(F.size(words) / F.lit(seg_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_seg, F.lit(1)) - 1),
        lambda i: F.array_join(
            F.slice(words, i * seg_words + 1, seg_words), " "
        ),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
    max_df: int = 1,
) -> DataFrame:
    """Cross-document segment-level dedup (the C4 / RefinedWeb posture:
    drop text that repeats ACROSS the corpus — shared boilerplate,
    licenses, navigation chrome — while keeping each document's unique
    content). Splits every document into non-overlapping ``seg_words``-
    word segments, finds segments present in more than ``max_df``
    DISTINCT documents, and rebuilds each document from its surviving
    segments in order.

    Returns (id, n_segments, n_removed, text_clean); documents whose
    every segment was boilerplate survive with text_clean = ''.

    Scale shape (round-5 rewrite of the broadcast-array design): the
    exploded (id, seg_idx, seg) frame is computed ONCE and persisted
    across its two consumers. Shuffle 1 (segment-keyed, the only
    corpus-sized exchange on the discovery side) finds segments in more
    than ``max_df`` distinct documents. The duplicated POSITIONS per doc
    come from a left-semi join of the exploded frame against that dup
    set — Spark broadcasts the dup side while it is small and falls back
    to a shuffled semi join when boilerplate is heavy, so there is no
    driver-side ceiling: the previous design collapsed the dup set into
    ONE collect_set row (2 GB single-row cap) and probed it with a linear
    array_contains per segment — O(|segments| x |dup set|) on a
    boilerplate-heavy crawl where the dup set reaches millions. The
    rebuild then joins each doc to its (small, covered-docs-only) dup-
    index set and recovers surviving segments via array_except over
    INDEX arrays — hash-based set difference, O(segments + dups) per doc
    (the scrub_repeated_spans pattern, text.py); at test scale AQE turns
    that join into a broadcast, keeping the corpus un-re-shuffled. Exact
    duplicated-within-one-doc segments are NOT removed (distinct-doc
    frequency 1) — within-document repetition is repeated_spans' job.

    Reference analog: none (bullet has no dedup surface); this is the
    M5 extension family, cited from the C4 paper's three-sentence-span
    rule and RefinedWeb's exact-substring pass.
    """
    from pyspark import StorageLevel

    base = df.select(
        F.col(id_col), text_segments(F.col(text_col), seg_words).alias("__segs")
    )
    segs = base.select(
        F.col(id_col), F.posexplode("__segs").alias("__idx", "__seg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        segs.groupBy("__seg")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("__seg")
    )
    dup_idx = (
        segs.join(dup, "__seg", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("__idx").alias("__dupidx"))
    )
    return (
        base.join(dup_idx, id_col, "left")
        .withColumn(
            "__dupidx",
            F.coalesce(F.col("__dupidx"), F.array().cast("array<int>")),
        )
        .withColumn(
            "__keep_idx",
            F.array_sort(
                F.array_except(
                    F.sequence(F.lit(0), F.size("__segs") - 1), F.col("__dupidx")
                )
            ),
        )
        .select(
            F.col(id_col),
            F.size("__segs").alias("n_segments"),
            (F.size("__segs") - F.size("__keep_idx")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.col("__keep_idx"), lambda i: F.col("__segs")[i]
                ),
                " ",
            ).alias("text_clean"),
        )
    )


def hamming_near_dup_pairs(
    fps: DataFrame, id_col: str, sig_col: str, max_hamming: int = 3
) -> DataFrame:
    """ALL pairs within Hamming distance ``max_hamming`` (≤ 3) over ANY
    64-bit signature column — (id_a, id_b, hamming). The generic form of
    :func:`simhash_md5_near_dup_pairs`' pigeonhole join, reused by image
    perceptual hashes (multimodal.phash_images) and any other 64-bit
    fingerprint: a pair differing in ≤3 of 64 bits must agree exactly on
    ≥1 of the 4 16-bit blocks, so candidates are an equi-join on
    (block_idx, block_value) — linear blocking with guaranteed recall,
    never all-pairs. Arithmetic shiftright sign-extends on longs; the
    0xFFFF mask makes each block extraction unsigned-correct."""
    if max_hamming > 3:
        raise ValueError("4-block pigeonhole guarantees recall only for max_hamming <= 3")
    sig = F.col(sig_col).cast("long")
    blocks = [
        (F.shiftright(sig, 16 * k).bitwiseAND(F.lit(0xFFFF))).alias(f"blk{k}")
        for k in range(4)
    ]
    base = _persist_sigs(fps.select(F.col(id_col), sig.alias("__sig"), *blocks))
    blocked = base.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"blk{k}") for k in range(4)])).alias(
            "block_idx", "block_val"
        ),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = a.join(
        b,
        (F.col("a.block_idx") == F.col("b.block_idx"))
        & (F.col("a.block_val") == F.col("b.block_val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
    )
    fa = base.select(F.col(id_col).alias("id_a"), F.col("__sig").alias("__sa"))
    fb = base.select(F.col(id_col).alias("id_b"), F.col("__sig").alias("__sb"))
    hamming = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def source_overlap_matrix(
    df: DataFrame,
    keys: Column,
    source_col: str = "source",
) -> DataFrame:
    """Cross-SOURCE duplication matrix → (source_a, source_b, n_shared,
    jaccard): for every source pair, how many distinct segment keys they
    share — corpus forensics (which crawls/dumps copy from which), the
    between-source view of exact_dedup's within-corpus collapse.

    ``keys`` is an ARRAY column of engine-portable segment keys per row:
    ``F.array(text.fingerprint(col))`` measures whole-document duplication,
    ``text.word_ngrams(col, 5)`` measures n-gram-level content sharing
    (the between-corpora contamination read). jaccard = n_shared /
    (n_a + n_b − n_shared) over each source's DISTINCT key set, 6 dp.

    Shape at 100 TB: one scan → explode → distinct (source, key) — the
    only corpus-sized shuffle; the pair join is keyed by the segment key,
    so each join group is bounded by #sources (never all-pairs over
    rows); the per-source size table is #sources rows and broadcasts
    back twice."""
    fp = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(keys).alias("fp"),
        )
        .distinct()
        .persist()
    )
    sizes = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = fp.alias("a"), fp.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(
            F.broadcast(sizes.withColumnsRenamed({"source": "source_a", "n": "n_a"})),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"source": "source_b", "n": "n_b"})),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )
    return out


# gram_col -> (postings, cap, n_drop, drop, (memo_epoch, data_epoch))
_cap_memo: dict[str, tuple] = {}
_cap_memo_epoch: int = 0


def invalidate_cap_memo() -> None:
    """Drop every memoized df-cap decision (and the DataFrame references
    the memo pins). The memo's fast path keys on ANALYZED-PLAN equality
    (``sameResult``), which — like Spark's own CacheManager — assumes
    immutable inputs: re-running the same dedup query after the
    underlying source FILES changed would otherwise reuse a stale drop
    set. Call this on source refresh / catalog invalidation (the same
    moment you'd call ``spark.catalog.refreshTable``), or at session
    teardown in a long-lived server to release the py4j references."""
    global _cap_memo_epoch
    _cap_memo.clear()
    _cap_memo_epoch += 1


def df_capped_postings(
    postings: DataFrame,
    gram_col: str = "gram",
    max_df: int | None = None,
    max_df_frac: float | None = None,
    n_docs: int | None = None,
    drop_broadcast_below: int = 1_000_000,
    data_epoch: object = None,
) -> DataFrame:
    """Apply the posting-join df budget rule (SCALE.md) to a (doc, gram)
    posting frame: drop every posting row whose gram's document frequency
    exceeds ``min(max_df, max_df_frac·n_docs)``. Shared by
    :func:`weighted_jaccard_pairs` and :func:`containment_pairs` (same
    word-shingle gram space, same caps — VERDICT r9 task 4);
    :func:`tfidf_cosine_pairs` keeps its own prune because its stats frame
    must survive anyway to attach idf, so the prune rides that broadcast
    join for free.

    Plan shape — anti-join against the DROP set, never semi-join against
    the KEEP set: ``keep`` is nearly the whole gram vocabulary (at sf0.1:
    27 213 of 27 213 grams — max df 25 vs cap 2 500), so the keep
    semi-join re-shuffles the full posting frame to prune NOTHING
    (+1.5 s measured, the r9 dedup_weighted_jaccard 2.90→3.99 s
    regression). ``drop`` is provably tiny: Σ_g df(g) = |postings|, so
    |{g : df(g) > cap}| ≤ |postings|/cap — with the default absolute cap
    100 000 that is ≤ P/10⁵ rows regardless of corpus size. The exact
    drop count (one action on the already-aggregated gram frame) gates
    the broadcast: 0 → return the input untouched (the common corpus —
    plan identical to the uncapped exact path); ≤ ``drop_broadcast_below``
    → broadcast anti-join (map-side, no posting shuffle); above → shuffle
    anti-join (pathological boilerplate corpus, still linear)."""
    if max_df is None and max_df_frac is None:
        return postings
    if max_df_frac is not None and n_docs is None:
        raise ValueError("max_df_frac needs n_docs")
    caps = []
    if max_df is not None:
        caps.append(max_df)
    if max_df_frac is not None:
        caps.append(int(max_df_frac * n_docs))
    cap = min(caps)
    # identical-call memo (the persist_generation fast-path idea): the
    # drop COUNT is an eager job per call, so a server re-running the
    # same dedup query would pay one extra posting pass per invocation —
    # if the posting plan and cap match the previous call's, reuse its
    # drop decision outright. sameResult compares PLANS, not data: like
    # Spark's CacheManager the fast path assumes immutable inputs. When
    # sources are mutable, pass ``data_epoch`` (any hashable version
    # token — a snapshot id, refresh counter, mtime) so a data change
    # invalidates the memo, or call :func:`invalidate_cap_memo` on
    # refresh. One entry per gram_col, keyed to the CURRENT epoch only —
    # size stays O(#gram spaces), refs released on invalidation.
    from bullet_spark_spark.operators._cache import same_plan

    memo = _cap_memo.get(gram_col)
    if (
        memo is not None
        and memo[1] == cap
        and memo[4] == (_cap_memo_epoch, data_epoch)
        and same_plan(memo[0], postings)
    ):
        n_drop, drop = memo[2], memo[3]
    else:
        drop = (
            postings.groupBy(gram_col)
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > cap)
            .select(gram_col)
        )
        n_drop = drop.count()  # bounded: ≤ |postings|/cap rows
        _cap_memo[gram_col] = (
            postings,
            cap,
            n_drop,
            drop,
            (_cap_memo_epoch, data_epoch),
        )
    if n_drop == 0:
        return postings
    if n_drop <= drop_broadcast_below:
        drop = F.broadcast(drop)
    return postings.join(drop, gram_col, "left_anti")


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_cos: float = 0.30,
    max_df: int | None = 100_000,
    max_df_frac: float | None = 0.3,
    broadcast_below: int = 2_000_000,
) -> DataFrame:
    """Lexical near-duplicate PAIRS by tf-idf cosine over an inverted
    index → (id_a, id_b, cos) with id_a < id_b and cos ≥ ``min_cos`` —
    the sparse-vector complement of the embedding-cosine path
    (semantic_cosine_pairs): catches template/boilerplate rewrites whose
    embeddings drift apart but whose vocabulary barely changes.

    Plan: tokenize once → (doc, term, tf) postings; document frequency
    and idf = ln(N/df) from ONE postings aggregate; per-doc L2 norms from
    a second postings aggregate (both term-pruned identically); candidate
    pairs from the postings SELF-JOIN keyed on term — pair cost is
    Σ_t df(t)², so stop terms MUST be pruned: a term in every document
    alone contributes |corpus|² candidate pairs (measured: the unpruned
    join is 24 s at 5 000 docs and quadratic beyond). ``max_df_frac``
    (default 0.3) drops terms appearing in more than that fraction of
    documents — corpus-relative boilerplate removal; ``max_df``
    (absolute, default 100 000) is the cap that actually bounds the join
    at web scale: a term surviving only the fractional cap contributes
    (0.3·N)² pairs — quadratic in N — where the absolute cap holds each
    term's contribution at a constant max_df² (SCALE.md posting-join
    budget rule). Both None = exact (test only). Pruned terms carry
    near-zero idf anyway — every IR stack does this.
    Dot products and norms accumulate as ROUNDED-then-DECIMAL terms
    (order-independent, engine-exact); idf is rounded 8 dp before use so
    ln() differences below 1e-8 can't flip the hash.

    The per-doc norm frames and the term-idf frame broadcast only when the
    corpus is under ``broadcast_below`` documents — an unconditional
    broadcast hint on a corpus-row-count-sized frame bypasses Spark's size
    thresholds and OOMs the driver at exactly the scale the docstring
    claims; above the gate AQE picks the join strategy from observed
    sizes.

    Reference analog: none (no text surface); M5 dedup-family extension,
    the SpotSigs/shingle-free lexical near-dup posture.
    """
    from bullet_spark_spark.operators.text import tokens

    # NO widen_thin_input here (unlike containment_pairs): this stage is a
    # plain whitespace split — measured 1.3 s thin vs 1.85 s widened at
    # sf0.1; the repartition shuffle of raw text costs more than the
    # serial tokenize saves. The heavy work (posting self-join) is already
    # wide after its own exchange.
    postings = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.select(id_col).distinct().count()  # bounded: one scalar
    stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    if max_df_frac is not None:
        stats = stats.filter(F.col("df_t") <= int(max_df_frac * n_docs))
    if max_df is not None:
        stats = stats.filter(F.col("df_t") <= max_df)
    stats = stats.withColumn(
        "idf",
        F.round(F.log(F.lit(float(n_docs)) / F.col("df_t")), 8),
    )
    if n_docs <= broadcast_below:
        stats = F.broadcast(stats)
    weighted = postings.join(stats, "term").select(
        "id",
        "term",
        (F.col("tf").cast("double") * F.col("idf")).alias("w"),
    )
    from pyspark import StorageLevel

    weighted = weighted.persist(StorageLevel.MEMORY_AND_DISK)
    norms = weighted.groupBy("id").agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 9).cast("decimal(28,9)")).cast(
                "double"
            )
        ).alias("norm")
    )
    a, b = weighted.alias("a"), weighted.alias("b")
    dots = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.sum(
                F.round(F.col("a.w") * F.col("b.w"), 9).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("dot")
        )
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("nb"))
    if n_docs <= broadcast_below:
        na, nb = F.broadcast(na), F.broadcast(nb)
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_containment: float = 0.8,
    max_df: int | None = 100_000,
    max_df_frac: float | None = 0.5,
    broadcast_below: int = 2_000_000,
) -> DataFrame:
    """ASYMMETRIC near-dup: pairs where the smaller document's n-gram set
    is mostly CONTAINED in the larger's → (id_a, id_b, n_small, shared,
    containment) with containment = |A∩B| / min(|A|, |B|).

    Jaccard (dedup_ngram_jaccard) misses subset relationships: a tweet
    quoted inside an article scores near-zero Jaccard but 1.0
    containment — exactly the 'document embedded in document' duplication
    a training corpus accumulates (quotes, syndication, scraped snippets
    inside aggregator pages). Broder's containment coefficient is the
    standard fix.

    Plan: DISTINCT n-gram posting lists per doc; a document-frequency
    aggregate prunes HOT grams before the self-join (``max_df_frac``,
    default 0.5: a gram present in more than that fraction of documents
    is boilerplate — a gram at document frequency f·N alone contributes
    (f·N)² candidate pairs, so the unpruned Σ df² bound is quadratic at
    web scale; this is the same corpus-relative stop-term prune
    ``tfidf_cosine_pairs`` carries, and SpotSigs' stopword-anchor
    argument). Per-doc set sizes are computed AFTER the prune so
    containment stays a well-defined statistic (|A∩B| / min|A|,|B|) on
    the pruned gram space; both caps ``None`` = exact (small-sf / test
    only). Shared counts from the posting self-join — Σ_t df(t)²
    candidate pairs with df ≤ min(max_df, max_df_frac·N). The ABSOLUTE
    ``max_df`` (default 100 000) is the cap that holds at web scale: the
    fractional cap alone admits (0.5·N)² pairs per surviving gram —
    quadratic in N (SCALE.md posting-join budget rule). Fully cross-engine (md5-free: grams compare as
    text). Per-doc size frames broadcast only under ``broadcast_below``
    docs (~32 MB at the default) — above that AQE picks the join.
    """
    # word_shingles: same normalization + empty-set-below-n convention as
    # ngram_jaccard_pairs and its DuckDB oracle comprehension. Widened:
    # 3-gram construction + distinct inherit the scan's partitioning and
    # run near-serially on a few-file corpus (4.2 → 3.4 s at sf0.1).
    df = widen_thin_input(df)
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
        )
        .filter(F.length("gram") > 0)
        .distinct()
    )
    from pyspark import StorageLevel

    # persist BEFORE the cap: df_capped_postings takes an eager action
    # (the drop count), which would otherwise compute the shingle explode
    # twice — once for the count, once for the join pipeline
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    if max_df_frac is not None or max_df is not None:
        n_docs = df.select(id_col).distinct().count()  # bounded: one scalar
        grams = df_capped_postings(
            grams, "gram", max_df=max_df, max_df_frac=max_df_frac, n_docs=n_docs
        )
    else:
        n_docs = None
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    # persist the doc-sized size frame (r12): sa and sb broadcast-build
    # from it independently and their canonical plans differ enough that
    # neither static ReuseExchange nor AQE stage reuse dedups them — the
    # n_grams aggregate over the posting cache ran TWICE per query
    # (measured two ~0.7 s 65-task subexecutions at sf0.1)
    from bullet_spark_spark.operators._cache import persist_generation

    (sizes,) = persist_generation("dedup.containment_pairs.sizes", sizes)
    a, b = grams.alias("a"), grams.alias("b")
    shared = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("ga"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("gb"))
    if n_docs is not None and n_docs <= broadcast_below:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.least("ga", "gb").alias("n_small"),
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least("ga", "gb"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= min_containment)
    )


def plan_lsh_bands(
    target_jaccard: float, num_hashes: int
) -> tuple[int, int, float]:
    """Choose the (bands, rows_per_band) factorization of ``num_hashes``
    whose S-curve threshold (1/b)^(1/r) sits closest to the similarity
    you want to catch → (bands, rows, achieved_threshold). The knob
    users actually have is "catch pairs above J≈0.8", not band counts —
    this is the planner that turns one into the other (Mining of Massive
    Datasets §3.4.3; pure arithmetic, no data touched)."""
    if not 0.0 < target_jaccard < 1.0:
        raise ValueError("target_jaccard must be in (0, 1)")
    best = None
    for r in range(1, num_hashes + 1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        thr = (1.0 / b) ** (1.0 / r)
        score = abs(thr - target_jaccard)
        if best is None or score < best[0]:
            best = (score, b, r, thr)
    return best[1], best[2], best[3]


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_df: int = 1,
) -> DataFrame:
    """Cross-document exact-substring span detection over OVERLAPPING
    word k-grams — the fine-grained sibling of ``segment_dedup``.
    ``segment_dedup`` only catches repeats aligned to its non-overlapping
    segment grid; a passage shifted by one word slips through. This is
    the exact-substring posture of the suffix-array dedup literature
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"), re-expressed distributed: every k-token window is hashed,
    windows whose gram occurs in more than ``max_df`` DISTINCT documents
    are duplicated positions, and overlapping/adjacent duplicated
    positions merge into maximal spans (gaps-and-islands).

    Returns one row per document that contains at least one duplicated
    span: (id, n_tokens, dup_grams, dup_spans, dup_tokens, dup_frac)
    where dup_tokens is the total token count covered by merged spans and
    dup_frac = dup_tokens / n_tokens.

    Scale shape: the (id, pos, gram-hash) frame is linear in corpus
    tokens and computed once (persisted across its two consumers); grams
    leave the row as xxhash64 longs — the gram STRINGS never enter a
    shuffle. Shuffle 1 is the gram-keyed document-frequency aggregate
    (map-side partial); duplicated positions come back via a left-semi
    join that AQE broadcasts while the dup-gram set is small. Span
    merging is one window over (doc, pos) — partitioned by document, no
    skew beyond document length. No driver collects, no all-pairs
    stage: cost is O(tokens) + Σ_gram df(gram), not O(docs²).

    The k-gram array is built with slice/transform over a MATERIALIZED
    token column (HOF lambdas are interpreted — the token split must not
    be re-evaluated per element), and hashing happens AFTER posexplode so
    it runs in whole-stage codegen, not inside the lambda.

    Reference analog: none (bullet has no dedup surface); M5 extension
    family alongside segment_dedup / ngram containment.
    """
    from pyspark import StorageLevel

    toks_f = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"),
    ).filter(F.size("__toks") >= k)
    grams = (
        toks_f.select(
            "id",
            F.size("__toks").alias("n_tokens"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__toks") - k),
                    lambda i: F.array_join(
                        F.slice(F.col("__toks"), i + 1, k), " "
                    ),
                )
            ).alias("pos", "__gram"),
        )
        .select("id", "n_tokens", "pos", F.xxhash64("__gram").alias("gh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct("id").alias("__df"))
        .filter(F.col("__df") > max_df)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "left_semi")
    w = W.partitionBy("id").orderBy("pos")
    islands = (
        hits.withColumn(
            "__brk",
            F.when(F.col("pos") <= F.lag("pos").over(w) + k, 0).otherwise(1),
        )
        .withColumn("__isl", F.sum("__brk").over(w))
        .groupBy("id", "n_tokens", "__isl")
        .agg(
            F.count(F.lit(1)).alias("__grams"),
            (F.max("pos") - F.min("pos") + k).alias("__span_toks"),
        )
    )
    return islands.groupBy("id", "n_tokens").agg(
        F.sum("__grams").alias("dup_grams"),
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum("__span_toks").alias("dup_tokens"),
        F.round(F.sum("__span_toks") / F.col("n_tokens"), 6).alias("dup_frac"),
    )


def _span_gram_frames(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> tuple[DataFrame, DataFrame]:
    """Shared span-dedup front end → (toks_f, grams): the normalized token
    array per doc ≥ k tokens, and the linear (id, pos, gh) overlapping
    word-k-gram frame (xxhash64 longs — gram strings never shuffle). The
    k-gram array is built with slice/transform over the MATERIALIZED token
    column (HOF lambdas are interpreted), hashing after posexplode so it
    runs in codegen. Callers persist as needed."""
    toks_f = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"),
    ).filter(F.size("__toks") >= k)
    grams = toks_f.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - k),
                lambda i: F.array_join(F.slice(F.col("__toks"), i + 1, k), " "),
            )
        ).alias("pos", "__gram"),
    ).select("id", "pos", F.xxhash64("__gram").alias("gh"))
    return toks_f, grams


def _scrub_rebuild(toks_f: DataFrame, hits: DataFrame, k: int) -> DataFrame:
    """Shared span-scrub back end: duplicated gram positions (id, pos) →
    (id, n_tokens, dup_tokens, text_clean). The covered-token mask is
    row-local (per-position index ranges → collect_set per doc, bounded by
    document length), and the rebuild is an index-aware array_except —
    the same recovery segment_dedup uses."""
    covered = (
        hits.select(
            "id", F.explode(F.sequence("pos", F.col("pos") + k - 1)).alias("__ti")
        )
        .groupBy("id")
        .agg(F.collect_set("__ti").alias("__cov"))
    )
    return (
        toks_f.join(covered, "id", "left")
        .withColumn(
            "__cov", F.coalesce(F.col("__cov"), F.array().cast("array<int>"))
        )
        .withColumn(
            "__keep",
            F.array_sort(
                F.array_except(
                    F.sequence(F.lit(0), F.size("__toks") - 1), F.col("__cov")
                )
            ),
        )
        .select(
            "id",
            F.size("__toks").alias("n_tokens"),
            F.size("__cov").alias("dup_tokens"),
            F.array_join(
                F.transform(F.col("__keep"), lambda i: F.col("__toks")[i]), " "
            ).alias("text_clean"),
        )
    )


def scrub_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_df: int = 1,
    keep_first: bool = False,
) -> DataFrame:
    """Remove cross-document duplicated SPANS from every document —
    detection (``duplicated_spans``) carried through to the rebuilt
    corpus, at span granularity instead of ``segment_dedup``'s fixed
    grid. Every token covered by any word k-gram that occurs in more
    than ``max_df`` DISTINCT documents is dropped from ALL documents
    (the C4/boilerplate posture: repeated passages are chrome, nobody
    keeps a copy), and the surviving tokens are rejoined in order.

    ``keep_first=True`` switches to the suffix-array-dedup posture (Lee
    et al.: remove all but ONE occurrence): each duplicated gram keeps a
    KEEPER document — the minimum id holding it — and only covers tokens
    in NON-keeper documents, so one copy of every duplicated passage
    survives the corpus. Keeper choice is per GRAM, so where passages
    from different keeper documents overlap inside one document the
    intersection tokens can still be scrubbed everywhere — the price of
    keeping keeper election a single aggregate instead of a global
    alignment; deterministic, and the oracle replays it exactly.

    Returns every document ≥ k tokens: (id, n_tokens, dup_tokens,
    text_clean); unaffected documents pass through with dup_tokens = 0.

    Scale shape: shares ``duplicated_spans``' linear gram frame and its
    single gram-keyed shuffle (keeper election is the same aggregate
    that counts distinct documents); the covered-token mask is built
    row-local from the doc's duplicated positions (posexplode of
    per-position ``sequence(pos, pos+k-1)`` index ranges → collect_set
    per doc — the set is bounded by document length, NOT corpus size),
    and the rebuild is an array_except of index arrays exactly like
    segment_dedup's surviving-segment recovery. No stage touches more
    than O(corpus tokens) rows.
    """
    from pyspark import StorageLevel

    toks_f, grams = _span_gram_frames(df, id_col, text_col, k)
    toks_f = toks_f.persist(StorageLevel.MEMORY_AND_DISK)
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        grams.groupBy("gh")
        .agg(
            F.count_distinct("id").alias("__df"),
            F.min("id").alias("__keeper"),
        )
        .filter(F.col("__df") > max_df)
        .select("gh", "__keeper")
    )
    if keep_first:
        hits = grams.join(dup, "gh").filter(F.col("id") != F.col("__keeper"))
    else:
        hits = grams.join(dup.select("gh"), "gh", "left_semi")
    return _scrub_rebuild(toks_f, hits, k)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
    window of ``w`` consecutive gram hashes, and select each window's
    minimum (leftmost on ties). Guarantees: any shared passage of at
    least w+k-1 tokens produces at least one shared fingerprint
    (coverage), and the expected selected density is 2/(w+1) — the
    fingerprint posting table is ~w/2× smaller than the full gram
    table, which is the whole point at corpus scale: downstream
    pair-finding joins touch fingerprints, not grams.

    Returns (id, pos, fp) — fp is the gram's md5 hex. md5 (not
    xxhash64) so the SELECTION is engine-portable: lexicographic min
    over fixed-width hex equals numeric min over the hash value, and
    every engine with md5/lpad/window-min replays it exactly (same
    portability posture as minhash_signatures_md5).

    Scale shape: one window function over (doc, pos) — partitioned by
    document, the only exchange; selection and dedup are row-local
    per doc. O(tokens) rows end-to-end, no corpus-global state.
    """
    toks_f = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("__toks"),
    ).filter(F.size("__toks") >= k + w - 1)
    grams = toks_f.select(
        "id",
        F.size("__toks").alias("__n"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - k),
                lambda i: F.array_join(F.slice(F.col("__toks"), i + 1, k), " "),
            )
        ).alias("pos", "__gram"),
    ).select("id", "__n", "pos", F.md5("__gram").alias("fp"))
    # leftmost-min tie-break: the window min of fp||pos picks the smallest
    # hash, then the smallest position among equal hashes.
    key = F.concat("fp", F.lit("|"), F.lpad(F.col("pos").cast("string"), 8, "0"))
    win = (
        W.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = (
        grams.withColumn("__key", F.min(key).over(win))
        # complete windows only: starts 0 .. n_grams - w
        .filter(F.col("pos") <= (F.col("__n") - k + 1) - w)
        .select(
            "id",
            F.substring("__key", 34, 8).cast("int").alias("pos"),
            F.substring("__key", 1, 32).alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 1000,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints →
    (id_a, id_b, shared) with id_a < id_b and shared ≥ ``min_shared``.
    The posting self-join runs on the winnowed table (≈ 2/(w+1) the
    gram count) with the same corpus-relative hot-key prune as
    containment_pairs/tfidf: fingerprints in more than ``max_df``
    documents are boilerplate and contribute df² pair candidates each,
    so they are dropped before the join — Σdf² stays bounded."""
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w).select(
        "id", "fp"
    ).distinct()
    from pyspark import StorageLevel

    # persist BEFORE the cap (the drop count is an eager action — without
    # the cache it recomputes the winnowing pass); drop-side anti-join,
    # not keep-side semi-join: see df_capped_postings
    fps = fps.persist(StorageLevel.MEMORY_AND_DISK)
    fps = df_capped_postings(fps, "fp", max_df=max_df)
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def fuzzy_pairs_blocked(
    keys: DataFrame,
    id_col: str,
    key_col: str,
    max_dist: int = 2,
    key_width: int = 24,
) -> DataFrame:
    """Blocked EDIT-DISTANCE pair mining over short fixed-width keys →
    (id_a, id_b, dist): the record-linkage / entity-resolution dedup
    surface (typo-level near-dup on titles, names, normalized prefixes)
    that none of the token-set operators (minhash/simhash/containment)
    cover — those see "acme corp" vs "acme c0rp" as disjoint shingle
    sets, while edit distance sees one substitution.

    Blocking is the PassJoin-style pigeonhole (Li, Deng, Feng 2011 —
    same family as :func:`hamming_near_dup_pairs`' 16-bit blocks): each
    key is cut into ``max_dist + 1`` contiguous segments; two
    equal-width keys within SUBSTITUTION distance ``max_dist`` must
    agree exactly on at least one (segment_idx, segment_value), so
    candidates are an equi-join on that pair — linear blocking, never
    all-pairs. Keys are clipped/padded to exactly ``key_width`` chars
    (rpad) so segment boundaries align; the guarantee covers
    substitution edits, and the full Levenshtein VERIFY also admits the
    insert/delete pairs whose alignment happens to preserve a segment
    (documented recall posture: exact for Hamming-style typos, best-
    effort for indels — the common record-linkage trade).

    Scale shape: one posexplode to (d+1)·n segment rows, one
    segment-keyed equi-join (shuffle on the segment value, no
    broadcast hint — a hot segment like a boilerplate prefix skews, and
    AQE's skew split handles it), then the O(key_width²) Levenshtein DP
    only on candidates — key_width is a constant (≤ ~64), so the verify
    is O(1) per candidate pair. Deterministic and engine-portable:
    DuckDB's levenshtein() computes the same DP, so the whole pipeline
    is oracle-checkable value-for-value.

    Hot-segment caveat: keys much SHORTER than ``key_width`` pad with
    spaces, so their trailing segments are all-blank — one shared
    bucket across every short key (correct, the pigeonhole needs it:
    two 8-char keys within distance d share only blank segments), but
    quadratic in the short-key count. Filter the input to
    ``length >= key_width`` (the registered query does) or size
    ``key_width`` to the population's minimum when short keys are
    legitimate data."""
    nseg = max_dist + 1
    if key_width % nseg != 0:
        raise ValueError(
            f"key_width ({key_width}) must be divisible by max_dist+1 ({nseg}) "
            "so the pigeonhole segments align"
        )
    base = _persist_sigs(_fuzzy_key_frame(keys, id_col, key_col, key_width))
    segs = _fuzzy_segments(base, id_col, key_width, nseg)
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    ka = base.select(F.col(id_col).alias("id_a"), F.col("__k").alias("__ka"))
    kb = base.select(F.col(id_col).alias("id_b"), F.col("__k").alias("__kb"))
    return (
        cand.join(ka, "id_a")
        .join(kb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("__ka"), F.col("__kb")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def _fuzzy_key_frame(
    df: DataFrame, id_col: str, key_col: str, key_width: int
) -> DataFrame:
    """(id, __k) with the key clipped/padded to exactly key_width chars —
    the canonical form fuzzy_pairs_blocked and the streaming store share."""
    return df.select(
        F.col(id_col),
        F.rpad(F.substring(F.col(key_col), 1, key_width), key_width, " ").alias(
            "__k"
        ),
    )


def _fuzzy_segments(
    keys: DataFrame, id_col: str, key_width: int, nseg: int
) -> DataFrame:
    """Posexplode a padded-key frame into its pigeonhole segments."""
    w = key_width // nseg
    return keys.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[F.substring(F.col("__k"), 1 + i * w, w) for i in range(nseg)]
            )
        ).alias("seg_idx", "seg_val"),
    )


def streaming_fuzzy_ingest(
    stream: DataFrame,
    state_dir: str,
    out_dir: str,
    id_col: str,
    key_col: str,
    max_dist: int = 2,
    key_width: int = 24,
    checkpoint_dir: str | None = None,
    compact_every: int | None = 16,
):
    """CONTINUOUS fuzzy-dedup intake: every micro-batch is edit-distance-
    deduplicated against (a) itself and (b) every record ever accepted,
    via a persisted KEY store — the record-linkage analogue of
    :func:`streaming_neardup_ingest` (same epoch-partitioned store, same
    idempotent per-epoch writes, same periodic compaction).

    Per batch (foreachBatch, batch-mode DataFrames):
      1. canonicalize keys once (:func:`_fuzzy_key_frame`, persisted);
      2. within-batch :func:`fuzzy_pairs_blocked` pairs ≤ ``max_dist``
         resolve GREEDILY (first-occurrence-wins: an id drops iff a KEPT
         smaller id is close — _greedy_pair_drops; naive pairwise
         dropping over-deletes on transitive chains);
      3. batch pigeonhole segments BROADCAST against the store's
         segments (a micro-batch is small; history is big) — history is
         touched only through its key table, cost ∝ segment collisions;
         candidates verify with the same Levenshtein DP;
      4. survivors append (id, key) to the store and their full rows to
         ``out_dir`` — per-epoch overwrite, so a retried epoch is
         idempotent.

    State per accepted record is ``key_width`` chars — a 100 TB corpus's
    store is a few GB of parquet any batch job can reuse. Returns the
    StreamingQuery (AvailableNow trigger — drain-and-stop intake)."""
    import os

    nseg = max_dist + 1
    if key_width % nseg != 0:
        raise ValueError(
            f"key_width ({key_width}) must be divisible by max_dist+1 ({nseg})"
        )
    spark = stream.sparkSession
    key_store = os.path.join(state_dir, "fuzzy_keys")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keys = _fuzzy_key_frame(batch_df, id_col, key_col, key_width).persist()

        # (2) history FIRST: store members are all kept and smaller (monotone
        # ids), so a batch id close to any of them is condemned outright —
        # and a condemned id must not condemn its own within-batch neighbors
        # (greedy semantics; _greedy_pair_drops takes these as pre_dropped)
        hist_dups = None
        if _sig_store_epochs(spark, key_store):
            hist = (
                spark.read.option("basePath", key_store).parquet(key_store)
                .filter(F.col("epoch") != epoch_id)  # retry safety
                .select(id_col, "__k")
            )
            new_seg = _fuzzy_segments(keys, id_col, key_width, nseg)
            hist_seg = _fuzzy_segments(hist, id_col, key_width, nseg)
            cands = (
                hist_seg.join(
                    F.broadcast(
                        new_seg.withColumnRenamed(id_col, "__new_id")
                    ),
                    ["seg_idx", "seg_val"],
                )
                .select(
                    F.col(id_col).alias("__hist_id"),
                    F.col("__new_id"),
                )
                .distinct()
            )
            ka = hist.select(
                F.col(id_col).alias("__hist_id"), F.col("__k").alias("__ka")
            )
            kb = keys.select(
                F.col(id_col).alias("__new_id"), F.col("__k").alias("__kb")
            )
            hist_dups = (
                cands.join(ka, "__hist_id")
                .join(kb, "__new_id")
                .filter(F.levenshtein(F.col("__ka"), F.col("__kb")) <= max_dist)
                .select(F.col("__new_id").alias(id_col))
                .distinct()
                .localCheckpoint(eager=True)
            )

        # (3) within-batch: GREEDY first-occurrence-wins over the close
        # pairs (pairwise larger-id dropping over-deletes on transitive
        # chains — _greedy_pair_drops docstring); history-condemned ids
        # can't condemn their own neighbors
        batch_pairs = fuzzy_pairs_blocked(
            keys.select(F.col(id_col), F.col("__k").alias("k")),
            id_col,
            "k",
            max_dist=max_dist,
            key_width=key_width,
        )
        pre = (
            hist_dups.select(F.col(id_col).alias("id"))
            if hist_dups is not None
            else None
        )
        dup_ids = _greedy_pair_drops(batch_pairs, pre_dropped=pre).select(
            F.col("id").alias(id_col)
        )
        if hist_dups is not None:
            dup_ids = dup_ids.unionByName(hist_dups)

        dup_ids = dup_ids.distinct()
        survivors = batch_df.join(dup_ids, id_col, "left_anti")
        surviving_keys = keys.join(dup_ids, id_col, "left_anti")

        # (4) idempotent per-epoch writes
        surviving_keys.write.mode("overwrite").parquet(
            f"{key_store}/epoch={epoch_id}"
        )
        survivors.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
        keys.unpersist()

        if compact_every:
            closed = [
                e for e in _sig_store_epochs(spark, key_store) if e != epoch_id
            ]
            if len(closed) >= compact_every:
                _compact_sig_store(spark, key_store, keep_epoch=epoch_id)

    writer = stream.writeStream.foreachBatch(process).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def pair_eval_metrics(
    predicted: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Pair-level dedup EVALUATION → one row (n_pred, n_true, tp,
    precision, recall, f1): score a dedup operator's pair output against
    ground truth (planted duplicates, a labeled benchmark, or a stronger
    oracle's pairs) — the measurement half every dedup tuning loop needs
    (the retrieval_metrics analogue for the dedup family; thresholds and
    band counts get tuned against THIS, not against eyeballing).

    Pairs are canonicalized (min, max) on both sides so orientation
    never miscounts. Scale shape: two distinct pair frames, ONE
    full-outer join on the canonical pair, ONE aggregate — pair-space-
    sized throughout, no corpus scan, no driver-side counts (stays a
    lazy DataFrame). Exact integer ratios rounded 6 dp: engine-portable,
    oracle-checkable."""
    def canon(df: DataFrame, flag: str) -> DataFrame:
        return df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        ).distinct().withColumn(flag, F.lit(1))

    both = canon(predicted, "__p").join(
        canon(truth, "__t"), ["a", "b"], "full_outer"
    )
    # outer coalesce: sum over ZERO rows (both inputs empty) is NULL, and
    # the per-row coalesce never runs — the counts must still read 0
    agg = both.agg(
        F.coalesce(
            F.sum(F.coalesce(F.col("__p"), F.lit(0))), F.lit(0)
        ).alias("n_pred"),
        F.coalesce(
            F.sum(F.coalesce(F.col("__t"), F.lit(0))), F.lit(0)
        ).alias("n_true"),
        F.coalesce(
            F.sum(
                F.coalesce(F.col("__p"), F.lit(0))
                * F.coalesce(F.col("__t"), F.lit(0))
            ),
            F.lit(0),
        ).alias("tp"),
    )
    prec = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("n_true") > 0, F.col("tp") / F.col("n_true")
    ).otherwise(F.lit(0.0))
    return agg.select(
        "n_pred",
        "n_true",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                (prec + rec) > 0, 2 * prec * rec / (prec + rec)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("f1"),
    )


def _gram_tf(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram, tf) term-frequency postings over word n-grams WITH
    multiplicity (word_shingles deduplicates; the weighted family needs
    counts). Same zip-of-slices shingling as word_shingles — one split
    per row, never per shingle (the interpreted-HOF lesson)."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    cnt = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(toks, i + 1, cnt) for i in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(n)])
    )
    return (
        widen_thin_input(df)
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .groupBy("id", "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.4,
    max_df: int | None = 100_000,
    max_df_frac: float | None = 0.5,
) -> DataFrame:
    """Exact TF-WEIGHTED Jaccard pairs → (id_a, id_b, wjaccard):
    ``Σ_g min(tf_a(g), tf_b(g)) / Σ_g max(tf_a(g), tf_b(g))`` over word
    n-grams WITH multiplicity — the repetition-aware near-dup measure
    the set-Jaccard family flattens (a doc that repeats a passage 10×
    and one containing it once are "identical" to set Jaccard on the
    shared grams; weighted Jaccard sees the mass difference). The exact
    counterpart a weighted-minhash (Ioffe CWS) approximation would be
    tuned against.

    Identity used: Σmax over the union = T_a + T_b − Σmin over shared
    grams, so only the SHARED-gram posting join is ever materialized —
    never the union space, never all pairs.

    Scale shape (the containment_pairs posture): (id, gram, tf) postings
    from one explode + count; grams over EITHER df cap are pruned BEFORE
    the posting self-join (totals are computed over the SAME pruned gram
    space so the ratio stays a true weighted Jaccard of that space; pass
    both ``None`` for the unpruned exact measure — test only); one
    gram-keyed self-join with per-pair min-sums; doc totals
    broadcast-join back. Integer tf arithmetic end-to-end, ratio rounded
    6 dp — oracle-exact.

    Candidate-pair budget (why BOTH caps, and why the ABSOLUTE one is
    the default that matters): the self-join emits Σ_g df(g)² candidate
    pairs. ``max_df_frac`` alone is NOT a bound at web scale — a gram
    surviving a 0.5·N fractional cap contributes (0.5·N)² pairs, i.e.
    quadratic in corpus size. ``max_df`` (absolute, default 100 000)
    caps each gram's contribution at a CONSTANT 10¹⁰ regardless of N,
    making the join linear in the number of surviving grams; the
    fraction remains the corpus-relative boilerplate knob for small
    corpora where the absolute cap never binds. The effective cap is
    min(max_df, max_df_frac·N) — the rule is stated once in SCALE.md's
    posting-join budget section and shared by containment_pairs and
    tfidf_cosine_pairs."""
    # persist the RAW postings: the df-prune, totals, and the self-join's
    # two sides all derive from this one frame — without the cache each
    # consumer re-runs the corpus scan + explode (audit_scans-caught)
    tf = _persist_sigs(_gram_tf(df, id_col, text_col, n))
    # count(*) on the RAW frame: docs shorter than n words still count
    # toward the fractional cap's denominator (same convention as the
    # oracle's n_docs)
    n_docs = df.count() if max_df_frac is not None else None
    tf = df_capped_postings(
        tf, "gram", max_df=max_df, max_df_frac=max_df_frac, n_docs=n_docs
    )
    totals = tf.groupBy("id").agg(F.sum("tf").alias("total"))
    a, b = tf.alias("a"), tf.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.least(F.col("a.tf"), F.col("b.tf"))).alias("__im"))
    )
    ta = totals.select(F.col("id").alias("id_a"), F.col("total").alias("__ta"))
    tb = totals.select(F.col("id").alias("id_b"), F.col("total").alias("__tb"))
    return (
        inter.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__im")
                / (F.col("__ta") + F.col("__tb") - F.col("__im")),
                6,
            ).alias("wjaccard"),
        )
        .filter(F.col("wjaccard") >= threshold)
    )


def bbit_minhash_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.35,
    num_hashes: int = 32,
    bands: int = 16,
    b: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """b-BIT minhash near-dup pairs (Li & König, WWW 2010 — public
    knowledge): store only the lowest ``b`` bits of each of the k minhash
    components — k·b bits of resident sketch per document instead of
    k·128 (32× smaller at b=4) — and undo the collision bias with
    ``Ĵ = (C − 2⁻ᵇ) / (1 − 2⁻ᵇ)`` where C is the matching fraction of
    b-bit components. THE memory-bound variant for a billion-document
    resident index: the full md5 components exist only transiently for
    banding (b-bit bands would flood buckets — 16 values per band row);
    the verify step touches nothing but the b-bit sketch.

    Engine-portable end-to-end: b is pinned to 4 so the b-bit component
    IS the md5 hex string's last character (``substr(h, 32, 1)`` in any
    SQL dialect), and the bias correction divides by exact binary
    constants (2⁻⁴ = 0.0625) — the whole pipeline hash-matches a DuckDB
    oracle like :func:`minhash_dedup_pairs_md5`.

    → (id_a, id_b, c_match, est_jaccard_bbit), est ≥ ``threshold``.
    Variance note: Var(Ĵ_bbit) ≈ Var(Ĵ_full)/(1−2⁻ᵇ)² + collision noise,
    so k should be ~2× the full-width k for matched precision (default 32
    vs the md5 row's 16) — still a 16× memory cut."""
    if b != 4:
        raise ValueError(
            "engine-portable extraction uses the md5 hex LAST CHARACTER; "
            "b must be 4"
        )
    sigs = _persist_sigs(
        minhash_signatures_md5(df, id_col, text_col, num_hashes, shingle_n)
    )
    bbit = sigs.select(
        F.col(id_col),
        F.transform("sig", lambda h: F.substring(h, 32, 1)).alias("bsig"),
    )
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, deduplicate=False
    )
    sa = bbit.select(F.col(id_col).alias("id_a"), F.col("bsig").alias("ba"))
    sb = bbit.select(F.col(id_col).alias("id_b"), F.col("bsig").alias("bb"))
    joined = cands.join(sa, "id_a").join(sb, "id_b")
    c_match = F.size(
        F.filter(
            F.zip_with(F.col("ba"), F.col("bb"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    r = 2.0 ** (-b)
    est = (c_match / F.lit(float(num_hashes)) - F.lit(r)) / F.lit(1.0 - r)
    return (
        joined.select(
            "id_a",
            "id_b",
            c_match.cast("bigint").alias("c_match"),
            F.round(est, 6).alias("est_jaccard_bbit"),
        )
        .filter(F.col("est_jaccard_bbit") >= threshold)
        .distinct()
    )


def weighted_minhash_dedup_pairs_md5(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """WEIGHTED minhash near-dup pairs, engine-portable: estimates the
    tf-weighted (multiset) Jaccard that :func:`weighted_jaccard_pairs`
    computes exactly — for INTEGER weights, expanding each gram into tf
    distinct copies (``gram#0 … gram#(tf-1)``) makes plain minhash over
    the expanded sets an unbiased estimator of Σmin/Σmax (the classic
    integer-weight reduction; Ioffe's CWS generalizes to real weights).
    Signature components are min(md5('j:' || copy)) hex strings, so the
    WHOLE pipeline — expansion, banding, candidate join, verify —
    hash-matches a DuckDB oracle byte-for-byte, like
    :func:`minhash_dedup_pairs_md5`.

    Scale shape: the expansion multiplies posting rows by mean tf
    (bounded by document length, not corpus size — the exploded frame is
    exactly the pre-grouped gram stream), then ONE groupBy(id) with k
    partial mins; banding and verify are the shared LSH code paths."""
    tf = _gram_tf(df, id_col, text_col, shingle_n)
    copies = tf.select(
        F.col("id").alias(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("tf") - 1),
                lambda i: F.concat_ws("#", F.col("gram"), i.cast("string")),
            )
        ).alias("__sh"),
    )
    mins = copies.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("__sh")))).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )
    sigs = _persist_sigs(
        mins.select(
            F.col(id_col),
            F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"),
        )
    )
    cands = minhash_lsh_candidates(
        sigs, id_col, bands, num_hashes // bands, deduplicate=False
    )
    sims = minhash_similarity(sigs, cands, id_col)
    return sims.filter(F.col("est_jaccard") >= threshold).distinct()


def semdedup_survivors(
    embeddings: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_col: str = "centroid",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public knowledge): semantic
    deduplication with CLUSTER-LOCAL pair generation → the surviving
    (id) set. Every embedding is assigned to its nearest centroid
    (k-means fit or per-label prototypes — exact decimal argmin,
    similarity.nearest_centroid_assign), cosine pairs are computed ONLY
    within a cluster, transitive duplicate sets resolve through
    connected_components, and the smallest id per set survives.

    Why this exists next to the global paths (semantic survivors /
    blocked GEMM): the pair candidate space drops from n² (all blocks)
    to Σ_c n_c² — with k balanced clusters a k× reduction, and the
    within-cluster join is a plain EQUI-join on the assigned label
    (bucket-local shuffle, no grid). The trade is by DESIGN: a
    duplicate pair straddling two clusters is not a candidate (the
    paper's premise is that near-dups share a cluster at sane k); the
    oracle encodes the same cluster-local rule, so the certification
    is of THIS contract, not of global dedup. Skew note: one giant
    cluster degrades toward n² — pick k (or cap cluster size) so
    max n_c is bounded, exactly like the banded-LSH df caps.

    Cosine is the engine-portable expression (ordered-fold dot /
    (sqrt·sqrt), rounded 6 dp); ties and survivors inherit the
    connected_components min-label semantics."""
    from bullet_spark_spark.operators.similarity import (
        dot as _dot,
        nearest_centroid_assign,
        norm as _norm,
    )

    assign = nearest_centroid_assign(
        embeddings, centroids, id_col, vec_col, label_col, centroid_col
    ).select(F.col(id_col), F.col("assigned"))
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__n")
    ).join(assign, id_col)
    a = vecs.select(
        F.col("assigned"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = vecs.select(
        F.col("assigned"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    prod = F.col("__na") * F.col("__nb")
    pairs = (
        a.join(b, "assigned")  # cluster-local equi-join, never a grid
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.when(
                prod > 0,
                F.round(_dot(F.col("__va"), F.col("__vb")) / prod, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
    return neardup_survivors(
        embeddings.select(id_col), pairs.select("id_a", "id_b"), id_col
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — gear-hash boundaries, FastCDC posture
# ---------------------------------------------------------------------------

import hashlib as _hashlib

# 256-entry gear table, derived deterministically from md5 so import is
# reproducible with no runtime RNG (the FastCDC paper draws these random;
# any fixed high-entropy table satisfies the boundary-uniformity argument).
_GEAR = tuple(
    int.from_bytes(_hashlib.md5(bytes([i])).digest()[:8], "big")
    for i in range(256)
)


def _cdc_mask(avg_bits: int) -> int:
    """A SPREAD mask with ``avg_bits`` set bits over positions 13..63.
    Gear's shift-register update ``h = (h << 1) + gear[b]`` means bit p of
    h only sees the last p+1 bytes — a low-bit mask would judge boundaries
    on a few bytes of context. Spreading the tested bits high keeps the
    effective context window wide (the reason FastCDC's published masks
    are spread), while P[boundary] stays 2^-avg_bits per position."""
    if not 1 <= avg_bits <= 20:
        raise ValueError(f"avg_bits must be in [1, 20], got {avg_bits}")
    positions = [13 + (50 * i) // max(avg_bits - 1, 1) for i in range(avg_bits)]
    if avg_bits == 1:
        positions = [45]
    mask = 0
    for p in positions:
        mask |= 1 << min(p, 63)
    return mask


def _cdc_cuts(n: int, candidates, min_size: int, max_size: int) -> list[int]:
    """Boundary positions (cut AFTER index) honoring min/max: candidates
    closer than ``min_size`` to the previous cut are skipped, and a cut is
    FORCED at ``max_size`` when no candidate fired — the classic CDC size
    clamp. Natural boundaries are honored in the TAIL too (a remainder
    that already fits in one chunk still cuts at its candidates): that is
    what keeps a document and its suffix-extension sharing their final
    chunks — suffix stability, the mirror of the insertion re-sync
    property. A candidate at the last byte is skipped (it would cut an
    empty final chunk). Sequential by nature, but runs over the sparse
    candidate list (≈ n / 2^avg_bits entries), not every byte."""
    cuts: list[int] = []
    start = 0
    ci = 0
    m = len(candidates)
    while True:
        nxt = None
        while ci < m:
            c = int(candidates[ci])
            if c < start + min_size or c >= n - 1:
                ci += 1
                continue
            if c >= start + max_size:
                break
            nxt = c
            ci += 1
            break
        if nxt is None:
            if n - start <= max_size:
                break
            nxt = start + max_size - 1  # forced cut
        cuts.append(nxt)
        start = nxt + 1
    return cuts


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    avg_bits: int = 6,
    min_size: int = 16,
    max_size: int = 256,
) -> DataFrame:
    """CONTENT-DEFINED CHUNKING: split each document at gear-hash
    boundaries (FastCDC posture — Xia et al., ATC'16) and fingerprint each
    chunk, the storage-dedup primitive that also powers sub-document
    near-dup removal in training corpora: unlike fixed-size blocks, an
    insertion early in a document shifts only the chunks it touches — all
    downstream boundaries re-synchronize because each boundary depends
    only on the trailing 64 bytes of content, never on absolute position.

    Per byte, ``h = (h << 1) + GEAR[b]`` (uint64 wrap); position t is a
    boundary candidate when ``h & mask == 0`` with a SPREAD high-bit mask
    (see :func:`_cdc_mask`); ``min_size``/``max_size`` clamp degenerate
    chunks (expected size ≈ 2^avg_bits bytes before clamping). Boundaries
    are computed VECTORIZED: h_t = Σ_{k<64} GEAR[b_{t-k}] << k (the shift
    register forgets after 64 steps), evaluated as 64 lagged uint64 adds
    per Arrow batch — no per-byte Python. Only the sparse candidate list
    walks through Python (the min/max clamp is inherently sequential).

    Returns (id, chunk_idx, chunk_pos, chunk_len, chunk_hash): a MAP-ONLY
    stage — zero shuffle; at 100 TB it parallelizes over input splits and
    every downstream dedup is a groupBy on chunk_hash (chunk-space, smaller
    than corpus-space by the dedup ratio). chunk_hash is md5 of the chunk
    bytes (engine-neutral, collision-safe at catalog scale).
    """
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    mask = _cdc_mask(avg_bits)
    base = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    out_schema = StructType(
        [
            base.schema[id_col],
            StructField("chunk_idx", LongType()),
            StructField("chunk_pos", LongType()),
            StructField("chunk_len", LongType()),
            StructField("chunk_hash", StringType()),
        ]
    )

    def gen(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        gear = np.array(_GEAR, dtype=np.uint64)
        msk = np.uint64(mask)
        err = np.seterr(over="ignore")  # uint64 wrap IS the hash semantics
        try:
            for pdf in batches:
                ids, idxs, poss, lens, hashes = [], [], [], [], []
                for rid, t in zip(pdf[id_col].values, pdf["__t"]):
                    raw = (t or "").encode("utf-8")
                    n = len(raw)
                    if n == 0:
                        continue
                    g = gear[np.frombuffer(raw, dtype=np.uint8)]
                    h = g.copy()
                    for k in range(1, 64):
                        if k >= n:
                            break
                        h[k:] += g[:-k] << np.uint64(k)
                    cand = np.flatnonzero((h & msk) == np.uint64(0))
                    cuts = _cdc_cuts(n, cand, min_size, max_size)
                    bounds = [0] + [c + 1 for c in cuts] + [n]
                    for i in range(len(bounds) - 1):
                        s, e = bounds[i], bounds[i + 1]
                        ids.append(rid)
                        idxs.append(i)
                        poss.append(s)
                        lens.append(e - s)
                        hashes.append(hashlib.md5(raw[s:e]).hexdigest())
                yield pd.DataFrame(
                    {
                        id_col: pd.array(ids, dtype="int64"),
                        "chunk_idx": pd.array(idxs, dtype="int64"),
                        "chunk_pos": pd.array(poss, dtype="int64"),
                        "chunk_len": pd.array(lens, dtype="int64"),
                        "chunk_hash": hashes,
                    }
                )
        finally:
            np.seterr(**err)

    return base.mapInPandas(gen, schema=out_schema)


def dedup_rate_estimate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hex_prefix: str = "0",
    round_dp: int = 6,
) -> DataFrame:
    """PRE-FLIGHT dedup-rate estimation by CONTENT-KEY cluster sampling —
    the 100 TB question "is this corpus duplicated enough to be worth a
    full dedup pass?" answered from a 1/16 sample whose cost is one scan.

    The estimator's correctness hinges on WHAT gets sampled: sampling
    documents uniformly UNDERESTIMATES duplication (a duplicate pair
    crosses the sample boundary with probability 2p(1-p)), so the sample
    is drawn by CONTENT KEY — a document is in-sample iff the first hex
    char of md5(normalized text) equals ``hex_prefix`` — which keeps or
    drops every copy of the same content TOGETHER. Group-level inclusion
    makes both the sampled doc count and the sampled unique count
    unbiased (scaled) estimates; their ratio is the standard consistent
    ratio estimator for the dup rate. Deterministic (no RNG), so the
    differential vs the exact full-corpus rate is oracle-checkable.

    One combinable aggregate computes sample AND exact sides in a single
    scan (conditional counts — no second pass, no join); output is a
    one-row panel: sample counts, estimated rate, exact rate, |error|.
    At 100 TB you run ONLY the sample side (drop the exact columns): the
    scan reads one string column and the agg state is two counters plus
    two distinct sketches.
    """
    ck = F.md5(normalize_text(F.col(text_col)))
    flag = F.substring(ck, 1, 1) == hex_prefix
    agg = df.select(ck.alias("ck"), flag.alias("inx")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct("ck").alias("u_total"),
        F.count(F.when(F.col("inx"), F.lit(1))).alias("n_sample"),
        F.countDistinct(F.when(F.col("inx"), F.col("ck"))).alias("u_sample"),
    )
    est = F.when(
        F.col("n_sample") > 0,
        F.round(1.0 - F.col("u_sample") / F.col("n_sample"), round_dp),
    )
    exact = F.round(1.0 - F.col("u_total") / F.col("n_total"), round_dp)
    return agg.select(
        F.col("n_sample").alias("n_sample_docs"),
        F.col("u_sample").alias("n_sample_uniq"),
        est.alias("est_dup_rate"),
        exact.alias("exact_dup_rate"),
        F.round(F.abs(est - exact), round_dp).alias("abs_err"),
    )
