"""Plan-health audit: flag queries whose physical plan scans the same
base table >= 3 times — the double-consumer recompute hazard (a derived
frame consumed by two downstream branches re-executes per consumer
unless persisted or re-expressed as a window over reduced rows; column
pruning diverges the subtrees past Spark's exchange reuse).

Round-4 catches: pipeline_release_v2 (74s -> ~5s at sf0.1),
quality_validate (4 scans -> 1), temperature mixture, bm25 stats,
unigram counts, q11/q15/q20/q22 scalar subqueries.

Usage: python tools/audit_scans.py [--sf /root/testdata/sf0.001]
Exits 0 always — known-benign flags (independent demo unions, tiny
eval-subset rescans, AQE-reused rollup exchanges) are listed in
_ACCEPTED with their justification.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ACCEPTED = {
    # 4 independent sampling demos unioned in one slot — each scans once
    "sampling_deterministic": "four independent demo variants, one scan each",
    # the pc/ranked branches share the literal range exchange — verified
    # ReusedExchange=1 in the executed plan, so real base scans = 2
    # (nulls + ranged), both column-pruned; the pre-AQE text shows 3
    "scale_column_stats": "range exchange reused at runtime (ReusedExchange=1); nulls branch is a pruned second scan",
    # keys0/corrupt/truth are three 1-column pruned derivations of one
    # demo base (the same class as quality_snapshot_diff); the expensive
    # pair pipeline itself runs on the _persist_sigs-cached key frame
    "dedup_eval_fuzzy": "pred + truth derive pruned key projections of one demo base; pair pipeline cached",
    # raw tf postings are eagerly persisted (_persist_sigs); the plan text
    # re-prints the cached child once per consumer (prune + totals + both
    # self-join sides) but the corpus scans once at materialization
    "dedup_weighted_jaccard": "tf postings persisted; plan text re-prints the cached child per consumer",
    # eval side derives from the same table but is a tiny pruned subset
    "decontam_minhash": "eval-subset rescans are pruned and broadcast-sized",
    "decontam_ngram": "eval-subset rescan is pruned and broadcast-sized",
    # hierarchical rollup: initial plan shows 3, AQE ReusedExchange dedupes
    "time_bucket_rollup": "month/year levels reuse the day exchange at runtime",
    # 2-pass by design (count pass + score pass) + pruned lang join
    "text_perplexity_buckets": "two-pass train+score, counts persisted",
    "text_bm25_topk": "dl persisted; remaining scans are the 2 tokenize passes",
    "pipeline_release_v2": "scrub spans + clean frame persisted; raw-source scans prune",
    # r6 review — CDC/demo fixture-derivation artifacts: the old/new/delta
    # sides are DERIVED from one base table because the fixture has no real
    # change stream; a production CDC pipeline reads delta tables (one scan
    # each). The extra scans are pruned parquet rereads of the demo base,
    # not operator costs — the operators themselves take the sides as
    # separate frames.
    "relational_incremental_agg": "old/changed/new sides derived from one demo base",
    "pipeline_warehouse_sync": "old/new/diff/semi-join sides derived from one demo base; diff+base persisted",
    "relational_incremental_join": "both relations' old/new/delta derived from demo bases",
    "quality_snapshot_diff": "old and new snapshots both constructed from the demo base",
    # nearest-aware as-of unions forward and backward candidate passes over
    # the same (pruned) events scan — two directions by definition
    "join_asof_nearest": "forward + backward passes + tie-break rescan, all pruned",
    # centroid pipelines: train pass (per-dim aggregate) + score pass +
    # label join-back on the same embeddings table — multi-pass by design,
    # each pass column-pruned; at scale centroids are k×dim broadcast state
    "sim_nearest_centroid": "centroid train pass + scoring pass + label join-back",
    "sim_cluster_silhouette": "centroid train pass + scoring pass + rank windows",
    # r7 review — sketch exact-path certifications rescan the BOUNDED side
    # (the key set / per-cell lookups / the exact verification counts);
    # the data-sized table scans once and the rescans are column-pruned
    # key reads (the exact paths exist only to certify the sketch answers
    # value-for-value — production callers run the sketch path alone)
    "sketch_bloom_prune": "k per-hash branches + exact verify reread the pruned KEY column; orders scans once",
    "sketch_cms_error_md5": "build + d lookup branches + exact counts; key column pruned, one wide scan",
    "sketch_overlap_exact": "per-group distinct + pair + size passes over one pruned (group,key) projection",
    # r7 review — retrieval certifications: anchors/positives/banned/truth
    # are tiny pruned subsets of the embeddings table (fixture has no
    # separate query table); the corpus-sized pass runs once per metric
    "sim_hard_negatives": "anchor/positive/banned subsets pruned; corpus pass single",
    "sim_retrieval_eval_exact": "retriever + truth passes + metric joins; subsets pruned",
    "sim_hybrid_rrf": "bm25's 2 tokenize passes (dl persisted) + the 3-row checkpointed anchors",
    # r11 review — the skew fixture derives THREE different interval sets
    # from one pruned events scan (intra-day sessions, per-user month
    # spans, day windows); the join sides themselves persist inside
    # interval_overlap_join, so the fan-out stops at these derivations
    "temporal_interval_overlap_skew": "3 independent interval derivations (sessions/spans/windows) of one pruned scan; join sides persisted in-operator",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bullet_spark_spark import get_spark

    spark = get_spark(app_name="audit-scans", shuffle_partitions=8)
    qs, osql = entry.queries(), entry.oracle_sql()
    flagged = []
    for name in osql:
        df = qs[name](spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        cnt = Counter(
            re.findall(r"file:[^\s]*/(\w+)\.parquet", buf.getvalue())
        )
        multi = {t: c for t, c in cnt.items() if c >= 3}
        if multi:
            status = _ACCEPTED.get(name, "UNREVIEWED")
            flagged.append((name, multi, status))
            print(f"{name}: {multi} — {status}")
    unreviewed = [f for f in flagged if f[2] == "UNREVIEWED"]
    print(f"\n{len(flagged)} flagged, {len(unreviewed)} unreviewed")


if __name__ == "__main__":
    main()
