"""Trained quality classifier (quality_model): the learned counterpart
of text.quality_score. Planted-signal recovery tests — a classifier
trained on documents whose label is decided by marker vocabulary must
rank held-out documents by that vocabulary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bullet_spark_spark.operators import quality_model as qm


@pytest.fixture(scope="module")
def labeled(spark):
    """200 synthetic docs: positives carry 'signal' vocabulary, negatives
    'noise' vocabulary, both mixed with shared filler; deterministic."""
    rows = []
    for i in range(200):
        good = i % 2 == 0
        marker = ["clean", "well", "written", "prose"] if good else [
            "spam", "junk", "click", "bait"
        ]
        filler = [f"word{(i * 7 + j) % 23}" for j in range(10)]
        text = " ".join(marker * 2 + filler)
        rows.append((i, text, 1 if good else 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_classifier_recovers_planted_signal(labeled):
    train = labeled.filter(F.col("doc_id") % 4 != 0)
    test = labeled.filter(F.col("doc_id") % 4 == 0)
    model = qm.train_quality_classifier(train, num_features=1 << 12)
    scored = qm.score_quality(model, test)
    assert scored.columns == ["doc_id", "text", "label", "quality_prob"]
    auc = qm.classifier_auc(scored)
    assert auc > 0.95, auc
    # probabilities are probabilities
    mm = scored.agg(F.min("quality_prob"), F.max("quality_prob")).first()
    assert 0.0 <= mm[0] <= mm[1] <= 1.0


def test_scoring_is_deterministic(labeled):
    model = qm.train_quality_classifier(labeled, num_features=1 << 12)
    a = sorted((r.doc_id, round(r.quality_prob, 9))
               for r in qm.score_quality(model, labeled).collect())
    b = sorted((r.doc_id, round(r.quality_prob, 9))
               for r in qm.score_quality(model, labeled).collect())
    assert a == b


def test_auc_degenerate_label_is_defined_or_flagged(labeled):
    one_class = labeled.filter(F.col("label") == 1)
    model = qm.train_quality_classifier(labeled, num_features=1 << 12)
    scored = qm.score_quality(model, one_class)
    # MLlib returns 1.0 or nan-ish values for a single class; the call
    # must not raise — callers gate on sensible labels
    val = qm.classifier_auc(scored)
    assert val == val or val != val  # just: no exception


def test_calibration_table_shape_and_consistency(labeled):
    model = qm.train_quality_classifier(labeled, num_features=1 << 12)
    scored = qm.score_quality(model, labeled)
    cal = qm.calibration_table(scored, n_buckets=10).collect()
    assert 1 <= len(cal) <= 10
    assert sum(r.n for r in cal) == labeled.count()
    for r in cal:
        assert 0 <= r.bucket <= 9
        assert 0.0 <= r.avg_prob <= 1.0 and 0.0 <= r.pos_rate <= 1.0
        # bucket membership: avg_prob inside the bucket's bounds
        assert r.bucket / 10 <= r.avg_prob <= (r.bucket + 1) / 10 + 1e-9
    # a well-trained model on separable data is sharply calibrated at
    # the extremes
    lo, hi = cal[0], cal[-1]
    assert lo.pos_rate < 0.5 < hi.pos_rate


def test_quality_filter_keeps_high_prob_only(labeled):
    model = qm.train_quality_classifier(labeled, num_features=1 << 12)
    kept = qm.quality_filter(model, labeled, threshold=0.8)
    rows = kept.collect()
    assert 0 < len(rows) < labeled.count()
    assert all(r.quality_prob >= 0.8 for r in rows)
    # planted positives dominate the kept set
    assert sum(r.label for r in rows) / len(rows) > 0.9


def test_streaming_inference_matches_batch(spark, labeled, tmp_path):
    """The trained model scores a STREAM (online corpus filtering): a
    batch-trained PipelineModel transforms a file-drip streaming frame
    row-for-row identically to the batch pass — MLlib inference is a
    stateless map, so it rides Structured Streaming unchanged."""
    from bullet_spark_spark.sources.streaming import file_drip
    from bullet_spark_spark.streaming.sinks import MemorySink

    model = qm.train_quality_classifier(labeled, num_features=1 << 12)
    stream = file_drip(spark, labeled, str(tmp_path / "drip"), chunks=3)
    scored = qm.score_quality(model, stream, keep_cols=["doc_id", "label"])
    sink = MemorySink()
    q = (
        scored.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck_qm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    idx = {c: i for i, c in enumerate(sink.columns)}
    got = sorted(
        (r[idx["doc_id"]], round(r[idx["quality_prob"]], 9)) for r in sink.rows
    )
    want = sorted(
        (r.doc_id, round(r.quality_prob, 9))
        for r in qm.score_quality(model, labeled).collect()
    )
    assert got == want
