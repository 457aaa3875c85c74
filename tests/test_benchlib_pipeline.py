"""benchlib training-pipeline benchmark pieces: the synthetic near-dup
corpus is deterministic and actually contains the structure the measured
job is supposed to exercise."""

from pyspark.sql import functions as F

from heritrix_spark.benchlib import synth_documents, training_pipeline


def test_synth_documents_deterministic(spark):
    a = synth_documents(spark, 500).orderBy("doc_id").collect()
    b = synth_documents(spark, 500).orderBy("doc_id").collect()
    assert a == b
    # near-dup group structure: variants differ from the base but share
    # most words
    base = a[0]["text"].split()
    var = a[1]["text"].split()
    same = sum(1 for x, y in zip(base, var) if x == y)
    assert 0 < len(base) - same <= 6  # ~1 word in 13 mutated
    assert len(base) == len(var) == 40


def test_training_pipeline_shape(spark):
    docs = synth_documents(spark, 1000)
    out = training_pipeline(docs)
    rows = out.collect()
    n = len(rows)
    # dedup must bite (groups of 5 near-dups) but not nuke the corpus
    assert 200 <= n < 1000
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "val", "test"}
    # survivors are unique doc ids
    assert len({r["doc_id"] for r in rows}) == n
    # deterministic end to end
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, training_pipeline(docs).collect())
    )
