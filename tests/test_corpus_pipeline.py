"""End-to-end training-set build (plans/corpus_pipeline.py): stage
reconciliation invariants at sf0.001 — each stage is oracle-verified by
its own catalog query; here the COMPOSITION is pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.plans.corpus_pipeline import build_training_set
from factory_inspectors_db_etl_spark.sources.tables import load_table


def test_null_text_docs_not_silently_dropped(spark, tmp_path):
    # ADVICE r7: md5(NULL) is NULL and NULL never equi-joins, so the
    # exact-dup rep_map used to silently drop NULL-text docs from the
    # component mapping (a PERMISSIVE JSONL read can produce NULL text).
    # Pin totality: every input doc_id — NULL text included — appears in
    # `components` exactly once, and NULL-text docs map to one shared
    # representative (identical NULL fingerprints collapse together).
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away", "en"),
        (2, "the quick brown fox jumps over the lazy dog and runs away", "en"),
        (3, None, "en"),
        (4, None, "en"),
        (5, "a completely different document about spark and petabytes of data", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    docs = docs.withColumn("source", F.lit("test")).withColumn(
        "n_chars", F.coalesce(F.length("text"), F.lit(0)).cast("long")
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    comp = build_training_set(spark, str(tmp_path))["components"]
    got = {r.doc_id: r.component_id for r in comp.collect()}
    assert sorted(got) == [1, 2, 3, 4, 5], "component mapping must be total"
    # exact dups share a component; the two NULL-text docs collapse together
    assert got[1] == got[2]
    assert got[3] == got[4]


def test_training_set_build_invariants(spark, sf_dir):
    out = build_training_set(spark, sf_dir)
    kept = out["kept"]
    splits = out["splits"]
    packed = out["packed_train"]

    n_docs = load_table(spark, sf_dir, "documents").count()
    n_kept = kept.count()
    assert 0 < n_kept <= n_docs

    # one doc per near-dup cluster, all above the quality gate
    assert kept.select("component_id").distinct().count() == n_kept
    assert kept.filter(F.col("quality") < 0.4).count() == 0

    # splits partition kept exactly; train dominates
    by_split = dict(splits.groupBy("split").count().collect())
    assert sum(by_split.values()) == n_kept
    assert by_split.get("train", 0) >= 0.9 * n_kept

    # packing covers every train doc exactly once; bins respect the
    # budget except single oversized docs
    n_train = by_split.get("train", 0)
    assert packed.count() == n_train
    over = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("n_chars").alias("sz"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("sz") > 2000) & (F.col("n") > 1))
    )
    # a bin may exceed budget only via its LAST doc (contiguous fill);
    # strictly-over bins with >1 doc must still have started under budget
    for r in over.collect():
        assert r.sz - 2000 < 2000, r

    # determinism: a second build is row-identical
    out2 = build_training_set(spark, sf_dir)
    assert sorted(map(tuple, out["splits"].select("doc_id", "split").collect())) == sorted(
        map(tuple, out2["splits"].select("doc_id", "split").collect())
    )
