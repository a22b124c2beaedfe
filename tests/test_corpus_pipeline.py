"""End-to-end training-set build (plans/corpus_pipeline.py): stage
reconciliation invariants at sf0.001 — each stage is oracle-verified by
its own catalog query; here the COMPOSITION is pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.plans.corpus_pipeline import build_training_set
from factory_inspectors_db_etl_spark.sources.tables import load_table


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
