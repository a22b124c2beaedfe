"""Small-file compaction (operators/compaction.py): content-preserving,
file-count math, clustering restore, and in-place-write refusal."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.compaction import compact_parquet
from factory_inspectors_db_etl_spark.sources.tables import load_table


def _parquet_files(d):
    return sorted(glob.glob(f"{d}/*.parquet"))


@pytest.fixture()
def fragmented(spark, sf_dir, tmp_path):
    """events written as 64 tiny files — the streaming-sink shape."""
    src = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    ev.repartition(64).write.parquet(src)
    return src, ev


def test_compaction_preserves_content_and_reduces_files(spark, fragmented, tmp_path):
    src, ev = fragmented
    n = ev.count()
    assert len(_parquet_files(src)) == 64
    dst = str(tmp_path / "compact")
    files = compact_parquet(spark, src, dst, target_rows_per_file=(n + 3) // 4)
    assert files == 4
    assert len(_parquet_files(dst)) == 4
    got = spark.read.parquet(dst)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ev.collect()))


def test_compaction_with_range_clustering(spark, fragmented, tmp_path):
    """``by`` columns restore clustering: every output file's user_id
    range is disjoint (modulo range-partition boundaries), so min/max
    pruning works again after compaction."""
    src, ev = fragmented
    n = ev.count()
    dst = str(tmp_path / "clustered")
    files = compact_parquet(
        spark, src, dst, target_rows_per_file=(n + 3) // 4, by=["user_id"]
    )
    assert files == 4
    spans = []
    for f in _parquet_files(dst):
        r = spark.read.parquet(f).agg(F.min("user_id"), F.max("user_id")).collect()[0]
        if r[0] is not None:
            spans.append((r[0], r[1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo  # disjoint user_id ranges across files


def test_compaction_refuses_in_place_overwrite(spark, fragmented, tmp_path):
    src, _ = fragmented
    with pytest.raises(Exception):
        compact_parquet(spark, src, src, target_rows_per_file=1000)
    # and the source is untouched
    assert len(_parquet_files(src)) == 64
