"""Z-order layout (operators/layout.py): Morton key correctness and the
actual pruning property the layout exists for."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.layout import (
    interleave_bits,
    zorder_key,
    zorder_layout,
)


def _py_morton(xs: list[int], bits: int) -> int:
    out = 0
    for d, x in enumerate(xs):
        for i in range(bits):
            out |= ((x >> i) & 1) << (i * len(xs) + d)
    return out


@pytest.fixture(scope="module")
def grid(spark):
    # 64x64 uniform grid: x = i % 64, y = i // 64
    return spark.createDataFrame(
        [(i, i % 64, i // 64) for i in range(4096)], ["rid", "x", "y"]
    ).cache()


def test_interleave_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (255, 255), (106, 18), (199, 5)], ["a", "b"]
    )
    got = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton([r["a"], r["b"]], 8), (r["a"], r["b"])


def test_zorder_key_bounds_and_determinism(grid):
    out = zorder_key(grid, ["x", "y"], bits_per_dim=8)
    rows = out.select("rid", "zkey").collect()
    assert len(rows) == 4096
    assert all(0 <= r["zkey"] < (1 << 16) for r in rows)
    again = {r["rid"]: r["zkey"] for r in zorder_key(grid, ["x", "y"], bits_per_dim=8).collect()}
    assert {r["rid"]: r["zkey"] for r in rows} == again


def test_zorder_layout_prunes_both_dimensions(spark, grid):
    """The measurable contract: for a small 2-D box predicate, per-file
    min/max stats on the z-ordered layout touch FEWER files than a
    single-column-sorted layout of the same file count."""
    def file_spans(df_written_dir):
        df = spark.read.parquet(df_written_dir).withColumn("_f", F.input_file_name())
        return (
            df.groupBy("_f")
            .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                 F.min("y").alias("y0"), F.max("y").alias("y1"))
            .collect()
        )

    tmp = tempfile.mkdtemp()
    try:
        zdir, sdir = os.path.join(tmp, "z"), os.path.join(tmp, "s")
        zorder_layout(grid, ["x", "y"], n_files=16, bits_per_dim=8).write.parquet(zdir)
        grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(sdir)

        def touched(spans, x0, x1, y0, y1):
            return sum(
                1 for r in spans
                if r["x1"] >= x0 and r["x0"] <= x1 and r["y1"] >= y0 and r["y0"] <= y1
            )

        z_spans, s_spans = file_spans(zdir), file_spans(sdir)
        assert len(z_spans) >= 8 and len(s_spans) >= 8
        # box on BOTH dims: x-sorted layout prunes x but every surviving
        # file spans all of y; the z-layout bounds both dimensions
        z_touch = touched(z_spans, 0, 15, 0, 15)
        s_touch = touched(s_spans, 0, 15, 0, 15)
        assert z_touch < s_touch, (z_touch, s_touch)
        # and the y-only box: the x-sorted layout cannot prune AT ALL
        assert touched(z_spans, 0, 63, 0, 7) < touched(s_spans, 0, 63, 0, 7)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_zorder_constant_dimension_maps_to_zero(spark):
    df = spark.createDataFrame([(i, 7, i) for i in range(16)], ["rid", "c", "x"])
    rows = zorder_key(df, ["c", "x"], 4).collect()
    # constant dim contributes nothing: zkey = interleave(0, bucket(x))
    for r in rows:
        assert r["zkey"] % 2 == 0  # dim-0 bits (even positions... d=0 -> bit 0) all zero
