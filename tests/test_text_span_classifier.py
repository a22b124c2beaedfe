"""Span-level dedup building blocks and the hashed linear classifier
(operators/text_analysis.py round-4 additions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from factory_inspectors_db_etl_spark.operators.text_analysis import (
    hashed_linear_score,
    word_chunks,
)


def test_word_chunks_sizes_and_ragged_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(45))), (2, "a b"), (3, "")],
        ["id", "text"],
    )
    got = {r["id"]: r["c"] for r in df.select("id", word_chunks(F.col("text"), 20).alias("c")).collect()}
    assert len(got[1]) == 3
    assert got[1][0].split(" ") == [f"w{i}" for i in range(20)]
    assert got[1][2].split(" ") == [f"w{i}" for i in range(40, 45)]  # ragged tail
    assert got[2] == ["a b"]
    assert got[3] == [""]  # empty text -> one empty span, never an empty array


def test_word_chunks_reassembly_roundtrip(spark):
    text = " ".join(f"t{i}" for i in range(57))
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    out = df.select(F.array_join(word_chunks(F.col("text"), 20), " ").alias("t")).collect()
    assert out[0]["t"] == text  # chunking loses nothing


def test_span_dedup_drops_repeated_span_keeps_first(spark):
    boiler = " ".join(["copyright footer all rights reserved"] * 4)  # 20 words
    df = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"a{i}" for i in range(20))),
            (2, boiler + " " + " ".join(f"b{i}" for i in range(20))),
        ],
        ["doc_id", "text"],
    )
    chunks = df.select(
        "doc_id", F.posexplode(word_chunks(F.col("text"), 20)).alias("chunk_idx", "chunk")
    )
    from pyspark.sql import Window
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "chunk_idx")
    flagged = chunks.withColumn("_keep", F.row_number().over(w) == 1)
    kept = {(r["doc_id"], r["chunk_idx"]): r["_keep"] for r in flagged.collect()}
    assert kept[(1, 0)] is True    # first occurrence of the boilerplate
    assert kept[(2, 0)] is False   # later doc's copy dropped
    assert kept[(1, 1)] and kept[(2, 1)]  # unique spans survive


def test_hashed_linear_score_properties(spark):
    weights = [0.5, -0.25, 1.0, -1.0] * 16
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, ""), (3, "alpha alpha")],
        ["id", "text"],
    )
    s = {
        r["id"]: r["s"]
        for r in df.select("id", hashed_linear_score(F.col("text"), weights).alias("s")).collect()
    }
    assert s[2] == 0.0  # empty text -> 0, not NULL/NaN
    # doubling every weight doubles the score (linearity)
    s2 = {
        r["id"]: r["s"]
        for r in df.select(
            "id", hashed_linear_score(F.col("text"), [w * 2 for w in weights]).alias("s")
        ).collect()
    }
    assert abs(s2[1] - 2 * s[1]) < 1e-12
    # a one-token doc's score IS its bucket weight; duplicated token -> same mean
    one = df.sparkSession.createDataFrame([(1, "alpha")], ["id", "text"])
    sa = one.select(hashed_linear_score(F.col("text"), weights).alias("s")).collect()[0]["s"]
    assert abs(s[3] - sa) < 1e-12
    assert sa in weights  # the score of a single token is a bucket weight


def test_hashed_linear_score_is_case_normalized_and_deterministic(spark):
    weights = [float(i) / 10 for i in range(64)]
    df = spark.createDataFrame([(1, "Hello World"), (2, "hello world")], ["id", "text"])
    got = [
        r["s"]
        for r in df.select(hashed_linear_score(F.col("text"), weights).alias("s")).collect()
    ]
    assert got[0] == got[1]
