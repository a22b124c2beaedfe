"""Round-6 catalog: TF-IDF-weighted cosine entity-resolution join,
weakly-connected components at catalog level (large-star/small-star),
a REAL PNG encode→decode round-trip, market-concentration (HHI),
per-market RFM segmentation, session→calendar interval alignment,
n-gram novelty scoring, deterministic exact-k reservoir sampling, and
a 2-D skyline (Pareto frontier).

Same contract as ``plans.catalog``: every query has a DuckDB oracle
registered in ``catalog.ORACLES`` and the pair sits inside the driver's
50-key window for round 6.  Determinism follows the catalog
conventions: money in integer cents, integer cross-multiplied
thresholds (DECIMAL(38,0) / HUGEINT on the oracle side), one trailing
IEEE division per float output, integer aggregates CAST to BIGINT in
oracles, date/bucket outputs as ISO strings, and every window over a
provably total per-partition order.

Reference parity: the reference's dictionary fuzzy-dot fallback
(populate_db_ru_v1.py:186-192) is the 1-entity-at-a-time ancestor of
``j16``'s corpus-scale set-similarity join; everything else extends the
engine past the reference surface (LLM-pipeline + analytics families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..operators.dedup import (
    connected_components_large_star,
    materialize,
    normalize_for_shingling,
    shingles,
)
from ..operators.setsim import tfidf_cosine_pairs
from ..sources.tables import load_table

def _cents(col: str):
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


# ---------------------------------------------------------------------------
# J16: TF-IDF-weighted cosine set-similarity join (entity resolution)
# ---------------------------------------------------------------------------


def q_j16_tfidf_cosine_join(spark: SparkSession, sf: str) -> DataFrame:
    """J16: idf-weighted cosine self-join over part NAMES — the WHIRL /
    fuzzy-match entity-resolution shape: two product names match when
    they share RARE words, with ubiquitous words contributing ~nothing.
    Integer surrogate idf (``w = N div df``) + suffix-norm prefix filter
    (lossless, Bayardo WWW'07) + DECIMAL(38,0) cross-multiplied
    threshold — see ``operators.setsim.tfidf_cosine_pairs``.  The oracle
    is capless all-pairs SQL over the same weights, so the prefix
    filter's zero-false-negative claim is value-checked every run."""
    p = load_table(spark, sf, "part").select("p_partkey", "p_name")
    return tfidf_cosine_pairs(
        p, "p_partkey", "p_name", threshold_num=3, threshold_den=5
    )


O_J16 = """
WITH toks AS (
  SELECT DISTINCT p_partkey AS doc, tok
  FROM (
    SELECT p_partkey,
           unnest(string_split(regexp_replace(trim(lower(p_name)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM part
  )
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS nd FROM part
), wt AS (
  SELECT tok, CAST((SELECT nd FROM n) // CAST(count(*) AS BIGINT) AS BIGINT) AS w
  FROM toks GROUP BY tok
), tw AS (
  SELECT doc, t.tok, CAST(w * w AS BIGINT) AS w2
  FROM toks t JOIN wt USING (tok)
), norms AS (
  SELECT doc, CAST(sum(w2) AS BIGINT) AS n2 FROM tw GROUP BY 1
), dots AS (
  SELECT a.doc AS id_a, b.doc AS id_b, CAST(sum(a.w2) AS BIGINT) AS dot
  FROM tw a JOIN tw b ON a.tok = b.tok AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT id_a, id_b, dot,
       na.n2 AS na2, nb.n2 AS nb2,
       CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cosine
FROM dots
JOIN norms na ON na.doc = id_a
JOIN norms nb ON nb.doc = id_b
WHERE CAST(dot AS HUGEINT) * dot * 25 >= 9 * CAST(na.n2 AS HUGEINT) * nb.n2
"""


# ---------------------------------------------------------------------------
# G5: weakly connected components (large-star/small-star at catalog level)
# ---------------------------------------------------------------------------


def q_g5_wcc(spark: SparkSession, sf: str) -> DataFrame:
    """G5: weakly-connected components over the urgent-order part
    co-purchase graph, via the alternating Large-Star/Small-Star
    algorithm (Kiveris SoCC'14) — the O(log² n)-round scale mode that
    ``connected_components``'s diameter-bounded min-propagation is not
    (the g1b lesson: the scale mode needs its own driver row).  Every
    node gets its component's minimum part id.  The oracle replays the
    closure with a recursive CTE, so the componentization itself is
    value-checked."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    urgent = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"]).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("id_a"), F.col("b.l_partkey").alias("id_b"))
        .distinct()
    )
    comp = connected_components_large_star(edges)
    return comp.select(
        F.col("node").alias("part_id"), F.col("component").alias("component")
    )


O_G5_WCC = """
WITH RECURSIVE li AS (
  SELECT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
), e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
), edges AS (
  SELECT u, v FROM e0
  UNION
  SELECT v AS u, u AS v FROM e0
), walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS part_id, min(label) AS component
FROM walk GROUP BY node
"""


# ---------------------------------------------------------------------------
# M-PNG: real PNG encode -> decode round-trip, SQL-replayed pixel stats
# ---------------------------------------------------------------------------


def q_m_png_decode(spark: SparkSession, sf: str) -> DataFrame:
    """M-PNG: REAL PNG decode.  ``with_png_payload`` builds a genuine
    PNG per document (zlib IDAT, CRC'd chunks, all five scanline filter
    types in rotation) whose PIXELS replay a SQL-expressible rule over
    the document text; ``decode_and_featurize`` then really decodes it
    (``operators.multimodal.decode_png``: chunk walk + CRC check +
    inflate + un-filter).  The oracle recomputes the channel means from
    the pixel RULE — a hash match therefore proves the whole
    encode→decode round-trip bit-exactly, since any filter/inflate/CRC
    defect would perturb the decoded sums."""
    d = load_table(spark, sf, "documents")
    feats = MM.decode_and_featurize(MM.with_png_payload(d))
    fx = lambda i: F.element_at("features", i)  # noqa: E731
    return feats.select(
        "doc_id",
        fx(1).cast("int").alias("width"),
        fx(2).cast("int").alias("height"),
        fx(4).alias("mean_r"),
        fx(5).alias("mean_g"),
        fx(6).alias("mean_b"),
        fx(7).alias("mean_all"),
    )


O_M_PNG = """
WITH m AS (
  SELECT doc_id,
         CAST(doc_id % 5 + 3 AS BIGINT) AS w,
         CAST(doc_id % 4 + 2 AS BIGINT) AS h,
         length(text) AS L,
         list_transform(range(1, length(text) + 1), i -> ascii(substr(text, i, 1))) AS codes
  FROM documents
), s AS (
  SELECT doc_id, w, h,
         list_sum(list_transform(range(0, w * h), j ->
            CASE WHEN L = 0 THEN 0 ELSE codes[((3 * j) % L) + 1] END)) AS sum_r,
         list_sum(list_transform(range(0, w * h), j ->
            CASE WHEN L = 0 THEN 0 ELSE codes[((3 * j + 1) % L) + 1] END)) AS sum_g,
         list_sum(list_transform(range(0, w * h), j ->
            CASE WHEN L = 0 THEN 0 ELSE codes[((3 * j + 2) % L) + 1] END)) AS sum_b
  FROM m
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(sum_r AS DOUBLE) / (w * h * 255) AS mean_r,
       CAST(sum_g AS DOUBLE) / (w * h * 255) AS mean_g,
       CAST(sum_b AS DOUBLE) / (w * h * 255) AS mean_b,
       CAST(sum_r + sum_g + sum_b AS DOUBLE) / (w * h * 3 * 255) AS mean_all
FROM s
"""


# ---------------------------------------------------------------------------
# A22: Herfindahl–Hirschman market-concentration index per nation
# ---------------------------------------------------------------------------


def q_a22_hhi_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """A22: HHI revenue concentration per customer nation — the
    market-concentration / inequality family companion to a18 (Gini),
    chosen over entropy/Theil because HHI = Σ shareᵢ² is exactly
    computable from integer cents: per-customer revenue in cents
    (BIGINT), squares summed in DECIMAL(38,0) (cents² overflows BIGINT
    at scale), and the headline value is the EXACT integer
    ``hhi_e12 = (sumsq·10¹²) div total²`` — integral division of
    38-digit decimals is exact in both engines, where a direct
    sumsq→double cast is NOT (sf1 lesson: DuckDB's int128→double
    double-rounds, 1-ulp mismatch on one nation); the display double
    divides that exact integer by 1e12.  Plan: one shuffle to customer
    grain, one to nation grain, nation dim broadcast."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    cust = (
        o.groupBy("o_custkey")
        .agg(F.sum(_cents("o_totalprice")).cast("long").alias("cents"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    dec = F.col("cents").cast("decimal(38,0)")
    agg = cust.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum(dec * dec).cast("decimal(38,0)").alias("_sumsq"),
    )
    return agg.withColumn(
        "hhi_e12",
        F.expr(
            "CAST((_sumsq * CAST(1000000000000 AS DECIMAL(38,0))) div "
            "(CAST(total_cents AS DECIMAL(38,0)) * CAST(total_cents AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ),
    ).select(
        "n_name",
        "n_customers",
        "total_cents",
        "hhi_e12",
        (F.col("hhi_e12").cast("double") / F.lit(1.0e12)).alias("hhi"),
    )


O_A22_HHI = """
WITH cust AS (
  SELECT o_custkey, CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
), j AS (
  SELECT n.n_name, cust.cents
  FROM cust
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
)
SELECT n_name, n_customers, total_cents, hhi_e12,
       CAST(hhi_e12 AS DOUBLE) / 1e12 AS hhi
FROM (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(CAST(cents AS HUGEINT) * cents) * CAST(1000000000000 AS HUGEINT)
              // (CAST(sum(cents) AS HUGEINT) * sum(cents)) AS BIGINT) AS hhi_e12
  FROM j GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# W28: per-market RFM segmentation (windowed quintile scoring)
# ---------------------------------------------------------------------------


def q_w28_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    """W28: RFM (recency/frequency/monetary) customer segmentation with
    quintile scores PER NATION — the product-analytics staple.  Metrics
    are exact integers (days since last order vs the global max order
    date, order count, cents); scores are ``ntile(5)`` over total
    orders — every ntile ranks by (metric, c_custkey) so the tiling is
    deterministic, and every window is PARTITIONED by nation (no global
    sort funnel; the per-market framing is also the analytically right
    one — spend scales differ across markets).  Global max date arrives
    by broadcast 1-row cross join."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    maxd = o.agg(F.max("o_orderdate").alias("_maxd"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).cast("long").alias("f_orders"),
            F.sum(_cents("o_totalprice")).cast("long").alias("m_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn("r_days", F.datediff("_maxd", "_last").cast("int"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    wr = W.partitionBy("n_name").orderBy(F.col("r_days").desc(), "c_custkey")
    wf = W.partitionBy("n_name").orderBy(F.col("f_orders").asc(), "c_custkey")
    wm = W.partitionBy("n_name").orderBy(F.col("m_cents").asc(), "c_custkey")
    scored = cust.select(
        "c_custkey",
        "n_name",
        "r_days",
        "f_orders",
        "m_cents",
        F.ntile(5).over(wr).cast("int").alias("r_score"),
        F.ntile(5).over(wf).cast("int").alias("f_score"),
        F.ntile(5).over(wm).cast("int").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


O_W28_RFM = """
WITH maxd AS (
  SELECT max(o_orderdate) AS md FROM orders
), cust AS (
  SELECT o_custkey,
         CAST(datediff('day', max(o_orderdate), (SELECT md FROM maxd)) AS INTEGER) AS r_days,
         CAST(count(*) AS BIGINT) AS f_orders,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS m_cents
  FROM orders GROUP BY 1
), j AS (
  SELECT c.c_custkey, n.n_name, cust.r_days, cust.f_orders, cust.m_cents
  FROM cust
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
), s AS (
  SELECT c_custkey, n_name, r_days, f_orders, m_cents,
         CAST(ntile(5) OVER (PARTITION BY n_name ORDER BY r_days DESC, c_custkey) AS INTEGER) AS r_score,
         CAST(ntile(5) OVER (PARTITION BY n_name ORDER BY f_orders ASC, c_custkey) AS INTEGER) AS f_score,
         CAST(ntile(5) OVER (PARTITION BY n_name ORDER BY m_cents ASC, c_custkey) AS INTEGER) AS m_score
  FROM j
)
SELECT c_custkey, n_name, r_days, f_orders, m_cents, r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
FROM s
"""


# ---------------------------------------------------------------------------
# J18: session -> calendar-hour interval alignment
# ---------------------------------------------------------------------------


def q_j18_interval_align(spark: SparkSession, sf: str) -> DataFrame:
    """J18: align per-user SESSION intervals (w13's 30-minute-gap rule)
    onto the CALENDAR HOUR grid, emitting the exact overlap of every
    (session, hour) cell in integer microseconds — the temporal
    normalization step behind per-hour billing/occupancy rollups.  No
    inequality join anywhere: each session explodes to the hours it
    covers (``sequence`` fan-out bounded by session length), overlap is
    ``least(end, hour+1h) - greatest(start, hour)`` on NTZ timestamps.
    One shuffle on user_id serves both sessionization windows and the
    session aggregate; the hour explode is shuffle-free."""
    ev = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_break = F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")
    new_s = F.when(gap_break | F.lag("ts").over(w).isNull(), 1).otherwise(0)
    sess = (
        ev.withColumn("_new", new_s)
        .withColumn(
            "session_idx",
            F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("int"),
        )
        .groupBy("user_id", "session_idx")
        .agg(F.min("ts").alias("_s"), F.max("ts").alias("_e"))
    )
    cells = sess.select(
        "user_id",
        "session_idx",
        "_s",
        "_e",
        F.explode(
            F.expr("sequence(date_trunc('hour', _s), date_trunc('hour', _e), interval 1 hour)")
        ).alias("_h"),
    )
    return cells.select(
        "user_id",
        "session_idx",
        F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.expr(
            "timestampdiff(MICROSECOND, greatest(_s, _h),"
            " least(_e, _h + interval 1 hour))"
        ).cast("long").alias("overlap_us"),
    )


O_J18_ALIGN = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx
  FROM g
), sess AS (
  SELECT user_id, session_idx, min(ts) AS s, max(ts) AS e
  FROM s GROUP BY 1, 2
), cells AS (
  SELECT user_id, session_idx, s, e,
         unnest(generate_series(date_trunc('hour', s), date_trunc('hour', e),
                                INTERVAL 1 HOUR)) AS h
  FROM sess
)
SELECT user_id, session_idx,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(date_diff('microseconds', greatest(s, h), least(e, h + INTERVAL 1 HOUR)) AS BIGINT)
         AS overlap_us
FROM cells
"""


# ---------------------------------------------------------------------------
# T-NOV: per-document n-gram novelty (first-seen shingle fraction)
# ---------------------------------------------------------------------------


def q_t_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """T-NOV: per-document novelty — the fraction of a document's
    distinct 3-shingles whose FIRST appearance (minimum doc_id) is this
    document.  The corpus-curation signal behind "how much of this crawl
    is new text" dashboards, and the batch twin of incremental-dedup's
    delta framing (d_incremental_dedup).  Two shuffles: one groupBy to
    find each shingle's first owner, one to re-aggregate per document;
    shingles are 64-bit hashes (catalog identity convention)."""
    d = load_table(spark, sf, "documents")
    sh = (
        d.withColumn("_words", F.split(normalize_for_shingling(F.col("text")), " "))
        .select("doc_id", F.explode(shingles(F.col("_words"), 3)).alias("_sh"))
        .select("doc_id", F.xxhash64("_sh").alias("elem"))
        .distinct()
    )
    firsts = sh.groupBy("elem").agg(F.min("doc_id").alias("_first"))
    per_doc = (
        sh.join(firsts, "elem")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("_first") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        (F.col("n_novel").cast("double") / F.col("n_shingles").cast("double")).alias(
            "novelty"
        ),
    )


O_T_NOVELTY = """
WITH toks AS (
  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS sh
  FROM toks, UNNEST(range(1, greatest(len(w) - 2, 1) + 1)) AS t(i)
), firsts AS (
  SELECT sh, min(doc_id) AS fd FROM sh GROUP BY 1
), per_doc AS (
  SELECT s.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN f.fd = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM sh s JOIN firsts f USING (sh)
  GROUP BY 1
)
SELECT doc_id, n_shingles, n_novel,
       CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS novelty
FROM per_doc
"""


# ---------------------------------------------------------------------------
# P-RES: deterministic exact-k reservoir sample (hash top-k)
# ---------------------------------------------------------------------------


def q_p_reservoir_sample(spark: SparkSession, sf: str) -> DataFrame:
    """P-RES: exact-k uniform sample WITHOUT a global shuffle sort —
    rank every event by a salted content hash and keep the k smallest
    (hash-ordering makes "uniform random" and "deterministic replay"
    the same thing, the sampling-family convention from p_hash_split).
    Plan: TakeOrderedAndProject — per-partition top-k then a driver-side
    k-way merge of k·n_partitions rows, never a full sort/shuffle of the
    fact table; at any scale the moved data is O(k) per partition.  The
    md5 hash family keeps the oracle replay engine-portable."""
    ev = load_table(spark, sf, "events")
    rk = F.md5(F.concat(F.lit("rs6:"), F.col("event_id").cast("string")))
    return (
        ev.select("event_id", "user_id", "event_type", rk.alias("rk"))
        .orderBy("rk", "event_id")
        .limit(1000)
    )


O_P_RESERVOIR = """
SELECT event_id, user_id, event_type,
       md5('rs6:' || CAST(event_id AS VARCHAR)) AS rk
FROM events
ORDER BY rk, event_id
LIMIT 1000
"""


# ---------------------------------------------------------------------------
# O8: 2-D skyline (Pareto frontier: minimize price, maximize size)
# ---------------------------------------------------------------------------


def q_o8_skyline_2d(spark: SparkSession, sf: str) -> DataFrame:
    """O8: the skyline operator — parts on the (minimize retail price,
    maximize size) Pareto frontier: no other part is at-most-as-expensive
    AND at-least-as-large with at least one strict.  Classic distributed
    decomposition (skyline(S₁∪S₂) ⊆ skyline(S₁)∪skyline(S₂), dominance
    transitivity): stage 1 computes BUCKET-LOCAL skylines with
    PARTITIONED windows ($1000 price buckets; a range frame gives the
    strictly-cheaper running max, a same-price partition max settles
    ties), stage 2 merges the few survivors with one broadcast
    inequality anti-join — no global-order window, no quadratic join on
    the full table.  Equal (price, size) rows don't dominate each other
    and are all kept."""
    p = load_table(spark, sf, "part")
    b = p.select(
        "p_partkey", _cents("p_retailprice").alias("price_cents"), "p_size"
    ).withColumn("_bucket", F.expr("price_cents div 100000"))
    w_cheaper = (
        W.partitionBy("_bucket")
        .orderBy("price_cents")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_same = W.partitionBy("price_cents")
    local = (
        b.withColumn("_prev_max", F.max("p_size").over(w_cheaper))
        .withColumn("_same_max", F.max("p_size").over(w_same))
        .filter(
            (F.col("_prev_max").isNull() | (F.col("_prev_max") < F.col("p_size")))
            & (F.col("p_size") == F.col("_same_max"))
        )
        .select("p_partkey", "price_cents", "p_size")
    )
    local = materialize(local)
    t = local.select(
        F.col("price_cents").alias("_tp"), F.col("p_size").alias("_ts")
    )
    dominated = ((F.col("_tp") < F.col("price_cents")) & (F.col("_ts") >= F.col("p_size"))) | (
        (F.col("_tp") == F.col("price_cents")) & (F.col("_ts") > F.col("p_size"))
    )
    return local.join(F.broadcast(t), dominated, "left_anti")


O_O8_SKYLINE = """
WITH b AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents,
         p_size
  FROM part
)
SELECT p_partkey, price_cents, p_size
FROM b s
WHERE NOT EXISTS (
  SELECT 1 FROM b t
  WHERE (t.price_cents < s.price_cents AND t.p_size >= s.p_size)
     OR (t.price_cents = s.price_cents AND t.p_size > s.p_size)
)
"""


EXT4_QUERIES = {
    "j16_tfidf_cosine_join": q_j16_tfidf_cosine_join,
    "g5_wcc": q_g5_wcc,
    "m_png_decode": q_m_png_decode,
    "a22_hhi_concentration": q_a22_hhi_concentration,
    "w28_rfm_segmentation": q_w28_rfm_segmentation,
    "j18_interval_align": q_j18_interval_align,
    "t_ngram_novelty": q_t_ngram_novelty,
    "p_reservoir_sample": q_p_reservoir_sample,
    "o8_skyline_2d": q_o8_skyline_2d,
}

EXT4_ORACLES = {
    "j16_tfidf_cosine_join": O_J16,
    "g5_wcc": O_G5_WCC,
    "m_png_decode": O_M_PNG,
    "a22_hhi_concentration": O_A22_HHI,
    "w28_rfm_segmentation": O_W28_RFM,
    "j18_interval_align": O_J18_ALIGN,
    "t_ngram_novelty": O_T_NOVELTY,
    "p_reservoir_sample": O_P_RESERVOIR,
    "o8_skyline_2d": O_O8_SKYLINE,
}
