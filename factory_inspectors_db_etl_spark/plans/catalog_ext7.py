"""Round-9 catalog: six analytics/curation shapes new this round —
CUSUM change-point detection, linear-interpolation as-of join, Shannon
entropy profiling, bottom-k (KMV) distinct sketches, Flesch readability
scoring, and common-neighbor/Adamic-Adar link prediction.

Same contract as ``plans.catalog``: every query here has a DuckDB
oracle and sits inside the driver's 50-key window for round 9.
Determinism discipline follows the catalog conventions: exact integer
arithmetic end-to-end with one trailing IEEE division per float output
(the w12/a25 lesson); transcendental inputs (ln) are snapped to
fixed-point integers immediately (the t_zipf discipline) so every
downstream sum/product is exact; wide products that could outgrow
BIGINT at 100 TB run in DECIMAL(38,0) / HUGEINT (the g7 discipline).

Reference parity: the reference repo (populate_db_ru_v1.py) has no
drift/interpolation/entropy/sketch/readability/graph path — this module
extends the engine's analytics surface beyond the reference
(SURVEY.md §2 additions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.dedup import portable_hash60
from ..operators.graph_broadcast import resolve_graph_broadcast
from ..operators.materialize import materialize
from ..sources.tables import load_table
from .catalog_ext import _graph_small_side

_LN_SCALE = 100_000  # fixed-point scale for ln() snapping (t_zipf discipline)


# ---------------------------------------------------------------------------
# W35: CUSUM change-point detection per event_type (drift family)
# ---------------------------------------------------------------------------


def q_w35_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """W35: CUSUM CHANGE-POINT detector per event_type — the classic
    "when did this metric's level shift" question (Page '54 cumulative
    sums; the at-most-one-changepoint/AMOC form).  Per event_type the
    daily cent-exact value totals form a series x_1..x_n; the
    change-point is the day i maximizing |n*C_i - i*T| where C_i is the
    prefix sum and T the grand total — the integer-scaled CUSUM
    deviation (the float form C_i - i*T/n times n).  The two segment
    means around the split quantify the shift.

    Cross-engine exactness: cents are exact BIGINTs, so C_i, T, and the
    scaled deviation n*C_i - i*T are exact integers; the argmax runs on
    integers with an earliest-day tiebreak, and the three float outputs
    (relative deviation, left/right segment means) are single IEEE
    divisions of exact integers.  Degenerate guards: a single-day series
    puts the change-point at that day with a NULL right mean
    (NULLIF(n-i, 0) on both engines — the r8 ADVICE division rule), and
    a type whose SIGNED cents cancel to t=0 pins cusum_rel to NULL the
    same way (NULLIF(n*t, 0); DuckDB would otherwise emit NaN/Inf —
    r9 ADVICE item 2, pinned in tests/test_round10_numerics.py).

    Scale: one map-side-combinable shuffle to (type, day) daily totals
    — the windowed CUSUM pass runs over the AGGREGATED series (O(days)
    rows per type, date-bounded), never over raw events; the per-type
    window partitioning is explicit so no global sort exists.  The
    deviation product n*C_i is bounded by days*total — BIGINT-safe to
    ~1e15 daily-cent totals; past that the moment columns move to
    DECIMAL(38,0) like g7's."""
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.to_date("ts").alias("d"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.sum("cents").cast("long").alias("y")
    )
    wt = W.partitionBy("event_type")
    wcum = wt.orderBy("d")
    cum = (
        daily.withColumn("i", F.row_number().over(wcum).cast("long"))
        .withColumn("c", F.sum("y").over(wcum))
        .withColumn("n", F.count(F.lit(1)).over(wt).cast("long"))
        .withColumn("t", F.sum("y").over(wt))
    )
    dev = cum.withColumn(
        "dev", F.col("n") * F.col("c") - F.col("i") * F.col("t")
    ).withColumn("absdev", F.abs(F.col("dev")))
    pick = W.partitionBy("event_type").orderBy(F.col("absdev").desc(), F.col("d").asc())
    best = dev.withColumn("rn", F.row_number().over(pick)).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.date_format("d", "yyyy-MM-dd").alias("cp_day"),
        (
            F.col("absdev").cast("double")
            # signed cents can cancel to t=0: NULLIF pins both engines to
            # NULL (DuckDB would yield NaN/Inf) — the degenerate-divisor
            # rule right_mean below already follows (VERDICT r9 ADVICE)
            / F.nullif(F.col("n") * F.col("t"), F.lit(0)).cast("double")
        ).alias("cusum_rel"),
        (
            F.col("c").cast("double") / (F.col("i") * 100).cast("double")
        ).alias("left_mean"),
        (
            (F.col("t") - F.col("c")).cast("double")
            / F.nullif((F.col("n") - F.col("i")) * 100, F.lit(0)).cast("double")
        ).alias("right_mean"),
    )


O_W35_CHANGEPOINT = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
), daily AS (
  SELECT event_type, d, CAST(sum(cents) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
), cum AS (
  SELECT event_type, d, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS i,
         CAST(sum(y) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS c,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS t
  FROM daily
), dev AS (
  SELECT *, abs(n * c - i * t) AS absdev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(n * c - i * t) DESC, d ASC) AS rn
  FROM cum
)
SELECT event_type, n AS n_days, strftime(d, '%Y-%m-%d') AS cp_day,
       CAST(absdev AS DOUBLE) / CAST(nullif(n * t, 0) AS DOUBLE) AS cusum_rel,
       CAST(c AS DOUBLE) / CAST(i * 100 AS DOUBLE) AS left_mean,
       CAST(t - c AS DOUBLE) / CAST(nullif((n - i) * 100, 0) AS DOUBLE) AS right_mean
FROM dev WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# J24: linear-interpolation as-of join (time-series family)
# ---------------------------------------------------------------------------

def q_j24_interp_join(spark: SparkSession, sf: str) -> DataFrame:
    """J24: INTERPOLATION JOIN — the as-of join's continuous sibling.
    j6_asof_fill steps (each probe takes the latest earlier reference
    value); here each probe takes the LINEAR INTERPOLATION between its
    bracketing reference points — the standard alignment for sampled
    physical/financial series (kdb+ aj's interpolating cousin; Pandas
    merge_asof + interpolate in one relational pass).  Reference curve:
    daily revenue cents by ship date; probes: orders by order date.

    Cross-engine exactness: interp = (y0*(t1-t0) + (y1-y0)*(t-t0)) /
    (t1-t0) — numerator and denominator are exact BIGINTs (cents × day
    counts), ONE trailing IEEE division.  The past-the-end clamp is an
    appended sentinel segment carrying y1 = y0 ending the day after the
    LAST observed probe/reference day (derived from the data, NOT a
    far-future constant: a 9999-12-31 sentinel makes y0*(t1-t0) outgrow
    2^53 at large daily totals, where the double cast rounds and the
    "exact clamp" stops being exact — both engines derive the identical
    date so the formula degenerates to exactly y0 with no branch);
    probes BEFORE the first reference day take the left-join NULL path
    with ``oob`` = true.

    Scale: the reference curve aggregates to O(days) rows (date-bounded,
    kilobytes) — packed and segmented WITHOUT a global window (array
    transform over the sorted aggregate, the w34 fold discipline), then
    exploded to per-MONTH copies and broadcast, so the probe join is a
    broadcast hash EQUI-join on the month key with the range predicate
    as a residual filter (j8b's bucket discipline — no nested-loop scan
    of all segments per probe, measured 2.5s -> 1.2s steady-state at
    sf0.1); the probe side (the big table) never shuffles."""
    li = load_table(spark, sf, "lineitem").select(
        F.to_date("l_shipdate").alias("d"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("day")
    )
    # materialize the O(days) aggregate: THREE consumers (packed
    # segments, the sentinel bound, and nothing else) would otherwise
    # re-run the full lineitem scan per consumer — at corpus scale
    # that is a repeated full-table pass for a kilobyte result (the
    # t_collocation_lift reuse lesson)
    daily = materialize(
        li.groupBy("d").agg(F.sum("cents").cast("long").alias("y"))
    )
    # sentinel end: day after the last probe or reference day — small,
    # data-derived, identical on both engines (coalesce guards an empty
    # side; greatest() skips nulls in Spark but not DuckDB)
    bounds = orders.agg(F.max("day").alias("_mo")).crossJoin(
        daily.agg(F.max("d").alias("_mr"))
    ).select(
        F.date_add(
            F.greatest(
                F.coalesce(F.col("_mo"), F.col("_mr")),
                F.coalesce(F.col("_mr"), F.col("_mo")),
            ),
            1,
        ).alias("_end")
    )
    packed = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("arr")
    ).crossJoin(F.broadcast(bounds)).select(
        F.concat(
            F.col("arr"),
            F.array(
                F.struct(
                    F.col("_end").alias("d"),
                    F.element_at("arr", -1)["y"].alias("y"),
                )
            ),
        ).alias("arr2")
    )
    seg = packed.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(arr2) - 1), i -> struct("
                "arr2[i-1].d AS t0, arr2[i-1].y AS y0, "
                "arr2[i].d AS t1, arr2[i].y AS y1))"
            )
        ).alias("s")
    ).select("s.*")
    # month-bucket the segments: each [t0, t1) span copies to every
    # calendar month it touches, so the probe join is an equi-join on
    # the month index (the j8b trick); spans are inter-knot gaps plus
    # one probe-bounded sentinel, so the explosion is O(months covered)
    month_idx = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    seg_m = seg.select(
        "t0",
        "y0",
        "t1",
        "y1",
        F.explode(
            F.sequence(month_idx(F.col("t0")), month_idx(F.date_sub(F.col("t1"), 1)))
        ).alias("m"),
    )
    probes = orders.withColumn("m", month_idx(F.col("day")))
    seg_b = F.broadcast(seg_m)
    j = probes.join(
        seg_b,
        (probes["m"] == seg_m["m"])
        & (probes["day"] >= seg_m["t0"])
        & (probes["day"] < seg_m["t1"]),
        "left",
    )
    dt01 = F.datediff("t1", "t0").cast("long")
    dt = F.datediff("day", "t0").cast("long")
    num = F.col("y0") * dt01 + (F.col("y1") - F.col("y0")) * dt
    return j.select(
        "o_orderkey",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "y0",
        "y1",
        (num.cast("double") / dt01.cast("double")).alias("interp_cents"),
        F.col("t0").isNull().alias("oob"),
    )


O_J24_INTERP = """
WITH li AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
), daily AS (
  SELECT d, CAST(sum(cents) AS BIGINT) AS y FROM li GROUP BY d
), o AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day FROM orders
), snt AS (
  -- sentinel = day after the last probe/reference day, mirroring the
  -- Spark side's data-derived clamp (coalesce guards an empty side)
  SELECT greatest(
           coalesce((SELECT max(day) FROM o), (SELECT max(d) FROM daily)),
           coalesce((SELECT max(d) FROM daily), (SELECT max(day) FROM o))
         ) + 1 AS e
), seg0 AS (
  SELECT d AS t0, y AS y0,
         lead(d) OVER (ORDER BY d) AS t1,
         lead(y) OVER (ORDER BY d) AS y1
  FROM daily
), seg AS (
  SELECT t0, y0, coalesce(t1, (SELECT e FROM snt)) AS t1,
         coalesce(y1, y0) AS y1
  FROM seg0
)
SELECT o.o_orderkey, strftime(o.day, '%Y-%m-%d') AS day, s.y0, s.y1,
       CAST(s.y0 * datediff('day', s.t0, s.t1)
            + (s.y1 - s.y0) * datediff('day', s.t0, o.day) AS DOUBLE)
         / CAST(datediff('day', s.t0, s.t1) AS DOUBLE) AS interp_cents,
       s.t0 IS NULL AS oob
FROM o LEFT JOIN seg s ON o.day >= s.t0 AND o.day < s.t1
"""


# ---------------------------------------------------------------------------
# A26: Shannon entropy / diversity profile per group (data-QA family)
# ---------------------------------------------------------------------------


def q_a26_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """A26: SHANNON ENTROPY profile — per event_type, the entropy of its
    hour-of-day histogram, plus normalized entropy (H / ln(bins)) and
    the Gini-Simpson diversity index: the standard "is this segment's
    activity concentrated or uniform" data-QA read (mixture monitoring
    for training-data sources uses exactly this shape per source).

    Cross-engine exactness: with L(x) = round(ln(x)*1e5) snapped to
    BIGINT (the t_zipf discipline), n*H = n*L(n) - sum(c_h*L(c_h)) is
    an exact integer and entropy = that / (n*1e5) is ONE IEEE division;
    normalized entropy divides the same integer by n*L(bins)
    (NULLIF-guarded: a single-bin histogram has L(1) = 0 — the r8
    ADVICE degenerate-division rule, pinned to NULL on both engines).
    Gini-Simpson = (n² - sum c²)/n² runs its products in DECIMAL(38,0)
    / HUGEINT (the g7 discipline: n² outgrows BIGINT near 3e9 rows per
    group at 100 TB).

    Scale: one map-side-combinable shuffle to (type, hour) counts — 24
    rows per type — then one tiny reduce; nothing downstream of the
    first aggregation sees raw rows."""
    ev = load_table(spark, sf, "events").select(
        "event_type", F.hour("ts").alias("h")
    )
    hist = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).cast("long").alias("c"))

    def L(col):  # noqa: N802 — fixed-point ln, mirrors the SQL twin
        return F.round(F.log(col.cast("double")) * _LN_SCALE).cast("long")

    s = hist.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.col("c") * L(F.col("c"))).cast("long").alias("terms"),
        # multiply IN decimal(38,0) (not cast after a BIGINT product):
        # c^2 overflows BIGINT near c~3e9, exactly the 100 TB per-group
        # count the g7 discipline exists for; the oracle multiplies in
        # HUGEINT for the same reason (VERDICT r9 ADVICE item 1)
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("c2"),
    )
    h_num = (F.col("n") * L(F.col("n")) - F.col("terms")).alias("h_num")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    return s.select(
        "event_type",
        "n",
        "n_bins",
        (
            h_num.cast("double") / (F.col("n") * _LN_SCALE).cast("double")
        ).alias("entropy"),
        (
            h_num.cast("double")
            / F.nullif(F.col("n") * L(F.col("n_bins")), F.lit(0)).cast("double")
        ).alias("entropy_norm"),
        (
            (dec(F.col("n")) * dec(F.col("n")) - F.col("c2")).cast("double")
            / (dec(F.col("n")) * dec(F.col("n"))).cast("double")
        ).alias("gini_simpson"),
    )


O_A26_ENTROPY = f"""
WITH hist AS (
  SELECT event_type, hour(ts) AS h, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type,
         CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(c * CAST(round(ln(c) * {_LN_SCALE}) AS BIGINT)) AS BIGINT) AS terms,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS c2
  FROM hist GROUP BY event_type
)
SELECT event_type, n, n_bins,
       CAST(n * CAST(round(ln(n) * {_LN_SCALE}) AS BIGINT) - terms AS DOUBLE)
         / CAST(n * {_LN_SCALE} AS DOUBLE) AS entropy,
       CAST(n * CAST(round(ln(n) * {_LN_SCALE}) AS BIGINT) - terms AS DOUBLE)
         / CAST(nullif(n * CAST(round(ln(n_bins) * {_LN_SCALE}) AS BIGINT), 0) AS DOUBLE)
         AS entropy_norm,
       CAST(CAST(n AS HUGEINT) * n - c2 AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS gini_simpson
FROM s
"""


# ---------------------------------------------------------------------------
# A27: bottom-k (KMV) distinct-count sketch per group (sketch family)
# ---------------------------------------------------------------------------

_KMV_K = 256  # sketch size; rse ~ 1/sqrt(k-2) ~ 6.3%
_KMV_RANGE = 1 << 60  # portable_hash60 codomain


def q_a27_bottomk_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """A27: BOTTOM-K (KMV) distinct-count sketch — per order priority,
    estimate distinct customers from the k smallest hash values:
    est = (k-1) / h_(k) with hashes mapped to [0,1) (Bar-Yossef '02;
    the K-Minimum-Values sketch).  Complements a5/a9/w27b's HLL with
    the OTHER classic mergeable distinct sketch — KMV supports set
    operations (intersection via min-merge) that HLL cannot, which is
    why dedup pipelines carry both.

    Cross-engine exactness: the hash is the portable md5-based
    ``portable_hash60`` (identical literals both engines); the k-th
    smallest distinct hash is an integer; h/2^60 is an EXACT binary
    division (power of two), so est = (k-1)/(h/2^60) is one IEEE
    division of exactly-representable doubles.  Groups with fewer than
    k distinct keys have no k-th hash and fall back to the exact count
    (coalesce on both engines).

    Scale: the distinct-(group, hash) aggregation is the only raw-data
    shuffle (map-side combinable); the rank window runs over distinct
    hashes per group.  At 100 TB the window input is still |distinct|
    — for true sketch-sized state the same contract runs as a
    min-heap accumulate per partition then merge (the a9 partial
    pattern); this form is the exact-replayable baseline."""
    o = load_table(spark, sf, "orders").select(
        "o_orderpriority",
        portable_hash60(
            F.concat(F.lit("kmv:"), F.col("o_custkey").cast("string"))
        ).alias("h"),
    )
    dh = o.distinct()
    wr = W.partitionBy("o_orderpriority").orderBy(F.col("h").asc())
    kth = (
        dh.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == _KMV_K)
        .select("o_orderpriority", F.col("h").alias("kth_hash"))
    )
    exact = (
        load_table(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").cast("long").alias("n_exact"))
    )
    est = F.lit(float(_KMV_K - 1)) / (
        F.col("kth_hash").cast("double") / F.lit(float(_KMV_RANGE))
    )
    return exact.join(kth, "o_orderpriority", "left").select(
        "o_orderpriority",
        "n_exact",
        "kth_hash",
        F.coalesce(est, F.col("n_exact").cast("double")).alias("est_distinct"),
        (
            F.abs(
                F.coalesce(est, F.col("n_exact").cast("double"))
                - F.col("n_exact").cast("double")
            )
            / F.col("n_exact").cast("double")
            <= F.lit(0.15)
        ).alias("sketch_ok"),
    )


O_A27_BOTTOMK = f"""
WITH dh AS (
  SELECT DISTINCT o_orderpriority,
         CAST(('0x' || substr(md5('kmv:' || CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM orders
), kth AS (
  SELECT o_orderpriority, h AS kth_hash FROM (
    SELECT o_orderpriority, h,
           row_number() OVER (PARTITION BY o_orderpriority ORDER BY h ASC) AS rn
    FROM dh) WHERE rn = {_KMV_K}
), exact AS (
  SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
  FROM orders GROUP BY o_orderpriority
)
SELECT e.o_orderpriority, e.n_exact, k.kth_hash,
       coalesce({float(_KMV_K - 1)} / (CAST(k.kth_hash AS DOUBLE) / {float(_KMV_RANGE)}),
                CAST(e.n_exact AS DOUBLE)) AS est_distinct,
       abs(coalesce({float(_KMV_K - 1)} / (CAST(k.kth_hash AS DOUBLE) / {float(_KMV_RANGE)}),
                    CAST(e.n_exact AS DOUBLE)) - CAST(e.n_exact AS DOUBLE))
         / CAST(e.n_exact AS DOUBLE) <= 0.15 AS sketch_ok
FROM exact e LEFT JOIN kth k USING (o_orderpriority)
"""


# ---------------------------------------------------------------------------
# T-READ: Flesch readability scoring per document (text family)
# ---------------------------------------------------------------------------


def q_t_readability(spark: SparkSession, sf: str) -> DataFrame:
    """T-READ: FLESCH READING-EASE per document — 206.835 -
    1.015*(words/sentences) - 84.6*(syllables/words), the standard
    readability gate in LLM-corpus quality filters (alongside the
    Gopher-style stats in t_quality_score; syllables are approximated
    by vowel-group runs, the usual regex surrogate).  All three counts
    ship as exact integers so downstream filters can re-derive any
    banding.

    Cross-engine exactness: words/sentences/syllables are integer regex
    counts with identical patterns; the score is two IEEE divisions of
    exact integers combined in a FIXED parenthesization — identical
    doubles on both engines, so even the banding case-ladder compares
    identically.  NULL text coalesces to '' (w=0 -> NULL score via
    NULLIF, band 'empty') — the degenerate-division rule.

    Scale: pure columnar regex work, zero shuffles, zero UDFs — scan
    speed; the explode-free counts keep row width constant."""
    d = load_table(spark, sf, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("t")
    )
    trimmed = F.trim(F.col("t"))
    words = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")
    sents = F.size(F.regexp_extract_all(F.col("t"), F.lit(r"[.!?]+"), 0)).cast("long")
    sylls = F.size(
        F.regexp_extract_all(F.lower(F.col("t")), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    c = d.select(
        "doc_id",
        words.alias("n_words"),
        sents.alias("n_sentences"),
        sylls.alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.nullif(
        F.col("n_sentences"), F.lit(0)
    ).cast("double")
    spw = F.col("n_syllables").cast("double") / F.nullif(
        F.col("n_words"), F.lit(0)
    ).cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    return c.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        flesch.alias("flesch"),
        F.when(F.col("n_words") == 0, F.lit("empty"))
        .when(flesch.isNull(), F.lit("no_sentences"))
        .when(flesch >= 90, F.lit("very_easy"))
        .when(flesch >= 60, F.lit("standard"))
        .when(flesch >= 30, F.lit("difficult"))
        .otherwise(F.lit("very_confusing"))
        .alias("band"),
    )


O_T_READABILITY = """
WITH d AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
), c AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(t) = '' THEN 0
              ELSE len(string_split_regex(trim(t), '\\s+')) END AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT) AS n_sentences,
         CAST(len(regexp_extract_all(lower(t), '[aeiouy]+')) AS BIGINT) AS n_syllables
  FROM d
), f AS (
  SELECT *,
         206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(nullif(n_sentences, 0) AS DOUBLE))
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(nullif(n_words, 0) AS DOUBLE))
           AS flesch
  FROM c
)
SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
       CASE WHEN n_words = 0 THEN 'empty'
            WHEN flesch IS NULL THEN 'no_sentences'
            WHEN flesch >= 90 THEN 'very_easy'
            WHEN flesch >= 60 THEN 'standard'
            WHEN flesch >= 30 THEN 'difficult'
            ELSE 'very_confusing' END AS band
FROM f
"""


# ---------------------------------------------------------------------------
# G9: common-neighbor / Adamic-Adar link prediction (graph family)
# ---------------------------------------------------------------------------

_G9_MAX_HUB_DEG = 64  # exclude hub intermediates: candidate volume = n*cap^2
_G9_TOP = 50


def q_g9_link_prediction(spark: SparkSession, sf: str) -> DataFrame:
    """G9: LINK PREDICTION over the urgent-order co-purchase graph —
    score NON-adjacent node pairs by common-neighbor count and
    Adamic-Adar (sum over shared neighbors w of 1/ln(deg_w);
    Adamic & Adar '03, Liben-Nowell & Kleinberg '03), the classic
    "which edge forms next" primitive; same canonical u<v edge set as
    g2/g7/g8.

    Hub exclusion: intermediates with degree > ``_G9_MAX_HUB_DEG``
    generate no candidate pairs, bounding candidate volume at n*cap²
    instead of the n*max_deg² blowup — the standard scale mitigation
    (it biases AA low on hub-mediated pairs, documented; production
    tunes the cap).  deg_w >= 2 holds by construction for any shared
    neighbor, so ln(deg_w) > 0 and the AA term divides safely.

    Cross-engine exactness: per-intermediate AA contributions snap to
    fixed-point BIGINTs (round(1e6/ln(deg_w)) — the t_zipf ln
    discipline), so pair scores are exact integer sums with one
    trailing division; the top-50 cut orders by (cn, aa, u, v) — a
    total order, so the SET is deterministic and the driver's
    order-insensitive hash matches.

    Scale: degree table is one map-side count; candidate generation is
    an equi-join of the adjacency list with itself ON the intermediate
    (shuffle keyed by w, bounded by the cap); the existing-edge
    anti-join and the final top-k (TakeOrdered, no global window) are
    standard."""
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
    edges = materialize(
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    adj = edges.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
        edges.select(F.col("v").alias("w"), F.col("u").alias("x"))
    )
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    mid = deg.filter((F.col("deg") >= 2) & (F.col("deg") <= _G9_MAX_HUB_DEG))
    aa_w = F.round(F.lit(1_000_000.0) / F.log(F.col("deg").cast("double"))).cast(
        "long"
    )
    # r11: the |V|-row filtered-degree table rides _graph_small_side
    # (broadcast by default, conf-switchable to a shuffle join via
    # spark.graft.graph.broadcast) — the pre-r11 plan SMJ-joined adj
    # against mid and, because adj_mid feeds both wedge sides, ran that
    # SMJ subtree TWICE; the broadcast leaves the adjacency unshuffled
    # until the wedge join itself (12 -> 8 exchanges, 4 -> 2 SMJ: only
    # the wedge self-join and the existing-edge anti-join still shuffle,
    # plans/r11/g9_link_prediction_{before,after}.txt).  A
    # collect_list-and-explode wedge form (one adj shuffle) was measured
    # SLOWER at sf0.1 — ObjectHashAggregate + Generate leave whole-stage
    # codegen (isolated 3.2s -> 5.2s), so the codegen self-join stays.
    # r12 size gate: |V| <= 2|E| over the symmetric adjacency and mid is
    # the deg-filtered subset, so the materialized edge count is a cheap
    # conservative bound (VERDICT r11 item #8)
    adj_mid = adj.join(
        _graph_small_side(spark, mid, resolve_graph_broadcast(spark, None, edges.count)),
        "w",
    ).select(
        "w", "x", aa_w.alias("aa")
    )
    p1 = adj_mid.select("w", F.col("x").alias("u"), "aa")
    p2 = adj_mid.select("w", F.col("x").alias("v"))
    cand = p1.join(p2, "w").filter(F.col("u") < F.col("v"))
    # aggregate BEFORE the existing-edge anti-join: the wedge stream is
    # the big intermediate (139M rows at sf1 — measured exactly 10x the
    # sf0.1 volume) and groupBy gets a map-side partial combine, so the
    # (u,v) shuffle carries combined pair scores, not raw wedges; the
    # anti-join then runs on the far smaller distinct-pair set.  The
    # filter commutes with the aggregation (both key on (u,v)).
    scored_all = cand.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum("aa").cast("long").alias("aa_scaled"),
    )
    scored = scored_all.join(edges, ["u", "v"], "left_anti")
    top = scored.orderBy(
        F.col("cn").desc(), F.col("aa_scaled").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(_G9_TOP)
    return top.select(
        "u",
        "v",
        "cn",
        (F.col("aa_scaled").cast("double") / F.lit(1_000_000.0)).alias("adamic_adar"),
    )


O_G9_LINK_PREDICTION = f"""
WITH li AS (
  SELECT l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderpriority = '1-URGENT'
), e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b USING (l_orderkey)
  WHERE a.l_partkey < b.l_partkey
), adj AS (
  SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e
), deg AS (
  SELECT w, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY w
), mid AS (
  SELECT w, CAST(round(1000000.0 / ln(deg)) AS BIGINT) AS aa
  FROM deg WHERE deg >= 2 AND deg <= {_G9_MAX_HUB_DEG}
), am AS (
  SELECT adj.w, adj.x, mid.aa FROM adj JOIN mid USING (w)
), cand AS (
  SELECT p1.w, p1.x AS u, p2.x AS v, p1.aa
  FROM am p1 JOIN am p2 ON p1.w = p2.w
  WHERE p1.x < p2.x
), ne AS (
  SELECT c.u, c.v, c.w, c.aa FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = c.u AND e.v = c.v)
), scored AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cn, CAST(sum(aa) AS BIGINT) AS aa_scaled
  FROM ne GROUP BY u, v
)
SELECT u, v, cn, CAST(aa_scaled AS DOUBLE) / 1000000.0 AS adamic_adar
FROM scored
ORDER BY cn DESC, aa_scaled DESC, u ASC, v ASC
LIMIT {_G9_TOP}
"""


EXT7_QUERIES = {
    "w35_changepoint": q_w35_changepoint,
    "j24_interp_join": q_j24_interp_join,
    "a26_entropy": q_a26_entropy,
    "a27_bottomk_distinct": q_a27_bottomk_distinct,
    "t_readability": q_t_readability,
    "g9_link_prediction": q_g9_link_prediction,
}

EXT7_ORACLES = {
    "w35_changepoint": O_W35_CHANGEPOINT,
    "j24_interp_join": O_J24_INTERP,
    "a26_entropy": O_A26_ENTROPY,
    "a27_bottomk_distinct": O_A27_BOTTOMK,
    "t_readability": O_T_READABILITY,
    "g9_link_prediction": O_G9_LINK_PREDICTION,
}
