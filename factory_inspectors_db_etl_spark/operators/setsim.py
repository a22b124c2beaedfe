"""Set-similarity joins beyond LSH: lossless prefix filtering and
asymmetric containment.

Two exact set-similarity operators that complement the probabilistic
families in ``operators.dedup`` (MinHash/SimHash bucket *candidates*,
these produce *exact* answers with a provably lossless candidate
filter):

- ``prefix_filter_jaccard_pairs``: all pairs with Jaccard >= t over
  word-k-shingle sets, candidates generated ONLY from each document's
  rarest elements (the SSJoin/PPJoin prefix filter — Chaudhuri
  ICDE'06, Xiao WWW'08).  Unlike MinHash-LSH this misses nothing: the
  prefix theorem guarantees every qualifying pair shares a prefix
  element, so the output equals the brute-force all-pairs join.
- ``containment_pairs``: directed containment |A∩B|/|A| >= t over
  word k-shingles — the asymmetric near-dup relation Jaccard cannot
  see (a short document quoted whole inside a long one has tiny
  Jaccard but containment ~1).  The inverted-index shape of
  ``dedup.ngram_jaccard_pairs``, with per-direction thresholds.

Thresholds are integer rationals (``threshold_num/threshold_den``),
never floats: ceil(t*n) on a float threshold hits the 0.6*5 == 3.0000…4
ulp trap, and the final keep decision compares cross-multiplied
integers, so both operators are bit-deterministic on any engine.

Scale notes (100 TB): no stage is ever all-pairs.  Prefix postings are
the RAREST ``|s| - ceil(t|s|) + 1`` tokens per set, so hot tokens only
enter a posting list for documents where nothing rarer exists; the
length-ratio prune (t|b| <= |a| <= |b|/t) drops cross-size candidates
before the pair ever forms.  Containment reuses the capped inverted
index (``max_df`` stop-shingle cap) from ``ngram_jaccard_pairs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import materialize, normalize_for_shingling, shingles


def _collapse_exact(df: DataFrame, id_col: str, text_col: str):
    """Group byte-identical texts; returns (reps, members) where ``reps``
    is one row per distinct text (the min-id representative, with its
    group size ``_gn``) and ``members`` maps rep -> every member id.

    The duplicate-density guard shared with the LSH/fuzzy-join family
    (sf1 lesson): a corpus where every document has r verbatim copies
    makes every posting list r× longer and the pair join r²× bigger,
    while the DISTINCT-text pair set is unchanged — so compute pairs
    once per distinct text and expand afterward.  Bit-identical by
    construction: shingle/element sets are pure functions of the text,
    so every expanded pair carries exactly the values the un-collapsed
    pipeline would have computed.  (The expansion itself is output-bound:
    q identical docs genuinely form q(q-1)/2 qualifying pairs — exact
    dedup upstream is the fix when that output is unwanted.)"""
    grp = Window.partitionBy(text_col)
    tagged = materialize(
        df.select(
            F.col(id_col).alias("_mid"),
            F.col(text_col).alias(text_col),
            F.min(id_col).over(grp).alias("_rep"),
            F.count(F.lit(1)).over(grp).alias("_gn"),
        )
    )
    members = tagged.select(F.col("_rep").alias("rep"), F.col("_mid").alias("mid"))
    reps = (
        tagged.filter(F.col("_mid") == F.col("_rep"))
        .select(F.col("_mid").alias(id_col), text_col, "_gn")
    )
    return reps, members


def _element_stream(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc, elem) stream: the document's distinct word ``k``-shingles
    as 64-bit hashes (``k=1`` = unigram tokens).  Hashing is the
    catalog's shingle-identity convention (collision ~2^-64) and keeps
    the ordered arrays and verify intersections long-typed."""
    words = df.withColumn("_words", F.split(normalize_for_shingling(F.col(text_col)), " "))
    elems = (
        F.array_distinct(F.col("_words"))
        if k == 1
        else shingles(F.col("_words"), k)
    )
    return words.select(
        F.col(id_col).alias("doc"), F.explode(elems).alias("_e")
    ).select("doc", F.xxhash64("_e").alias("elem"))


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 5,
    collapse_exact: bool = True,
) -> DataFrame:
    """EXACT all-pairs Jaccard >= num/den over distinct word-``k``-shingle
    sets, via the prefix filter — O(candidates) work, zero false
    negatives.

    Why it is lossless: order all tokens globally by (document
    frequency, token).  For a set s, any pair with J >= t shares at
    least ceil(t*|s|) tokens, and if the globally-smallest shared token
    sat outside s's first ``|s| - ceil(t|s|) + 1`` tokens, all
    ceil(t|s|) shared tokens would have to fit in the last
    ``ceil(t|s|) - 1`` positions — pigeonhole contradiction.  So
    exploding only that prefix per document and equi-joining on the
    token still meets every qualifying pair; an exact intersect/union
    verify finishes the job.  ``tests/test_round5b_ops.py`` pins
    equality against the unfiltered brute-force join.

    One ordered token table feeds everything: sizes, prefixes, and the
    verify arrays, so the corpus is tokenized exactly once (materialize
    barrier, same rationale as ``ngram_jaccard_pairs``).

    ``collapse_exact`` (default on) computes pairs once per DISTINCT
    text and expands to member ids afterward — see ``_collapse_exact``.

    Returns (id_a, id_b, inter, union_sz, jaccard) with id_a < id_b.
    """
    p, q = threshold_num, threshold_den
    members = None
    if collapse_exact:
        df, members = _collapse_exact(df, id_col, text_col)
    toks = materialize(_element_stream(df, id_col, text_col, k))
    dfreq = toks.groupBy("elem").agg(F.count(F.lit(1)).alias("df"))
    # per-doc element array sorted rarest-first under the global total
    # order (df, elem) — ties on df are broken by the element hash, so
    # every document sorts by the SAME global order (prefix-filter
    # precondition); (df, elem) is unique per doc (elements are
    # distinct), so sort_array makes the collect_list order immaterial.
    per_doc = (
        toks.join(dfreq, "elem")
        .groupBy("doc")
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "elem"))).alias("_ord"),
            F.count(F.lit(1)).alias("sz"),
        )
        .withColumn(
            "_plen",
            F.col("sz") - F.expr(f"({p} * sz + {q - 1}) DIV {q}") + 1,
        )
    )
    per_doc = materialize(
        per_doc.select(
            "doc",
            "sz",
            F.transform("_ord", lambda s: s["elem"]).alias("toks"),
            F.transform(
                F.slice("_ord", F.lit(1), F.col("_plen")), lambda s: s["elem"]
            ).alias("prefix"),
        )
    )
    pref = per_doc.select("doc", "sz", F.explode("prefix").alias("tok"))
    a, b = pref.alias("a"), pref.alias("b")
    # candidates: share one prefix token AND pass the length-ratio prune
    # (J >= p/q forces q*|a| >= p*|b| and q*|b| >= p*|a|).
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (q * F.col("a.sz") >= p * F.col("b.sz"))
            & (q * F.col("b.sz") >= p * F.col("a.sz")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    sides = per_doc.select("doc", "toks", "sz")
    verified = (
        cand.join(
            sides.select(
                F.col("doc").alias("id_a"),
                F.col("toks").alias("_ta"),
                F.col("sz").alias("_sza"),
            ),
            "id_a",
        )
        .join(
            sides.select(
                F.col("doc").alias("id_b"),
                F.col("toks").alias("_tb"),
                F.col("sz").alias("_szb"),
            ),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("_ta", "_tb")).cast("long"))
        .withColumn("union_sz", (F.col("_sza") + F.col("_szb") - F.col("inter")).cast("long"))
        .filter(q * F.col("inter") >= p * F.col("union_sz"))
    )
    out = verified.select(
        "id_a",
        "id_b",
        "inter",
        "union_sz",
        (F.col("inter") / F.col("union_sz")).alias("jaccard"),
    )
    if members is None:
        return out
    # identical texts always qualify (J = 1): one SELF-pair per
    # multi-member group, valued from the group's own element-set size,
    # so the expansion emits exactly what the un-collapsed pipeline would
    if collapse_exact:
        self_pairs = (
            df.filter(F.col("_gn") >= 2)
            .select(F.col(id_col).alias("doc"))
            .join(per_doc.select("doc", "sz"), "doc")
            .select(
                F.col("doc").alias("id_a"),
                F.col("doc").alias("id_b"),
                F.col("sz").cast("long").alias("inter"),
                F.col("sz").cast("long").alias("union_sz"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        out = out.unionByName(self_pairs)
    return (
        out.join(members.select(F.col("rep").alias("id_a"), F.col("mid").alias("xa")), "id_a")
        .join(members.select(F.col("rep").alias("id_b"), F.col("mid").alias("xb")), "id_b")
        .filter(F.col("xa") != F.col("xb"))
        .select(
            F.least("xa", "xb").alias("id_a"),
            F.greatest("xa", "xb").alias("id_b"),
            "inter",
            "union_sz",
            "jaccard",
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def bruteforce_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold_num: int = 3,
    threshold_den: int = 5,
) -> DataFrame:
    """Reference implementation: the full inverted-index join with NO
    prefix filter — every shared element generates the pair.  Test-only
    twin of ``prefix_filter_jaccard_pairs`` (quadratic in posting-list
    length on hot elements; not registered as a query)."""
    p, q = threshold_num, threshold_den
    toks = _element_stream(df, id_col, text_col, k)
    sizes = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(b, (F.col("a.elem") == F.col("b.elem")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("_sza")), "id_a")
        .join(sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("_szb")), "id_b")
        .withColumn("inter", F.col("inter").cast("long"))
        .withColumn("union_sz", (F.col("_sza") + F.col("_szb") - F.col("inter")).cast("long"))
        .filter(q * F.col("inter") >= p * F.col("union_sz"))
        .select(
            "id_a",
            "id_b",
            "inter",
            "union_sz",
            (F.col("inter") / F.col("union_sz")).alias("jaccard"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int | None = 1000,
    collapse_exact: bool = True,
) -> DataFrame:
    """Directed containment C(src→dst) = |src∩dst|/|src| >= num/den over
    word ``k``-shingle sets — finds documents (mostly) CONTAINED in
    others, which symmetric Jaccard structurally misses: a 50-shingle
    quote inside a 5000-shingle page has J ≈ 0.01 but C = 1.0.

    Same inverted-index candidate plan as ``ngram_jaccard_pairs``
    (shared-shingle equi-join, ``max_df`` stop-shingle cap, postings of
    size 1 dropped), but each undirected intersection row fans out into
    up to two DIRECTED rows, each thresholded against its own source
    size with cross-multiplied integers.

    ``collapse_exact`` (default on): pairs once per distinct text,
    member expansion afterward (``_collapse_exact``) — measured 254s →
    ~20s Spark-side at sf1 on the 10×-replicated stress corpus.

    Returns (src_id, dst_id, inter, sz_src, containment).
    """
    p, q = threshold_num, threshold_den
    members = None
    if collapse_exact:
        df, members = _collapse_exact(df, id_col, text_col)
    sh = materialize(
        df.withColumn("_words", F.split(normalize_for_shingling(F.col(text_col)), " "))
        .select(
            F.col(id_col).alias("doc"),
            F.explode(shingles(F.col("_words"), k)).alias("sh"),
        )
        .select("doc", F.xxhash64("sh").alias("sh"))
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    if max_df is None:
        eligible = sh
    else:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        eligible = sh.join(
            freq.filter((F.col("df") > 1) & (F.col("df") <= max_df)).select("sh"), "sh"
        )
    postings = eligible.groupBy("sh").agg(F.collect_list("doc").alias("docs"))
    inter = (
        postings.select(F.explode("docs").alias("id_a"), "docs")
        .select("id_a", F.explode("docs").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    both = inter.join(
        sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a")), "id_a"
    ).join(sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
    # one undirected row -> up to two directed rows (a⊑b and/or b⊑a)
    directed = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src_id"),
                    F.col("id_b").alias("dst_id"),
                    F.col("inter"),
                    F.col("sz_a").alias("sz_src"),
                ),
                F.struct(
                    F.col("id_b").alias("src_id"),
                    F.col("id_a").alias("dst_id"),
                    F.col("inter"),
                    F.col("sz_b").alias("sz_src"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    out = directed.filter(q * F.col("inter") >= p * F.col("sz_src")).select(
        "src_id",
        "dst_id",
        F.col("inter").cast("long").alias("inter"),
        F.col("sz_src").cast("long").alias("sz_src"),
        (F.col("inter") / F.col("sz_src")).alias("containment"),
    )
    if members is None:
        return out
    # identical texts contain each other fully (C = 1 both directions):
    # one SELF-pair per multi-member group; the directed expansion below
    # emits every ordered member combination exactly once
    self_pairs = (
        df.filter(F.col("_gn") >= 2)
        .select(F.col(id_col).alias("doc"))
        .join(sizes, "doc")
        .select(
            F.col("doc").alias("src_id"),
            F.col("doc").alias("dst_id"),
            F.col("sz").cast("long").alias("inter"),
            F.col("sz").cast("long").alias("sz_src"),
            F.lit(1.0).alias("containment"),
        )
    )
    return (
        out.unionByName(self_pairs)
        .join(members.select(F.col("rep").alias("src_id"), F.col("mid").alias("xs")), "src_id")
        .join(members.select(F.col("rep").alias("dst_id"), F.col("mid").alias("xd")), "dst_id")
        .filter(F.col("xs") != F.col("xd"))
        .select(
            F.col("xs").alias("src_id"),
            F.col("xd").alias("dst_id"),
            "inter",
            "sz_src",
            "containment",
        )
    )
