"""Property-based checks (hypothesis) for the round-4 operators: CDC
merge vs a dict-replay oracle, mixture sampling invariants, Morton-key
bijectivity.  Same philosophy as test_property_algorithms: few examples,
maximum structural diversity per example."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from factory_inspectors_db_etl_spark.operators.layout import interleave_bits
from factory_inspectors_db_etl_spark.operators.merge import apply_cdc
from factory_inspectors_db_etl_spark.operators.sampling import mixture_sample

_prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# changelogs: small key space to force key collisions, unique version ids
_changes = st.lists(
    st.tuples(
        st.integers(0, 5),                    # key
        st.integers(0, 99),                   # payload
        st.sampled_from(["U", "U", "U", "D", "I"]),  # op (I behaves as upsert)
    ),
    min_size=0,
    max_size=25,
)
_base = st.lists(st.integers(0, 5), unique=True, max_size=6)


def _merge_reference(base_rows, changes):
    """Dict-replay oracle: apply changes in version order."""
    state = {k: (f"base-{k}", float(k)) for k in base_rows}
    for v, (k, payload, op) in enumerate(changes):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (f"chg-{k}-{v}", float(payload))
    return state


@_prop
@given(_base, _changes)
def test_apply_cdc_matches_dict_replay(spark, base_keys, changes):
    base = spark.createDataFrame(
        [(k, f"base-{k}", float(k)) for k in base_keys] or [(None, None, None)],
        "k int, name string, bal double",
    )
    if not base_keys:
        base = base.limit(0)
    ch = spark.createDataFrame(
        [(k, f"chg-{k}-{v}", float(p), op, v) for v, (k, p, op) in enumerate(changes)]
        or [(None, None, None, None, None)],
        "k int, name string, bal double, op string, v int",
    )
    if not changes:
        ch = ch.limit(0)
    got = {r["k"]: (r["name"], r["bal"]) for r in apply_cdc(base, ch, ["k"], ["v"]).collect()}
    assert got == _merge_reference(base_keys, changes)


_weights = st.dictionaries(
    st.sampled_from(["en", "de", "fr", "zh"]),
    st.floats(0.05, 1.0, allow_nan=False),
    min_size=1,
    max_size=4,
)


@_prop
@given(_weights, st.integers(0, 3))
def test_mixture_sample_invariants(spark, weights, seed_shift):
    rows = [
        (i, f"text-{i + seed_shift}", ["en", "en", "en", "de", "de", "fr", "zh"][i % 7])
        for i in range(350)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = mixture_sample(df, "text", "lang", weights).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    input_counts = {}
    for _, _, lang in rows:
        input_counts[lang] = input_counts.get(lang, 0) + 1
    # only targeted strata appear, and no stratum is upsampled
    assert set(by_lang) <= set(weights)
    for lang, ids in by_lang.items():
        assert len(ids) <= input_counts[lang]
    # every surviving row is a real input row of that stratum
    all_ids = {i for ids in by_lang.values() for i in ids}
    assert all_ids <= {r[0] for r in rows}
    # determinism: re-running selects the identical ids
    again = {(r["lang"], r["doc_id"]) for r in mixture_sample(df, "text", "lang", weights).collect()}
    assert {(lang, i) for lang, ids in by_lang.items() for i in ids} == again


def _py_morton(xs, bits):
    out = 0
    for d, x in enumerate(xs):
        for i in range(bits):
            out |= ((x >> i) & 1) << (i * len(xs) + d)
    return out


@_prop
@given(
    st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=20
    )
)
def test_interleave_bits_bijective_and_matches_reference(spark, points):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(points, ["a", "b"])
    got = df.select("a", "b", interleave_bits([F.col("a"), F.col("b")], 8).alias("z")).collect()
    for r in got:
        z = _py_morton([r["a"], r["b"]], 8)
        assert r["z"] == z
        # bijectivity: decode back
        a = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (a, b) == (r["a"], r["b"])


# --- BPE greedy merge fold (operators/bpe.py::_merge_pair) ---

_syms = st.lists(st.sampled_from(["a", "b", "ab", "aa", "c"]), min_size=0, max_size=12)
_pair = st.sampled_from([("a", "a"), ("a", "b"), ("b", "a"), ("a", "ab"), ("ab", "a"), ("aa", "a")])


def _greedy_merge_ref(syms, l, r):
    out = []
    for x in syms:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return out


@_prop
@given(st.lists(st.tuples(_syms, _pair), min_size=1, max_size=20))
def test_bpe_merge_fold_matches_greedy_reference(spark, cases):
    """The higher-order-fold merge equals the left-to-right greedy
    non-overlapping reference on adversarial symbol runs (aaaa, abab,
    multi-char symbols that embed the pair as a substring)."""
    from pyspark.sql import functions as F

    from factory_inspectors_db_etl_spark.operators.bpe import _merge_pair

    rows = [(i, syms, l, r) for i, (syms, (l, r)) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, syms array<string>, l string, r string")
    got = {
        row["i"]: row["m"]
        for row in df.select(
            "i", _merge_pair(F.col("syms"), F.col("l"), F.col("r")).alias("m")
        ).collect()
    }
    for i, (syms, (l, r)) in enumerate(cases):
        assert got[i] == _greedy_merge_ref(syms, l, r), (syms, l, r)
