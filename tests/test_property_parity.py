"""Property-based cross-engine parity for the two mechanisms every
oracle-checked query leans on: engine-portable rounding (fround must
produce bit-identical doubles in Spark and DuckDB) and exact integer
conformance (BIGINT strings survive without a double round-trip).
Hypothesis drives the value space; each example batch runs ONE Spark
job and one DuckDB query."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from data_ingestors_spark.functions.casts import cast_for_decl
from data_ingestors_spark.functions.rounding import fround, o_fround

finite_doubles = st.floats(
    allow_nan=False,
    allow_infinity=False,
    width=64,
    min_value=-1e12,
    max_value=1e12,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=100), st.integers(0, 6))
def test_fround_bit_identical_across_engines(spark, values, nd):
    sdf = spark.createDataFrame([(v,) for v in values], "x double")
    got = [r.y for r in sdf.select(fround(F.col("x"), nd).alias("y")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {o_fround('CAST(? AS DOUBLE)', nd)}", [v]).fetchone()[0]
        for v in values
    ]
    # bit-identical, not approx: both engines ran floor(x*p + 0.5)/p
    # on the identical IEEE double
    assert [repr(g) for g in got] == [repr(w) for w in want]


int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=12, deadline=None)
@given(st.lists(int64s, min_size=1, max_size=100))
def test_bigint_string_roundtrip_exact(spark, ns):
    """Any int64, as a string, survives the BIGINT conformance cast
    exactly — including values beyond double's 2^53 integer range
    (ADVICE r1: a double round-trip corrupts these silently)."""
    sdf = spark.createDataFrame([(str(n),) for n in ns], "s string")
    got = [r.y for r in sdf.select(cast_for_decl(F.col("s"), "BIGINT").alias("y")).collect()]
    assert got == ns


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.just("3.5"),          # non-integral: must NOT truncate
            st.just("1e3"),          # scientific integral
            st.just("nan"),
            st.just("inf"),
            st.just(" 42 "),         # whitespace-tolerant
            st.text(alphabet="abcXYZ!#", min_size=1, max_size=6),
            st.integers(min_value=2**31, max_value=2**40).map(str),  # int32 overflow
        ),
        min_size=1,
        max_size=30,
    )
)
def test_int_conformance_never_silently_corrupts(spark, raws):
    """INT (32-bit) conformance: every input either maps to its exact
    in-range integer value or to NULL (counted as an error upstream) —
    never to a truncated or wrapped number."""
    sdf = spark.createDataFrame([(s,) for s in raws], "s string")
    out = sdf.select(
        "s", cast_for_decl(F.col("s"), "INT").alias("y")
    ).collect()
    for r in out:
        stripped = r.s.strip()
        try:
            exact = int(stripped)
        except ValueError:
            # reference semantics (pd.to_numeric): scientific-notation
            # integrals like '1e3' conform; non-integrals do not
            try:
                f = float(stripped)
                exact = int(f) if f == int(f) else None
            except (ValueError, OverflowError):
                exact = None
        in_range = exact is not None and -(2**31) <= exact < 2**31
        if in_range:
            assert r.y == exact, f"{r.s!r} -> {r.y}"
        else:
            assert r.y is None, f"{r.s!r} must be NULL (error), got {r.y}"


def test_fround_half_boundary_cases(spark):
    """The exact values where Spark's native round and DuckDB's round
    historically disagree (decimal-repr vs binary rounding) — fround
    must agree with itself across engines on all of them."""
    cases = [2.675, 0.125, 1.005, 2.5, -2.5, 0.285, 1.115]
    for nd in (0, 1, 2):
        sdf = spark.createDataFrame([(v,) for v in cases], "x double")
        got = [r.y for r in sdf.select(fround(F.col("x"), nd).alias("y")).collect()]
        con = duckdb.connect()
        want = [
            con.execute(
                f"SELECT {o_fround('CAST(? AS DOUBLE)', nd)}", [v]
            ).fetchone()[0]
            for v in cases
        ]
        assert got == want, f"nd={nd}"


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda p: p[0] != p[1]),
        min_size=0,
        max_size=40,
    )
)
def test_neardup_clusters_match_union_find(spark, edge_list):
    """BOTH physical strategies (one-task union-find and iterative
    min-label propagation) must compute exactly the connected
    components a reference union-find produces, for arbitrary random
    graphs over 25 nodes (including disconnected nodes and dense
    blobs)."""
    from data_ingestors_spark.operators.dedup import neardup_clusters

    n = 25
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}

    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edge_list or [(0, 0)], "id_a long, id_b long")
    if not edge_list:
        pairs = pairs.filter("id_a <> id_a")  # empty frame, same schema
    got = {r.doc_id: r.cluster_id for r in neardup_clusters(ids, pairs).collect()}
    assert got == expected
    # force the distributed iterative path (smallgraph gate off)
    got_iter = {
        r.doc_id: r.cluster_id
        for r in neardup_clusters(ids, pairs, smallgraph_edges=0).collect()
    }
    assert got_iter == expected


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
        min_size=1,
        max_size=30,
    ),
)
def test_upsert_idempotent_and_deterministic(spark, tmp_path_factory, first, second):
    """MERGE invariants under random batches: re-applying a batch is a
    no-op (idempotence — the retry-safety the streaming sink leans
    on), and duplicate keys inside a batch resolve to the same winner
    every time (deterministic dedup)."""
    from data_ingestors_spark.io.writers import read_table, upsert

    target = str(tmp_path_factory.mktemp("ups") / "t")

    def batch(rows):
        return spark.createDataFrame(
            [(f"k{k}", v) for k, v in rows], "data_id string, v long"
        )

    upsert(spark, target, batch(first), n_buckets=4)
    upsert(spark, target, batch(second), n_buckets=4)
    state1 = sorted((r.data_id, r.v) for r in read_table(spark, target).collect())

    # replay the second batch: nothing may change
    upsert(spark, target, batch(second), n_buckets=4)
    state2 = sorted((r.data_id, r.v) for r in read_table(spark, target).collect())
    assert state2 == state1

    # one row per key, and every key from both batches is present
    keys = [k for k, _ in state1]
    assert len(keys) == len(set(keys))
    assert set(keys) == {f"k{k}" for k, _ in first + second}


@settings(max_examples=8, deadline=None)
@given(
    st.integers(1, 60),   # doc length in words
    st.integers(2, 12),   # chunk size
    st.integers(0, 6),    # overlap (clamped below chunk size)
)
def test_chunk_documents_covers_every_word(spark, n_words, chunk_size, overlap):
    """Chunking invariants for arbitrary (length, size, overlap):
    every word index is covered by >= 1 chunk, chunk 0 starts at word
    0, consecutive chunks advance by exactly stride, and no chunk is
    empty."""
    from data_ingestors_spark.operators.text import chunk_documents

    overlap = min(overlap, chunk_size - 1)
    stride = chunk_size - overlap
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "text", "doc_id", chunk_size=chunk_size, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    covered = set()
    for r in rows:
        toks = r.chunk_text.split(" ")
        assert toks, "empty chunk"
        assert len(toks) == r.n_words
        start = r.chunk_id * stride
        assert toks == words[start : start + chunk_size]
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(n_words))


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 1000), st.integers(8, 14))
def test_winnowing_guarantee_randomized(spark, seed, passage_len):
    """Randomized winnowing guarantee (k=5, window=4): two docs built
    from DISJOINT vocabularies except for one shared passage of
    >= window+k-1 = 8 words must share >= 1 fingerprint."""
    import random

    from data_ingestors_spark.operators.text import winnowing_fingerprints

    rng = random.Random(seed)
    shared = [f"s{seed}_{i}" for i in range(passage_len)]
    doc_a = [f"a{rng.randint(0, 99)}" for _ in range(rng.randint(0, 10))] + shared + [
        f"a{rng.randint(100, 199)}" for _ in range(rng.randint(0, 10))
    ]
    doc_b = [f"b{rng.randint(0, 99)}" for _ in range(rng.randint(0, 10))] + shared + [
        f"b{rng.randint(100, 199)}" for _ in range(rng.randint(0, 10))
    ]
    df = spark.createDataFrame(
        [(1, " ".join(doc_a)), (2, " ".join(doc_b))], ["doc_id", "text"]
    )
    fps = winnowing_fingerprints(df, "text", "doc_id", k=5, window=4).collect()
    by_doc: dict = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]


@settings(max_examples=5, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 4))
def test_rollup_refresh_order_invariance(spark, tmp_path_factory, seed, n_splits):
    """Property: folding a fixed event set into the rollup store in
    ANY batch partitioning and ANY order yields the same finalized
    answer as one full refresh — the associativity/commutativity the
    additive-partial design claims."""
    import random

    from data_ingestors_spark.operators.rollup import read_rollup, rollup_upsert

    rng = random.Random(seed)
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, rng.randrange(4), rng.randrange(60)),
         rng.randrange(3), rng.choice(["view", "click"]), float(rng.randrange(100)), "{}")
        for i in range(60)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    df = spark.createDataFrame(rows, schema)

    assignment = [rng.randrange(n_splits) for _ in range(60)]
    batches = [
        [r for r, a in zip(rows, assignment) if a == b] for b in range(n_splits)
    ]
    batches = [b for b in batches if b]
    rng.shuffle(batches)

    base = tmp_path_factory.mktemp("rollup_prop")
    split_store, full_store = str(base / "split"), str(base / "full")
    for b in batches:
        rollup_upsert(spark, spark.createDataFrame(b, schema), split_store)
    rollup_upsert(spark, df, full_store)

    canon = lambda p: sorted(
        (r.bucket, r.event_type, r.n_events, float(r.sum_value), r.min_value, r.max_value)
        for r in read_rollup(spark, p).collect()
    )
    assert canon(split_store) == canon(full_store)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 64), st.sampled_from([7, 64, 256]))
def test_interval_overlap_join_matches_bruteforce(spark, seed, n, bin_size):
    """Property: the binned equi-join form returns EXACTLY the pairs a
    brute-force quadratic scan finds — for random interval sets, any
    bin size, including intervals far longer than a bin and touching
    endpoints."""
    import random

    from data_ingestors_spark.operators.joins import interval_overlap_join

    rng = random.Random(seed)
    left = [(i, rng.randrange(0, 2000), 0) for i in range(n)]
    left = [(i, s, s + rng.randrange(0, 900)) for i, s, _ in left]
    right = [(1000 + i, rng.randrange(0, 2000), 0) for i in range(n)]
    right = [(i, s, s + rng.randrange(0, 900)) for i, s, _ in right]

    expect = sorted(
        (l[0], r[0])
        for l in left
        for r in right
        if l[1] <= r[2] and r[1] <= l[2]
    )
    ldf = spark.createDataFrame(left, "id long, s long, e long")
    rdf = spark.createDataFrame(right, "id long, s long, e long")
    got = sorted(
        (r.l_id, r.r_id)
        for r in interval_overlap_join(ldf, rdf, bin_size=bin_size).collect()
    )
    assert got == expect


def _py_lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=2,
        max_size=12,
        unique=True,
    )
)
def test_fastss_complete_on_random_strings(spark, strings):
    """FastSS 1-deletion blocking finds EXACTLY the edit-distance-1
    pairs a brute-force scan finds, over random strings from a tiny
    alphabet (maximal deletion-key collisions — the adversarial case
    for both false positives, killed by the verify step, and false
    negatives, impossible per the FastSS theorem)."""
    from data_ingestors_spark.operators.fuzzy import fastss_pairs

    rows = list(enumerate(strings))
    df = spark.createDataFrame(rows, ["id", "s"])
    got = {(r.id_a, r.id_b) for r in fastss_pairs(df, "s", "id").collect()}
    want = {
        (i, j)
        for i, a in rows
        for j, b in rows
        if i < j and _py_lev(a, b) == 1
    }
    assert got == want, (sorted(got ^ want), strings)
