"""Property-based invariant tests (hypothesis) for core operators —
adversarial inputs (duplicate keys, hot keys, nulls-by-absence, skewed
sizes) that the fixed testdata never produces. The parity suite checks
behavior on realistic data; these pin algebraic invariants on hostile
data.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def test_salted_join_identity_under_arbitrary_skew(spark):
    """salted_join output == plain join output for ANY fact multiset
    (including 100%-hot-key inputs and keys absent from the dim) and
    any bucket count — salting may only re-partition work, never change
    the result multiset."""
    from kafkastreams_example_spark.operators.relational import salted_join

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        fact_keys=st.lists(st.integers(0, 6), min_size=1, max_size=40),
        dim_keys=st.lists(st.integers(0, 6), min_size=1, max_size=7, unique=True),
        buckets=st.sampled_from([1, 3, 8]),
    )
    def check(fact_keys, dim_keys, buckets):
        fact = spark.createDataFrame(
            [(k, i) for i, k in enumerate(fact_keys)], "k BIGINT, row_id BIGINT"
        )
        dim = spark.createDataFrame(
            [(k, f"d{k}") for k in dim_keys], "k BIGINT, label STRING"
        )
        plain = sorted(
            tuple(r) for r in fact.join(dim, "k").select("k", "row_id", "label").collect()
        )
        salted = sorted(
            tuple(r)
            for r in salted_join(fact, dim, "k", salt_buckets=buckets, salt_source="row_id")
            .select("k", "row_id", "label")
            .collect()
        )
        assert salted == plain

    check()


def test_sequence_pack_invariants(spark):
    """Greedy prefix-sum packing invariants for ANY document length
    multiset: (a) every document lands in exactly one (shard, bin);
    (b) within a shard, bins are dense from 0 WHEN no single document
    exceeds the budget (an oversize doc legitimately consumes several
    bins' worth and skips indices — hypothesis found exactly that edge,
    so the density claim is conditioned); (c) every doc's bin equals
    floor(exclusive-prefix-sum / budget) under the shard's md5 order —
    the greedy stream replayed in Python."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    budget = 50

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        lengths=st.lists(st.integers(1, 120), min_size=1, max_size=60),
        n_shards=st.sampled_from([1, 4]),
    )
    def check(lengths, n_shards):
        docs = spark.createDataFrame(
            [(i, n) for i, n in enumerate(lengths)], "doc_id BIGINT, n_tokens BIGINT"
        )
        t = docs.select(
            "doc_id",
            (F.col("doc_id") % n_shards).alias("shard"),
            "n_tokens",
            F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
        )
        w = (
            Window.partitionBy("shard")
            .orderBy("ord_key")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.sum("n_tokens").over(w)
        packed = t.select(
            "doc_id",
            "shard",
            "n_tokens",
            ((cum - F.col("n_tokens")) / budget).cast("bigint").alias("bin"),
        ).collect()

        assert len({r["doc_id"] for r in packed}) == len(lengths)  # (a)
        by_shard: dict[int, dict[int, int]] = {}
        for r in packed:
            by_shard.setdefault(r["shard"], {}).setdefault(r["bin"], 0)
            by_shard[r["shard"]][r["bin"]] += r["n_tokens"]
        if max(lengths) <= budget:
            for bins in by_shard.values():
                ids = sorted(bins)
                assert ids[0] == 0 and ids == list(range(len(ids)))  # (b)
        # (c): replay each shard's md5-ordered greedy stream in Python —
        # every doc's bin must equal floor(exclusive-prefix-sum/budget)
        import hashlib

        for shard in by_shard:
            rows = [r for r in packed if r["shard"] == shard]
            rows.sort(key=lambda r: hashlib.md5(str(r["doc_id"]).encode()).hexdigest())
            running = 0
            for r in rows:
                assert r["bin"] == running // budget  # (c)
                running += r["n_tokens"]

    check()


def test_oracle_harness_detects_mismatches(spark):
    """Meta-test of the correctness gate itself: _check_one must flag a
    value mismatch, a row-count mismatch, and a column-name mismatch —
    a gate that green-lights everything is worse than no gate."""
    import duckdb

    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "oracle_check", Path(__file__).resolve().parent.parent / "tools" / "oracle_check.py"
    )
    oc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oc)

    from conftest import SF_DIR

    con = duckdb.connect()
    con.execute(f"CREATE VIEW region AS SELECT * FROM '{SF_DIR}/region.parquet'")

    class FakeSpec:
        def __init__(self, fn, oracle):
            self.fn = fn
            self.oracle = oracle

    good = lambda s, d: s.read.parquet(f"{d}/region.parquet").selectExpr(  # noqa: E731
        "r_regionkey", "r_name"
    )
    cases = {
        "ok": (good, "SELECT r_regionkey, r_name FROM region"),
        "bad_value": (good, "SELECT r_regionkey + 1 AS r_regionkey, r_name FROM region"),
        "bad_rows": (good, "SELECT r_regionkey, r_name FROM region WHERE r_regionkey > 0"),
        "bad_cols": (good, "SELECT r_regionkey, r_name AS region_name FROM region"),
    }
    oc.REGISTRY = {k: FakeSpec(fn, sql) for k, (fn, sql) in cases.items()}
    fails: list[str] = []
    for name in cases:
        oc._check_one(spark, con, name, SF_DIR, fails)
    assert fails == ["bad_value", "bad_rows", "bad_cols"]


def test_strict_float_gate_trips_on_one_ulp(spark):
    """Gate-sensitivity mutant for the round-18 strict_float mode: an
    oracle one ulp off from the Spark result must PASS the default
    9-sig-fig compare (that blindness is why the r17 percentile bug
    survived 17 rounds of green gates) and FAIL strict compare; an
    exactly-equal oracle must pass strict; and strict must NOT split
    on signed zero (−0.0 vs 0.0 stays collapsed — the x30 rule)."""
    import math

    import duckdb

    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "oracle_check",
        Path(__file__).resolve().parent.parent / "tools" / "oracle_check.py",
    )
    oc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oc)

    v = -3.0
    v_ulp = math.nextafter(v, -math.inf)  # -3.0000000000000004
    fn = lambda s, d: s.createDataFrame(  # noqa: E731
        [(1, v)], "k INT, pct DOUBLE"
    )
    con = duckdb.connect()
    exact = f"SELECT 1 AS k, CAST({v!r} AS DOUBLE) AS pct"
    off = f"SELECT 1 AS k, CAST({v_ulp!r} AS DOUBLE) AS pct"

    ok, _ = oc.compare_query(spark, con, fn, off, ".", strict_float=False)
    assert ok, "9-sig-fig compare must absorb one ulp (documented blindness)"
    ok, detail = oc.compare_query(spark, con, fn, off, ".", strict_float=True)
    assert not ok, f"strict compare must trip on one ulp: {detail}"
    ok, _ = oc.compare_query(spark, con, fn, exact, ".", strict_float=True)
    assert ok, "strict compare must pass on bit-equal values"

    zfn = lambda s, d: s.createDataFrame(  # noqa: E731
        [(1, -0.0)], "k INT, pct DOUBLE"
    )
    ok, _ = oc.compare_query(
        spark, con, zfn, "SELECT 1 AS k, CAST(0.0 AS DOUBLE) AS pct", ".",
        strict_float=True,
    )
    assert ok, "strict compare must collapse signed zero"


def test_bucketed_pairs_subset_of_exact(spark):
    """Within-bucket semantics ⊆ all-pairs semantics, for ANY vector
    multiset and threshold: every pair the two-level PQ bucketing emits
    must also be emitted by the exact kernel at the same threshold
    (bucketing may only REDUCE the candidate set), and every emitted
    cosine must clear the threshold."""
    from hypothesis import assume

    from kafkastreams_example_spark.functions.similarity import (
        bucketed_cosine_pairs,
        cosine_pairs,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        vecs=st.lists(
            st.lists(
                st.integers(-3, 3).map(float), min_size=4, max_size=4
            ).filter(lambda v: any(x != 0.0 for x in v)),
            min_size=4,
            max_size=14,
        ),
        threshold=st.sampled_from([0.2, 0.5, 0.9]),
    )
    def check(vecs, threshold):
        assume(len(vecs) >= 2)
        emb = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>",
        )
        bucketed = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in bucketed_cosine_pairs(
                emb, threshold=threshold, n_centroids=None, target_bucket_rows=4,
                min_centroids=2,
            ).collect()
        }
        exact = {
            (r["id_a"], r["id_b"], r["cosine"])
            for r in cosine_pairs(emb, threshold=threshold).collect()
        }
        assert bucketed <= exact
        assert all(c >= threshold - 1e-9 for _, _, c in bucketed)

    check()


def test_bpe_greedy_merge_matches_sequential_reference(spark):
    """bpe_greedy_merge (the aggregate-fold used by bpe_train_merges)
    must equal the sequential greedy left-to-right merge for ANY symbol
    sequence and pair — including the overlap traps: chained pairs
    ([a,a,a] with (a,a) → [aa,a]), the merged token re-appearing later,
    and single-symbol words (no pairs, identity). One Spark job over
    all hypothesis examples: per-row pair columns keep it a single
    DataFrame evaluation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F
    from kafkastreams_example_spark.functions.text import bpe_greedy_merge

    def reference(syms, pa, pb):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                out.append(pa + pb)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    sym = st.sampled_from(["a", "b", "ab", "aa"])

    @settings(
        max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
    )
    @given(
        rows=st.lists(
            st.tuples(st.lists(sym, min_size=1, max_size=8), sym, sym),
            min_size=1,
            max_size=12,
        )
    )
    def check(rows):
        df = spark.createDataFrame(
            [(i, syms, pa, pb) for i, (syms, pa, pb) in enumerate(rows)],
            "i INT, syms ARRAY<STRING>, pa STRING, pb STRING",
        )
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i",
                bpe_greedy_merge(F.col("syms"), F.col("pa"), F.col("pb")).alias("m"),
            ).collect()
        }
        for i, (syms, pa, pb) in enumerate(rows):
            assert got[i] == reference(syms, pa, pb), (syms, pa, pb, got[i])

    check()


def test_tfidf_cosine_pairs_subset_of_full_vector_pairs(spark):
    """Every pair tfidf_cosine_pairs emits must also pass the threshold
    under the FULL-vector cosine (no signature/champion truncation):
    the truncated dot is a sum over a subset of the shared terms of a
    nonnegative-weight product, so truncated cosine <= full cosine and
    the pruned result is provably a subset of the exact one — the same
    guarantee the PQ-bucketed pair generator pins against its exact
    kernel. (A recall floor is deliberately NOT pinned: this synthetic
    corpus is homogeneous — >50% of ALL doc pairs pass 0.6 on full
    vectors — so the champion estimator is a top-of-distribution
    selector here by design.)"""
    import duckdb

    from kafkastreams_example_spark.queries import REGISTRY
    from conftest import SF_DIR

    emitted = {
        (r["doc_a"], r["doc_b"])
        for r in REGISTRY["tfidf_cosine_pairs"].fn(spark, SF_DIR).collect()
    }
    assert emitted, "pruned generator emitted nothing at sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    exact = con.execute(f"""
WITH terms AS (SELECT doc_id, unnest({tok}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (SELECT doc_id, tf.term, tf * ln(CAST(n_docs AS DOUBLE)/df) AS w
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      WHERE tf * ln(CAST(n_docs AS DOUBLE)/df) > 1e-12),
norm AS (SELECT doc_id, sqrt(sum(w*w)) AS nrm FROM w GROUP BY doc_id),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w*b.w) AS dot
         FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT doc_a, doc_b FROM dots
JOIN norm na ON dots.doc_a = na.doc_id JOIN norm nb ON dots.doc_b = nb.doc_id
WHERE round(dot/(na.nrm*nb.nrm), 6) >= 0.6
""").fetchall()
    exact_pairs = {(a, b) for a, b in exact}
    stray = emitted - exact_pairs
    assert not stray, f"pruned pairs not in exact full-vector set: {sorted(stray)[:5]}"


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_media_parsers_never_raise_on_arbitrary_bytes(payload):
    """Ingest-robustness property: the pure-struct media decoders run
    inside Arrow batches over 100 TB of untrusted payloads — ANY byte
    string must yield a dict or None, never an exception (one raise
    poisons the whole batch). Covers the header walkers and both
    content-level decoders."""
    from kafkastreams_example_spark.functions.multimodal import (
        decimate_wav_pcm,
        parse_audio_header,
        parse_bmp_pixels,
        parse_image_header,
        parse_video_header,
        parse_wav_pcm,
        resize_bmp_nn,
        sample_bmp_frames,
    )

    for parser in (
        parse_image_header,
        parse_audio_header,
        parse_video_header,
        parse_wav_pcm,
        parse_bmp_pixels,
        resize_bmp_nn,
        decimate_wav_pcm,
        sample_bmp_frames,
    ):
        out = parser(payload)
        assert out is None or isinstance(out, dict)


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=256), st.sampled_from([b"RIFF", b"BM", b"OggS", b"fLaC", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff"]))
def test_media_parsers_never_raise_on_magic_prefixed_garbage(tail, magic):
    """Harder fuzz tier: payloads that PASS the magic check but carry
    garbage structure exercise the deep walkers (chunk sizes, frame
    hops, box trees) — the code paths plain random bytes rarely
    reach."""
    from kafkastreams_example_spark.functions.multimodal import (
        decimate_wav_pcm,
        parse_audio_header,
        parse_bmp_pixels,
        parse_image_header,
        parse_video_header,
        parse_wav_pcm,
        resize_bmp_nn,
        sample_bmp_frames,
    )

    payload = magic + tail
    for parser in (
        parse_image_header,
        parse_audio_header,
        parse_video_header,
        parse_wav_pcm,
        parse_bmp_pixels,
        resize_bmp_nn,
        decimate_wav_pcm,
        sample_bmp_frames,
    ):
        out = parser(payload)
        assert out is None or isinstance(out, dict)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_gopher_rules_never_raise_and_flags_are_boolean(spark, texts):
    """Fuzz the hard quality gate: arbitrary unicode-ish text (incl.
    token-free strings) must never raise, and every rule flag plus the
    verdict must be a real boolean — never NULL (the round-10
    zero-token contract, generalized)."""
    from kafkastreams_example_spark.functions.text import gopher_quality_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    rows = gopher_quality_rules(df).collect()
    assert len(rows) == len(texts)
    for r in rows:
        for f in ("word_count_ok", "mean_len_ok", "stopwords_ok",
                  "repetition_ok", "passes"):
            assert isinstance(r[f], bool), (f, r)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group key
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
)
def test_grouped_exact_percentile_property(spark, rows, p):
    """Fuzz the bounded-histogram percentile kernel against Spark's
    built-in exact Percentile: random group sizes (incl. singletons),
    duplicated values (floats drawn from a bounded range collide
    often enough), negatives, and every common p. Bit-equality, not
    approx — the kernel exists to REPLACE the built-in at scale, so
    any ulp of divergence is a bug (NaN inputs are out of contract:
    quarantine non-finite values upstream, as mad_outliers does)."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_percentile,
    )

    df = spark.createDataFrame(rows, "k INT, v DOUBLE")
    got = {
        r["k"]: r["pct"]
        for r in grouped_exact_percentile(df, ["k"], "v", p).collect()
    }
    want = {
        r["k"]: r["pct"]
        for r in df.groupBy("k").agg(F.percentile("v", p).alias("pct")).collect()
    }
    assert got == want, (p, got, want)


def test_percentile_duplicated_straddle_regression(spark):
    """Pinned round-17 hypothesis falsifier: when both straddling ranks
    hold the SAME value (v1 == v2 == −3, frac 0.2), the pure two-sided
    weighting rounds to −3.0000000000000004 while the built-in's
    histogram lookup returns −3.0 untouched. The kernel must
    short-circuit v1 == v2 — in the single-p kernel AND each p of the
    multi-p kernel (the winsorize path)."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_percentile,
        grouped_exact_percentiles,
    )

    df = spark.createDataFrame(
        [(0, 0.0), (0, -3.0), (0, -3.0)], "k INT, v DOUBLE"
    )
    [got] = grouped_exact_percentile(df, ["k"], "v", 0.1).collect()
    [want] = df.groupBy("k").agg(F.percentile("v", 0.1).alias("pct")).collect()
    assert repr(got["pct"]) == repr(want["pct"]) == "-3.0"

    [multi] = grouped_exact_percentiles(
        df, ["k"], "v", {"p10": 0.1, "p90": 0.9}
    ).collect()
    [want90] = df.groupBy("k").agg(F.percentile("v", 0.9).alias("pct")).collect()
    assert repr(multi["p10"]) == "-3.0"
    assert repr(multi["p90"]) == repr(want90["pct"])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    ),
    st.sets(
        st.sampled_from([0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95]),
        min_size=2,
        max_size=4,
    ),
)
def test_grouped_exact_percentiles_multi_p_property(spark, rows, ps):
    """Round-18 fuzz extension: the MULTI-p kernel (the winsorize /
    decile-boundary path) against one built-in Percentile per p —
    same strategy that falsified the single-p kernel in round 17
    (duplicated values, negatives, singleton groups). Bit-equality
    per p, and computing several ps from the shared histogram must
    not perturb any single p's value."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_percentiles,
    )

    df = spark.createDataFrame(rows, "k INT, v DOUBLE")
    names = {f"p{int(p * 100):02d}": p for p in sorted(ps)}
    got = {
        r["k"]: {out: r[out] for out in names}
        for r in grouped_exact_percentiles(df, ["k"], "v", names).collect()
    }
    want = {
        r["k"]: {out: r[out] for out in names}
        for r in df.groupBy("k")
        .agg(
            *[
                F.percentile("v", F.lit(p)).alias(out)
                for out, p in names.items()
            ]
        )
        .collect()
    }
    assert got == want, (names, got, want)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=50,
    ),
    st.floats(min_value=0.05, max_value=0.95),
)
def test_ewma_fold_bit_equality_property(spark, vals, alpha):
    """Round-18 fuzz extension: the EWMA left fold — the SHARED
    queries.ewma_fold expression q_ewma ships (round-19 advice: a
    local re-declaration here would let a reassociation in q_ewma's
    own fold slip past this fuzz) — against the same IEEE operation
    sequence evaluated in pure Python: s_i = α·x_i + (1−α)·s_{i−1}
    seeded with x_0. The query's cross-engine bit-equality claim
    rests on 'identical fold, identical order'; any reassociation
    (fma-style fusion, acc + α·(x−acc)) surfaces as an ulp here."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.queries import ewma_fold

    a = alpha
    df = spark.createDataFrame([(vals,)], "xs ARRAY<DOUBLE>")
    [row] = df.select(ewma_fold(F.col("xs"), a).alias("ewma")).collect()
    want = vals[0]
    for x in vals[1:]:
        want = a * x + (1.0 - a) * want
    assert repr(row["ewma"]) == repr(want), (vals, a, row["ewma"], want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    )
)
def test_decile_boundary_assignment_property(spark, scores):
    """Round-18 fuzz extension: decile boundaries from the keyless
    multi-p kernel must be bit-equal to nine built-in Percentiles,
    and the broadcast bucket rule (count of boundaries strictly below
    the score) must agree with the same rule evaluated in Python over
    the built-in boundaries — the q_decile_lift path, with the
    duplicated-value histograms that broke round 17."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_percentiles,
    )

    df = spark.createDataFrame([(s,) for s in scores], "v DOUBLE")
    ps = {f"b{i}": i / 10 for i in range(1, 10)}
    [bounds] = grouped_exact_percentiles(df, [], "v", ps).collect()
    [want_b] = df.agg(
        *[F.percentile("v", F.lit(p)).alias(out) for out, p in ps.items()]
    ).collect()
    for out in ps:
        # + 0.0 collapses signed zero, matching the gate comparator:
        # SQL groupBy normalizes -0.0 to 0.0 in the kernel's histogram
        # key while the built-in keeps the sign — the kernel's one
        # documented divergence (IEEE-equal, so no == can observe it)
        assert repr(bounds[out] + 0.0) == repr(want_b[out] + 0.0), (
            out,
            scores,
        )
    got = [
        r["decile"]
        for r in df.crossJoin(
            F.broadcast(grouped_exact_percentiles(df, [], "v", ps))
        )
        .select(
            "v",
            sum(
                [(F.col("v") > F.col(f"b{i}")).cast("int") for i in range(1, 10)],
                F.lit(0),
            ).alias("decile"),
        )
        .orderBy("v", "decile")
        .collect()
    ]
    want = sorted(
        sum(1 for i in range(1, 10) if s > want_b[f"b{i}"]) for s in scores
    )
    assert sorted(got) == want, (scores, got, want)


# ---------------------------------------------------------------------------
# Misra-Gries reduction invariants (functions/sketches.py) — the pure
# kernel, no Spark: fuzz arbitrary batch splits, term distributions, and
# k, and check the bounds the exactness certificate relies on.
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    terms=st.lists(st.integers(min_value=0, max_value=40), max_size=300),
    k=st.integers(min_value=1, max_value=12),
    cuts=st.lists(st.integers(min_value=0, max_value=300), max_size=4),
)
def test_mg_reduce_bounds(terms, k, cuts):
    from collections import Counter

    from kafkastreams_example_spark.functions.sketches import mg_reduce

    bounds = sorted({c for c in cuts if c <= len(terms)}) + [len(terms)]
    batches, prev = [], 0
    for b in bounds:
        batches.append(Counter(terms[prev:b]))
        prev = b
    counters, d_total = mg_reduce(batches, k)
    true = Counter(terms)

    assert len(counters) <= k
    # mass conservation bound: sum of decrements <= n/(k+1)
    assert d_total <= len(terms) // (k + 1)
    for t, c in counters.items():
        assert true[t] - d_total <= c <= true[t]
    for t, c in true.items():
        if t not in counters:
            assert c <= d_total


def test_range_kernel_matches_brute_force_on_hostile_fixtures(spark):
    """functions/sliding.py under adversarial inputs the deterministic
    tests don't reach: random tie storms on t, near-total NULL columns,
    single-value entities (degenerate frames), entities of size 0-12,
    values drawn from a 3-element set (constant frames everywhere).
    Both kernel faces must equal the quadratic reference row-for-row:
    corr (with its exact degeneracy exclusion) and the six-aggregate
    stats (count/sum/mean/std exact to 1e-9, min/max exactly)."""
    import math

    from kafkastreams_example_spark.functions.sliding import (
        rolling_corr_range,
        rolling_range_stats,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(1, 3),                      # entity
                st.integers(0, 25),                     # t slot (ties!)
                st.sampled_from([None, 1.5, 2.5, 7.0]),  # value
            ),
            min_size=1,
            max_size=30,
        ),
        w=st.sampled_from([300, 1000]),
    )
    def check(rows, w):
        data = [
            (ent, i, t * 100, v) for i, (ent, t, v) in enumerate(rows)
        ]
        df = spark.createDataFrame(
            data, "ent BIGINT, eid BIGINT, t_us BIGINT, value DOUBLE"
        )
        corr = {
            r["eid"]: r["c"]
            for r in rolling_corr_range(
                df, ["ent"], "t_us", "value", w, ["eid"], out_col="c"
            ).collect()
        }
        stats = {
            r["eid"]: r
            for r in rolling_range_stats(
                df, ["ent"], "t_us", "value", w, ["eid"]
            ).collect()
        }
        assert set(stats) == {eid for _, eid, _, _ in data}
        for ent, eid, t, _ in data:
            frame = [
                (t2, v2)
                for e2, _, t2, v2 in data
                if e2 == ent and t - w <= t2 <= t and v2 is not None
            ]
            vals = [v for _, v in frame]
            g = stats[eid]
            assert g["n_frame"] == len(vals)
            if not vals:
                assert g["sum_v"] is None and g["min_v"] is None
            else:
                assert abs(g["sum_v"] - sum(vals)) < 1e-9
                assert g["min_v"] == min(vals) and g["max_v"] == max(vals)
                mu = sum(vals) / len(vals)
                assert abs(
                    g["std_v"]
                    - math.sqrt(sum((v - mu) ** 2 for v in vals) / len(vals))
                ) < 1e-9
            # corr reference with exact degeneracy exclusion
            n = len(frame)
            if n < 2 or len({t2 for t2, _ in frame}) == 1 or len(set(vals)) == 1:
                assert eid not in corr
                continue
            xs = [t2 for t2, _ in frame]
            mx, my = sum(xs) / n, sum(vals) / n
            vx = sum((x - mx) ** 2 for x in xs)
            vy = sum((v - my) ** 2 for v in vals)
            cov = sum((x - mx) * (v - my) for x, v in zip(xs, vals))
            assert eid in corr
            assert abs(corr[eid] - cov / math.sqrt(vx * vy)) < 1e-9

    check()
