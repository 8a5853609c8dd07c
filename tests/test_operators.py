"""Operator unit/property tests: dedup-family invariants (the SURVEY §5
property list) and the skew-salting equivalence."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from kafkastreams_example_spark.operators.dedup import (
    dedup_exact,
    dedup_null_passthrough,
    dedup_refresh_batch,
    dedup_windowed,
)
from kafkastreams_example_spark.operators.relational import dsum, salted_agg
from kafkastreams_example_spark.sources.tables import load_table

from conftest import SF_DIR

BASE = datetime(2024, 1, 1)

# (key_idx or None, offset_seconds) event streams; small alphabets force
# collisions so the dedup paths actually exercise
EVENTS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),
        st.integers(0, 3600),
    ),
    min_size=1,
    max_size=30,
)


def _df(spark, events):
    rows = [
        (
            i,
            None if k is None else f"k{k}",
            BASE + timedelta(seconds=off),
        )
        for i, (k, off) in enumerate(events)
    ]
    return spark.createDataFrame(rows, "row_id INT, key STRING, ts TIMESTAMP")


@settings(max_examples=12, deadline=None)
@given(EVENTS)
def test_dedup_refresh_invariants(spark, events):
    """(a) null-key rows are preserved bit-exact; (b) among survivors of
    one key, consecutive gaps exceed the threshold; (c) every input key
    with rows has ≥1 survivor."""
    df = _df(spark, events)
    out = dedup_refresh_batch(df, F.col("key"), "ts", 300.0, tiebreak=["row_id"]).collect()
    inp = df.collect()

    null_in = sorted(r["row_id"] for r in inp if r["key"] is None)
    null_out = sorted(r["row_id"] for r in out if r["key"] is None)
    assert null_in == null_out

    by_key: dict[str, list] = {}
    for r in out:
        if r["key"] is not None:
            by_key.setdefault(r["key"], []).append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: (r["ts"], r["row_id"]))
        for a, b in zip(rows, rows[1:]):
            assert (b["ts"] - a["ts"]).total_seconds() > 300.0, (key, a, b)

    keys_in = {r["key"] for r in inp if r["key"] is not None}
    assert keys_in == set(by_key)


@settings(max_examples=8, deadline=None)
@given(EVENTS)
def test_dedup_windowed_one_survivor_per_bucket(spark, events):
    df = _df(spark, events)
    out = dedup_windowed(df, "key", "ts", 600, tiebreak=["row_id"]).collect()
    seen = set()
    for r in out:
        bucket = (r["key"], int(r["ts"].timestamp() // 600))
        assert bucket not in seen
        seen.add(bucket)


def test_dedup_exact_keeps_first_by_order(spark):
    df = _df(spark, [(0, 100), (0, 50), (0, 50), (1, 10)])
    out = dedup_exact(df, ["key"], ["ts", "row_id"]).collect()
    got = {r["key"]: r["row_id"] for r in out}
    # k0: two rows tie at t=50 → row_id 1 wins; k1 trivially row 3
    assert got == {"k0": 1, "k1": 3}


def test_dedup_null_passthrough_keeps_all_nulls(spark):
    df = _df(spark, [(None, 0), (None, 0), (0, 0), (0, 1)])
    out = dedup_null_passthrough(df, F.col("key"), "ts", 600, tiebreak=["row_id"]).collect()
    assert sorted(r["row_id"] for r in out) == [0, 1, 2]


def test_dedup_clusters_deep_chain(spark):
    """Connected components must survive deep components: a 12-node
    chain (diameter 11) requires ~11 propagation rounds — without
    lineage truncation the nested plan overflows the planner."""
    from kafkastreams_example_spark.functions.dedup_approx import dedup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "id_a BIGINT, id_b BIGINT"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(chain).collect()}
    assert set(out.values()) == {100} and len(out) == 12

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a BIGINT, id_b BIGINT")
    out2 = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert out2 == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_ivf_recall_against_exact(spark):
    """IVF top-k is approximate by design; pin recall floors against
    the exact brute-force results so bucketing regressions surface.
    Round-7 measurement (all three SFs): training-free id-prefix
    codebook 0.92/0.92/1.0, k-means k=16 i3 0.88/0.88/1.0, k=16 i2
    (the ivf_topk_trained registry config) 0.84/0.88/1.0 — both modes
    now pinned at ≥0.8 (was 0.2/0.6)."""
    from kafkastreams_example_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, qids, 5).collect()
    }
    fallback = {
        (r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb, qids, 5).collect()
    }
    recall_fb = len(exact & fallback) / len(exact)
    assert recall_fb >= 0.8, f"fallback IVF recall below floor: {recall_fb}"
    cents = kmeans_centroids(emb, k=16, iters=3)
    trained = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, qids, 5, centroids=cents).collect()
    }
    recall = len(exact & trained) / len(exact)
    assert recall >= 0.8, f"k-means IVF recall below floor: {recall}"


def test_doc_chunking_matches_python_reference(spark):
    """Third-engine check for the chunker: recompute every expected
    (chunk_idx, n_tokens, md5) in plain Python from the same
    tokenization contract and compare exactly — catches off-by-one
    window/stride bugs the DuckDB oracle could share by construction."""
    import hashlib
    import re

    from kafkastreams_example_spark.queries import q_doc_chunking
    from kafkastreams_example_spark.sources.tables import load_table

    size, stride = 32, 24
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_DIR, "documents").collect()}
    expected = set()
    for doc_id, text in docs.items():
        toks = re.findall("[a-z0-9]+", text.lower())
        for start in range(0, max(len(toks), 1), stride):
            chunk = toks[start : start + size]
            if chunk:
                expected.add(
                    (doc_id, start // stride, len(chunk),
                     hashlib.md5(" ".join(chunk).encode()).hexdigest())
                )
    got = {
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_hash"])
        for r in q_doc_chunking(spark, SF_DIR).collect()
    }
    assert got == expected


def test_udf_registration_and_entropy(spark):
    """UDF surface: SQL-registered pandas UDFs compute on Arrow
    batches; entropy sanity: uniform bytes > repeated byte."""
    from kafkastreams_example_spark.functions.udf import register_udfs

    register_udfs(spark)
    row = spark.sql(
        "SELECT byte_entropy('aaaa') AS low, byte_entropy('abcd') AS high, "
        "normalize_text('  A   b  ') AS norm"
    ).collect()[0]
    assert row["low"] == 0.0
    assert row["high"] == 2.0
    assert row["norm"] == "a b"


def test_salted_agg_matches_plain(spark):
    orders = load_table(spark, SF_DIR, "orders")
    # decimal addends so the two-phase sum/avg are exact (a double
    # partial sum would re-introduce order dependence at the merge step)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    plain = {
        r["o_orderstatus"]: (r["n"], r["total"], r["lo"], r["hi"], r["mean"])
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.count("o_orderkey").alias("n"),
            F.sum(dec).alias("total"),
            F.min(dec).alias("lo"),
            F.max(dec).alias("hi"),
            (F.sum(dec).cast("double") / F.count(dec)).alias("mean"),
        )
        .collect()
    }
    salted = {
        r["o_orderstatus"]: (r["n"], r["total"], r["lo"], r["hi"], r["mean"])
        for r in salted_agg(
            orders,
            ["o_orderstatus"],
            {
                "n": ("count", "o_orderkey"),
                "total": ("sum", dec),
                "lo": ("min", dec),
                "hi": ("max", dec),
                "mean": ("avg", dec),
            },
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_unknown_kind(spark):
    import pytest

    orders = load_table(spark, SF_DIR, "orders")
    with pytest.raises(ValueError, match="unsupported aggregate kind"):
        salted_agg(orders, ["o_orderstatus"], {"xs": ("collect_list", "o_orderkey")})


def test_symdelete_fuzzy_pairs_exact_recall(spark):
    """Symmetric-delete blocking must find EVERY pair within ed<=2 —
    including insert/delete shifts and pairs whose first AND last
    characters both differ (the classes prefix/suffix blocking misses).
    Ground truth: brute-force Python Levenshtein over all pairs."""
    from kafkastreams_example_spark.functions.dedup_approx import symdelete_fuzzy_pairs

    names = [
        "alpha", "alpXa", "aXphY",      # subs at interior + both-ends-ish
        "Xlpha", "alphX",               # first-char-only / last-char-only subs
        "alph", "alphaZZ",              # deletion, double insertion
        "lphaa",                        # shift: delete front, insert back
        "beta", "betta", "bet", "abetX",  # insertions/deletions with shifts
        "gamma", "delta",               # far from everything else
        "", "a", "ab",                  # degenerate shorts
    ]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    truth = {
        (i, j, lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 2
    }
    df = spark.createDataFrame(list(enumerate(names)), "id BIGINT, name STRING")
    got = {
        (r["id_a"], r["id_b"], r["edit_dist"])
        for r in symdelete_fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    }
    assert got == truth


def test_decode_media_meta_parses_real_image_headers(spark):
    """decoder='real' must read true dimensions from genuine container
    header bytes — PNG IHDR (big-endian), GIF logical screen
    (little-endian), JPEG SOF0 behind APP0/DQT segments, BMP info
    header — and degrade to (NULL, NULL, 'unknown') on non-images."""
    import struct
    import zlib

    from kafkastreams_example_spark.functions.multimodal import decode_media_meta

    def png(w, h):
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk))
        )

    def jpeg(w, h):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
        return b"\xff\xd8" + app0 + dqt + sof0
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    bmp = b"BM" + struct.pack("<IHHI", 126, 0, 0, 26) + struct.pack("<IiiHH", 40, 12, -34, 1, 24)
    rows = [
        (0, png(640, 481)), (1, gif), (2, jpeg(123, 456)), (3, bmp),
        (4, b"plain text, not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["format"], r["byte_len"])
        for r in decode_media_meta(df, decoder="real").collect()
    }
    assert got[0] == (640, 481, "png", len(png(640, 481)))
    assert got[1] == (320, 200, "gif", len(gif))
    assert got[2] == (123, 456, "jpeg", len(jpeg(123, 456)))
    assert got[3] == (12, 34, "bmp", len(bmp))  # |negative height| = top-down rows
    assert got[4] == (None, None, "unknown", 24)


def test_decode_audio_meta_parses_real_audio_headers(spark):
    """parse_audio_header must chunk-walk a genuine RIFF/WAVE header
    (including a non-canonical chunk order with a LIST chunk before
    fmt), bit-unpack FLAC STREAMINFO incl. the 36-bit total-samples
    duration, page-walk Ogg (Vorbis id header + last-page granule;
    Opus 48 kHz clock minus pre-skip), frame-walk MP3 (ID3v2 skip +
    Layer-III bitrate/samplerate tables), and degrade to 'unknown'
    otherwise — including a FLAC whose first metadata block is NOT
    STREAMINFO (r7 ADVICE: block-type bits must be checked)."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import decode_audio_meta

    def wav(sr, ch, bits, n_samples, extra_chunk=False):
        ba = ch * bits // 8
        ds = n_samples * ba
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ba, ba, bits)
        data = b"data" + struct.pack("<I", ds)
        lst = b"LIST" + struct.pack("<I", 4) + b"INFO" if extra_chunk else b""
        body = lst + fmt + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    def flac(sr, ch, bits, total_samples=0, block_type=0):
        streaminfo = (
            struct.pack(">HH", 4096, 4096)  # min/max blocksize
            + b"\x00\x00\x00" * 2  # min/max framesize (u24 each)
            + bytes(
                [
                    (sr >> 12) & 0xFF,
                    (sr >> 4) & 0xFF,
                    ((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4),
                    (((bits - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF),
                ]
            )
            + struct.pack(">I", total_samples & 0xFFFFFFFF)
            + b"\x00" * 12  # md5 tail (truncated is fine for the parser)
        )
        return b"fLaC" + bytes([0x80 | block_type, 0, 0, 34]) + streaminfo

    def ogg_page(granule, body, bos=False, eos=False):
        htype = (0x02 if bos else 0) | (0x04 if eos else 0)
        return (
            b"OggS\x00"
            + bytes([htype])
            + struct.pack("<q", granule)
            + b"\x00" * 12  # serial + seq + crc
            + bytes([1, len(body)])
            + body
        )

    vorbis_id = b"\x01vorbis" + b"\x00" * 4 + bytes([2]) + struct.pack("<I", 44100) + b"\x00" * 14
    opus_id = b"OpusHead\x01" + bytes([1]) + struct.pack("<H", 312) + struct.pack("<I", 48000)

    def mp3_frames(k, byte2, byte3):
        # byte2 packs bitrate/samplerate idx; frame length from tables
        hdr = bytes([0xFF, 0xFB, byte2, byte3])
        kbps = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)[byte2 >> 4]
        sr = (44100, 48000, 32000)[(byte2 >> 2) & 0x3]
        flen = 144 * kbps * 1000 // sr
        return (hdr + b"\x00" * (flen - 4)) * k

    rows = [
        (0, wav(16000, 2, 16, 1600)),            # canonical: 100 ms stereo
        (1, wav(8000, 1, 16, 12000, True)),      # LIST chunk first: 1500 ms mono
        (2, flac(44100, 2, 16)),                 # 0 total samples = unknown dur
        (3, b"OggS\x00\x02" + b"\x00" * 20),     # truncated: recognition only
        (4, b"ID3\x04\x00" + b"\x00" * 10),      # tag only, no frames
        (5, b"\xff\xfb\x90\x00" + b"\x00" * 10),  # one (truncated) frame
        (6, b"definitely not audio bytes"),
        (7, flac(32000, 1, 24, total_samples=48000)),   # 1500 ms mono
        (8, flac(44100, 2, 16, total_samples=44100, block_type=4)),  # bad 1st block
        (9, ogg_page(0, vorbis_id, bos=True) + ogg_page(22050, b"\x00", eos=True)),
        (10, ogg_page(0, opus_id, bos=True) + ogg_page(48312, b"\x00", eos=True)),
        (11, b"ID3\x04\x00\x00" + b"\x00\x00\x00\x14" + b"\x00" * 20
             + mp3_frames(3, 0x90, 0x00)),       # 20-byte tag + 3 stereo frames
        (12, mp3_frames(2, 0x98, 0xC0)),         # 32 kHz mono, 2 frames
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {
        r["doc_id"]: (
            r["sample_rate"], r["channels"], r["bits"], r["duration_ms"], r["format"]
        )
        for r in decode_audio_meta(df).collect()
    }
    assert got[0] == (16000, 2, 16, 100, "wav")
    assert got[1] == (8000, 1, 16, 1500, "wav")
    assert got[2] == (44100, 2, 16, None, "flac")
    assert got[3] == (None, None, None, None, "ogg")
    assert got[4] == (None, None, None, None, "mp3")
    assert got[5] == (44100, 2, None, 1152 * 1000 // 44100, "mp3")
    assert got[6] == (None, None, None, None, "unknown")
    assert got[7] == (32000, 1, 24, 1500, "flac")
    assert got[8] == (None, None, None, None, "unknown")
    assert got[9] == (44100, 2, None, 500, "ogg")
    assert got[10] == (48000, 1, None, 1000, "ogg")  # granule minus pre-skip
    assert got[11] == (44100, 2, None, 3 * 1152 * 1000 // 44100, "mp3")
    assert got[12] == (32000, 1, None, 2 * 1152 * 1000 // 32000, "mp3")


def test_dedup_clusters_fixed_iteration_mode(spark, monkeypatch):
    """probe_convergence=False must produce the same components with
    zero count() probes (the kmeans-style fixed-iteration contract);
    a 6-node chain needs ceil(log2(diameter+1)) = 3 doubling rounds."""
    from pyspark.sql import DataFrame

    from kafkastreams_example_spark.functions.dedup_approx import dedup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)] + [(10, 11)], "id_a BIGINT, id_b BIGINT"
    )
    want = sorted(
        tuple(r) for r in dedup_clusters(chain, max_iterations=8).collect()
    )

    def _boom(self, *a, **k):
        raise AssertionError("fixed-iteration mode ran a driver-side count probe")

    monkeypatch.setattr(DataFrame, "count", _boom)
    got_df = dedup_clusters(chain, max_iterations=8, probe_convergence=False)
    monkeypatch.undo()
    assert sorted(tuple(r) for r in got_df.collect()) == want
    assert want[0][1] == 0 and want[-1][1] == 10  # two components, min-labeled
    """D≤k('') must be exactly {''} — the unguarded sequence(1, 0)
    construction only worked through descending-sequence and
    negative-length-substring edge behavior (round-3 advice)."""
    from kafkastreams_example_spark.functions.dedup_approx import deletion_neighborhood

    df = spark.createDataFrame([("",), ("ab",)], "s STRING")
    rows = {r["s"]: r["d"] for r in df.select(
        "s", deletion_neighborhood("s", 2).alias("d")).collect()}
    assert rows[""] == [""]
    assert set(rows["ab"]) == {"ab", "a", "b", ""}


def test_dedup_incremental_detects_known_dup_and_keeps_novel(spark):
    """Incremental LSH dedup semantics on a constructed corpus: a batch
    doc that is a verbatim copy of a corpus doc must be dropped, a doc
    with disjoint vocabulary must survive."""
    from kafkastreams_example_spark.functions.dedup_approx import (
        minhash_bands,
        minhash_signatures,
    )

    corpus_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, corpus_text),            # corpus
        (3, "completely different words about spark shuffles and parquet"),
        (10, corpus_text),           # batch: exact copy -> must be dropped
        (20, "zanzibar quokka vortex umbra glyph nimbus"),  # batch: novel
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batch = minhash_bands(minhash_signatures(docs.filter(F.col("doc_id") % 10 == 0)))
    corpus = minhash_bands(minhash_signatures(docs.filter(F.col("doc_id") % 10 != 0)))
    hits = (
        batch.withColumnRenamed("doc_id", "batch_id")
        .join(corpus, ["band", "bh"])
        .select(F.col("batch_id").alias("doc_id"))
        .distinct()
    )
    survivors = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id")
        .join(hits, "doc_id", "left_anti")
        .collect()
    }
    assert survivors == {20}


def test_dedup_incremental_plan_broadcasts_batch_side(spark):
    """The asymmetric join must broadcast the (small) batch band table —
    at scale the corpus is streamed past it, never self-joined."""
    from kafkastreams_example_spark.plans.explain import plan_string
    from kafkastreams_example_spark.queries import q_dedup_incremental

    plan = plan_string(q_dedup_incremental(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_duplicated_ngram_stats_known_overlap(spark):
    """doc 1 and 2 share one 8-token span (each contributes one dup
    8-gram); doc 3 is unique; doc 4 is too short to have any 8-gram."""
    from kafkastreams_example_spark.functions.text import duplicated_ngram_stats

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, shared + " india"),                # 2 8-grams, 1 duplicated
        (2, "juliet " + shared),               # 2 8-grams, 1 duplicated
        (3, "kilo lima mike november oscar papa quebec romeo sierra"),
        (4, "tango uniform"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in duplicated_ngram_stats(docs, n=8).collect()}
    assert (got[1].n_ngrams, got[1].n_dup_ngrams) == (2, 1)
    assert (got[2].n_ngrams, got[2].n_dup_ngrams) == (2, 1)
    assert (got[3].n_ngrams, got[3].n_dup_ngrams) == (2, 0)
    assert (got[4].n_ngrams, got[4].n_dup_ngrams, got[4].dup_fraction) == (0, 0, 0.0)
    assert abs(got[1].dup_fraction - 0.5) < 1e-12


def test_bpe_pair_counts_hand_counted(spark):
    from kafkastreams_example_spark.functions.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "abc ab x"), (2, "abc")], "doc_id long, text string"
    )
    # tokens: abc, ab, x, abc -> pairs: ab(x3: abc,abc,ab), bc(x2)
    got = {(r.pair, r.cnt) for r in bpe_pair_counts(docs).collect()}
    assert got == {("ab", 3), ("bc", 2)}


def test_sequence_pack_bin_assignment_matches_exclusive_cumsum(spark):
    """Recompute the greedy stream-packing invariant row-by-row: within
    each shard (md5 order) bin == exclusive-prefix-sum // budget, bins
    are non-decreasing, and no bin is left under-filled while a later
    bin exists (greedy property)."""
    from kafkastreams_example_spark.queries import q_sequence_pack

    rows = q_sequence_pack(spark, SF_DIR).collect()
    import hashlib

    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 8
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: hashlib.md5(str(r.doc_id).encode()).hexdigest())
        cum = 0
        prev_bin = 0
        for r in rs:
            assert r.seq_bin == cum // 256
            assert r.seq_bin >= prev_bin
            prev_bin = r.seq_bin
            cum += r.n_tokens


def test_salted_join_matches_plain(spark):
    from kafkastreams_example_spark.operators.relational import salted_join

    cust = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    salted = salted_join(orders, cust, "custkey", salt_buckets=4, salt_source="o_orderkey")
    plain = orders.join(cust, "custkey")
    cols = ["custkey", "o_orderkey", "c_mktsegment"]
    assert sorted(map(tuple, salted.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_value_histogram_degenerate_single_value(spark):
    """All-equal values must land in bin 0 (no division by the zero
    range) — in BOTH engines, per the oracle's CASE guard."""
    from kafkastreams_example_spark.queries import q_value_histogram
    import kafkastreams_example_spark.queries as Q

    # run the same logic on a constant-value frame via monkeypatched load
    const = spark.createDataFrame(
        [(i, 7.5) for i in range(5)], "event_id BIGINT, value DOUBLE"
    )
    orig = Q.load_table
    try:
        Q.load_table = lambda s, d, t: const
        rows = q_value_histogram(spark, SF_DIR).collect()
    finally:
        Q.load_table = orig
    assert [(r.bin, r.cnt) for r in rows] == [(0, 5)]


def test_bucketed_pairs_tiny_and_sparse_corpora(spark):
    """Review regression (r7): when the B-codebook id block [c1, c1+c2)
    matches nothing (tiny corpus, or ids not dense from 0), assignment
    must degrade to A-only bucketing — never silently drop the corpus.
    A 4-row corpus with a bit-identical duplicate must still pair."""
    from kafkastreams_example_spark.functions.similarity import bucketed_cosine_pairs

    vec = [1.0, 0.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    tiny = spark.createDataFrame(
        [(0, vec), (1, other), (2, vec), (3, [0.0, 0.0, 1.0, 0.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in bucketed_cosine_pairs(tiny, threshold=0.99, n_centroids=None).collect()
    }
    assert (0, 2) in pairs

    sparse = spark.createDataFrame(
        [(1000, vec), (1001, other), (1002, vec)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    # codebook blocks anchor at min(id) (r8): even with no id < c1 the
    # A codebook is non-empty and the bit-identical duplicates MUST
    # still pair — the silent-drop failure mode is structurally gone
    sparse_pairs = {
        (r["id_a"], r["id_b"])
        for r in bucketed_cosine_pairs(sparse, threshold=0.99, n_centroids=None).collect()
    }
    assert (1000, 1002) in sparse_pairs


def test_trained_pq_recall_floor_on_adversarial_ingest_order(spark):
    """r7 verdict #3: prefix codebooks make PQ-dedup recall hinge on
    ingest order. Adversarial corpus: the first c1+c2 = 8 ids are
    near-identical clones (degenerate prefix codebooks — every cell
    scores alike, so near-dups land in noise-decided buckets), then 40
    three-member near-dup clusters. The TRAINED subspace codebooks
    must recover ≥0.9 recall vs the exact all-pairs kernel and beat
    the prefix codebooks on the same corpus (measured 0.986 vs 0.797;
    fully deterministic — fixed seed, fixed tie-breaks)."""
    import numpy as np

    from kafkastreams_example_spark.functions.similarity import (
        bucketed_cosine_pairs,
        cosine_pairs,
    )

    rng = np.random.default_rng(7)
    anchor = rng.normal(size=8)
    anchor /= np.linalg.norm(anchor)
    rows = [(i, (anchor + rng.normal(scale=1e-3, size=8)).tolist()) for i in range(8)]
    vid = 8
    for _ in range(40):
        center = rng.normal(size=8)
        center /= np.linalg.norm(center)
        for _ in range(3):
            rows.append((vid, (center + rng.normal(scale=0.02, size=8)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    exact = {(r["id_a"], r["id_b"]) for r in cosine_pairs(df, 0.95).collect()}
    recall = {}
    for cb in ("prefix", "trained"):
        got = {
            (r["id_a"], r["id_b"])
            for r in bucketed_cosine_pairs(
                df, threshold=0.95, grid=(4, 4), n_probe=2, codebook=cb
            ).collect()
        }
        assert got <= exact  # bucketed pairs are always a subset of exact
        recall[cb] = len(got & exact) / len(exact)
    assert recall["trained"] >= 0.9, recall
    assert recall["trained"] > recall["prefix"], recall


def test_knn_screened_agreement(spark):
    """r8 verdict #1: the PQ-screened kNN label eval must agree with the
    brute-force ground truth. On a corpus whose embeddings genuinely
    cluster by label (20 clusters × 10 members, noise σ=0.05, 10 labels
    — the regime the probe exists to detect), the exact path must score
    near-perfect and the screened path must stay within 0.1 accuracy of
    it: cluster members co-bucket under the PQ grid, so screening keeps
    the informative neighbors. Fully deterministic (fixed seed)."""
    import numpy as np

    from kafkastreams_example_spark.functions.similarity import knn_label_report

    rng = np.random.default_rng(11)
    rows, vid = [], 0
    for c in range(20):
        center = rng.normal(size=8)
        center /= np.linalg.norm(center)
        for _ in range(10):
            v = center + rng.normal(scale=0.05, size=8)
            rows.append((vid, c % 10, v.tolist()))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id BIGINT, label INT, embedding ARRAY<DOUBLE>")

    def overall(df):
        r = df.collect()
        n = sum(x["n_queries"] for x in r)
        return sum(x["n_correct"] for x in r) / n

    acc_exact = overall(knn_label_report(emb, screened=False))
    acc_screened = overall(knn_label_report(emb, screened=True, grid=(4, 4)))
    assert acc_exact >= 0.9, acc_exact
    assert acc_screened >= acc_exact - 0.1, (acc_screened, acc_exact)


def test_decode_audio_meta_garbage_wav_degrades(spark):
    """A payload with valid RIFF/WAVE magic but garbage fmt fields
    (unsigned sample_rate overflowing signed INT) must degrade to
    'unknown', never crash the Arrow batch."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import decode_audio_meta

    garbage = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + b"\xff" * 16  # audio_format/channels/sample_rate/... all 0xFF
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    df = spark.createDataFrame([(0, garbage)], "doc_id BIGINT, payload BINARY")
    got = decode_audio_meta(df).collect()[0]
    assert got["format"] == "unknown" and got["sample_rate"] is None


def test_parse_video_header_walks_mp4_box_tree():
    """parse_video_header must read mvhd v0 AND v1 timescale/duration,
    count tracks, skip zero-dimension (audio) tkhd boxes when picking
    the presentation size, and degrade malformed boxes instead of
    crashing: a size-0 box ends the walk, truncated mvhd yields None,
    and a non-ftyp payload is not video."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import parse_video_header

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    def mvhd_v0(ts, du):
        return box(
            b"mvhd",
            bytes(4) + bytes(8) + struct.pack(">II", ts, du)
            + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10) + bytes(36) + bytes(24) + struct.pack(">I", 2),
        )

    def mvhd_v1(ts, du):
        return box(
            b"mvhd",
            b"\x01\x00\x00\x00" + bytes(16) + struct.pack(">I", ts)
            + struct.pack(">Q", du) + bytes(80),
        )

    def trak(tid, w, h):
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07" + bytes(8) + struct.pack(">I", tid) + bytes(4)
            + struct.pack(">I", 1000) + bytes(16) + bytes(36)
            + struct.pack(">II", w << 16, h << 16),
        )
        return box(b"trak", tkhd)

    ftyp = box(b"ftyp", b"isom" + bytes(4))

    m = parse_video_header(
        ftyp + box(b"moov", mvhd_v0(1000, 45000) + trak(1, 0, 0) + trak(2, 640, 480))
    )
    assert m == {
        "timescale": 1000, "duration_ms": 45000, "n_tracks": 2,
        "width": 640, "height": 480, "format": "mp4",
    }

    m1 = parse_video_header(ftyp + box(b"moov", mvhd_v1(600, 1234567) + trak(1, 1920, 1080)))
    assert (m1["timescale"], m1["duration_ms"], m1["width"]) == (600, 1234567 * 1000 // 600, 1920)

    assert parse_video_header(b"not a video!") is None
    assert parse_video_header(ftyp + box(b"moov", trak(1, 640, 480))) is None  # no mvhd
    # size-0 box must end the walk, not loop forever / crash
    assert parse_video_header(ftyp + b"\x00\x00\x00\x00moov") is None
    # truncated mvhd (declared but bytes missing) degrades
    assert (
        parse_video_header(ftyp + box(b"moov", box(b"mvhd", bytes(4)))) is None
    )


def test_bpe_train_merges_stops_when_vocabulary_exhausts(spark, tmp_path):
    """A corpus whose words reduce to single symbols before the 4
    scheduled rounds must END training early with only the real merges
    — never fabricate NULL merge rows from min() over an empty pair
    frame (the oracle's LIMIT-1-over-empty emits nothing, so a
    fabricated row would diverge the engines on row count)."""
    from kafkastreams_example_spark.queries import REGISTRY

    # all words are "ab": round 1 merges (a,b) with weight 6, round 2
    # finds no adjacent pairs (every word is the single symbol "ab")
    docs = spark.createDataFrame(
        [(i, "ab ab", "en", "s", 5) for i in range(3)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = REGISTRY["bpe_train_merges"].fn(spark, str(tmp_path)).collect()
    assert [(r["merge_rank"], r["left_sym"], r["right_sym"], r["weight"]) for r in rows] == [
        (1, "a", "b", 6)
    ]

    # fully degenerate: single-character words only -> zero merges
    docs1 = spark.createDataFrame(
        [(i, "a b c", "en", "s", 5) for i in range(2)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    d1 = tmp_path / "one"
    d1.mkdir()
    docs1.write.parquet(str(d1 / "documents.parquet"))
    assert REGISTRY["bpe_train_merges"].fn(spark, str(d1)).count() == 0


def test_bucketed_assign_zero_embedding_is_safe_and_deterministic(spark):
    """An all-zero embedding must not kill the job (under ANSI mode
    x/0.0 RAISES in Spark; DuckDB yields NULL — either way a single
    junk vector in a 100 TB corpus would poison the dedup). The
    zero-vector rule: it normalizes to the zero vector, scoring dot 0
    against every cell and ranking purely by tie-break — identically in
    both engines. Pins: no exception, every vector assigned, assignment
    bit-stable across evaluations, and the zero vector itself lands in
    the tie-break cell (a_id 0)."""
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.functions.similarity import bucketed_assign

    rows = [(0, [0.0, 0.0, 0.0, 0.0])] + [
        (i, [float(i), 1.0, 0.0, float(i % 3)]) for i in range(1, 12)
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    def snapshot():
        return sorted(
            (r["id"], r["bucket"])
            for r in bucketed_assign(emb, grid=(3, 2), n_probe=2).collect()
        )

    first = snapshot()
    assert {i for i, _ in first} == set(range(12))
    assert first == snapshot()
    # the zero vector's dots are all 0 -> every cell ties -> (o, cell)
    # sort gives cell 0 first; c2=2 so its best bucket is in {0, 1}
    zero_buckets = {b for i, b in first if i == 0}
    assert min(zero_buckets) // 2 == 0, zero_buckets


def test_media_parsers_handle_realworld_container_shapes():
    """Round-8 review fixes, each pinned: (1) v1 tkhd widens times by
    12 bytes — width must read at payload offset 88, not decode matrix
    bytes; (2) size==1 largesize boxes (>4 GiB mdat) and size==0
    (to-EOF) are spec-legal, so a non-faststart file's trailing moov
    must still be reached; (3) an ID3v2.4 footer adds 10 bytes before
    the first MP3 frame; (4) a multiplexed Ogg (.ogv) carries several
    granule clocks — duration must come from the AUDIO stream's serial
    only."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import (
        parse_audio_header,
        parse_video_header,
    )

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    def mvhd(ts, du):
        return box(b"mvhd", bytes(12) + struct.pack(">II", ts, du) + bytes(80))

    ftyp = box(b"ftyp", b"isom" + bytes(4))

    # (1) version-1 tkhd: +12 bytes of 64-bit times before the matrix
    tkhd_v1 = box(
        b"tkhd",
        b"\x01\x00\x00\x07" + bytes(16) + struct.pack(">I", 1) + bytes(4)
        + struct.pack(">Q", 1000) + bytes(16) + bytes(36)
        + struct.pack(">II", 1280 << 16, 720 << 16),
    )
    m = parse_video_header(ftyp + box(b"moov", mvhd(1000, 5000) + box(b"trak", tkhd_v1)))
    assert (m["width"], m["height"]) == (1280, 720), m

    # (2) largesize mdat before moov: size field 1 + 64-bit size
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16) + bytes(0)
    tkhd_v0 = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + bytes(8) + struct.pack(">I", 1) + bytes(4)
        + struct.pack(">I", 1000) + bytes(16) + bytes(36)
        + struct.pack(">II", 640 << 16, 480 << 16),
    )
    m2 = parse_video_header(ftyp + mdat + box(b"moov", mvhd(600, 1200) + box(b"trak", tkhd_v0)))
    assert (m2["timescale"], m2["width"]) == (600, 640), m2

    # (3) ID3v2.4 footer flag: frames start 10 bytes later
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)  # 128k @ 44100
    id3_body = bytes(20)
    id3 = b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, len(id3_body)]) + id3_body
    mp3 = id3 + b"3DI" + bytes(7) + frame * 2
    m3 = parse_audio_header(mp3)
    assert m3 and m3["format"] == "mp3" and m3["sample_rate"] == 44100, m3
    assert m3["duration_ms"] == 2 * 1152 * 1000 // 44100, m3

    # (4) multiplexed ogg: a video stream's huge granules must not
    # leak into the audio duration
    def page(serial, granule, body, typ):
        return (
            b"OggS" + bytes([0, typ]) + struct.pack("<q", granule)
            + struct.pack("<I", serial) + bytes(8)
            + bytes([1, len(body)]) + body
        )

    vorbis_id = b"\x01vorbis" + bytes(4) + bytes([2]) + struct.pack("<I", 44100) + bytes(13)
    ogv = (
        page(7, 0, vorbis_id, 2)                      # audio BOS
        + page(9, 1 << 40, b"\x00", 0)                # video stream page
        + page(7, 44100 * 3, b"\x00", 4)              # audio EOS
    )
    m4 = parse_audio_header(ogv)
    assert m4 and m4["duration_ms"] == 3000, m4


def test_parse_wav_pcm_reads_samples_and_degrades():
    """parse_wav_pcm must decode real int16 PCM from the data chunk,
    clamp to the bytes actually present when the declared data size
    overruns (a truncated upload — the common 100 TB ingest wart), and
    degrade to None for non-PCM/non-16-bit/garbage payloads instead of
    crashing the Arrow batch."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import parse_wav_pcm

    def wav(samples, declared=None, fmt_tag=1, bits=16):
        data = b"".join(struct.pack("<h", s) for s in samples)
        ds = len(data) if declared is None else declared
        return (
            b"RIFF" + struct.pack("<I", 36 + ds) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt_tag, 1, 16000, 32000, 2, bits)
            + b"data" + struct.pack("<I", ds) + data
        )

    m = parse_wav_pcm(wav([100, -200, 300]))
    assert m == {"n_samples": 3, "s_min": -200, "s_max": 300, "s_mean": round(200 / 3, 6)}
    # declared size overruns the payload: stats over what's present
    m = parse_wav_pcm(wav([5, -5], declared=1000))
    assert m["n_samples"] == 2 and m["s_min"] == -5 and m["s_max"] == 5
    # empty data chunk: zero count, NULL stats
    assert parse_wav_pcm(wav([]))["n_samples"] == 0
    # non-PCM format tag, 8-bit depth, and garbage all degrade to None
    assert parse_wav_pcm(wav([1], fmt_tag=3)) is None
    assert parse_wav_pcm(wav([1], bits=8)) is None
    assert parse_wav_pcm(b"not audio") is None


def test_parse_bmp_pixels_layout_sensitivity():
    """parse_bmp_pixels must honor the BMP pixel layout: bottom-up row
    order for positive heights, top-down for negative, 4-byte row
    stride padding, and B-G-R channel order — pinned via the
    order-sensitive wsum checksum; compressed/low-bpp/garbage payloads
    degrade to None and truncated pixel data to the rows present."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import parse_bmp_pixels

    def bmp(w, h, rows_file_order, bpp=24, compression=0):
        stride = (w * 3 + 3) // 4 * 4
        body = b"".join(
            bytes(row) + b"\x00" * (stride - 3 * w) for row in rows_file_order
        )
        return (
            b"BM" + struct.pack("<I", 54 + len(body)) + b"\x00" * 4
            + struct.pack("<I", 54)
            + struct.pack("<IiiHHII", 40, w, h, 1, bpp, compression, len(body))
            + b"\x00" * 16 + body
        )

    # 2x2, image rows: y=0 -> pixels (b,g,r) (1,2,3)(4,5,6); y=1 -> (7,8,9)(10,11,12)
    top = [1, 2, 3, 4, 5, 6]
    bot = [7, 8, 9, 10, 11, 12]
    expected_wsum = (
        1 * (1 + 2 + 3) + 2 * (4 + 5 + 6) + 3 * (7 + 8 + 9) + 4 * (10 + 11 + 12)
    )
    # bottom-up (h > 0): file stores y=1 row first
    m_up = parse_bmp_pixels(bmp(2, 2, [bot, top]))
    # top-down (h < 0): file stores y=0 row first
    m_down = parse_bmp_pixels(bmp(2, -2, [top, bot]))
    assert m_up["wsum"] == m_down["wsum"] == expected_wsum
    assert m_up["n_px"] == 4 and m_up["mean_g"] == round((2 + 5 + 8 + 11) / 4, 6)
    # ROW-SWAPPED bottom-up file must CHANGE wsum (layout sensitivity)
    assert parse_bmp_pixels(bmp(2, 2, [top, bot]))["wsum"] != expected_wsum
    # truncation: only the first file row survives
    full = bmp(2, 2, [bot, top])
    m_tr = parse_bmp_pixels(full[: 54 + 8])
    assert m_tr["n_px"] == 2 and m_tr["wsum"] == 3 * (7 + 8 + 9) + 4 * (10 + 11 + 12)
    # degrade cases
    assert parse_bmp_pixels(bmp(2, 2, [bot, top], bpp=8)) is None
    assert parse_bmp_pixels(bmp(2, 2, [bot, top], compression=1)) is None
    assert parse_bmp_pixels(b"not a bitmap") is None


def test_simhash_manku_matches_band_pairs_with_fewer_random_candidates(spark):
    """The Manku multi-block banding must (a) emit EXACTLY the same
    pairs as the 4x15 banding — both are pigeonhole-exact for
    hamming ≤ 3 — and (b) generate far fewer RANDOM candidates on a
    corpus with no true near-dups: 30-bit keys collide ~n²/2³⁰ per
    table vs 15-bit bands' ~n²/2¹⁵ (the saturation that goes quadratic
    at corpus scale). Candidate mass is measured by mirroring each
    scheme's keying and summing C(bucket, 2)."""
    import itertools

    import numpy as np

    from kafkastreams_example_spark.functions.dedup_approx import (
        simhash_band_pairs,
        simhash_manku_pairs,
    )

    rng = np.random.default_rng(31)
    fps = [(i, int(rng.integers(0, 1 << 60))) for i in range(3000)]
    fp = spark.createDataFrame(fps, "doc_id BIGINT, simhash BIGINT")

    got_band = {(r["id_a"], r["id_b"]) for r in simhash_band_pairs(fp).collect()}
    got_manku = {(r["id_a"], r["id_b"]) for r in simhash_manku_pairs(fp).collect()}
    assert got_band == got_manku

    def cands(keys_per_doc):
        from collections import Counter

        c = Counter()
        for _, h in fps:
            for key in keys_per_doc(h):
                c[key] += 1
        return sum(v * (v - 1) // 2 for v in c.values())

    band_c = cands(lambda h: [(b, (h >> (b * 15)) & 0x7FFF) for b in range(4)])
    combos = list(itertools.combinations(range(6), 3))

    def manku_keys(h):
        out = []
        for i, combo in enumerate(combos):
            k = 0
            for b in combo:
                k = (k << 10) | ((h >> (b * 10)) & 0x3FF)
            out.append((i, k))
        return out

    manku_c = cands(manku_keys)
    assert band_c > 100, band_c  # the 15-bit space genuinely saturates
    assert manku_c <= band_c // 10, (manku_c, band_c)


def test_simhash_pairs_default_is_manku_banding(spark):
    """Round-10 pin: the registry DEFAULT simhash_pairs must compile to
    the Manku multi-block plan (20 C(6,3) key tables — the n²/2³⁰
    candidate class), not the demoted 4×15 banding (n²/2¹⁵). Checked
    structurally: the analyzed plan carries the 20-way table explode
    ('tbl' key-table column), which the 4-band plan does not; the
    contrast entry must still be the band form."""
    from kafkastreams_example_spark.queries import REGISTRY

    default_plan = str(
        REGISTRY["simhash_pairs"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .analyzed()
    )
    contrast_plan = str(
        REGISTRY["simhash_pairs_4band"]
        .fn(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .analyzed()
    )
    assert "tbl" in default_plan
    assert "tbl" not in contrast_plan and "band" in contrast_plan


def test_resize_bmp_nn_samples_correct_sources():
    """Nearest-neighbor resize must sample source (2x, 2y) in RASTER
    coordinates: a 4x4 image downsampled 2x keeps exactly pixels
    (0,0),(2,0),(0,2),(2,2) — verified per channel against a
    hand-built bottom-up BMP, plus top-down equivalence and the
    whole-image-or-nothing truncation contract."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import resize_bmp_nn

    w = h = 4
    # pixel (x, y) channels: b = 10*y + x, g = b + 100, r = b + 200
    def px(x, y):
        return bytes([10 * y + x, 10 * y + x + 100, 10 * y + x + 200])

    def bmp(rows_file_order, hh):
        body = b"".join(b"".join(r) for r in rows_file_order)  # stride 12, no pad
        return (
            b"BM" + struct.pack("<I", 54 + len(body)) + b"\x00" * 4
            + struct.pack("<I", 54)
            + struct.pack("<IiiHHII", 40, w, hh, 1, 24, 0, len(body))
            + b"\x00" * 16 + body
        )

    raster = [[px(x, y) for x in range(w)] for y in range(h)]
    up = bmp(list(reversed(raster)), h)       # bottom-up storage
    down = bmp(raster, -h)                    # top-down storage
    m_up, m_down = resize_bmp_nn(up), resize_bmp_nn(down)
    assert m_up == m_down
    assert (m_up["out_w"], m_up["out_h"], m_up["n_px"]) == (2, 2, 4)
    # kept sources: (0,0)=0, (2,0)=2, (0,2)=20, (2,2)=22  (b channel)
    assert m_up["mean_b"] == round((0 + 2 + 20 + 22) / 4, 6)
    assert m_up["mean_g"] == round((0 + 2 + 20 + 22) / 4 + 100, 6)
    # wsum with weights 1..4 over (b+g+r) = 3b + 300
    vals = [0, 2, 20, 22]
    assert m_up["wsum"] == sum((i + 1) * (3 * v + 300) for i, v in enumerate(vals))
    # truncated pixel data: resize refuses (whole image or nothing)
    assert resize_bmp_nn(up[:-5]) is None
    assert resize_bmp_nn(b"not a bitmap") is None


def test_sample_bmp_frames_walker():
    """The frame walker must hop by declared file sizes, sample frames
    0, 2, ... and stop at a malformed tail (truncated-upload policy:
    keep the frames already parsed)."""
    import struct

    from kafkastreams_example_spark.functions.multimodal import (
        parse_bmp_pixels,
        sample_bmp_frames,
    )

    def bmp(seed):
        w = h = 2
        body = bytes((seed + i) % 256 for i in range(h * 8))  # stride 8
        return (
            b"BM" + struct.pack("<I", 54 + len(body)) + b"\x00" * 4
            + struct.pack("<I", 54)
            + struct.pack("<IiiHHII", 40, w, h, 1, 24, 0, len(body))
            + b"\x00" * 16 + body
        )

    frames = [bmp(s) for s in (0, 50, 100, 150)]
    m = sample_bmp_frames(b"".join(frames))
    assert (m["n_frames"], m["n_sampled"]) == (4, 2)
    expect = sum(parse_bmp_pixels(frames[i])["wsum"] for i in (0, 2))
    assert m["wsum_total"] == expect and m["n_px"] == 8
    # truncated tail frame: walk keeps the complete prefix
    m2 = sample_bmp_frames(b"".join(frames[:3]) + frames[3][:-4])
    assert m2["n_frames"] == 3 and m2["n_sampled"] == 2
    assert sample_bmp_frames(b"not a movie") is None


def test_ngram_span_removal_cuts_shared_span_only(spark):
    """Hand-built case: two docs share an 8-token span; the span must
    be cut from BOTH docs (cut-everywhere contract) while every
    non-shared token survives in order; a short (<8 tokens) doc passes
    through untouched."""
    from kafkastreams_example_spark.functions.text import (
        remove_duplicated_ngram_spans,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = spark.createDataFrame(
        [
            (1, f"intro one {shared} tail one"),
            (2, f"prefix two two {shared} outro"),
            (3, "tiny doc only"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["cleaned_text"])
        for r in remove_duplicated_ngram_spans(docs, n=8).collect()
    }
    assert got[1] == (12, 8, "intro one tail one")
    assert got[2] == (12, 8, "prefix two two outro")
    assert got[3] == (3, 0, "tiny doc only")


def test_pagerank_sinks_sum_to_one(spark):
    """Dangling-mass property: on a graph WITH sinks the ranks must
    still sum to 1 (mass redistributed uniformly each round, not
    leaked) and match a numpy power-iteration reference per node."""
    import numpy as np

    from kafkastreams_example_spark.functions.graph import pagerank

    # 0→1, 0→2, 1→2, 3→0 ; node 2 is a sink
    edge_list = [(0, 1), (0, 2), (1, 2), (3, 0)]
    edges = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    got = {r["node"]: r["r"] for r in pagerank(edges, iters=7).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9

    d, n = 0.85, 4
    r = np.full(n, 1.0 / n)
    out = {0: [1, 2], 1: [2], 3: [0]}
    for _ in range(7):
        nxt = np.full(n, (1.0 - d) / n)
        dmass = r[2]  # the sink
        for s, ds in out.items():
            for t in ds:
                nxt[t] += d * r[s] / len(ds)
        nxt += d * dmass / n
        r = nxt
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])


def test_pagerank_converges_under_tol(spark):
    """tol mode must stop early once the L1 delta drops below tol and
    agree with a long fixed run to within that tolerance."""
    from kafkastreams_example_spark.functions.graph import pagerank

    edge_list = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    edges = spark.createDataFrame(edge_list, "src BIGINT, dst BIGINT")
    fixed = {r["node"]: r["r"] for r in pagerank(edges, iters=60).collect()}
    tol = {r["node"]: r["r"] for r in pagerank(edges, iters=60, tol=1e-10).collect()}
    assert set(fixed) == set(tol)
    for k in fixed:
        assert abs(fixed[k] - tol[k]) < 1e-8, (k, fixed[k], tol[k])


def test_ngram_span_removal_matches_python_reference(spark):
    """Third-engine check (the doc_chunking discipline): recompute the
    covered-position contract in plain Python — an n-gram is duplicated
    iff it occurs in ≥2 distinct docs; a position is covered iff inside
    any such window — and compare cleaned outputs exactly. Catches
    off-by-one window bugs the DuckDB oracle could share."""
    import re
    from collections import defaultdict

    from kafkastreams_example_spark.functions.text import (
        remove_duplicated_ngram_spans,
    )
    from kafkastreams_example_spark.sources.tables import load_table

    n = 8
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents").limit(120).collect()
    }
    toks = {d: re.findall("[a-z0-9]+", t.lower()) for d, t in docs.items()}
    gram_docs = defaultdict(set)
    for d, ts in toks.items():
        for s in range(len(ts) - n + 1):
            gram_docs[tuple(ts[s : s + n])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = {}
    for d, ts in toks.items():
        covered = set()
        for s in range(len(ts) - n + 1):
            if tuple(ts[s : s + n]) in dup:
                covered.update(range(s, s + n))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        expected[d] = (len(ts), len(ts) - len(kept), " ".join(kept))

    sub = spark.createDataFrame(
        [(d, docs[d]) for d in docs], "doc_id BIGINT, text STRING"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["cleaned_text"])
        for r in remove_duplicated_ngram_spans(sub, n=n).collect()
    }
    assert got == expected


def test_gopher_rules_zero_token_doc_fails_deterministically(spark):
    """Round-10 review fix: a doc with no tokens must FAIL every rule
    with boolean (never NULL) flags — a hard gate whose verdict can be
    NULL is broken (Spark NULL == 0 is NULL and filter(passes) would
    silently drop rather than reject)."""
    from kafkastreams_example_spark.functions.text import gopher_quality_rules

    df = spark.createDataFrame(
        [(1, "!!!"), (2, ""), (3, None)], "doc_id BIGINT, text STRING"
    )
    for r in gopher_quality_rules(df).collect():
        assert r["passes"] is False
        assert r["n_failed"] == 4
        assert r["mean_token_len"] is None
        for f in ("word_count_ok", "mean_len_ok", "stopwords_ok", "repetition_ok"):
            assert r[f] is False


def test_grouped_exact_median_matches_builtin(spark):
    """The bounded-histogram median must be BIT-identical to Spark's
    exact `median` aggregate (which it replaces to avoid the per-group
    value buffer): odd and even group sizes, duplicated values spanning
    the middle ranks, negative values, and a single-row group."""
    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_median,
    )

    rows = [
        # odd count
        ("a", 1.0), ("a", 2.5), ("a", 9.0),
        # even count, duplicate value covering both middle ranks
        ("b", 4.0), ("b", 4.0), ("b", 7.0), ("b", 8.0),
        # even count, distinct middles -> interpolation
        ("c", -3.0), ("c", 0.25), ("c", 0.75), ("c", 10.0),
        # singleton
        ("d", 42.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    got = {
        r["k"]: r["med"]
        for r in grouped_exact_median(df, ["k"], "v").collect()
    }
    want = {
        r["k"]: r["med"]
        for r in df.groupBy("k").agg(F.median("v").alias("med")).collect()
    }
    assert got == want, (got, want)

    # and on the real fixture column, per event_type
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("value").isNotNull()
    )
    got = {
        r["event_type"]: r["med"]
        for r in grouped_exact_median(ev, ["event_type"], "value").collect()
    }
    want = {
        r["event_type"]: r["med"]
        for r in ev.groupBy("event_type")
        .agg(F.median("value").alias("med"))
        .collect()
    }
    assert got == want

    # the generalized kernel must match F.percentile bit-for-bit at
    # arbitrary p (fractional interpolation positions included)
    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_percentile,
    )

    for p in (0.25, 0.9):
        got = {
            r["event_type"]: r["pct"]
            for r in grouped_exact_percentile(
                ev, ["event_type"], "value", p
            ).collect()
        }
        want = {
            r["event_type"]: r["pct"]
            for r in ev.groupBy("event_type")
            .agg(F.percentile("value", p).alias("pct"))
            .collect()
        }
        assert got == want, p


def test_grouped_exact_percentile_ignores_nulls(spark):
    """Round-12 advice fix: NULLs in the value column must be ignored
    (built-in percentile semantics). Before the fix the NULL histogram
    row inflated __n and shifted every cumulative rank via the
    NULLS FIRST ascending window order."""
    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_median,
        grouped_exact_percentile,
    )

    rows = [
        ("a", None), ("a", 1.0), ("a", 3.0), ("a", None), ("a", 8.0),
        ("b", None), ("b", 2.0), ("b", 4.0),
        ("c", None),  # all-NULL group: built-in yields NULL / no value
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    for p in (0.5, 0.25, 0.9):
        got = {
            r["k"]: r["pct"]
            for r in grouped_exact_percentile(df, ["k"], "v", p).collect()
        }
        want = {
            r["k"]: r["pct"]
            for r in df.groupBy("k")
            .agg(F.percentile("v", p).alias("pct"))
            .collect()
            if r["pct"] is not None
        }
        assert got == want, p
    # median front door too
    got = {
        r["k"]: r["med"] for r in grouped_exact_median(df, ["k"], "v").collect()
    }
    assert got == {"a": 3.0, "b": 3.0}


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """functions/bloom.py contract: every inserted key passes the
    probe (no false negatives — correctness of the semi-join reduction
    depends on it), non-members pass at roughly the designed (k·n/m)^k
    rate, and the semi join's OUTPUT equals the plain semi join
    exactly (the bloom only prices the plan)."""
    from kafkastreams_example_spark.functions.bloom import (
        bloom_probe,
        bloom_semi_join,
        build_bloom_bits,
    )

    dim = spark.createDataFrame(
        [(i * 13 + 5,) for i in range(2000)], "k BIGINT"
    )
    n_bits = ((16 * 2000 + 63) // 64) * 64
    words = build_bloom_bits(dim, "k", n_bits)
    assert dim.filter(bloom_probe(F.col("k"), words)).count() == 2000
    # fp rate on a disjoint domain: expect ~1/64, assert < 5/64
    nm = spark.range(0, 50000).select((F.col("id") + 10**12).alias("k"))
    fp = nm.filter(bloom_probe(F.col("k"), words)).count()
    assert fp / 50000 < 5 / 64, fp
    # end-to-end exactness vs the plain semi join
    fact = spark.range(0, 30000).select(
        F.pmod(F.col("id") * 7, F.lit(40000)).alias("k"),
        F.col("id").alias("v"),
    )
    got = sorted(
        (r["k"], r["v"]) for r in bloom_semi_join(fact, dim, "k").collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in fact.join(dim.distinct(), "k", "left_semi").collect()
    )
    assert got == want and len(got) > 0

    import pytest

    with pytest.raises(ValueError):
        build_bloom_bits(dim, "k", 100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom_bits(dim, "k", 1 << 30)  # over the literal cap

    # round-13 advice fix: xxhash64 is type-sensitive, so an INT fact
    # key probed against a BIGINT-built filter used to false-negative
    # on EVERY row (silently dropped despite the EXACT contract). Both
    # sides now hash the string rendering — a mixed-type probe must
    # keep all true members.
    fact_int = spark.createDataFrame(
        [(int(i * 13 + 5),) for i in range(2000)], "k INT"
    )
    assert fact_int.filter(bloom_probe(F.col("k"), words)).count() == 2000
    got_mixed = sorted(
        r["k"] for r in bloom_semi_join(fact_int, dim, "k").collect()
    )
    assert got_mixed == sorted(i * 13 + 5 for i in range(2000))

    # round-14 advice fix: CROSS-FAMILY numeric keys (INT fact vs
    # DOUBLE dim) render differently as strings ('1' vs '1.0'), so the
    # string-normalized hash still false-negatived; bloom_semi_join now
    # widens both sides to DOUBLE when the families differ. Every
    # fact row matches a dim key, so the exact semi join must keep all.
    dim_dbl = dim.select(F.col("k").cast("double").alias("k"))
    got_cross = sorted(
        r["k"] for r in bloom_semi_join(fact_int, dim_dbl, "k").collect()
    )
    assert got_cross == sorted(i * 13 + 5 for i in range(2000))
    # and a DECIMAL(12,2) dim vs INT fact (renders '5.00' vs '5')
    dim_dec = dim.select(F.col("k").cast("decimal(12,2)").alias("k"))
    got_dec = sorted(
        int(r["k"]) for r in bloom_semi_join(fact_int, dim_dec, "k").collect()
    )
    assert got_dec == sorted(i * 13 + 5 for i in range(2000))

    # round-14 review fix: FLOAT and DOUBLE are SEPARATE families — a
    # float key like 1.1f renders '1.1' while its lossless double
    # widening renders '1.1000000238418579', so a FLOAT-vs-DOUBLE pair
    # must widen too (both sides end up hashing the double rendering).
    # Keys i + 0.1 are non-dyadic, the exact failure shape.
    fact_f = spark.createDataFrame(
        [(float(i) + 0.1,) for i in range(500)], "k FLOAT"
    )
    dim_d = fact_f.select(F.col("k").cast("double").alias("k"))
    got_fd = sorted(
        round(r["k"], 1) for r in bloom_semi_join(fact_f, dim_d, "k").collect()
    )
    assert got_fd == sorted(round(i + 0.1, 1) for i in range(500))


def test_pca_topr_recovers_spiked_components(spark):
    """Deflated power iteration (functions/pca.py) must recover the
    top-3 eigenvectors of a spiked covariance: per-component |cos|
    >= 0.99 against numpy eigh of the SAME empirical covariance, and
    the returned directions near-orthonormal. (The registry entry runs
    a fixed 3 iterations for oracle determinism; accuracy is pinned
    here at 6 iterations, where the spiked gaps have converged.)"""
    import numpy as np

    from kafkastreams_example_spark.functions.pca import power_iteration_topr

    rng = np.random.default_rng(7)
    d, n = 16, 2000
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    U = Q[:, :3]
    Z = rng.standard_normal((n, 3)) * np.array([4.0, 2.0, 1.0])
    X = (
        Z @ U.T
        + 0.01 * rng.standard_normal((n, d))
        + rng.standard_normal(d)  # constant mean shift, must be centered out
    )
    C = np.cov(X, rowvar=False, bias=True)
    _, V = np.linalg.eigh(C)
    truth = V[:, ::-1][:, :3]

    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id BIGINT, dv ARRAY<DOUBLE>",
    ).persist()
    try:
        mu, accepted = power_iteration_topr(df, dim=d, r=3, iters=6)
    finally:
        df.unpersist()
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)
    xs = np.array([x for x, _ in accepted])
    for k in range(3):
        cos = abs(float(xs[k] @ truth[:, k]))
        assert cos >= 0.99, (k, cos)
    assert np.allclose(xs @ xs.T, np.eye(3), atol=0.02)
    # Rayleigh eigenvalues (components 1-2; the last is never needed)
    # must rank in decreasing order and track n·eigval of the truth
    lams = [lam for _, lam in accepted[:2]]
    assert lams[0] > lams[1] > 0


def test_pagerank_empty_graph_returns_empty(spark):
    """Round-10 review fix: a filtered-to-nothing edge frame must yield
    an empty rank frame, not a driver-side ZeroDivisionError."""
    from kafkastreams_example_spark.functions.graph import pagerank

    empty = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert pagerank(empty, iters=3).collect() == []


def test_mg_summaries_superset_and_error_ledger(spark):
    """Misra-Gries guarantee on a forced-decrement corpus: with k far
    below the distinct-term count every partition must decrement, the
    ledger rows must bound the undercount (stored cnt >= true - D_p,
    absent term true count <= D_p), and the candidate set must contain
    every term whose global count exceeds the summed budget."""
    from collections import Counter

    from kafkastreams_example_spark.functions.sketches import (
        mg_partition_summaries,
    )

    # zipf-ish: term_i appears ~ 600/i times, plus a 400-singleton tail
    data = []
    for i in range(1, 30):
        data += [f"hot{i:02d}"] * (600 // i)
    data += [f"tail{j:04d}" for j in range(400)]
    true = Counter(data)
    terms = spark.createDataFrame(
        [(t,) for t in data], "term STRING"
    ).repartition(4)

    summ = mg_partition_summaries(terms, k=8).collect()
    ledgers = [r for r in summ if r["term"] is None]
    cands = {r["term"]: r for r in summ if r["term"] is not None}
    assert len(ledgers) == 4  # one ledger row per partition
    d_tot = sum(r["dp"] for r in ledgers)
    assert d_tot > 0  # the decrement path actually ran
    # per-term: stored lower bound never exceeds truth, and any term
    # absent from every summary is provably rare
    for t, r in cands.items():
        assert r["cnt"] <= true[t]
    for t, c in true.items():
        if t not in cands:
            assert c <= d_tot, (t, c, d_tot)


def test_top_terms_sketched_exact_and_certificate(spark):
    """End-to-end: sketched top-n equals the exact groupBy top-n when
    the certificate holds, and RAISES (never silently wrong) when k is
    adversarially small."""
    import pytest

    from kafkastreams_example_spark.functions.sketches import (
        top_terms_sketched,
    )

    data = []
    for i in range(1, 30):
        data += [f"hot{i:02d}"] * (600 // i)
    data += [f"tail{j:04d}" for j in range(400)]
    terms = spark.createDataFrame(
        [(t,) for t in data], "term STRING"
    ).repartition(4)

    got = [(r["term"], r["n"]) for r in top_terms_sketched(terms, n=10, k=64).collect()]
    want = [
        (r["term"], r["n"])
        for r in terms.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(10)
        .collect()
    ]
    assert got == want

    with pytest.raises(ValueError, match="not certifiable"):
        top_terms_sketched(terms, n=10, k=2)


def test_top_terms_sketched_small_vocab_degrades_exact(spark):
    """Vocab <= k: no decrements, d_tot == 0, result certifies even
    when fewer than n distinct terms exist."""
    from kafkastreams_example_spark.functions.sketches import (
        top_terms_sketched,
    )

    terms = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "term STRING"
    ).repartition(2)
    got = [(r["term"], r["n"]) for r in top_terms_sketched(terms, n=10, k=16).collect()]
    assert got == [("a", 5), ("b", 3), ("c", 1)]


def test_embedding_pca_recovers_spiked_direction(spark, tmp_path):
    """On a spiked-covariance corpus (one dominant direction, 26x
    eigengap) the 3-step power iteration must align with the true
    principal component: per-row projections correlate >= 0.99 with
    the numpy eigendecomposition's. The shipped testdata embeddings
    are near-isotropic (eigengap ~1.07) where NO small iteration count
    converges — there the entry's contract is the deterministic
    unrolled-3-step form (the graph_pagerank precedent), verified
    value-exact by the DuckDB oracle instead."""
    import numpy as np

    from kafkastreams_example_spark.queries import q_embedding_pca_scores

    rng = np.random.default_rng(7)
    u = rng.normal(size=64)
    u /= np.linalg.norm(u)
    M = rng.normal(scale=1.0, size=(200, 64)) + np.outer(
        rng.normal(scale=5.0, size=200), u
    )
    pdf = [(int(i), [float(x) for x in M[i]], 0) for i in range(200)]
    df = spark.createDataFrame(
        pdf, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    got = {
        r["vec_id"]: r["pc1"]
        for r in q_embedding_pca_scores(spark, str(tmp_path)).collect()
    }
    Mf = M.astype(np.float32).astype(np.float64)  # the stored precision
    C = np.cov(Mf, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    proj = (Mf - Mf.mean(0)) @ V[:, -1]
    gotv = np.array([got[i] for i in range(200)])
    corr = abs(np.corrcoef(proj, gotv)[0, 1])
    assert corr >= 0.99, corr
    assert w[-1] / w[-2] > 5  # the fixture really is spiked


def test_grouped_exact_percentiles_multi_matches_single(spark):
    """The shared-histogram multi-percentile kernel must return each
    percentile BIT-identical to the single-p kernel (and hence to the
    built-in F.percentile): adding a percentile to the request set
    must never perturb another's straddling-rank pick."""
    from kafkastreams_example_spark.operators.relational import (
        grouped_exact_percentile,
        grouped_exact_percentiles,
    )

    rows = [
        ("a", 1.0), ("a", 2.5), ("a", 9.0),
        ("b", 4.0), ("b", 4.0), ("b", 7.0), ("b", 8.0),
        ("c", -3.0), ("c", 0.25), ("c", 0.75), ("c", 10.0),
        ("d", 42.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    ps = {"p05": 0.05, "p50": 0.5, "p95": 0.95}
    multi = {
        r["k"]: (r["p05"], r["p50"], r["p95"])
        for r in grouped_exact_percentiles(df, ["k"], "v", ps).collect()
    }
    for i, (out, p) in enumerate(ps.items()):
        single = {
            r["k"]: r["x"]
            for r in grouped_exact_percentile(
                df, ["k"], "v", p, out="x"
            ).collect()
        }
        for k, vals in multi.items():
            assert vals[i] == single[k], (out, k)

    # and against the built-in on the real fixture column
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    multi = {
        r["event_type"]: (r["p05"], r["p50"], r["p95"])
        for r in grouped_exact_percentiles(
            ev, ["event_type"], "value", ps
        ).collect()
    }
    want = {
        r["event_type"]: (r["p05"], r["p50"], r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.05).alias("p05"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
        .collect()
    }
    assert multi == want


def test_ssjoin_prefix_matches_all_shared_shingle_ground_truth(spark):
    """Prefix-filter recall/precision on a constructed corpus with
    known structure: exact dup (J=1), one-token edit (high J), shared
    tail (mid J), and an unrelated doc — the ssjoin output must equal
    the brute-force all-shared-shingles join filtered at the same
    threshold, pair for pair and value for value. Exercises the
    prefix-length edge n_sh small (plen = n - ceil(t*n) + 1) and the
    length filter."""
    from kafkastreams_example_spark.functions.dedup_approx import (
        shingle_jaccard_pairs,
        ssjoin_prefix_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base.replace("delta", "dXlta")),  # one-token edit
            (4, "epsilon zeta eta theta iota kappa lam mu nu xi"),
            (5, "one two three four five six seven eight nine ten"),
            (6, "tiny doc under five tokens".replace(" tokens", "")),
        ],
        "doc_id INT, text STRING",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
        for r in ssjoin_prefix_pairs(docs, threshold=0.5).collect()
    }
    # ground truth: every shared-shingle pair (df cap lifted), same tau
    want = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
        for r in shingle_jaccard_pairs(
            docs, threshold=0.5, max_df=10**9
        ).collect()
    }
    assert got == want
    assert (1, 2) in got and got[(1, 2)][1] == 1.0


def test_mmr_rerank_parametric_k(spark):
    """functions/similarity.mmr_rerank generalized over k (round 13):
    k=5 yields 5 distinct picks with NON-INCREASING marginal scores
    (penalties only grow as picks accumulate, so the greedy max is
    monotone), the k=3 result is exactly its prefix (greedy prefix
    property), and bad parameters raise."""
    import pytest

    from kafkastreams_example_spark.functions.similarity import mmr_rerank
    from kafkastreams_example_spark.sources.tables import load_table

    from conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    r5 = sorted(
        ((r["rank"], r["neighbor_id"], r["score"])
         for r in mmr_rerank(emb, k=5, pool=10).collect())
    )
    assert [r[0] for r in r5] == [1, 2, 3, 4, 5]
    assert len({r[1] for r in r5}) == 5
    scores = [r[2] for r in r5]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    r3 = sorted(
        ((r["rank"], r["neighbor_id"], r["score"])
         for r in mmr_rerank(emb, k=3, pool=10).collect())
    )
    assert r3 == r5[:3]
    with pytest.raises(ValueError):
        mmr_rerank(emb, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(emb, k=11, pool=10)


def test_mad_outliers_exact_boundary_row_excluded(spark, tmp_path):
    """Round-19 (verdict item 3): a row sitting EXACTLY at the 5·MAD
    cut must be excluded by the strict `>` — the boundary-equality
    mutant class (`>` -> `>=`) that survived the r14/r18 mutation
    audits because no sf0.01 row occupied the cut. Group 'boundary' =
    [8,10,10,12,20]: median 10, ads [2,0,0,2,10], MAD 2, cut 10; the
    value-20 row lands ad == 10.0 exactly (small integers in doubles —
    bit-exact), so n_outliers MUST be 0 under `>` and flips to 1 under
    `>=`. Group 'clear' pins the generic path (ad 20 > 10 → 1). The
    same fixture backs the gate-side kill in
    tools/gate_sensitivity.py::_bf_mad_outliers (BOUNDARY MISMATCH)."""
    from kafkastreams_example_spark.queries import q_mad_outliers

    rows = [(i, "boundary", v) for i, v in enumerate([8.0, 10.0, 10.0, 12.0, 20.0])]
    rows += [(10 + i, "clear", v) for i, v in enumerate([8.0, 10.0, 10.0, 12.0, 30.0])]
    spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        r["event_type"]: r for r in q_mad_outliers(spark, str(tmp_path)).collect()
    }
    b = out["boundary"]
    assert b["med_value"] == 10.0 and b["mad_value"] == 2.0
    assert b["n_outliers"] == 0, "exact-boundary row (ad == 5·MAD) must not flag"
    assert b["outlier_frac"] == 0.0
    c = out["clear"]
    assert c["n_outliers"] == 1 and c["med_value"] == 10.0 and c["mad_value"] == 2.0


def test_boundary_fixture_entries_are_registered():
    """Every gate_sensitivity boundary fixture must name a real
    registry entry (a renamed query must fail CI, not silently drop
    its boundary gate)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from kafkastreams_example_spark.queries import REGISTRY
    from tools.gate_sensitivity import BOUNDARY_FIXTURES

    unknown = sorted(set(BOUNDARY_FIXTURES) - set(REGISTRY))
    assert not unknown, unknown


def test_ewma_history_cap_guard_names_the_query(spark, tmp_path):
    """The retention-contract guard on q_ewma must fire DIAGNOSABLY —
    error naming the query ('q_ewma'), the entity, and the row count —
    when one entity's history exceeds DEFAULT_HISTORY_CAP. Pins the
    guard's wiring through the REAL query path, and kills the 'q_ewma'
    label mutant class (GATE_SENSITIVITY_r18's adjudicated-structural
    survivor) by test: a mutated label no longer matches."""
    import pytest
    from pyspark.sql import functions as F

    from kafkastreams_example_spark.functions.sliding import (
        DEFAULT_HISTORY_CAP,
    )
    from kafkastreams_example_spark.queries import q_ewma

    n = DEFAULT_HISTORY_CAP + 1
    (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            F.lit(7).alias("user_id"),
            F.lit("hot").alias("event_type"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
        .write.mode("overwrite")
        .parquet(str(tmp_path / "events.parquet"))
    )
    with pytest.raises(
        Exception, match="q_ewma: entity history exceeds the retention"
    ):
        q_ewma(spark, str(tmp_path)).collect()
