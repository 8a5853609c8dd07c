"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; at 100 TB the plan
shape is what matters: the (small) query set is broadcast, candidates
stream through a narrow per-row projection (dot product via higher-order
functions — JVM-side, codegen'd, no Python), and top-k is a per-query
window over only the scored rows. No all-pairs materialization unless
explicitly asked for (cosine_pairs, threshold-gated).

Determinism: all arithmetic is double (cast from float once), summation
is sequential left-to-right via F.aggregate — IEEE-reproducible and
matching the DuckDB oracle's list_sum(list_transform(...)) evaluation.

The IVF-style bucketed variant (probe a subset of centroid buckets) is
the planned scale path — see queries registry; centroids are seeded
deterministically so the oracle can reproduce bucket assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def embedding_norms(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return emb.select(
        "vec_id", F.size(vec_col).alias("dim"), _norm(v).alias("l2_norm"), "label"
    )


def _unit(col: Column) -> Column:
    """Pre-normalized (unit-length) double vector: cosine of two unit
    vectors is a single dot product, so the O(n²) pair stage does 1
    array-aggregate per pair instead of 3. Computed once per row.

    Zero-vector rule: an all-zero embedding normalizes to the zero
    vector (dot 0 against everything, ranked purely by tie-break) — NOT
    NaN/NULL/crash. Under ANSI mode x/0.0 RAISES in Spark while DuckDB
    yields NULL, so without this guard one junk embedding in a 100 TB
    corpus either kills the whole dedup job or silently diverges the
    engines; the oracle's `_EMB_U` CTE carries the same CASE."""
    v = _as_double(col)
    n = _norm(v)
    safe = F.when(n == 0.0, F.lit(1.0)).otherwise(n)
    return F.transform(v, lambda x: x / safe)


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id.

    Plan: pre-normalize per row (O(n)), broadcast(queries) ⋈ candidates
    (cross of Q×N rows, narrow), one dot per pair, row_number per query.
    Output: query_id, neighbor_id, rank, cosine (double).
    """
    from pyspark.sql import Window

    unit = emb.select(F.col(id_col), _unit(F.col(vec_col)).alias("uv"))
    queries = unit.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("uv").alias("qv")
    )
    cands = unit.select(F.col(id_col).alias("neighbor_id"), F.col("uv").alias("cv"))
    scored = (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _dot(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: the 100 TB path for similarity
    search.

    Centroids: pass a trained (cent_id, cv) frame — typically
    kmeans_centroids() — for inverted-file quality robust to degenerate
    id prefixes (both modes pin recall ≥0.8 vs brute force in
    tests/test_operators.py). The default (first n_centroids vectors by
    id) is the training-free deterministic fallback that any engine can
    reproduce exactly; both modes are SQL-oracled (queries.SQL_IVF_TOPK
    and queries._sql_ivf_topk_trained). Every vector is assigned to its
    nearest centroid once (O(n·C), broadcast centroids, no shuffle of
    the big side); a query probes only its n_probe nearest centroid
    buckets, so the scored candidate set is ~n_probe/n_centroids of the
    corpus instead of all of it. Output schema matches cosine_topk;
    results are approximate (a true neighbor outside probed buckets is
    missed).

    ``assignments``: a pre-built (id_col, bucket) posting list — pass
    the committed state of an incrementally maintained inverted file
    (queries.q_ivf_incremental) to skip the in-query assignment pass;
    it must have been assigned under the SAME centroids (ivf_assign).
    """
    from pyspark.sql import Window

    unit = emb.select(F.col(id_col), _unit(F.col(vec_col)).alias("uv"))
    if centroids is None:
        cents = unit.filter(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"), F.col("uv").alias("cv")
        )
    else:
        cents = centroids.select("cent_id", "cv")
    carr = _codebook_row(cents)

    def nearest(df: DataFrame, side_id: str, rank_limit: int, out: str,
                keep_uv: bool = False) -> DataFrame:
        # per-row top-rank_limit over the collected codebook array
        # (round 20, guide §2.4): replaces a row_number window that
        # sorted and EXCHANGED all k·n scored rows. Ordering identical:
        # ascending (o, cent_id) with o = nanvl(-cs, -inf) ≡ the
        # window's (cs DESC, cent_id ASC) — both rank a NaN score
        # first, though unit vectors cannot produce one.
        neg_inf = F.lit(float("-inf"))
        top = F.slice(
            F.array_sort(
                F.transform(
                    F.col("carr"),
                    lambda c: F.struct(
                        F.nanvl(-_dot(F.col("uv"), c["cv"]), neg_inf).alias("o"),
                        c["cent_id"].alias("cid"),
                    ),
                )
            ),
            1,
            rank_limit,
        )["cid"]
        cols = [F.col(side_id), F.explode(top).alias(out)]
        if keep_uv:
            cols.append(F.col("uv"))
        return df.join(F.broadcast(carr), how="cross").select(*cols)

    queries = unit.filter(F.col(id_col).isin(query_ids))
    probes = nearest(queries, id_col, n_probe, "bucket").withColumnRenamed(
        id_col, "query_id"
    )

    # home bucket is unique per vector (top-1), so no pair can arrive
    # twice through different probed buckets — no distinct
    if assignments is None:
        # the home-bucket pass keeps each vector's uv in its own row,
        # so the former assigned⋈unit re-attach join (an n-row shuffle
        # of vector-fat rows) is gone (round 20, guide §8.4: the
        # placement decision travels WITH the payload row instead of
        # being joined back on)
        cand = nearest(unit, id_col, 1, "bucket", keep_uv=True).select(
            F.col(id_col).alias("cand_id"), "bucket", F.col("uv").alias("cv2")
        )
    else:
        # committed posting lists: drop non-probed buckets BEFORE
        # re-attaching vectors (round 20, guide §3.2/§8.4) — only the
        # probed n_probe/C fraction of the corpus pays the id join,
        # and the hot-bucket set is a broadcast of ≤ q·n_probe rows
        hot = probes.select("bucket").distinct()
        cand = (
            assignments.select(id_col, "bucket")
            .join(F.broadcast(hot), "bucket")
            .join(unit, id_col)
            .select(F.col(id_col).alias("cand_id"), "bucket", F.col("uv").alias("cv2"))
        )

    qv = queries.select(F.col(id_col).alias("query_id"), F.col("uv").alias("qv"))
    scored = (
        probes.join(cand, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            _dot(F.col("qv"), F.col("cv2")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Home-bucket assignment of each vector under a FROZEN codebook:
    (id_col, bucket) rows, bucket = the centroid with the highest
    cosine (ties to the lowest cent_id — the exact tie-break of
    ivf_topk's in-query assignment and the SQL oracle). O(n·C) with
    broadcast centroids and a map-side max_by partial aggregate — the
    corpus is never shuffled with its vectors attached; the shuffle
    carries one best-so-far (id, bucket) row per vector per task.

    This is the INGEST half of the incrementally maintained inverted
    file (queries.q_ivf_incremental): each arriving batch is assigned
    here and its postings upserted into the index table, O(hot
    buckets) per batch, while the codebook stays fixed at its
    train-time snapshot."""
    unit = emb.select(F.col(id_col), _unit(F.col(vec_col)).alias("uv"))
    carr = _codebook_row(centroids.select("cent_id", "cv"))
    # per-row argmax over the codebook array (guide §2.4): the ingest
    # batch is never exchanged at all — assignment is one narrow
    # projection; tie-break identical to the max_by form (see
    # _codebook_row)
    return (
        unit.join(F.broadcast(carr), how="cross")
        # empty-codebook contract (round-20 ADVICE): array_max over an
        # empty collected codebook would be NULL — preserve the
        # pre-round-20 inner-join behavior (no assignments at all)
        # instead of emitting NULL buckets that an ingest path could
        # upsert. The guard tests the broadcast array's size, NOT the
        # computed bucket, so the scoring transform below is never
        # evaluated twice per row.
        .filter(F.size(F.col("carr")) > 0)
        .select(
            id_col,
            F.array_max(
                F.transform(
                    F.col("carr"),
                    lambda c: F.struct(
                        _dot(F.col("uv"), c["cv"]).alias("cs"),
                        (-c["cent_id"]).alias("nc"),
                        c["cent_id"].alias("cent_id"),
                    ),
                )
            )["cent_id"].alias("bucket"),
        )
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic fixed-iteration Lloyd k-means over unit vectors —
    the real centroid trainer for the IVF path (replacing the
    first-k-by-id stand-ins).

    Spherical k-means: init = the first k vectors by id (deterministic,
    no RNG); each iteration assigns every vector to its
    highest-cosine centroid (broadcast centroids — the corpus is never
    shuffled) and recomputes centroids as the re-normalized element-wise
    mean via posexplode → (cluster, dim) avg → array rebuild. A cluster
    that loses all members keeps its previous centroid. The iteration
    count is fixed (no driver-side convergence probe — at scale each
    round is one narrow pass + a k×dim agg) and each round
    localCheckpoints the k-row centroid frame to keep lineage flat.

    Output: (cent_id, cv) with cv unit-length — drop-in for ivf_topk's
    centroids parameter. The FIXED iteration count makes the training
    SQL-expressible as unrolled CTEs, so the cluster profile is fully
    oracle-checked (queries._sql_kmeans_centroids) on top of the
    ivf-recall floor test.
    """
    # persist the normalized corpus once: every Lloyd iteration re-reads
    # it for assignment, and without the persist each round re-scans the
    # parquet and re-normalizes (iters+1 full passes over the raw data)
    unit = emb.select(F.col(id_col), _unit(F.col(vec_col)).alias("uv")).persist()
    try:
        cents = _lloyd_iterations(unit, k, iters, id_col)
    finally:
        # the eager localCheckpoint in each iteration cut cents' lineage
        # from unit, so the cache can always be dropped — and a failed
        # Lloyd round must not leak the cached corpus for the session
        unit.unpersist()
    return cents


def _lloyd_iterations(unit: DataFrame, k: int, iters: int, id_col: str) -> DataFrame:
    cents = unit.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cent_id"), F.col("uv").alias("cv")
    )
    for it in range(iters):
        # argmax-by-cosine computed PER ROW over the collected codebook
        # array (round 20, guide §2.4): the previous max_by aggregation
        # re-keyed k·n scored rows by id through a hash Exchange even
        # though every id's k candidates are born in one task — scoring
        # all k centroids inside one array_max projection keeps the
        # assignment pass exchange-free. Tie-break identical: array_max
        # over STRUCT(cs, -cent_id) ≡ max_by by (cs, -cent_id) —
        # highest cs, then lowest cent_id, NaN largest in both.
        carr = _codebook_row(cents)
        assigned = (
            unit.join(F.broadcast(carr), how="cross")
            .select(
                id_col,
                F.array_max(
                    F.transform(
                        F.col("carr"),
                        lambda c: F.struct(
                            _dot(F.col("uv"), c["cv"]).alias("cs"),
                            (-c["cent_id"]).alias("nc"),
                            c["cent_id"].alias("cent_id"),
                        ),
                    )
                )["cent_id"].alias("cent_id"),
                "uv",
            )
        )
        means = (
            assigned.select("cent_id", F.posexplode("uv").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("mv")
            )
            .select("cent_id", _unit(F.col("mv")).alias("cv_new"))
        )
        cents = cents.join(means, "cent_id", "left").select(
            "cent_id", F.coalesce("cv_new", "cv").alias("cv")
        )
        # Checkpoint policy (optimization round 20, guide §1.2/§5): the
        # loop used to localCheckpoint EVERY round EAGERLY — one
        # blocking Spark job per iteration. A NON-eager checkpoint
        # keeps both properties that matter (the round's RDD computes
        # once even though `cents` is referenced twice — the broadcast
        # scorer and the empty-cluster fallback join — and the lineage
        # truncates so plans stay flat) without the per-round job
        # barrier: the whole training now executes inside the FINAL
        # round's single eager job. Values are unchanged —
        # checkpointing never alters arithmetic, only when it runs.
        last = it == iters - 1
        cents = cents.localCheckpoint(eager=last)
    return cents


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH bucketing (sign of dot with n_planes
    deterministic pseudo-random hyperplanes → an n_planes-bit bucket).
    Cosine-similar vectors collide with probability 1 − θ/π per bit, so
    bucket equality is the candidate filter for angular near-neighbor
    search — the second ANN bucketing tier next to IVF.

    Hyperplanes are derived from md5("plane:dim") so any engine can
    reproduce them exactly (the oracle embeds the same literals).
    """
    planes = hyperplane_matrix(n_planes, dim)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(F.zip_with(v, arr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("bigint")).otherwise(0)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def hyperplane_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-0.5, 0.5): component
    (p, d) = md5("p:d") first 8 hex digits / 2^32 − 0.5. Engine-portable
    by construction."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _codebook_row(
    cents: DataFrame, id_field: str = "cent_id", vec_field: str = "cv"
) -> DataFrame:
    """Collapse an O(√C)-row codebook into ONE row holding the whole
    codebook as ARRAY<STRUCT<cent_id, cv>> sorted by cent_id.

    Cross-joining (broadcast) this single row lets every corpus row
    score all centroids INSIDE one projection (array transform +
    array_max / array_sort / array_min), replacing the
    broadcast-cross-join → per-id re-aggregation pattern: the per-pass
    Exchange that carried one best-so-far row per vector disappears
    outright (guide §2.4 — each id's k scored rows were already born in
    a single task, the groupBy(id) hash exchange only re-proved that),
    and the k·n intermediate scored rows are never materialized as
    rows. The broadcast payload is identical to before (the same O(√C)
    codebook, one row instead of k).

    Equivalence notes (each call site's oracle re-proves these):
    - argmax by (cs DESC, cent_id ASC) ≡ array_max over
      STRUCT(cs, -cent_id, cent_id) — same NaN rule (NaN ranks largest
      in max_by AND array_max).
    - argmin by (d2 ASC, cent_id ASC) ≡ array_min over
      STRUCT(d2, cent_id) — NaN never wins a min in either form.
    - top-n by (o ASC, cent_id ASC) ≡ slice(array_sort(STRUCT(o,
      cent_id)), 1, n) — the exact collect_list/array_sort/slice
      comparator the aggregate form used.
    """
    return cents.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_field).alias("cent_id"), F.col(vec_field).alias("cv")
                )
            )
        ).alias("carr")
    )


def _lloyd_euclid(vecs: DataFrame, k: int, iters: int, off: int) -> DataFrame:
    """Fixed-iteration Lloyd k-means under squared-Euclidean distance
    over (id, hv) subspace vectors; init = the k vectors with id in
    [off, off+k). Assignment via min_by partial aggregation (the
    _lloyd_iterations pattern — the shuffle carries one best row per
    vector, never k·n scored rows); centroid update is the plain
    position-wise mean (subspace halves are not unit vectors, so no
    renormalization). Empty clusters keep their previous centroid; the
    fixed iteration count keeps the training unrollable as oracle CTEs.
    Output: (cent_id INT, cv ARRAY<DOUBLE>)."""
    cents = vecs.filter((F.col("id") >= off) & (F.col("id") < off + k)).select(
        (F.col("id") - off).cast("int").alias("cent_id"), F.col("hv").alias("cv")
    )
    for it in range(iters):
        # per-row argmin over the collected codebook array — same
        # exchange-elimination as _lloyd_iterations (guide §2.4);
        # array_min over STRUCT(d2, cent_id) ≡ min_by by (d2, cent_id)
        carr = _codebook_row(cents)
        assigned = (
            vecs.join(F.broadcast(carr), how="cross")
            .select(
                F.array_min(
                    F.transform(
                        F.col("carr"),
                        lambda c: F.struct(
                            _sqdist(F.col("hv"), c["cv"]).alias("d2"),
                            c["cent_id"].alias("cent_id"),
                        ),
                    )
                )["cent_id"].alias("cent_id"),
                "hv",
            )
        )
        means = (
            assigned.select("cent_id", F.posexplode("hv").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("mv")
            )
        )
        cents = cents.join(means, "cent_id", "left").select(
            "cent_id", F.coalesce("mv", "cv").alias("cv")
        )
        # same non-eager-until-final checkpoint policy as
        # _lloyd_iterations: the training executes as ONE job; the final
        # checkpoint is eager so the codebook materializes while the
        # caller's half-vector caches are still persisted
        # (bucketed_assign unpersists right after)
        last = it == iters - 1
        cents = cents.localCheckpoint(eager=last)
    return cents


def product_grid(
    n_rows: int, target_bucket_rows: int = 1024, min_centroids: int = 16
) -> tuple[int, int]:
    """Derive the two-level (c1, c2) codebook grid for a corpus of
    n_rows vectors: C = max(min_centroids, ceil(n/target)) total buckets
    factored as c1 = ceil(√C) coarse cells × c2 = ceil(C/c1) fine cells.
    Both factors are O(√C), which is what keeps the per-vector
    assignment cost and the broadcast codebooks sublinear in C."""
    import math

    c = max(min_centroids, math.ceil(n_rows / target_bucket_rows))
    c1 = math.ceil(math.sqrt(c))
    c2 = math.ceil(c / c1)
    return c1, c2


def bucketed_assign(
    emb: DataFrame,
    grid: tuple[int, int],
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    id_offset: int | None = None,
    codebook: str = "prefix",
    iters: int = 2,
) -> DataFrame:
    """Two-level product-quantizer bucket assignment — the sublinear
    assignment stage of bucketed_cosine_pairs, exposed separately so the
    scale probe can time it in isolation.

    Two independent deterministic codebooks partition the sphere as a
    product: codebook A = the first c1 vectors by id (starting at the
    corpus's min id — see id_offset below), codebook B = the next c2
    vectors (disjoint id block). A vector's bucket is (nearest-A cell)
    × c2 + (nearest-B cell); it probes its n_probe nearest A cells
    crossed with its single nearest B cell, landing in n_probe of the
    c1·c2 buckets. Near-duplicate pairs (cosine → 1) score
    near-identically against every codebook vector, so they agree on
    both components and co-bucket with high probability — the same
    property the flat scheme had, at O(c1+c2) = O(√C) dots per vector
    instead of O(C).

    Plan shape: two broadcast-codebook cross joins (each codebook is
    O(√C) rows — at 10⁹ vectors and C = n/1024 ≈ 10⁶, each broadcast is
    ~10³ vectors ≈ 512 KB, vs a 512 MB flat-C broadcast). Scoring is on
    NARROW (id, cell, score) rows only: the top-n_probe A selection is
    a collect_list/array_sort/slice aggregate and the top-1 B selection
    a max_by aggregate — both partial-aggregate map-side (every scored
    row of a vector is born in its scan task), so each exchange carries
    one small per-vector buffer, never n·√C vector-fat rows. The
    embedding column re-enters through exactly ONE n-row equi-join on
    id at the end (the pattern _lloyd_iterations uses for the same
    reason); the only wide exchanges carry (id, cell) pairs — asserted
    by tests/test_plans.py::test_bucketed_assign_exchanges_are_narrow.

    id_offset: codebook id blocks start at this id; None (default)
    derives min(id) with one narrow column-pruned agg — the same class
    of runtime statistic as the count() deriving the adaptive grid
    (bucketed_cosine_pairs derives both in a single action). Anchoring
    at min(id) means the A codebook is non-empty for any non-empty
    corpus — ids need not be dense from 0; a corpus whose ids start at
    1000 buckets identically to the same corpus shifted to 0.

    codebook="prefix" (default) scores full unit vectors against the
    raw id-block codebooks — training-free, deterministic, reproducible
    by any engine from the data alone. codebook="trained" is true
    subspace product quantization (Jégou et al., TPAMI 2011): the unit
    vector is split in half, and each half gets its own
    squared-Euclidean Lloyd-trained codebook (k = c1 resp. c2, `iters`
    fixed rounds, init = the same id blocks — see _lloyd_euclid), so
    bucket quality no longer hinges on the id-prefix vectors being
    spread out; recall vs the exact kernel is floor-pinned on a
    shuffled-id corpus in tests/test_operators.py. Training cost is
    iters narrow passes per half (min_by partial agg); the halves are
    persisted for training and re-derived once for the final scoring
    pass.

    Output: (bucket BIGINT, id BIGINT, uv ARRAY<DOUBLE>) — one row per
    (vector, probed bucket).
    """
    c1, c2 = grid
    unit = emb.select(
        F.col(id_col).cast("bigint").alias("id"), _unit(F.col(vec_col)).alias("uv")
    )
    if id_offset is None:
        id_offset = emb.agg(F.min(F.col(id_col).cast("bigint"))).first()[0]
    off = int(id_offset or 0)
    # each branch yields narrow scored frames (id, cell, o) with o
    # ASCENDING-better — (o, cell) struct sort ≡ ORDER BY score, cell,
    # bit-identical to the oracle's row_number tie-break. NaN care: the
    # trained branch's d2 is ascending in BOTH engines (NaN ranks last
    # everywhere), but the prefix branch negates a dot whose oracle
    # orders `cs DESC` — and both engines put NaN FIRST under DESC, so
    # a NaN score (an all-zero embedding inside the codebook block
    # normalizes to NaN) must map to -inf here, not stay NaN (Spark's
    # ascending sort would otherwise rank it LAST and the engines would
    # pick different cells)
    if codebook == "trained":
        half = (F.size("uv") / 2).cast("int")
        avecs = unit.select("id", F.slice("uv", F.lit(1), half).alias("hv")).persist()
        bvecs = unit.select(
            "id", F.slice("uv", half + 1, (F.size("uv") - half).cast("int")).alias("hv")
        ).persist()
        try:
            # the two subspace trainings are INDEPENDENT jobs — overlap
            # them (guide §2.6) so the B training back-fills executor
            # slots the A training's job tail leaves idle; each call
            # ends in its own eager localCheckpoint, so both codebooks
            # are materialized when the pool joins
            from concurrent.futures import ThreadPoolExecutor

            from pyspark import inheritable_thread_target

            # inheritable_thread_target(session) is only a decorator
            # factory under py4j pinned-thread mode (the default); with
            # PYSPARK_PIN_THREAD=false the fallback returns its argument
            # unchanged — i.e. the SparkSession itself, not a callable
            # (round-20 ADVICE). Guard on callability and run the
            # trainings without thread-property inheritance in that
            # legacy mode (plain functions still work there because
            # non-pinned py4j shares one JVM thread anyway).
            _inherit = inheritable_thread_target(emb.sparkSession)
            if not callable(_inherit):
                _inherit = lambda fn: fn  # noqa: E731
            with ThreadPoolExecutor(max_workers=2) as pool:
                fa = pool.submit(
                    _inherit(_lloyd_euclid), avecs, c1, iters, off
                )
                fb = pool.submit(
                    _inherit(_lloyd_euclid), bvecs, c2, iters, off + c1
                )
                ac = fa.result().select(
                    F.col("cent_id").cast("bigint").alias("a_id"),
                    F.col("cv").alias("av"),
                )
                bc = fb.result().select(
                    F.col("cent_id").cast("bigint").alias("b_id"),
                    F.col("cv").alias("bv"),
                )
        finally:
            # training materialized eagerly (per-iteration localCheckpoint
            # cut ac/bc loose); the final scoring below re-derives the
            # halves from the scan once — one narrow pass, no cache leak
            avecs.unpersist()
            bvecs.unpersist()
        # score the halves inline over unit (same slice expressions
        # that defined avecs/bvecs — identical arithmetic); the
        # persisted half frames now serve only the training passes
        a_score = lambda hv: lambda c: F.struct(  # noqa: E731
            _sqdist(hv, c["cv"]).alias("o"), c["cent_id"].alias("cid")
        )
        hv_a = F.slice(F.col("uv"), F.lit(1), half)
        hv_b = F.slice(F.col("uv"), half + 1, (F.size("uv") - half).cast("int"))
        a_scored = F.transform(F.col("acarr"), a_score(hv_a))
        b_scored = F.transform(F.col("bcarr"), a_score(hv_b))
    elif codebook == "prefix":
        ac = unit.filter((F.col("id") >= off) & (F.col("id") < off + c1)).select(
            (F.col("id") - off).alias("a_id"), F.col("uv").alias("av")
        )
        bc = unit.filter(
            (F.col("id") >= off + c1) & (F.col("id") < off + c1 + c2)
        ).select((F.col("id") - off - c1).alias("b_id"), F.col("uv").alias("bv"))
        neg_inf = F.lit(float("-inf"))
        cos_score = lambda c: F.struct(  # noqa: E731
            F.nanvl(-_dot(F.col("uv"), c["cv"]), neg_inf).alias("o"),
            c["cent_id"].alias("cid"),
        )
        a_scored = F.transform(F.col("acarr"), cos_score)
        b_scored = F.transform(F.col("bcarr"), cos_score)
    else:
        raise ValueError(f"unknown codebook {codebook!r}: use 'prefix' or 'trained'")
    # ONE narrow pass assigns every vector (round 20, guide §2.4/§8.4):
    # both subspace codebooks are collected to single array rows
    # (broadcast, same O(√C) payload as before) and each row computes
    # its top-n_probe A cells (slice(array_sort) — the exact
    # collect_list/array_sort/slice comparator the per-id aggregation
    # used) and best B cell (array_min ≡ min_by by (o, b_id)) inline.
    # The former shape — two broadcast cross joins, two groupBy(id)
    # exchanges, an aassign⋈bassign join and a cells⋈unit re-attach of
    # the vector column — collapses to zero exchanges. Empty/sparse
    # codebook semantics preserved: an empty A array explodes to no
    # rows (the old inner join dropped the id the same way); an empty B
    # array yields NULL → coalesce to cell 0 (the old LEFT join rule).
    acarr = _codebook_row(ac, "a_id", "av").withColumnRenamed("carr", "acarr")
    bcarr = _codebook_row(bc, "b_id", "bv").withColumnRenamed("carr", "bcarr")
    a_top = F.slice(F.array_sort(a_scored), 1, n_probe)["cid"]
    b_best = F.array_min(b_scored)["cid"]
    return (
        unit.join(F.broadcast(acarr), how="cross")
        .join(F.broadcast(bcarr), how="cross")
        .select(
            "id", "uv", F.explode(a_top).alias("a_id"), b_best.alias("b_id")
        )
        .select(
            (F.col("a_id") * c2 + F.coalesce(F.col("b_id"), F.lit(0))).alias("bucket"),
            "id",
            "uv",
        )
    )


def bucketed_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    n_centroids: int | None = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket_rows: int = 1024,
    min_centroids: int = 16,
    grid: tuple[int, int] | None = None,
    codebook: str = "prefix",
    iters: int = 2,
) -> DataFrame:
    """SemDeDup-style within-bucket near-duplicate pair detection — the
    100 TB path for embedding dedup (Abbas et al. 2023, "SemDeDup":
    cluster the corpus, compare only within clusters).

    Bucketing has two modes:

    * n_centroids=<int> — flat: each vector probes its n_probe nearest
      of C deterministic centroids (the first C vectors by id). Kept for
      small fixed codebooks and test pinning.
    * n_centroids=None (registry default) — ADAPTIVE TWO-LEVEL: the
      bucket count C = max(min_centroids, ceil(n/target_bucket_rows))
      tracks the corpus (fixed target bucket size ⇒ the within-bucket
      matmul total Σ_b n_b² ≈ n²·n_probe/C stays linear — a fixed C is
      quadratic in disguise, measured 11× wall at 30× data with C=16),
      and C is factored into a c1×c2 product grid of two O(√C)
      codebooks (see bucketed_assign). That keeps the ASSIGNMENT stage
      sublinear too: the flat adaptive scheme scored every vector
      against all C centroids — O(n·C) = O(n²/target) once C ∝ n, with
      an O(C)-row broadcast — while the product grid scores c1+c2+
      ≈ 3√C dots per vector with two O(√C)-row broadcasts. The one
      agg action deriving (n, min id) is the same class of runtime
      statistic AQE gathers; the oracle mirrors the derivation from a
      count(*)/min() CTE. Codebook blocks anchor at min(id), so ids
      need not be dense from 0. (`grid` forces an explicit (c1, c2) —
      test hook.)

    Candidate recall vs the exact all-pairs kernel is the probability
    both endpoints share a probed bucket — high when the threshold sits
    above the corpus's background similarity (real near-dup regimes,
    ~0.9), and intentionally partial when it does not; the declared
    semantic IS within-probed-bucket dedup, which the SQL oracle
    reproduces exactly (bit-for-bit bucket assignment — codebooks are
    corpus vectors at deterministic ids, portable to any engine). For
    exact all-pairs semantics on small corpora use cosine_pairs.

    The kernel tiles the within-bucket matmul in 4096-row stripes, so
    even a skew-bloated bucket is processed in bounded memory (tiling
    bounds the sims tile at 4096×n_b doubles).

    Output: id_a, id_b, cosine (id_a < id_b, cosine ≥ threshold,
    distinct across shared buckets).
    """
    from pyspark.sql import Window

    if grid is not None or n_centroids is None:
        if grid is None:
            # one action derives BOTH runtime statistics (row count for
            # the adaptive grid, min id anchoring the codebook blocks)
            stats = emb.agg(
                F.count(F.lit(1)), F.min(F.col(id_col).cast("bigint"))
            ).first()
            grid = product_grid(stats[0], target_bucket_rows, min_centroids)
            members = bucketed_assign(
                emb, grid, n_probe, vec_col, id_col,
                id_offset=stats[1], codebook=codebook, iters=iters,
            )
        else:
            members = bucketed_assign(
                emb, grid, n_probe, vec_col, id_col, codebook=codebook, iters=iters
            )
    else:
        unit = emb.select(
            F.col(id_col).cast("bigint").alias("id"), _unit(F.col(vec_col)).alias("uv")
        )
        cents = unit.filter(F.col("id") < n_centroids).select(
            F.col("id").alias("cent_id"), F.col("uv").alias("cv")
        )
        scored = F.broadcast(cents).join(unit, how="cross").select(
            "id", "cent_id", "uv", _dot(F.col("uv"), F.col("cv")).alias("cs")
        )
        w = Window.partitionBy("id").orderBy(F.col("cs").desc(), F.col("cent_id"))
        members = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= n_probe)
            .select(F.col("cent_id").alias("bucket"), "id", "uv")
        )

    def bucket_kernel(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.stack(pdf["uv"].to_numpy())
        # stripe the matmul: a 4096×n_b sims tile at a time, so an
        # oversized (skew) bucket costs memory O(stripe·n_b), never n_b²
        out = [empty]
        stripe = 4096
        for s in range(0, len(ids), stripe):
            sims = mat[s : s + stripe] @ mat.T
            ii, jj = np.nonzero(sims >= threshold)
            gi, gj = ids[s + ii], ids[jj]
            keep = gi < gj
            out.append(
                pd.DataFrame(
                    {"id_a": gi[keep], "id_b": gj[keep], "cosine": sims[ii, jj][keep]}
                )
            )
        return pd.concat(out, ignore_index=True)

    # one grouped pass per bucket — no self-join anywhere: pairs are
    # born inside the kernel, so no n² join-row materialization and no
    # ambiguous-self-join hazard
    pairs = members.groupBy("bucket").applyInPandas(
        bucket_kernel, schema="id_a BIGINT, id_b BIGINT, cosine DOUBLE"
    )
    # a pair sharing several probed buckets is emitted once per shared
    # bucket with an identical rounded score — distinct collapses them
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine")).distinct()


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold (exact).

    Plan: block-tiled distributed self-join. Every vector is hashed to
    one of n_blocks blocks; the n_blocks·(n_blocks+1)/2 unordered block
    pairs are enumerated as a tiny broadcast tile table; each side
    equi-joins to the tiles on its block id, and a cogrouped
    applyInPandas computes one BLAS matmul per tile, emitting only
    over-threshold pairs. Nothing is ever collected to the driver — the
    executors hold one (n/n_blocks)×d tile pair at a time — and no n²
    join row materialization happens (pairs exist only inside the
    kernel). Shuffle volume is 2·n_blocks copies of the unit vectors;
    raise n_blocks so a tile fits executor memory (rows/n_blocks × dim
    doubles per side).

    The all-pairs contract itself is quadratic compute — that's what
    the operator promises (the oracle checks exact pair parity). At
    corpus scale prefer bucketing first (minhash_lsh_pairs / ivf
    assignment) and run this kernel within buckets.

    Float note: numpy's blocked dot differs from sequential summation
    by ≤1 ulp; emitted values are rounded to 6 decimals, so results are
    stable across engines except for pairs within ~1e-15 of the
    threshold (never observed in the driver gate; an exact sequential
    fallback would trade 10× wall time for that last ulp).

    Output: id_a, id_b, cosine (id_a < id_b).
    """
    spark = emb.sparkSession

    def side(tile_col: str) -> DataFrame:
        # each side is built from scratch so its attributes carry fresh
        # expression ids — the cogroup below is a self-join by content,
        # and shared ids would trip Spark's ambiguous-self-join check
        unit = emb.select(
            F.col(id_col).cast("bigint").alias("id"), _unit(F.col(vec_col)).alias("uv")
        ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
        tiles = spark.createDataFrame(
            [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
            "ba INT, bb INT",
        )
        return unit.join(F.broadcast(tiles), F.col("blk") == F.col(tile_col)).select(
            "ba", "bb", "id", "uv"
        )

    left = side("ba")
    right = side("bb")

    def tile_kernel(key, lpdf, rpdf):
        import numpy as np
        import pandas as pd

        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame(
                {
                    "id_a": np.array([], dtype=np.int64),
                    "id_b": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                }
            )
        lids = lpdf["id"].to_numpy(dtype=np.int64)
        rids = rpdf["id"].to_numpy(dtype=np.int64)
        lmat = np.stack(lpdf["uv"].to_numpy())
        rmat = np.stack(rpdf["uv"].to_numpy())
        sims = lmat @ rmat.T
        ii, jj = np.nonzero(sims >= threshold)
        gi, gj = lids[ii], rids[jj]
        if key[0] == key[1]:
            # diagonal tile: both sides are the same rows — keep one
            # orientation and drop self-pairs in a single predicate
            keep = gi < gj
            id_a, id_b = gi[keep], gj[keep]
        else:
            # off-diagonal tile: each unordered pair appears exactly once
            # (the two blocks are disjoint); order the ids on emit
            keep = slice(None)
            id_a, id_b = np.minimum(gi, gj), np.maximum(gi, gj)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cosine": sims[ii, jj][keep]})

    out = (
        left.groupBy("ba", "bb")
        .cogroup(right.groupBy("ba", "bb"))
        .applyInPandas(tile_kernel, schema="id_a BIGINT, id_b BIGINT, cosine DOUBLE")
    )
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def knn_label_report(
    emb: DataFrame,
    k: int = 5,
    query_mod: int = 10,
    screened: bool = True,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    grid: tuple[int, int] | None = None,
) -> DataFrame:
    """kNN majority-vote label-accuracy report — the embedding-quality
    eval core shared by the registry entry (queries.q_knn_label_accuracy,
    screened=True) and the brute-force ground truth it is
    agreement-floor-pinned against (screened=False,
    tests/test_operators.py::test_knn_screened_agreement).

    Queries are the deterministic id-mod sample (id % query_mod == 0).

    screened=True — the 100 TB path: candidates for a query are the
    vectors sharing one of its n_probe probed product-quantizer buckets
    (bucketed_assign over the adaptive c1×c2 grid — the same sublinear
    inverted-file machinery as bucketed_cosine_pairs), so per-query
    candidate count is bounded by n_probe × target bucket size instead
    of the corpus: candidate generation is a narrow (bucket, id) equi-
    join, and the exact sequential-fold cosine re-score touches only
    candidates. screened=False — exact brute force: every query scores
    the whole corpus (quadratic by contract; test/ground-truth only).

    Both paths share the tail: top-k by (cosine DESC, neighbor_id),
    majority vote with ties toward the smaller label, per-label
    n/correct/accuracy. Output: (label, n_queries, n_correct, accuracy).

    Denominator caveat (screened=True): a query whose n_probe probed
    buckets contain NO other vector produces no candidate rows and is
    silently absent from the report — so per-label n_queries can be
    smaller than the screened=False ground truth for reasons other than
    vote disagreement. Compare accuracies between the two paths only on
    the intersection of reported queries (what
    test_knn_screened_agreement does), or treat missing queries as
    abstentions. At the registry's adaptive grid (target bucket ≈ √n
    rows) singleton buckets are rare; they matter on tiny or highly
    clustered corpora.
    """
    from pyspark.sql import Window

    unit = emb.select(
        F.col(id_col).cast("bigint").alias("vid"),
        F.col(label_col).alias("lbl"),
        _unit(F.col(vec_col)).alias("uv"),
    )
    qside = unit.select(
        F.col("vid").alias("query_id"),
        F.col("lbl").alias("true_label"),
        F.col("uv").alias("qv"),
    )
    cside = unit.select(
        F.col("vid").alias("neighbor_id"),
        F.col("lbl").alias("neighbor_label"),
        F.col("uv").alias("cv"),
    )
    if screened:
        if grid is None:
            # one action derives both runtime statistics (adaptive grid
            # size, codebook anchor) — the bucketed_cosine_pairs discipline
            n_rows, min_id = emb.agg(
                F.count(F.lit(1)), F.min(F.col(id_col).cast("bigint"))
            ).first()
            grid = product_grid(n_rows)
            members = bucketed_assign(
                emb, grid, n_probe, vec_col, id_col, id_offset=min_id
            )
        else:
            members = bucketed_assign(emb, grid, n_probe, vec_col, id_col)

        # Per-bucket BLAS kernel, the bucketed_cosine_pairs shape: the
        # probed assignment is shuffled ONCE by bucket, each bucket does
        # one queries×members matmul and emits only its per-query top-k
        # (k rows per query per bucket, never the candidate pairs).
        # The earlier join formulation materialized every candidate
        # pair through two vector-fat joins — ~22M rows × 512 B vectors
        # shuffled twice at 30× sf0.1 (measured 47 s); the kernel emits
        # ≤ n_probe·k rows per query. Per-bucket top-k then global
        # top-k is LOSSLESS: every global top-k candidate is within the
        # top-k of any bucket it shares with the query under the same
        # (cosine desc, id) total order. Cosines are rounded to 6
        # decimals BEFORE ranking so numpy's blocked matmul, the
        # oracle's sequential list_sum fold, and a pair scored in two
        # different buckets all agree on the order (the
        # bucketed_cosine_pairs float discipline).
        def bucket_topk(pdf):
            import numpy as np
            import pandas as pd

            empty = pd.DataFrame(
                {
                    "query_id": np.array([], dtype=np.int64),
                    "neighbor_id": np.array([], dtype=np.int64),
                    "cosine": np.array([], dtype=np.float64),
                }
            )
            ids = pdf["id"].to_numpy(dtype=np.int64)
            qmask = ids % query_mod == 0
            if len(pdf) < 2 or not qmask.any():
                return empty
            mat = np.stack(pdf["uv"].to_numpy())
            qids, qmat = ids[qmask], mat[qmask]
            out = [empty]
            stripe = 1024
            for s in range(0, len(qids), stripe):
                # np.round is round-half-to-even vs the oracle's
                # half-away-from-zero: divergence needs a cosine landing
                # EXACTLY on a 5e-7 boundary (measure-zero for dot
                # products of normalized doubles; same discipline as
                # bucketed_cosine_pairs). If ever bitten, switch both
                # sides to floor(x*1e6 + 0.5)/1e6.
                sims = np.round(qmat[s : s + stripe] @ mat.T, 6)
                sims[ids[None, :] == qids[s : s + stripe, None]] = -np.inf
                for r in range(sims.shape[0]):
                    row = sims[r]
                    order = np.lexsort((ids, -row))[:k]
                    keep = order[row[order] != -np.inf]
                    out.append(
                        pd.DataFrame(
                            {
                                "query_id": qids[s + r],
                                "neighbor_id": ids[keep],
                                "cosine": row[keep],
                            }
                        )
                    )
            return pd.concat(out, ignore_index=True)

        pairs = members.groupBy("bucket").applyInPandas(
            bucket_topk, schema="query_id BIGINT, neighbor_id BIGINT, cosine DOUBLE"
        )
        # a pair sharing both probed buckets arrives once per bucket
        # with an identical rounded score — collapse, then global top-k
        best = pairs.groupBy("query_id", "neighbor_id").agg(
            F.max("cosine").alias("cosine")
        )
        wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
        knn = (
            best.withColumn("rnk", F.row_number().over(wk))
            .filter(F.col("rnk") <= k)
            .join(qside.select("query_id", "true_label"), "query_id")
            .join(cside.select("neighbor_id", "neighbor_label"), "neighbor_id")
        )
    else:
        scored = (
            F.broadcast(qside.filter(F.col("query_id") % query_mod == 0))
            .join(cside, F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "true_label",
                "neighbor_id",
                "neighbor_label",
                _dot(F.col("qv"), F.col("cv")).alias("cosine"),
            )
        )
        wk = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
        knn = scored.withColumn("rnk", F.row_number().over(wk)).filter(F.col("rnk") <= k)
    votes = knn.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count("*").alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), "neighbor_label")
    pred = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", "true_label", F.col("neighbor_label").alias("pred_label"))
    )
    correct = F.count(F.when(F.col("pred_label") == F.col("true_label"), 1))
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").alias("n_queries"),
        correct.alias("n_correct"),
        F.round(correct.cast("double") / F.count("*"), 6).alias("accuracy"),
    )


def mmr_rerank(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 3,
    pool: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein
    SIGIR'98), generalized over k (round-13 verdict item 7 — the
    registry entry's k=3 greedy steps were hand-unrolled; this is the
    driver loop over any k with the same plan shape).

    Greedily picks ``k`` of the top-``pool`` cosine candidates for
    ``query_id``, maximizing λ·relevance − (1−λ)·max-similarity-to-
    already-picked — the redundancy-suppressing step between ANN
    retrieval and an LLM context window. Pick 1's penalty is zero (max
    over the empty set), so every reported score is uniformly
    λ·rel − (1−λ)·penalty.

    Plan shape (unchanged from the unrolled form): the ONLY corpus-
    bound stage is the candidate top-``pool``, which compiles to
    TakeOrderedAndProject (no global sort). Each greedy step is a
    DataFrame over the persisted ``pool``-row candidate frame with
    r−1 broadcast 1-row crosses — pool- and k-bounded, never corpus-
    bound. The persisted pool is the loop's working set; callers that
    materialize the result promptly may unpersist via
    ``spark.catalog.clearCache()``; the frame is pool-row tiny either
    way. Dot products are sequential folds (bit-identical doubles
    cross-engine); raw-score ordering with id tie-break is
    deterministic; callers round at output.

    Output: rank (1..k), neighbor_id, score (unrounded double).
    """
    if k < 1 or pool < k:
        raise ValueError(f"need 1 <= k <= pool, got k={k}, pool={pool}")
    unit = emb.select(id_col, _unit(F.col(vec_col)).alias("uv"))
    q = unit.filter(F.col(id_col) == query_id).select(F.col("uv").alias("qv"))
    cand = (
        unit.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, "uv", _dot(F.col("qv"), F.col("uv")).alias("rel"))
        .orderBy(F.col("rel").desc(), id_col)
        .limit(pool)
        .persist()
    )
    picks = []  # 1-row frames: (vec_id, score)
    picked_vecs = []  # 1-row frames: (pid, pv)
    for _ in range(k):
        rest = cand
        pen = None
        for i, p in enumerate(picked_vecs):
            rest = rest.crossJoin(
                F.broadcast(
                    p.select(
                        F.col("pid").alias(f"pid{i}"),
                        F.col("pv").alias(f"pv{i}"),
                    )
                )
            )
            d = _dot(F.col("uv"), F.col(f"pv{i}"))
            pen = d if pen is None else F.greatest(pen, d)
        for i in range(len(picked_vecs)):
            rest = rest.filter(F.col(id_col) != F.col(f"pid{i}"))
        score = (
            F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * pen
            if pen is not None
            else F.lit(lam) * F.col("rel")
        )
        nxt = (
            rest.select(id_col, "uv", score.alias("score"))
            .orderBy(F.col("score").desc(), id_col)
            .limit(1)
        )
        picks.append(nxt.select(id_col, "score"))
        picked_vecs.append(
            nxt.select(F.col(id_col).alias("pid"), F.col("uv").alias("pv"))
        )
    out = None
    for r, p in enumerate(picks, start=1):
        row = p.select(
            F.lit(r).alias("rank"),
            F.col(id_col).alias("neighbor_id"),
            F.col("score").alias("score"),
        )
        out = row if out is None else out.unionAll(row)
    return out
