"""Approximate / near-duplicate detection: MinHash+LSH, shingle
Jaccard, SimHash.

Hash choice: md5 hex strings, compared lexicographically. md5 is
available and bit-identical in every engine (Spark, DuckDB, Trino…), and
the minimum of hex strings is a valid min-hash (uniform over the token
universe), so signatures are portable for oracle checking — no
engine-specific hash() in the contract.

Scale design (the LSH path is the 100 TB story):
- signatures: explode(distinct tokens) → groupBy(doc) with H min-aggs.
  One shuffle on doc_id; map-side partial mins keep shuffle volume at
  O(docs × H), independent of token count.
- banding: signatures → (band_id, band_hash) pairs; candidate pairs come
  from a self-equi-join on the band hash — i.e. only docs that collide
  in some band are ever paired. Never all-pairs. Band-hash hot buckets
  (boilerplate docs) are the skew risk: cap bucket size or salt in a
  real deployment; AQE skew-join splitting covers moderate skew.
- shingle path: 5-gram shingles are near-unique, so the shingle
  equi-join produces a candidate set ≈ true near-dups, and exact Jaccard
  is computed only for candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize


def _exploded_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.array_distinct(tokenize(text_col))
    return docs.select(F.col(id_col), F.explode(toks).alias("tok"))


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: mh_i = min over distinct tokens of
    md5(i ':' token). Columns: id, mh0..mh{H-1} (hex strings).

    `tokens` optionally supplies a pre-built (id, tok) exploded-distinct
    frame so ensemble pipelines (dedup_candidates_union) can tokenize
    once, persist, and feed several signal generators."""
    ex = tokens if tokens is not None else _exploded_tokens(docs, text_col, id_col)
    return ex.groupBy(id_col).agg(*minhash_signature_aggs(num_hashes))


def minhash_signature_aggs(num_hashes: int = 8) -> list:
    """The MinHash min-aggregates over the `tok` column — exposed so a
    caller aggregating the token frame for several signals at once can
    ride them on its own groupBy (guide §2.3)."""
    return [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("tok")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 4,
    max_bucket: int = 64,
    tokens: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing at least one LSH band
    (band hash = md5 over its rows_per_band signature slots).
    Output: (id_a, id_b) with id_a < id_b, distinct.

    max_bucket drops band buckets with more members than the cap before
    pairing — the standard guard in LSH dedup pipelines: an oversized
    bucket means the band carries no discriminative signal (boilerplate
    / tiny vocabulary), and pairing it is O(bucket²) for no precision.
    At 100 TB this cap is what bounds the worst-case join fan-out.

    `sig` optionally supplies a pre-built signature frame (id, mh0..)
    so a caller that already materialized signatures can band it
    directly without re-aggregating."""
    if sig is None:
        sig = minhash_signatures(docs, text_col, id_col, num_hashes, tokens=tokens)
    exploded = minhash_bands(sig, id_col, num_hashes, rows_per_band)
    from pyspark.sql import Window

    bucket_n = F.count("*").over(Window.partitionBy("band", "bh"))
    exploded = exploded.withColumn("__n", bucket_n).filter(F.col("__n") <= max_bucket).drop("__n")
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_bands(
    sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode a MinHash signature frame into (id, band, band_hash)
    rows — the LSH bucketing key shared by self-dedup
    (minhash_lsh_pairs) and incremental batch-vs-corpus dedup."""
    bands = []
    for b in range(num_hashes // rows_per_band):
        slots = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *slots)).alias("bh"))
        )
    return sig.select(F.col(id_col), F.explode(F.array(*bands)).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )


def hashed_shingle_frame(
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Distinct per-doc hashed n-gram shingles: (id[, extras], sh) rows
    with sh = xxhash64 of the space-joined n-token window.

    Built by exploding the POSITION sequence and slicing in a top-level
    projection — whole-stage codegen — rather than exploding a
    transform()-lambda array: Spark evaluates higher-order lambdas
    interpreted per element, measured 3.7× slower at 30× sf0.1
    (10.1 s vs 2.7 s) for the same output. distinct() on the hashed
    rows gives array_distinct semantics (a 2⁻⁶⁴ in-doc hash collision
    is the only possible difference)."""
    toks = tokenize(text_col)
    t = docs.select(F.col(id_col), *extra_cols, toks.alias("toks"))
    n_pos = F.greatest(F.size("toks") - (n - 1), F.lit(0))
    return (
        t.filter(n_pos > 0)
        .select(F.col(id_col), *extra_cols, F.explode(F.sequence(F.lit(1), n_pos)).alias("i"), "toks")
        .select(
            F.col(id_col),
            *extra_cols,
            F.xxhash64(F.concat_ws(" ", F.slice("toks", F.col("i"), n))).alias("sh"),
        )
        .distinct()
    )


def shingle_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.2,
    max_df: int = 64,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share ≥1 shingle.

    Join is on shingle value (near-unique for n≥5), so candidate volume
    stays proportional to true overlap rather than |docs|². Shingles are
    hashed to 64-bit ints (native xxhash64) before the join: the
    shuffle carries 8 bytes per shingle instead of an ~n-word string
    and the equi-join compares ints. The hash is internal to the join —
    the operator's OUTPUT (pairs + Jaccard) is hash-free, so the oracle
    can join on raw shingles; collisions (~n²/2⁶⁴) would be the only
    observable difference and don't occur at any realistic corpus.

    max_df caps shingle document frequency BEFORE the self-join — the
    same guard as minhash_lsh_pairs' max_bucket: one boilerplate
    shingle shared by k docs would otherwise emit O(k²) join rows, the
    classic skew scale-killer. A shingle in more than max_df docs
    carries no near-dup signal, so the Jaccard universe is defined as
    the df ≤ max_df shingles: both the candidate join AND the per-doc
    set sizes use the capped set (the oracle mirrors this exactly).
    Output: id_a, id_b, n_shared, jaccard (double).
    """
    sh = hashed_shingle_frame(docs, n, text_col, id_col)
    from pyspark.sql import Window

    # document frequency per shingle (rows are distinct per doc already)
    sh = (
        sh.withColumn("__df", F.count("*").over(Window.partitionBy("sh")))
        .filter(F.col("__df") <= max_df)
        .drop("__df")
    )
    # the exploded+hashed+capped shingle set feeds the sizes agg and both
    # self-join sides; without persisting, Catalyst re-derives the whole
    # tokenize→shingle→hash→window pipeline per consumer. At warehouse
    # scale this intermediate would be a staged table; in-process,
    # MEMORY_AND_DISK.
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_shared").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", "n_shared", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 15,
    probe_convergence: bool = True,
) -> DataFrame:
    """Connected components over near-dup candidate pairs: every doc
    gets the minimum doc id of its component as cluster_id (the
    canonical representative) — the clustering step that turns pairwise
    near-dup detection into dedup groups.

    Iterative min-label propagation over DataFrames: per round, each
    node takes the min of its own label and its neighbors' labels;
    converges in O(component diameter) rounds (near-dup clusters are
    shallow). Each round is one join + one aggregation; the loop runs
    on the driver but all data stays distributed — the standard
    DataFrame-only connected-components shape when a graph library
    isn't warranted.

    probe_convergence=True stops as soon as a round changes no label,
    at the cost of one tiny (limit-1) driver action per round.
    probe_convergence=False runs exactly max_iterations rounds with no
    mid-loop driver round-trips — the kmeans_centroids fixed-iteration
    design: pick it when the component diameter bound is known (k
    rounds cover diameter 2^k − 1, since each round halves path
    lengths toward the minimum) and scheduler round-trips dominate,
    e.g. many small clustering jobs driven by one orchestrator.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lab").alias("nlab"))
        )
        # the round keeps a per-node __chg flag (new label < old label —
        # labels only ever decrease) so the convergence probe below is a
        # filter over the ALREADY-CHECKPOINTED frame instead of a second
        # join+shuffle of old vs new labels per round (optimization
        # round 20; the propagated label expression is unchanged)
        new_lab = F.least(
            F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                new_lab.alias("lab"),
                (new_lab < F.col("lab")).alias("__chg"),
            )
        )
        # localCheckpoint, not persist: persist caches data but the
        # LOGICAL plan still nests one join deeper per round, and deep
        # components (long chains) overflow the planner around ~10
        # rounds; checkpointing truncates lineage each iteration
        new_labels = new_labels.localCheckpoint(eager=True)
        if probe_convergence:
            changed = new_labels.filter(F.col("__chg")).limit(1).count()
            labels = new_labels.drop("__chg")
            if changed == 0:
                break
        else:
            labels = new_labels.drop("__chg")
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id"))


def simhash_token_hash(bits: int = 60) -> Column:
    """Portable token hash of the `tok` column: first bits/4 md5 hex
    chars as a (positive, < 2^60) bigint — identical across engines."""
    return F.conv(F.substring(F.md5(F.col("tok")), 1, bits // 4), 16, 10).cast(
        "bigint"
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    tokens: DataFrame | None = None,
) -> DataFrame:
    """60-bit SimHash per doc from token md5 prefixes.

    Token hash = first bits/4 md5 hex chars as an int (portable; 15 hex
    chars = 60 bits keeps the value positive in a signed 64-bit int in
    every engine); bit j of the fingerprint is the sign of
    Σ_tokens (2·bit_j(hash) − 1). 60 bits, not 32: at corpus scale a
    32-bit fingerprint at hamming ≤ 3 is collision-dense on
    template-heavy text (measured: 1.6M pairs over 5k synthetic docs) —
    the same reason production simhash dedup uses 64-bit fingerprints.

    Implemented as explode(tokens × bits) → two hash-aggregations —
    shuffle O(docs × bits) after map-side partials, fine for a
    fingerprint stage. Round-21 measurement note (guide §1 — measure,
    then keep what wins): a single groupBy(doc) with 61 sum/count
    accumulators (one shuffle, no 60× row explosion) was built and
    A/B'd at sf0.1 — it LOST in steady state (fingerprint 1.16 s vs
    0.35 s under the bench action; Manku pairs 4.9 s vs 3.3 s) both as
    a post-aggregation fold (CollapseProject inlines the 60-term fold
    into every downstream band/key expression) and with the fold inside
    the aggregate's result expression (the 61-wide update path loses
    codegen efficiency), so the explode form stays. At extreme scale
    the per-doc loop would move into one pandas_udf projection (no
    shuffle at all), kept expression-only here for oracle parity.
    """
    ex = tokens if tokens is not None else _exploded_tokens(docs, text_col, id_col)
    ex = ex.select(id_col, simhash_token_hash(bits).alias("h"))
    bit = ex.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"), F.col("h")
    ).select(
        id_col,
        "j",
        # python wrapper of shiftright only takes int shifts; the SQL
        # expression accepts a column shift amount
        (F.expr("shiftright(h, j)").bitwiseAND(F.lit(1)) * 2 - 1).alias("s"),
    )
    perbit = bit.groupBy(id_col, "j").agg(F.sum("s").alias("tot"))
    fp = F.sum(
        F.when(F.col("tot") > 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(0)
    )
    return perbit.groupBy(id_col).agg(fp.alias("simhash"))


def simhash_band_pairs(
    fp: DataFrame, id_col: str = "doc_id", hamming_max: int = 3, bits: int = 60
) -> DataFrame:
    """Near-dup pairs from SimHash fingerprints within hamming distance
    `hamming_max` (≤ 3): banded LSH plan, not all-pairs.

    The fingerprint splits into 4 bands of bits/4 bits (15-bit bands
    for the 60-bit default — 32k values per band, so random band
    collisions are ~n²/2¹⁵ per band, not the n²/2⁸ of byte bands);
    ≤3 differing bits touch ≤3 of the 4 bands, so every qualifying
    pair shares at least one band value exactly (pigeonhole) —
    candidates come from an equi-join on (band index, band value),
    then the exact hamming filter and a distinct (a pair can collide
    in several bands). Output is identical to the all-pairs form (the
    oracle runs all-pairs); the plan scales with candidate count, not
    n². One exploded-band plan aliased twice: AQE broadcasts one side
    on small corpora, or reuses one shuffle (ReusedExchange) when both
    sides sort-merge."""
    band_bits = bits // 4
    mask = (1 << band_bits) - 1
    exploded = fp.withColumn(
        "band", F.explode(F.array(*[F.lit(j) for j in range(4)]))
    ).withColumn(
        "val",
        F.expr(
            f"cast(shiftright(simhash, cast(band * {band_bits} as int)) & {mask} as int)"
        ),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
        .distinct()
    )


def simhash_manku_pairs(
    fp: DataFrame,
    id_col: str = "doc_id",
    hamming_max: int = 3,
    bits: int = 60,
    blocks: int = 6,
) -> DataFrame:
    """Near-dup pairs within hamming distance `hamming_max` — the
    MULTI-BLOCK banding of Manku, Jain & Das Sarma (WWW 2007, Google's
    web-scale simhash dedup), the at-scale sibling of the 4-band
    simhash_band_pairs: the fingerprint splits into `blocks` (6) blocks
    of bits/blocks (10) bits, and for EVERY combination of
    blocks − hamming_max (3) blocks the concatenation of those blocks
    is a join key. ≤ hamming_max differing bits touch ≤ hamming_max
    blocks, so some key combination is untouched (pigeonhole) — recall
    is exact, identical output to all-pairs.

    Why this wins at corpus scale: the 4×15 scheme's RANDOM collision
    mass is n²/2¹⁵ per band — at 10⁹ docs its 32k-value band space
    saturates and candidates go quadratic regardless of true dup
    density. Here each key carries (blocks − hamming_max)·(bits/blocks)
    = 30 bits, so random collisions are n²/2³⁰ per table × C(6,3) = 20
    tables — ~6500× fewer random candidates. The price is explode
    fan-out 20 vs 4 rows per doc, and a true near-dup pair surfaces in
    up to C(blocks − touched, blocks − hamming_max) tables before the
    distinct — so on a DUPLICATE-DENSE corpus (where candidates are
    dominated by real pairs) the 4-band form is cheaper, and on a
    realistic sparse corpus this form is the one that survives 10⁹
    rows. Both are exact; pick by corpus regime."""
    import itertools

    block_bits = bits // blocks
    keep = blocks - hamming_max
    mask = (1 << block_bits) - 1
    combos = list(itertools.combinations(range(blocks), keep))

    def key_expr(combo):
        # concatenate the kept blocks into one integer key: shift-left
        # by block_bits per step (as multiplication — exact for the 30
        # result bits of a 64-bit signed value)
        k = F.lit(0).cast("bigint")
        for b in combo:
            blk = F.expr(f"shiftright(simhash, {b * block_bits}) & {mask}")
            k = k * (1 << block_bits) + blk
        return k

    keyed = fp.withColumn(
        "t",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("tbl"), key_expr(c).alias("key"))
                    for i, c in enumerate(combos)
                ]
            )
        ),
    ).select(id_col, "simhash", F.col("t.tbl").alias("tbl"), F.col("t.key").alias("key"))
    a, b = keyed.alias("a"), keyed.alias("b")
    joined = a.join(
        b,
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_max)
        .distinct()
    )


def deletion_neighborhood(col: Column | str, max_deletes: int = 2) -> Column:
    """Symmetric-delete neighborhood D≤k(s): the string plus every
    variant reachable by deleting up to `max_deletes` characters,
    deduplicated. All JVM-side higher-order functions (sequence /
    transform / flatten) — no Python, stays inside codegen.

    |D≤k(s)| = O(L^k) short keys for a length-L string — viable for
    short entity fields (names, SKUs, titles), not whole documents."""
    s = F.col(col) if isinstance(col, str) else col

    def del1(x: Column) -> Column:
        # guard length 0: sequence(1, 0) is DESCENDING [1, 0] and the
        # i=0 slot only works because substring(x, 1, -1) happens to
        # return '' — correctness must not hinge on that edge behavior
        return F.when(F.length(x) < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.length(x)),
                lambda i: F.concat(
                    F.substring(x, F.lit(1), i - 1), F.substring(x, i + 1, F.length(x))
                ),
            )
        )

    out = F.array(s)
    frontier = F.array(s)
    for _ in range(max_deletes):
        frontier = F.flatten(F.transform(frontier, del1))
        out = F.concat(out, frontier)
    return F.array_distinct(out)


def symdelete_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """ALL pairs within Levenshtein distance `max_dist`, found by
    symmetric-delete (SymSpell-style) blocking — exact recall by
    construction: if ed(a,b) ≤ k, an optimal alignment yields a common
    subsequence reachable by ≤k deletions from each side, so
    D≤k(a) ∩ D≤k(b) ≠ ∅ and the key equi-join sees every true pair.
    The final levenshtein filter restores precision (a shared deletion
    key only bounds ed ≤ 2k).

    100 TB design: hash equi-join on short deletion keys — no nested
    loop, no coarse single-character blocks. A deletion key shared by
    m records implies those m records are pairwise within ed ≤ 2k, so
    candidate mass tracks the data's true near-match mass; no df-cap
    is applied because a cap would break the recall guarantee. The
    cheap pruning predicates (id_a < id_b, |len(a) − len(b)| ≤ k) ride
    INSIDE the join condition, so never-viable pairs die before the
    distinct shuffle ever sees them.

    Skew hazard, accepted: a deletion key shared by m records emits m²
    join rows in one hash bucket (sequential ids whose trailing digits
    delete to a common stem are the classic case). Salting cannot
    remove this while keeping exact recall — pairs across salt groups
    must still meet — so the guards are (a) the in-join pruning above
    and (b) AQE skew-join splitting (`spark.sql.adaptive.skewJoin`,
    on in session.get_spark), which re-parallelizes an oversized
    partition by replicating the build side. If a domain tolerates
    bounded recall loss, cap per-key fan-out upstream instead.

    Output: id_a, id_b (id_a < id_b), edit_dist.
    """
    keyed = df.select(
        F.col(id_col), F.col(text_col),
        F.explode(deletion_neighborhood(text_col, max_dist)).alias("blk"),
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("name_a"),
        F.col("blk").alias("blk_a"),
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("name_b"),
        F.col("blk").alias("blk_b"),
    )
    return (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= max_dist),
        )
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()  # a pair can collide on many deletion keys
        .select(
            "id_a", "id_b", F.levenshtein("name_a", "name_b").alias("edit_dist")
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


def ssjoin_prefix_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    staging_dir: str | None = None,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering: all document
    pairs with n-gram-shingle Jaccard >= threshold, found without an
    all-shared-shingles self-join (SSJoin prefix filter, Chaudhuri et
    al. ICDE'06; PPJoin, Xiao et al. WWW'08; distributed form per
    Vernica/Carey/Li SIGMOD'10).

    The filter: order every doc's shingle set by one GLOBAL total
    order — ascending document frequency, i.e. rarest first (ties
    broken by the shingle hash, which is unique per shingle) — and
    keep only the first |set| - ceil(t·|set|) + 1 shingles as the
    doc's PREFIX. Any pair with Jaccard >= t must share at least one
    prefix shingle under ANY common total order (pigeonhole on the
    overlap lower bound), so joining on prefix shingles alone loses
    nothing; choosing the rarity order makes join buckets as small as
    the corpus allows (the hottest shingles never enter a prefix
    unless a doc's whole set is hot). Candidates then pass the length
    filter (t·|y| <= |x| <= |y|/t) before the exact verification —
    the arrays re-attach by two doc-keyed joins and
    size(array_intersect) computes the true overlap.

    vs shingle_jaccard_pairs: that operator joins on EVERY shared
    shingle in a df-capped universe (threshold 0.2 reporting, cap
    changes the measure); this one is the exact tau-join over the
    UNCAPPED universe with candidate volume bounded by prefix
    co-occurrence. On adversarial corpora where even rare-half
    shingles are hot, compose with the df-cap universe instead —
    exactness here is with respect to the true Jaccard.

    Output: id_a, id_b (id_a < id_b), n_shared, jaccard (double;
    integer division is bit-identical cross-engine).
    """
    sh = hashed_shingle_frame(docs, n, text_col, id_col)
    df_ = sh.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = sh.join(df_, "sh")
    arr = (
        ranked.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("ord"),
            F.count("*").alias("n_sh"),
        )
        .select(
            id_col,
            F.transform("ord", lambda s: s.getField("sh")).alias("shs"),
            "n_sh",
        )
    )
    # arr feeds the prefix explode AND both verify sides; stage it to a
    # parquet so the tokenize->shingle->df->sort pipeline runs once
    # (literally a staged table, as it would be at warehouse scale).
    # Parquet staging instead of persist(): the returned frame is lazy,
    # so a persist could never be unpersisted by this function and each
    # invocation would leak a corpus-sized cached frame into executor
    # storage memory for the life of the session. The location must be
    # EXECUTOR-visible (round-13 ADVICE: a driver-local tempdir is
    # incomplete on a multi-node cluster) — resolve_staging prefers the
    # caller's staging_dir, then the cluster-shared checkpoint dir, and
    # falls back to a local tempdir only for local-mode runs; cleanup
    # is atexit-deferred because the caller may collect long after we
    # return.
    from .staging import resolve_staging

    stage = resolve_staging(
        docs.sparkSession, "ssjoin_prefix_stage_", staging_dir
    )
    arr.write.mode("overwrite").parquet(stage)
    arr = docs.sparkSession.read.parquet(stage)
    t = F.lit(float(threshold))
    plen = F.col("n_sh") - F.ceil(t * F.col("n_sh")) + 1
    prefix = arr.select(
        F.col(id_col), "n_sh", F.explode(F.slice("shs", F.lit(1), plen)).alias("sh")
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("na"), "sh"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb"), "sh"
    )
    cand = (
        a.join(b, "sh")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("na") >= t * F.col("nb"))
            & (F.col("nb") >= t * F.col("na"))
        )
        .select("id_a", "id_b")
        .distinct()  # a pair can share several prefix shingles
    )
    va = arr.select(
        F.col(id_col).alias("id_a"), F.col("shs").alias("shs_a"),
        F.col("n_sh").alias("na"),
    )
    vb = arr.select(
        F.col(id_col).alias("id_b"), F.col("shs").alias("shs_b"),
        F.col("n_sh").alias("nb"),
    )
    inter = F.size(F.array_intersect("shs_a", "shs_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("n_shared"),
            (
                inter.cast("double")
                / (F.col("na") + F.col("nb") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
    )
