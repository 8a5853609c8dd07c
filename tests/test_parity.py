"""DuckDB-oracle parity for every registered query — a local replica of
the driver's correctness gate (row count + schema-width + order-
insensitive value comparison), run at sf0.001 for speed.

Comparison: both results sorted column-name-major, values normalized
(floats rounded to 9 significant-ish decimals to absorb <1 ulp
formatting differences; everything else exact).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from kafkastreams_example_spark.queries import REGISTRY
from kafkastreams_example_spark.schema import TABLE_NAMES

from conftest import SF_DIR


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # -0.0 + 0.0 is +0.0 (IEEE): signed zero must not split the
        # compare (the x30 sweep caught a '-0' vs '0' false mismatch)
        return f"{v + 0.0:.9g}" if v == 0.0 else f"{v:.9g}"
    if isinstance(v, int):
        # exact — the float-style 9-sig-fig collapse would silently
        # equate different large ints (epoch ms, big sums)
        return v
    return v


def _normrows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple((v is None, str(v)) for v in t))


def test_timestamp_columns_load_as_ltz(spark):
    """The loader must normalize every declared timestamp column to
    TIMESTAMP (LTZ) regardless of the parquet physical encoding — the
    driver has shipped both BIGINT-ns and µs-NTZ files across rounds,
    and downstream epoch arithmetic (cast to double, unix_millis)
    rejects TIMESTAMP_NTZ outright."""
    from kafkastreams_example_spark.schema import NANO_TS_COLUMNS
    from kafkastreams_example_spark.sources.tables import load_table

    for table, cols in NANO_TS_COLUMNS.items():
        dtypes = dict(load_table(spark, SF_DIR, table).dtypes)
        for col in cols:
            assert dtypes[col] == "timestamp", (
                f"{table}.{col} loaded as {dtypes[col]!r}, want 'timestamp'"
            )


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0
        return
    dcols, drows = _duck(spec.oracle)
    assert sorted(scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    )
    assert len(srows) == len(drows), f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    a = _normrows(srows, scols)
    b = _normrows(drows, dcols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


def test_knn_exact_ground_truth_matches_its_oracle(spark):
    """The brute-force kNN eval is test-only (the registry entry is the
    PQ-screened form), but it IS the agreement test's ground truth — so
    it gets its own oracle gate here, keeping knn_label_accuracy_exact
    and SQL_KNN_LABEL_ACCURACY_EXACT from rotting unreferenced."""
    from kafkastreams_example_spark.queries import (
        SQL_KNN_LABEL_ACCURACY_EXACT,
        knn_label_accuracy_exact,
    )

    sdf = knn_label_accuracy_exact(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ocols, orows = _duck(SQL_KNN_LABEL_ACCURACY_EXACT)
    assert sorted(scols) == sorted(ocols)
    assert _normrows(srows, scols) == _normrows(orows, ocols)


def test_no_zero_signal_oracles():
    """Degeneracy gate (round 10): every oracle's output must be able
    to distinguish a working operator from a broken one — no zero-row
    results, no all-NULL columns, no constant boolean columns (beyond
    the documented ACCEPTED ledger). A hash compare of a degenerate
    output is not evidence; this is how asof_join stayed 'green' for
    eight rounds while its match column was NULL at every scale.
    Reuses tools/signal_audit.py's audit() verbatim so the CI gate and
    the operator tool cannot drift. DuckDB-only.

    Swept at BOTH the fast SF and the driver's gate SF since round 15:
    signal at sf0.001 does not imply signal at sf0.01 — k_anonymity's
    k < 5 cut varied at sf0.001 yet was constant False at sf0.01 (no
    class that small exists there), so the flag's branch went
    unexercised exactly where the driver compares; only the manual
    sf0.01 tool run caught it."""
    import duckdb

    from tools.signal_audit import audit, register_views

    # one shared constant for the SF the driver compares at — if the
    # gate SF ever moves, this is the single line to change, and the
    # dedup below keeps the sweep from running twice if SF_DIR is
    # pointed at the same dir
    gate_sf_dir = "/root/testdata/sf0.01"
    for sf_dir in dict.fromkeys((SF_DIR, gate_sf_dir)):
        con = duckdb.connect()
        register_views(con, sf_dir)
        assert audit(con) == [], sf_dir


def test_training_shuffle_parity_over_hostile_ids(spark, tmp_path):
    """Drive q_training_shuffle ITSELF (not a copy of its key
    expression — an expression copy would keep passing after a
    regression in the registry code) against its own SQL oracle on a
    documents table of hostile ids: negatives, the -2^31-1 boundary,
    0, ids differing by exactly 2^31 (the pair class a mod-2^31 key
    fold would permanently collide), a 2^53+1 value a float
    round-trip would corrupt, and a NULL id (round-17 advice: the
    key must be built with concat, which propagates NULL like the
    oracle's '||' — concat_ws SKIPS NULLs and would hash a NULL id
    as md5('42'), giving it a real key/shard the oracle denies).
    Full-output comparison, same normalization as the main gate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafkastreams_example_spark.queries import (
        REGISTRY,
        q_training_shuffle,
    )

    ids = [
        -5,
        -2147483649,
        -1,
        0,
        7,
        7 + 2147483648,
        2147483648,
        9007199254740993,
        None,
    ]
    table = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": ["t"] * len(ids),
            "lang": ["en"] * len(ids),
            "source": ["web"] * len(ids),
            "n_chars": pa.array([1] * len(ids), pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))

    df = q_training_shuffle(spark, str(tmp_path))
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    cur = con.execute(REGISTRY["training_shuffle"].oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols)
    assert _normrows(spark_rows, spark_cols) == _normrows(
        duck_rows, duck_cols
    )
    # the 2^31-apart pair must NOT collide (the fold-class regression)
    keys = {r[0]: r[1] for r in spark_rows}
    assert keys[7] != keys[7 + 2147483648]
