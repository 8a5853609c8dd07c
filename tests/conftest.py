from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from kafkastreams_example_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        cpus="4",
        shuffle_partitions=4,
        extra_conf={
            # tiny test state: the HDFS-backed provider avoids per-batch
            # RocksDB instance spin-up (RocksDB stays the documented
            # at-scale choice in session.py)
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
