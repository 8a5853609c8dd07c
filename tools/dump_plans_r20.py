#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries to
plans/r20/<name>_<tag>.txt — the optimization-round plan evidence."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from kafkastreams_example_spark.queries import REGISTRY  # noqa: E402
from kafkastreams_example_spark.session import get_spark  # noqa: E402

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf = "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(__file__).resolve().parent.parent / "plans" / "r20"
    out.mkdir(parents=True, exist_ok=True)
    for n in names:
        df = REGISTRY[n].fn(spark, sf)
        p = out / f"{n}_{tag}.txt"
        p.write_text(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
        print("wrote", p)
    spark.stop()

if __name__ == "__main__":
    main()
