"""Per-query performance probe (optimization-round harness, guide §1).

Isolates named registry queries in one warm session: times each with the
noop sink (computes every column, no sink cost), min/median over reps,
and optionally dumps ``explain("formatted")`` to a file for the plan
audit. Usage:

    python tools/perf_probe.py [--sf DIR] [--reps N] [--explain-dir D] q ...

Timing methodology note: the driver bench (bench.py) times ``.count()``;
this probe exists to attribute cost WITHIN a query (compute vs sink vs
memo effects), not to replace the bench numbers.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openmaptiles_zh_modifier_spark.registry import QUERIES  # noqa: E402
from openmaptiles_zh_modifier_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--count", action="store_true",
                    help="time .count() (bench methodology) instead of noop")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark(app_name="omt-zh-perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same JVM/python warmup as bench.py
    from pyspark.sql import functions as F

    nation = spark.read.parquet(f"{args.sf}/nation.parquet")
    region = spark.read.parquet(f"{args.sf}/region.parquet")
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name").count().count()
    )
    spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
        "l_returnflag").count().count()
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

    for name in args.queries:
        fn = QUERIES[name]
        times = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"probe:{name}:rep{i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.count:
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        times_s = " ".join(f"{t:.3f}" for t in times)
        print(f"{name}: min={min(times):.3f} reps=[{times_s}]", flush=True)
        if args.explain_dir:
            out = Path(args.explain_dir)
            out.mkdir(parents=True, exist_ok=True)
            df = fn(spark, args.sf)
            # mirrors df.explain("formatted") but returns the text
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out / f"{name}.txt").write_text(text)


if __name__ == "__main__":
    main()
