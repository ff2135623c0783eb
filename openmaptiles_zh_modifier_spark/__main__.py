"""Program entry: ``python -m openmaptiles_zh_modifier_spark``.

The drop-in replacement for running the reference jar
(``OMTZHModifier.main``, OMTZHModifier.java:19-33, which hardcodes
``jdbc:postgresql://localhost:5432/openmaptiles`` with the
openmaptiles/openmaptiles credentials and runs ``process(c)``): the
same defaults here, overridable by flag, plus the parquet-lake mode
the Spark engine adds. Prints the reference's telemetry shape (tables
found, per-table update counts, records/s).

Deliberate divergence from the reference (SURVEY B5): errors exit
NON-zero. The reference catches every exception and ``System.exit(0)``
(OMTZHModifier.java:27-31, :102, :190), which silently masks failed
runs from any calling script; this entry lets failures fail.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m openmaptiles_zh_modifier_spark",
        description=(
            "Back-fill name:zh-Hans / name:zh-Hant tags across every "
            "qualifying table of an OpenMapTiles database or parquet lake."
        ),
    )
    mode = p.add_mutually_exclusive_group()
    mode.add_argument(
        "--jdbc-url",
        default="jdbc:postgresql://localhost:5432/openmaptiles",
        help="JDBC URL (default: the reference's hardcoded URL)",
    )
    mode.add_argument(
        "--parquet",
        metavar="DIR",
        help="run against a parquet lake directory instead of JDBC",
    )
    p.add_argument(
        "--user", default="openmaptiles", help="JDBC user (reference default)"
    )
    p.add_argument(
        "--password",
        default="openmaptiles",
        help="JDBC password (reference default)",
    )
    p.add_argument(
        "--jdbc-driver",
        default="org.postgresql.Driver",
        help="JDBC driver class (must be on the Spark driver classpath)",
    )
    p.add_argument(
        "--schema-pattern",
        default=None,
        help="restrict JDBC catalog discovery to this schema pattern",
    )
    p.add_argument(
        "--out",
        metavar="DIR",
        default=None,
        help="parquet mode: write rewritten tables here (default: dry count)",
    )
    p.add_argument(
        "--num-partitions",
        type=int,
        default=16,
        help="JDBC BETWEEN-range scan partitions (reference batch heuristic)",
    )
    p.add_argument(
        "--compat-names-typo",
        action="store_true",
        help="reproduce the reference's 'names' map-key typo verbatim",
    )
    p.add_argument(
        "--master",
        default=None,
        help="Spark master override (default: existing session / local[*])",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from pyspark.sql import SparkSession

    from openmaptiles_zh_modifier_spark.plans.pipeline import (
        run_backfill,
        run_backfill_jdbc,
    )
    from openmaptiles_zh_modifier_spark.session import (
        apply_semantic_confs,
        get_spark,
    )

    # Adopt a live session untouched (Spark's getOrCreate APPLIES the
    # builder's non-static confs to an existing session — rebuilding
    # here would silently stomp the caller's runtime tuning, e.g.
    # shuffle-partition counts). getActiveSession is THREAD-LOCAL, so
    # also check the process-wide instantiated session (one created on
    # another thread — PySpark exposes no public getDefaultSession;
    # _instantiatedSession is what getOrCreate itself consults). The
    # attribute is private with no stability guarantee, so read it via
    # getattr: if a PySpark upgrade renames it we degrade to creating a
    # session rather than crashing before argument handling.
    spark = SparkSession.getActiveSession() or getattr(
        SparkSession, "_instantiatedSession", None
    )
    if spark is None:
        spark = get_spark(master=args.master)
    else:
        apply_semantic_confs(spark)
    if args.parquet:
        report = run_backfill(
            spark,
            args.parquet,
            out_root=args.out,
            compat_names_typo=args.compat_names_typo,
        )
    else:
        report = run_backfill_jdbc(
            spark,
            args.jdbc_url,
            args.jdbc_driver,
            schema_pattern=args.schema_pattern,
            compat_names_typo=args.compat_names_typo,
            properties={"user": args.user, "password": args.password},
            num_partitions=args.num_partitions,
        )

    print(f"Found {len(report.tables)} tables to update")
    for t in report.tables:
        print(
            f"Adding zh tags to [{t.table}] ({t.id_field}): "
            f"{t.n_updated} updated in {t.seconds}s"
        )
    print(
        f"Updated {report.total_updated} records, "
        f"{report.records_per_sec():.0f}/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
