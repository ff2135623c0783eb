"""Program entry (``python -m openmaptiles_zh_modifier_spark``): the
drop-in for running the reference jar. Parquet mode runs the full
discover -> classify -> backfill -> write loop; the JDBC flag defaults
pin the reference's hardcoded connection (OMTZHModifier.java:24-25) so
a user's bare invocation targets the same database the jar would."""

from __future__ import annotations


def test_parquet_mode_end_to_end(spark, tmp_path):
    from openmaptiles_zh_modifier_spark.__main__ import main

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [
            (1, "北京市", {"name": "北京市", "name:en": "Beijing"}),
            (2, "上海市", {"name": "上海市", "name:zh-Hans": "上海市"}),
            (3, "Paris", {"name": "Paris"}),
        ],
        "osm_id long, name string, tags map<string,string>",
    )
    df.write.mode("overwrite").parquet(f"{lake}/osm_city_point.parquet")

    assert main(["--parquet", lake, "--out", out]) == 0

    rows = {
        r.osm_id: dict(r.tags)
        for r in spark.read.parquet(f"{out}/osm_city_point.parquet").collect()
    }
    assert rows[1]["name:zh-Hans"] == "北京市"
    assert rows[1]["name:zh-Hant"] == "北京市"
    assert rows[2]["name:zh-Hant"] == "上海市"  # derived from existing Hans
    assert "name:zh-Hans" not in rows[3]  # non-Han name never qualifies


def test_jdbc_defaults_pin_the_reference_connection():
    from openmaptiles_zh_modifier_spark.__main__ import _build_parser

    args = _build_parser().parse_args([])
    assert args.jdbc_url == "jdbc:postgresql://localhost:5432/openmaptiles"
    assert args.user == "openmaptiles"
    assert args.password == "openmaptiles"
    assert args.jdbc_driver == "org.postgresql.Driver"
    assert not args.compat_names_typo


def test_main_adopts_live_session_without_stomping_confs(spark, tmp_path):
    # Spark's getOrCreate applies the builder's non-static confs to an
    # EXISTING session, so a naive get_spark() inside main would reset
    # the caller's runtime tuning (found: shuffle partitions 8 -> 32,
    # which broke an AQE skew test downstream). main must adopt the
    # live session untouched.
    from openmaptiles_zh_modifier_spark.__main__ import main

    before = spark.conf.get("spark.sql.shuffle.partitions")
    lake = str(tmp_path / "lake2")
    spark.createDataFrame(
        [(1, "北京市", {"name": "北京市"})],
        "osm_id long, name string, tags map<string,string>",
    ).write.mode("overwrite").parquet(f"{lake}/osm_point.parquet")
    assert main(["--parquet", lake]) == 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_main_from_worker_thread_finds_the_session(spark, tmp_path):
    # getActiveSession is thread-local; a worker thread must still adopt
    # the process-wide session instead of rebuilding one (which would
    # stomp runtime confs, see the test above).
    import threading

    from openmaptiles_zh_modifier_spark.__main__ import main

    before = spark.conf.get("spark.sql.shuffle.partitions")
    lake = str(tmp_path / "lake3")
    spark.createDataFrame(
        [(1, "北京市", {"name": "北京市"})],
        "osm_id long, name string, tags map<string,string>",
    ).write.mode("overwrite").parquet(f"{lake}/osm_point.parquet")

    result: dict = {}

    def run():
        result["rc"] = main(["--parquet", lake])

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert result["rc"] == 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
