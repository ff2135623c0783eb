"""End-to-end zh back-fill against the ACID COW table format
(`plans.pipeline.run_backfill_cow`): the reference's keyed UPDATE
(OMTZHModifier.java:156-169) as a transactional lake MERGE. Asserts the
post-merge table equals the plain `backfill_table` rewrite of the same
data, that the previous version stays readable (time travel), and that
a no-op run does not burn a version.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from openmaptiles_zh_modifier_spark.operators.cow_table import (
    cow_create,
    cow_read,
)
from openmaptiles_zh_modifier_spark.operators.zh_backfill import backfill_table
from openmaptiles_zh_modifier_spark.plans.pipeline import run_backfill_cow
from tests.test_zh_backfill import LATTICE, SCHEMA, mk


def _canon(df):
    rows = df.collect()
    return sorted(
        (r.id, r.name, None if r.tags is None else sorted(r.tags.items()))
        for r in rows
    )


@pytest.fixture()
def lattice_cow(spark, tmp_path):
    root = str(tmp_path / "zh_cow")
    df = mk(spark, [Row(id=i, name=n, tags=t) for i, n, t, *_ in LATTICE])
    cow_create(spark, root, df)
    return root, df


def test_cow_backfill_matches_plain_rewrite(spark, lattice_cow):
    root, df = lattice_cow
    version, n_updated = run_backfill_cow(spark, root)
    assert version == 2
    assert n_updated == sum(1 for _i, _n, _t, upd, _hs, _ht in LATTICE if upd)
    got = cow_read(spark, root)
    want = backfill_table(df)
    assert _canon(got) == _canon(want)


def test_cow_backfill_time_travel_and_idempotence(spark, lattice_cow):
    root, df = lattice_cow
    v1_before = _canon(cow_read(spark, root))
    version, n_updated = run_backfill_cow(spark, root)
    assert (version, n_updated > 0) == (2, True)
    # the pre-merge version stays readable and unchanged
    assert _canon(cow_read(spark, root, version=1)) == v1_before
    # a second run finds nothing to update and must NOT burn a version
    version2, n2 = run_backfill_cow(spark, root)
    assert (version2, n2) == (2, 0)
    assert _canon(cow_read(spark, root)) == _canon(backfill_table(df))


def test_cow_backfill_rejects_unqualified_table(spark, tmp_path):
    root = str(tmp_path / "bad_cow")
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    cow_create(spark, root, df)
    with pytest.raises(ValueError, match="does not qualify"):
        run_backfill_cow(spark, root)
