"""Model-based random walk over the multi-table catalog (round 13).

A seeded pseudo-random sequence of transactions — single- and
multi-table commits, deliberate crash-and-abort cycles, stale-base
conflict attempts, disjoint-table interleavings — runs against a real
catalog AND an in-memory reference model of (pins, per-catalog-version
expected table sums). After every step the catalog's pins must match
the model, every historical catalog version must still read to its
model snapshot (cross-table snapshot isolation), and the invariant
auditor (catalog_verify) must pass. This is the sequence coverage the
hand-written catalog tests can't give: interactions like
stage -> crash -> abort -> restage -> conflict-retry are reached by
the walk, not enumeration."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.cow_catalog import (
    CatalogTxn,
    catalog_abort,
    catalog_create,
    catalog_latest,
    catalog_read,
    catalog_verify,
)
from openmaptiles_zh_modifier_spark.operators.cow_table import (
    CowConflictError,
    cow_append,
    cow_create,
    cow_delete,
)

TABLES = ("a", "b", "c")


def _sum(spark, cat_root, table, cv=None):
    r = (
        catalog_read(spark, cat_root, table, catalog_version=cv)
        .agg(F.count(F.lit(1)), F.sum("v"))
        .collect()[0]
    )
    return (r[0], r[1] or 0)


@pytest.mark.parametrize("seed", [13, 131])
def test_catalog_model_walk(spark, tmp_path, seed):
    rng = random.Random(seed)
    roots = {}
    next_id = [0]

    def fresh_rows(n):
        lo = next_id[0]
        next_id[0] += n
        return spark.range(lo, lo + n).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )

    for t in TABLES:
        roots[t] = str(tmp_path / t)
        cow_create(spark, roots[t], fresh_rows(20))
    cat_root = str(tmp_path / "cat")
    catalog_create(cat_root, dict(roots))

    # model: expected (n_rows, sum_v) per table, history per catalog
    # version; python mirrors of every committed mutation
    model = {t: (20, sum(7 * k for k in range(i * 20, i * 20 + 20)))
             for i, t in enumerate(TABLES)}
    history = {1: dict(model)}

    # track exact row sets so deletes are computable
    rowsets = {t: set(range(i * 20, i * 20 + 20)) for i, t in enumerate(TABLES)}

    def sums(t):
        return (len(rowsets[t]), sum(7 * k for k in rowsets[t]))

    for step in range(14):
        op = rng.choice(["txn1", "txn2", "crash_abort", "stale_conflict"])
        if op == "txn1":
            t = rng.choice(TABLES)
            txn = CatalogTxn(cat_root)
            mod = rng.choice([3, 5, 7, 11])
            v = cow_delete(spark, txn.root(t), f"k % {mod} = 0")
            if v > txn.base_version(t):  # zero-hit deletes burn no version
                txn.stage(t, v)
                txn.commit()
                rowsets[t] = {k for k in rowsets[t] if k % mod != 0}
        elif op == "txn2":
            t1, t2 = rng.sample(TABLES, 2)
            txn = CatalogTxn(cat_root)
            n_new = rng.randint(3, 8)
            new = fresh_rows(n_new)
            new_keys = set(range(next_id[0] - n_new, next_id[0]))
            txn.stage(t1, cow_append(spark, txn.root(t1), new))
            mod = rng.choice([2, 3])
            v2 = cow_delete(spark, txn.root(t2), f"k % {mod} = 1")
            if v2 > txn.base_version(t2):
                txn.stage(t2, v2)
                rowsets[t2] = {k for k in rowsets[t2] if k % mod != 1}
            txn.commit()
            rowsets[t1] |= new_keys
        elif op == "crash_abort":
            t = rng.choice(TABLES)
            if not any(k % 13 == 0 for k in rowsets[t]):
                continue  # a zero-hit stage burns no version: nothing to abort
            cow_delete(spark, roots[t], "k % 13 = 0")  # staged, no commit
            # crash: catalog unchanged; then recovery
            got = _sum(spark, cat_root, t)
            assert got == sums(t), f"staged leak on {t} at step {step}"
            catalog_abort(cat_root, t)
        elif op == "stale_conflict":
            t = rng.choice(TABLES)
            if not any(k % 17 == 0 for k in rowsets[t]) or not any(
                k % 19 == 0 for k in rowsets[t]
            ):
                continue  # need real hits on both sides of the duel
            t_old = CatalogTxn(cat_root)  # capture base
            winner = CatalogTxn(cat_root)
            winner.stage(t, cow_delete(spark, winner.root(t), "k % 17 = 0"))
            winner.commit()
            rowsets[t] = {k for k in rowsets[t] if k % 17 != 0}
            # loser stages on the stale pin and must conflict
            t_old.stage(t, cow_delete(spark, t_old.root(t), "k % 19 = 0"))
            with pytest.raises(CowConflictError):
                t_old.commit()
            # the loser's staged version is now an orphan: recover
            catalog_abort(cat_root, t)
        history[catalog_latest(cat_root)] = {t: sums(t) for t in TABLES}
        # live state matches the model after every step
        for t in TABLES:
            assert _sum(spark, cat_root, t) == sums(t), (step, op, t)
        catalog_verify(cat_root)

    # cross-table snapshot isolation: EVERY historical catalog version
    # still reads to its model snapshot
    for cv, snap in history.items():
        for t in TABLES:
            assert _sum(spark, cat_root, t, cv) == snap[t], (cv, t)
