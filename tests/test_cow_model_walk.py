"""Model-based random walk over the COW table format (round 11).

A seeded pseudo-random sequence of DDL + DML operations (append,
evolve-append, rename, drop, widen, merge-update, compact, vacuum) runs
against a real table AND an in-memory reference model (rows + schema +
per-version history). After every step the table must equal the model;
vacuum steps trim the model's history to the manifests that survive;
at the end, every surviving historical version must time-travel to its
model snapshot. This is the sequence coverage the hand-written
column-mapping tests can't give: interactions like rename -> drop ->
re-add -> rename-again -> compact are reached by the walk, not by
enumeration. Values are chosen exactly representable (ints, halves) so
widening never moves a bit."""

from __future__ import annotations

import random

import pytest

from openmaptiles_zh_modifier_spark.operators.cow_table import (
    cow_append,
    cow_compact,
    cow_create,
    cow_delete,
    cow_set_partition_spec,
    cow_drop_column,
    cow_merge,
    cow_read,
    cow_rename_column,
    cow_widen_column,
)

_TYPES = {"int": "int", "long": "bigint", "float": "float", "double": "double",
          "string": "string"}
_WIDEN = {"int": "long", "float": "double"}


class Model:
    """Reference state: ordered {name: type_tag}, rows as dicts keyed by
    logical name, and a per-version (schema, rows) history."""

    def __init__(self):
        self.cols: dict[str, str] = {}
        self.rows: list[dict] = []
        self.history: dict[int, tuple[dict, list]] = {}

    def snap(self, version: int) -> None:
        self.history[version] = (
            dict(self.cols),
            [dict(r) for r in self.rows],
        )


def _spark_type(tag: str) -> str:
    return _TYPES[tag]


def _df(spark, cols: dict, rows: list[dict]):
    ddl = ", ".join(f"{n} {_spark_type(t)}" for n, t in cols.items())
    data = [tuple(r[n] for n in cols) for r in rows]
    return spark.createDataFrame(data, ddl)


def _read_as_model(df) -> tuple[dict, list]:
    type_of = dict(df.dtypes)
    inv = {v: k for k, v in _TYPES.items()}
    cols = {n: inv[type_of[n]] for n in df.columns}
    rows = sorted(
        ({n: r[n] for n in df.columns} for r in df.collect()),
        key=lambda r: r["id"],
    )
    return cols, rows


def _check(spark, root, model: Model, version=None):
    got_cols, got_rows = _read_as_model(
        cow_read(spark, root, version=version)
    )
    if version is None:
        want_cols, want_rows = model.cols, model.rows
    else:
        want_cols, want_rows = model.history[version]
    assert got_cols == want_cols, (version, got_cols, want_cols)
    assert got_rows == sorted(
        (dict(r) for r in want_rows), key=lambda r: r["id"]
    ), (version, got_rows)


def _read_manifest_spec(root):
    from openmaptiles_zh_modifier_spark.operators.cow_table import (
        _read_manifest,
    )

    return _read_manifest(root)["partition_by"]


def test_cow_model_walk(spark, tmp_path):
    rng = random.Random(42)
    root = str(tmp_path / "t")
    model = Model()
    model.cols = {"id": "long", "v_int": "int", "v_flt": "float",
                  "tag": "string", "part": "string"}
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        out = []
        for _ in range(n):
            out.append({
                "id": next_id,
                **{
                    c: _value_for(t, next_id)
                    for c, t in model.cols.items()
                    if c not in ("id", "part")
                },
                "part": f"p{next_id % 3}",
            })
            next_id += 1
        return out

    def _value_for(tag, seed):
        if tag in ("int", "long"):
            return seed * 3 + 1
        if tag in ("float", "double"):
            return seed + 0.5
        return f"s{seed}"

    model.rows = fresh_rows(6)
    v = cow_create(
        spark, root, _df(spark, model.cols, model.rows), partition_by="part"
    )
    model.snap(v)
    _check(spark, root, model)

    import time

    from openmaptiles_zh_modifier_spark.operators.cow_table import (
        _effective_commit_ts,
        cow_history,
        cow_resolve_as_of_ts,
        cow_vacuum,
    )

    # (wall-clock after the step, latest version then) — replayed at the
    # end through timestamp time travel (VERDICT r11 #4)
    ts_probes: list[tuple[float, int]] = [(time.time(), v)]
    renamed_n = 0
    for step in range(28):
        op = rng.choice(
            ["append", "evolve", "rename", "drop", "widen", "merge",
             "compact", "append", "merge", "vacuum", "delete", "delete",
             "respec"]
        )
        if op == "append":
            new = fresh_rows(rng.randint(1, 3))
            v = cow_append(spark, root, _df(spark, model.cols, new))
            model.rows.extend(new)
        elif op == "evolve":
            renamed_n += 1
            name = f"c{renamed_n}"
            tag = rng.choice(["int", "float", "string"])
            model.cols[name] = tag
            for r in model.rows:
                r[name] = None
            new = fresh_rows(2)
            v = cow_append(
                spark, root, _df(spark, model.cols, new), evolve_schema=True
            )
            model.rows.extend(new)
        elif op == "rename":
            cands = [c for c in model.cols if c not in ("id", "part")]
            if not cands:
                continue
            old = rng.choice(cands)
            renamed_n += 1
            new_name = f"c{renamed_n}"
            v = cow_rename_column(root, old, new_name)
            model.cols = {
                (new_name if k == old else k): t
                for k, t in model.cols.items()
            }
            for r in model.rows:
                r[new_name] = r.pop(old)
        elif op == "drop":
            cands = [c for c in model.cols if c not in ("id", "part")]
            if len(cands) < 2:
                continue
            name = rng.choice(cands)
            v = cow_drop_column(root, name)
            del model.cols[name]
            for r in model.rows:
                del r[name]
        elif op == "widen":
            cands = [c for c, t in model.cols.items() if t in _WIDEN
                     and c != "part"]
            if not cands:
                continue
            name = rng.choice(cands)
            wide = _WIDEN[model.cols[name]]
            v = cow_widen_column(root, name, _spark_type(wide))
            model.cols[name] = wide
            if wide == "double":
                for r in model.rows:
                    if r[name] is not None:
                        r[name] = float(r[name])
        elif op == "merge":
            if not model.rows:
                continue
            from pyspark.sql import functions as F

            target = rng.choice(model.rows)
            tcols = [c for c, t in model.cols.items()
                     if t == "string" and c != "part"]
            if not tcols:
                continue
            col = rng.choice(tcols)
            newval = f"m{step}"
            src = spark.createDataFrame(
                [(target["id"], newval, target["part"])],
                f"id long, {col} string, part string",
            )
            v = cow_merge(
                spark, root, src, on="id",
                matched_update={col: F.col(f"s.{col}")},
            )
            for r in model.rows:
                if r["id"] == target["id"]:
                    r[col] = newval
        elif op == "respec":
            # partition-spec evolution: toggle partitioned <-> not;
            # logical content is spec-invariant, so the model needs no
            # update — the walk checks that routing/pruning under the
            # flipped spec never loses or duplicates a row
            current_spec = _read_manifest_spec(root)
            v = cow_set_partition_spec(
                root, None if current_spec == "part" else "part"
            )
        elif op == "delete":
            if len(model.rows) < 2:
                continue
            target = rng.choice(model.rows)
            # alternate the deletion-vector and copy-on-write forms so
            # the walk reaches dv-then-rewrite, dv-then-compact,
            # dv-then-rename interleavings
            v = cow_delete(
                spark,
                root,
                f"id = {target['id']}",
                rewrite=rng.random() < 0.4,
            )
            model.rows = [r for r in model.rows if r["id"] != target["id"]]
        elif op == "compact":
            v = cow_compact(spark, root, min_files_per_partition=2)
        elif op == "vacuum":
            # no version burned; drops history older than the newest 2
            # manifests — the model forgets what the table forgot
            cow_vacuum(root, keep_versions=2, orphan_grace_seconds=0)
            survivors = set(cow_history(root))
            model.history = {
                k: vdata for k, vdata in model.history.items()
                if k in survivors
            }
        model.snap(v)
        _check(spark, root, model)
        # as-of-ts probe per step: "now" resolves to the latest version,
        # and the latest version's own effective stamp resolves to
        # ITSELF (ties go to the latest version <= ts)
        ts_probes.append((time.time(), v))
        assert cow_resolve_as_of_ts(root, ts_probes[-1][0]) == v
        assert cow_resolve_as_of_ts(root, _effective_commit_ts(root, v)) == v

    # time travel: every SURVIVING version still matches its snapshot,
    # by version AND by its effective commit timestamp
    surviving = set(cow_history(root))
    for version in sorted(surviving):
        if version in model.history:
            _check(spark, root, model, version=version)
            got_cols, got_rows = _read_as_model(
                cow_read(
                    spark, root,
                    as_of_ts=_effective_commit_ts(root, version),
                )
            )
            want_cols, want_rows = model.history[version]
            assert got_cols == want_cols
            assert got_rows == sorted(
                (dict(r) for r in want_rows), key=lambda r: r["id"]
            )

    # replay the recorded wall-clock probes: a timestamp taken when
    # version k was latest still resolves to k if k survived vacuum,
    # and errors (history forgotten) if it did not
    for t, ver in ts_probes:
        if ver in surviving:
            assert cow_resolve_as_of_ts(root, t) == ver
        else:
            with pytest.raises(ValueError):
                cow_resolve_as_of_ts(root, t)


@pytest.mark.parametrize("seed", [7, 1234])
def test_cow_model_walk_more_seeds(spark, tmp_path, seed):
    """Two shorter walks on other seeds — different op interleavings."""
    rng = random.Random(seed)
    root = str(tmp_path / "t")
    from pyspark.sql import functions as F

    cols = {"id": "long", "a": "int", "b": "string", "part": "string"}
    rows = [
        {"id": i, "a": i * 2, "b": f"b{i}", "part": f"p{i % 2}"}
        for i in range(4)
    ]
    model = Model()
    model.cols, model.rows = cols, rows
    cow_create(spark, root, _df(spark, cols, rows), partition_by="part")
    _check(spark, root, model)
    nid = 4
    for step in range(12):
        op = rng.choice(["rename", "drop-add", "widen", "append", "merge"])
        if op == "rename":
            cands = [c for c in model.cols if c not in ("id", "part")]
            old = rng.choice(cands)
            nn = f"r{step}"
            cow_rename_column(root, old, nn)
            model.cols = {(nn if k == old else k): t
                          for k, t in model.cols.items()}
            for r in model.rows:
                r[nn] = r.pop(old)
        elif op == "drop-add":
            # the resurrection hazard: drop then immediately re-add the
            # SAME logical name via evolve
            cands = [c for c in model.cols if c not in ("id", "part")]
            if len(cands) < 2:
                continue
            name = rng.choice(cands)
            cow_drop_column(root, name)
            del model.cols[name]
            for r in model.rows:
                del r[name]
            model.cols[name] = "string"
            for r in model.rows:
                r[name] = None
            new = {"id": nid, **{c: (f"x{nid}" if t == "string" else nid)
                                 for c, t in model.cols.items()
                                 if c not in ("id", "part")},
                   "part": f"p{nid % 2}"}
            nid += 1
            cow_append(spark, root, _df(spark, model.cols, [new]),
                       evolve_schema=True)
            model.rows.append(new)
        elif op == "widen":
            cands = [c for c, t in model.cols.items() if t in _WIDEN]
            if not cands:
                continue
            name = rng.choice(cands)
            wide = _WIDEN[model.cols[name]]
            cow_widen_column(root, name, _spark_type(wide))
            model.cols[name] = wide
            if wide == "double":
                for r in model.rows:
                    if r[name] is not None:
                        r[name] = float(r[name])
        elif op == "append":
            new = {"id": nid, **{c: (f"x{nid}" if t == "string"
                                     else (nid + 0.5) if t in ("float", "double")
                                     else nid)
                                 for c, t in model.cols.items()
                                 if c not in ("id", "part")},
                   "part": f"p{nid % 2}"}
            nid += 1
            cow_append(spark, root, _df(spark, model.cols, [new]))
            model.rows.append(new)
        elif op == "merge":
            tcols = [c for c, t in model.cols.items()
                     if t == "string" and c != "part"]
            if not tcols or not model.rows:
                continue
            col = rng.choice(tcols)
            target = rng.choice(model.rows)
            src = spark.createDataFrame(
                [(target["id"], f"m{step}", target["part"])],
                f"id long, {col} string, part string",
            )
            cow_merge(spark, root, src, on="id",
                      matched_update={col: F.col(f"s.{col}")})
            for r in model.rows:
                if r["id"] == target["id"]:
                    r[col] = f"m{step}"
        _check(spark, root, model)
