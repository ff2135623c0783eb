"""The zh-Hans / zh-Hant back-fill pipeline — the reference's one real query.

Semantics re-expressed from OMTZHModifier.java (SURVEY.md §2/§3):

  scan → project(P1) → filter(P2 server + P4 residual) → normalize(P5)
       → derive(F5 coalesce cascade) → changed-rows(F6) → write-back(F7/S5)

as ONE lazy DataFrame plan per table. The reference's manual id-range
batching loop (OMTZHModifier.java:130-137) disappears: file splits / JDBC
partitioning replace it, and the whole derivation is a shuffle-free,
map-side-only transform — at 100 TB this runs as a single stage of
whole-stage-codegen tasks with zero exchange.

Behavioral quirk B1 (SURVEY.md §2.10): the reference's SELECT reads the
existing Hant value from the misspelled key ``names:zh-Hant``
(OMTZHModifier.java:135-136) while its WHERE and UPDATE use the correct
``name:zh-Hant`` — so an existing Hant value is effectively never seen and
gets regenerated whenever the row qualifies. ``compat_names_typo=True``
reproduces that faithfully; the default implements the evident intent.

Quirk B7 (verified against OMTZHModifier.java:138 + :220-225): the
server-side WHERE tests the RAW hstore values with ``IS NULL``, while the
empty-string→missing normalization happens client-side only for rows that
already passed. Consequence: a row whose hans and hant are BOTH ``''``
never qualifies and is never updated; a row with one ``''`` and one NULL
qualifies (via the NULL) and then has both regenerated. We reproduce this
exactly in both compat modes — the filter uses raw ``isNull()``, the
derivation normalizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.functions.zh import (
    is_han,
    nullif_empty,
    to_simplified,
    to_traditional,
)
from ..functions.zh import CURATED, opencc_tables_from_env


KEY_ZH = "name:zh"
KEY_HANS = "name:zh-Hans"
KEY_HANT = "name:zh-Hant"
KEY_HANT_TYPO = "names:zh-Hant"  # B1: the reference's misspelled read key


def _qualifies(name: Column, tags: Column) -> Column:
    """Server-side WHERE (P2, OMTZHModifier.java:137-138): has some name
    source AND at least one zh variant missing. Uses the CORRECT keys even
    in typo mode — the reference's WHERE is spelled right; only the SELECT
    is not."""
    return (name.isNotNull() | tags[KEY_ZH].isNotNull()) & (
        tags[KEY_HANT].isNull() | tags[KEY_HANS].isNull()
    )


def derive_zh_columns(
    df: DataFrame,
    id_field: str = "id",
    compat_names_typo: bool = False,
    tables=None,
) -> DataFrame:
    """Project + filter + derive. Returns
    ``(id_field, name, zh, hans_old, hant_old, hans, hant, needs_update)``
    for rows that pass the server-side filter AND have a usable zh source.

    Pure column expressions — Catalyst pushes the filter into the scan and
    prunes the projection to exactly (id_field, name, tags).

    ``tables`` (or env ``SPARK_GRAFT_OPENCC_DIR``, resolved here) swaps
    in ingested OpenCC dictionaries — the deployment path to full
    dictionary parity (VERDICT r11 #3); unset = curated gate path.
    """
    tables = (
        None
        if tables is CURATED
        else (tables if tables is not None else opencc_tables_from_env())
    )
    name = F.col("name")
    tags = F.col("tags")
    hant_read_key = KEY_HANT_TYPO if compat_names_typo else KEY_HANT

    # P1 projection with map-key extraction (element_at == hstore ->).
    zh_raw = tags[KEY_ZH]
    hans_raw = tags[KEY_HANS]
    hant_raw = tags[hant_read_key]

    # P4 residual: zh source = tags['name:zh'], else name when it is a
    # non-empty Han-script string (OMTZHModifier.java:209-218).
    name_usable = name.isNotNull() & (name != F.lit("")) & is_han(name)
    zh = F.coalesce(zh_raw, F.when(name_usable, name))

    # P5: '' and NULL are the same "missing" state (:220-225).
    hans_old = nullif_empty(hans_raw)
    hant_old = nullif_empty(hant_raw)

    # F5 coalesce cascade (:227-235) + F6 changed-row flag (:207,237-244).
    hans_new = F.coalesce(hans_old, to_simplified(zh, tables))
    hant_new = F.coalesce(hant_old, to_traditional(zh, tables))
    needs_update = hans_old.isNull() | hant_old.isNull()

    return (
        df.where(_qualifies(name, tags))
        .where(zh.isNotNull())
        .select(
            F.col(id_field),
            name.alias("name"),
            zh.alias("zh"),
            hans_old.alias("hans_old"),
            hant_old.alias("hant_old"),
            hans_new.alias("hans"),
            hant_new.alias("hant"),
            needs_update.alias("needs_update"),
        )
    )


def updates_frame(
    df: DataFrame,
    id_field: str = "id",
    compat_names_typo: bool = False,
    tables=None,
) -> DataFrame:
    """The changed-rows frame ``(id_field, hans, hant)`` — the engine's
    equivalent of the reference's List<ChineseValues> per batch
    (OMTZHModifier.java:140-152), but computed distributed and lazy."""
    derived = derive_zh_columns(df, id_field, compat_names_typo, tables)
    return derived.where(F.col("needs_update")).select(id_field, "hans", "hant")


def updates_frame_with_tags(
    df: DataFrame,
    id_field: str = "id",
    compat_names_typo: bool = False,
    tables=None,
) -> DataFrame:
    """Changed-rows frame ``(id_field, hans, hant, new_tags_map)`` computed
    in ONE projection over ONE scan — for sinks that must write the full
    post-update tags value (the JDBC staging path). Deliberately NOT a
    join of :func:`updates_frame` back onto the source: over a live JDBC
    source, two scans are two snapshots, and pairing hans/hant from one
    snapshot with tags from another silently loses concurrent writes."""
    tables = (
        None
        if tables is CURATED
        else (tables if tables is not None else opencc_tables_from_env())
    )
    name = F.col("name")
    tags = F.col("tags")
    hant_read_key = KEY_HANT_TYPO if compat_names_typo else KEY_HANT

    name_usable = name.isNotNull() & (name != F.lit("")) & is_han(name)
    zh = F.coalesce(tags[KEY_ZH], F.when(name_usable, name))
    hans_old = nullif_empty(tags[KEY_HANS])
    hant_old = nullif_empty(tags[hant_read_key])
    hans_new = F.coalesce(hans_old, to_simplified(zh, tables))
    hant_new = F.coalesce(hant_old, to_traditional(zh, tables))
    needs_update = hans_old.isNull() | hant_old.isNull()
    new_tags = F.map_concat(
        F.coalesce(tags, F.create_map().cast("map<string,string>")),
        F.create_map(
            F.lit(KEY_HANS), hans_new,
            F.lit(KEY_HANT), hant_new,
        ),
    )
    return (
        df.where(_qualifies(name, tags))
        .where(zh.isNotNull() & needs_update)
        .select(
            F.col(id_field),
            hans_new.alias("hans"),
            hant_new.alias("hant"),
            new_tags.alias("new_tags_map"),
        )
    )


def backfill_table(
    df: DataFrame,
    id_field: str = "id",
    compat_names_typo: bool = False,
    tables=None,
) -> DataFrame:
    """Full-table rewrite form of the write-back (S5 option b).

    Computes the derivation inline and conditionally concatenates the two
    keys onto ``tags`` (F7; LAST_WIN gives hstore ``||`` right-wins
    semantics). NO JOIN and NO SHUFFLE: the update is recomputed where it
    applies, which at lake scale beats materializing an updates frame and
    joining it back. Every other column is passed through untouched.
    """
    tables = (
        None
        if tables is CURATED
        else (tables if tables is not None else opencc_tables_from_env())
    )
    name = F.col("name")
    tags = F.col("tags")
    hant_read_key = KEY_HANT_TYPO if compat_names_typo else KEY_HANT

    name_usable = name.isNotNull() & (name != F.lit("")) & is_han(name)
    zh = F.coalesce(tags[KEY_ZH], F.when(name_usable, name))
    hans_old = nullif_empty(tags[KEY_HANS])
    hant_old = nullif_empty(tags[hant_read_key])
    needs_update = hans_old.isNull() | hant_old.isNull()

    apply_update = _qualifies(name, tags) & zh.isNotNull() & needs_update
    new_tags = F.map_concat(
        F.coalesce(tags, F.create_map().cast("map<string,string>")),
        F.create_map(
            F.lit(KEY_HANS), F.coalesce(hans_old, to_simplified(zh, tables)),
            F.lit(KEY_HANT), F.coalesce(hant_old, to_traditional(zh, tables)),
        ),
    )
    return df.withColumn(
        "tags", F.when(apply_update, new_tags).otherwise(tags)
    )


def merge_backfill(
    base: DataFrame,
    updates: DataFrame,
    id_field: str = "id",
    broadcast_updates: bool | None = None,
) -> DataFrame:
    """Keyed-join form of the write-back (S5 option a without Delta): the
    logical left-join the reference spells as per-row UPDATE statements
    (OMTZHModifier.java:157-169).

    When the updates side is small (the common back-fill case: few rows
    change), broadcast it so the join is shuffle-free on the 100 TB base
    side. ``broadcast_updates=None`` leaves the decision to AQE/Catalyst.
    """
    upd = updates.select(
        F.col(id_field).alias("__upd_id"),
        F.col("hans").alias("__upd_hans"),
        F.col("hant").alias("__upd_hant"),
    )
    if broadcast_updates:
        upd = F.broadcast(upd)
    joined = base.join(upd, base[id_field] == upd["__upd_id"], "left")
    new_tags = F.map_concat(
        F.coalesce(
            F.col("tags"), F.create_map().cast("map<string,string>")
        ),
        F.create_map(
            F.lit(KEY_HANS), F.col("__upd_hans"),
            F.lit(KEY_HANT), F.col("__upd_hant"),
        ),
    )
    return (
        joined.withColumn(
            "tags",
            F.when(F.col("__upd_id").isNotNull(), new_tags).otherwise(
                F.col("tags")
            ),
        )
        .drop("__upd_id", "__upd_hans", "__upd_hant")
    )
