"""Relational operators mirroring the reference's probe/merge/diff loops.

Each hash-map probe in the reference becomes the canonical Spark join
(SURVEY.md §2.3); all functions are pure DataFrame → DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_probe(incoming: DataFrame, existing: DataFrame, keys: list[str]) -> DataFrame:
    """Keep incoming rows whose key matches NO existing row — the
    reference's existence probe before insert (src/storage.cpp:97-114),
    one left_anti join per key (email OR phone ⇒ chained anti-joins).
    """
    out = incoming
    for k in keys:
        out = out.join(existing.select(k).distinct(), k, "left_anti")
    return out


def merge_prefer_newer(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Reference merge strategy ``prefer-newer`` (src/merge.cpp:46-78):
    match by key; incoming replaces existing iff strictly newer by
    ``ts_col`` (lexicographic ISO == chronological; here a real
    timestamp); unmatched rows from both sides pass through.

    Emits all of existing's columns plus ``src`` ∈
    {existing, incoming}. Full-outer hash join on the key — at scale
    the incoming delta is usually small ⇒ broadcast it.
    """
    cols = existing.columns
    # presence markers, not key-null checks: "the existing side is
    # absent" must be detected by a non-null literal that only a
    # failed outer-join match can null out — testing e_key.isNull()
    # would also fire for a PRESENT existing row whose key field is
    # null (it matches nothing in an equi-join), wiping its data with
    # the absent incoming side's all-NULL columns
    e = existing.select(F.lit(True).alias("_e_present"),
                        *[F.col(c).alias(f"e_{c}") for c in cols])
    # one incoming row per key (newest ts wins, ties by max struct):
    # duplicated keys in a batch would otherwise fan the matched
    # existing row out N× through the join — the reference's
    # map-backed store cannot hold duplicate keys
    i = (
        incoming.groupBy(F.col(key).alias(f"i_{key}"))
        .agg(F.max(F.struct(
            F.col(ts_col).alias(f"i_{ts_col}"),
            *[F.col(c).alias(f"i_{c}") for c in cols
              if c not in (key, ts_col)],
        )).alias("_w"))
        .select(F.col(f"i_{key}"),
                *[F.col(f"_w.i_{c}").alias(f"i_{c}")
                  for c in cols if c != key],
                F.lit(True).alias("_i_present"))
    )
    j = e.join(i, e[f"e_{key}"] == i[f"i_{key}"], "full_outer")
    take_incoming = F.col("_e_present").isNull() | (
        F.col("_i_present").isNotNull()
        & (F.col(f"i_{ts_col}") > F.col(f"e_{ts_col}"))
    )
    out = j.select(
        *[
            F.when(take_incoming, F.col(f"i_{c}")).otherwise(F.col(f"e_{c}")).alias(c)
            for c in cols
        ],
        F.when(take_incoming, F.lit("incoming")).otherwise(F.lit("existing")).alias("src"),
    )
    return out


def merge_prefer_existing(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    enrich_col: str,
) -> DataFrame:
    """Reference strategy ``prefer-existing`` (src/merge.cpp:64-72):
    existing rows win, but an empty ``enrich_col`` is filled from the
    incoming match; unmatched incoming rows are appended.

    Incoming is deduplicated to one row per key first (a duplicated
    key would fan the matched existing row out through the left join
    — impossible in the reference's map-backed store). Among dups the
    representative prefers a NON-EMPTY enrich value (what the
    reference's sequential loop converges to), ties by min struct."""
    cols = existing.columns
    incoming = (
        incoming.groupBy(key)
        .agg(F.min(F.struct(
            (F.coalesce(F.col(enrich_col), F.lit("")) == "")
            .cast("int").alias("_empty"),     # non-empty enrich first
            *[F.col(c).alias(c) for c in cols if c != key],
        )).alias("_w"))
        .select(F.col(key),
                *[F.col(f"_w.{c}").alias(c) for c in cols if c != key])
    )
    i = incoming.select(
        F.col(key).alias(f"_ik_{key}"),
        F.col(enrich_col).alias("_i_enrich"),
    )
    enriched = (
        existing.join(i, existing[key] == F.col(f"_ik_{key}"), "left")
        .select(
            *[
                (
                    F.when(
                        (F.col(c).isNull() | (F.col(c) == "")) & F.col("_i_enrich").isNotNull(),
                        F.col("_i_enrich"),
                    ).otherwise(F.col(c)).alias(c)
                    if c == enrich_col
                    else F.col(c)
                )
                for c in cols
            ]
        )
    )
    new_rows = incoming.join(existing.select(key), key, "left_anti").select(*cols)
    return enriched.unionByName(new_rows)


def diff_by_key(
    a: DataFrame,
    b: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Classify keys into added / removed / changed / unchanged — the
    reference's full-outer diff (src/diff.cpp:44-80) as one join.

    added   = key only in b; removed = key only in a;
    changed = in both, any compare_col differs (NULL-safe).
    """
    # presence flags are sentinels from each join side, not data columns
    # (a data column could be legitimately NULL on a present row)
    ae = a.select(F.col(key), F.lit(1).alias("_in_a"),
                  *[F.col(c).alias(f"a_{c}") for c in compare_cols])
    be = b.select(F.col(key), F.lit(1).alias("_in_b"),
                  *[F.col(c).alias(f"b_{c}") for c in compare_cols])
    j = ae.join(be, key, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
    cls = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(key), cls.alias("diff_class"))


def set_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct rows of a not present in b (reference std::set_difference
    diff of email sets, src/cli.cpp:318-321 — pure SET semantics: the
    reference loads each side into a std::set first).

    ``subtract`` is SQL EXCEPT (distinct), which matches. The previous
    ``exceptAll(b.distinct()).distinct()`` form subtracted per
    OCCURRENCE, so a row appearing twice in ``a`` and once in ``b``
    wrongly survived."""
    return a.subtract(b)


# ------------------------------------------------- nested history/tags


def history_entry(ts, user: str, action: str):
    """One reference HistoryEntry (src/model.hpp:8-14) as a struct
    column: {timestamp, user, action}."""
    return F.struct(
        F.lit(ts).alias("timestamp") if isinstance(ts, str) else ts.alias("timestamp"),
        F.lit(user).alias("user"),
        F.lit(action).alias("action"),
    )


def append_history(history_col, ts, user: str, action: str):
    """history ++ [entry] — the reference's push_back on every add /
    edit / delete (src/storage.cpp:139,187,208). NULL history is an
    empty array (records imported from flat sources)."""
    empty = F.array().cast(
        "array<struct<timestamp:string,user:string,action:string>>"
    )
    return F.concat(
        F.coalesce(history_col, empty),
        F.array(history_entry(ts, user, action)),
    )


def merge_edit_history(
    existing: DataFrame,
    incoming: DataFrame,
    key: str,
    ts_col: str,
    user: str = "import",
) -> DataFrame:
    """prefer-newer merge that maintains the nested audit trail:

    - incoming wins (strictly newer ``ts_col``) → existing's history
      ++ one 'edited' entry (reference src/storage.cpp:187);
    - brand-new key → incoming's history ++ one 'created' entry
      (src/storage.cpp:139,458);
    - existing wins → history unchanged.

    ``tags`` (interchange schema, schemas/contact.schema.json) merge
    as the sorted distinct union on edit. Columns: all of existing's
    plus ``src``; ``history``/``tags`` must exist on both sides
    (CONTACT_FULL_SCHEMA) — the entry timestamp is the incoming row's
    ``ts_col`` so the result is deterministic (no wall clock)."""
    cols = existing.columns
    # presence markers, same device as merge_prefer_newer above: a
    # PRESENT existing row whose key field is null matches nothing in
    # the equi-join, and testing e_key.isNull() would misread it as a
    # brand-new incoming row — wiping its data with the absent
    # incoming side's NULL columns
    e = existing.select(F.lit(True).alias("_e_present"),
                        *[F.col(c).alias(f"e_{c}") for c in cols])
    # one incoming row per key: duplicated keys in a batch would fan
    # the matched existing row out N× through the join; newest-ts
    # wins among the dups (the reference's sequential loop applies
    # each in turn, so the newest lands last), ties by max struct
    i = incoming.select(F.lit(True).alias("_i_present"),
                        *[F.col(c).alias(f"i_{c}") for c in cols])
    i = (
        i.groupBy(f"i_{key}")
        .agg(F.max(F.struct(f"i_{ts_col}",
                            *[f"i_{c}" for c in cols
                              if c not in (key, ts_col)],
                            "_i_present")).alias("_w"))
        .select(F.col(f"i_{key}"),
                *[F.col(f"_w.i_{c}").alias(f"i_{c}")
                  for c in cols if c != key],
                F.col("_w._i_present").alias("_i_present"))
    )
    j = e.join(i, e[f"e_{key}"] == i[f"i_{key}"], "full_outer")
    is_new = F.col("_e_present").isNull()
    edited = (
        F.col("_e_present").isNotNull()
        & F.col("_i_present").isNotNull()
        & (F.col(f"i_{ts_col}") > F.col(f"e_{ts_col}"))
    )
    take_incoming = is_new | edited

    def merged(c: str):
        if c == "history":
            return (
                F.when(is_new, append_history(F.col("i_history"),
                                              F.col(f"i_{ts_col}"), user, "created"))
                .when(edited, append_history(F.col("e_history"),
                                             F.col(f"i_{ts_col}"), user, "edited"))
                .otherwise(F.col("e_history"))
            )
        if c == "tags":
            return (
                F.when(is_new, F.col("i_tags"))
                .when(edited, F.sort_array(F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("e_tags"), F.array().cast("array<string>")),
                        F.coalesce(F.col("i_tags"), F.array().cast("array<string>")),
                    ))))
                .otherwise(F.col("e_tags"))
            )
        return F.when(take_incoming, F.col(f"i_{c}")).otherwise(F.col(f"e_{c}"))

    return j.select(
        *[merged(c).alias(c) for c in cols],
        F.when(take_incoming, F.lit("incoming")).otherwise(F.lit("existing")).alias("src"),
    )
