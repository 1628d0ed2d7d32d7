"""Change-data-capture operators: changeset apply (MERGE-style upsert)
and slowly-changing-dimension type-2 history.

The reference is a data-integration connector (full-reload row pump,
CSVProvider.cs:563-577); real integration pipelines apply *incremental*
change feeds instead of reloading. These operators close that gap
Spark-first — no MERGE INTO (that's a table-format feature, not an engine
feature), just window + join plans Catalyst can optimize:

- ``apply_changeset``: latest change per key wins (window over the change
  feed — one shuffle on key), then a full outer join against the base
  (second shuffle, same key, so AQE can reuse the partitioning) resolves
  inserts/updates/deletes. No per-row Python; scales like any keyed join,
  and the change feed is usually small enough to broadcast.
- ``scd2``: per-key ordered change detection via ``lag`` + ``lead`` —
  exactly one shuffle on the business key; emits [valid_from, valid_to)
  version intervals with NULL valid_to for the current row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Apply an I/U/D change feed to ``base``; returns the new snapshot.

    ``changes`` carries the base's columns plus ``op_col`` in
    {'I','U','D'} and optionally ``seq_col`` ordering multiple changes to
    one key (highest wins; ties broken by op descending — 'U' > 'I' > 'D'
    is irrelevant since equal seq means same change batch, but the order
    is fixed for determinism). Keys present only in the feed insert;
    'D' deletes; 'U'/'I' replace the base row (upsert semantics).
    """
    order = [F.col(seq_col).desc()] if seq_col else []
    w = W.partitionBy(*key_cols).orderBy(*order, F.col(op_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    payload = [c for c in base.columns if c not in key_cols]
    b = base.alias("b")
    c = latest.alias("c")
    joined = b.join(c, on=key_cols, how="full_outer")
    keep = F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != "D")
    pick = [
        F.when(
            F.col(f"c.{op_col}").isNotNull(), F.col(f"c.{col}")
        ).otherwise(F.col(f"b.{col}")).alias(col)
        for col in payload
    ]
    return joined.filter(keep).select(*key_cols, *pick)


def scd2(
    changelog: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a change log into type-2 dimension history.

    Consecutive rows per key whose ``attr_cols`` are unchanged merge into
    one version; each output row carries ``valid_from`` (its first
    timestamp) and ``valid_to`` (the next version's valid_from, NULL for
    the current version). ``tiebreak_cols`` fix the order of equal
    timestamps (defaults to ``attr_cols`` — deterministic but arbitrary;
    pass an event id when you have one).
    """
    tb = tiebreak_cols if tiebreak_cols is not None else attr_cols
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tb]
    w = W.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(a).over(w)
        # null-safe inequality: a change to/from NULL is a new version
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    versions = changelog.withColumn(
        "__is_new_version", first | changed
    ).filter("__is_new_version")
    w2 = W.partitionBy(*key_cols).orderBy(*order)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .drop("__is_new_version")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    content_cols: list[str],
) -> DataFrame:
    """Derive a changeset FROM two full snapshots — the inverse of
    :func:`apply_changeset`, and the corpus-versioning primitive: given
    yesterday's and today's corpus, report per key whether it was
    ``added``, ``removed``, or ``changed`` (unchanged keys are omitted —
    at 100 TB they are almost all of the data and the diff must not
    carry them).

    Contents compare by ``md5(concat_ws(sep, content_cols))`` computed
    independently on each side — one narrow hash column per snapshot, so
    the join ships (key, 32-byte digest) rows, never the payloads
    (documents can be megabytes; the diff stays O(rows), not O(bytes)).
    md5 over UTF-8 strings is engine-portable (Spark and DuckDB agree
    bit-for-bit), which keeps the operator oracle-checkable. One full
    outer join on the key — a single co-partitioned shuffle; either side
    broadcastable when it's a delta-sized snapshot.

    ``concat_ws`` skips NULLs on both engines, so (NULL, 'a') and
    ('a', NULL) would collide; pass an explicit sentinel column ahead of
    nullable content columns if that distinction matters upstream.
    """
    if not key_cols or not content_cols:
        raise ValueError("key_cols and content_cols must be non-empty")
    sig = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in content_cols]))
    o = old.select(*key_cols, sig.alias("__old_sig"))
    n = new.select(*key_cols, sig.alias("__new_sig"))
    joined = o.join(n, key_cols, "full").filter(
        F.col("__old_sig").isNull()
        | F.col("__new_sig").isNull()
        | (F.col("__old_sig") != F.col("__new_sig"))
    )
    return joined.select(
        *key_cols,
        F.when(F.col("__old_sig").isNull(), F.lit("added"))
        .when(F.col("__new_sig").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
