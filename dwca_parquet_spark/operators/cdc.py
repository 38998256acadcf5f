"""Change-data-capture merge (upsert/delete), SURVEY §2 round-4 extension.

A 100 TB corpus is not rebuilt per batch — it is MERGED into: a change feed
of inserts/updates/deletes (op I/U/D with a monotone sequence number) lands
against the stored table, latest change per key wins. The reference's only
notion of mutation is whole-dataset versioning with an exists() skip
(/root/reference/src/dwca_parquet/libs/parquet.py:24-33); this operator adds
row-level merge semantics on top of the same versioned-parquet layout.

Semantics (MERGE INTO shape):
- ``changes`` may hold many rows per key; the winner is the row with the
  highest (seq, op) pair — an explicit total order, so the survivor is
  engine-deterministic even when one seq value carries two ops.
- winner op D → the key disappears from the result;
- winner op I/U → the winner's payload replaces (or inserts) the row;
- keys without changes pass through untouched.

Equivalent SQL (the oracle): target anti-join latest-keys, UNION ALL the
non-delete winners.

Scale/shuffle shape: one window (or groupBy-max + self-join — the window
keeps it one pass) over the CHANGE FEED keyed on the merge key — the feed is
batch-sized, not corpus-sized; then one left-anti equi-join of target
against the winners. With the target stored bucketed on the key
(sinks/parquet.py write_bucketed) the anti-join needs NO Exchange on the
corpus side: only the batch shuffles, which is the asymmetry that makes
per-batch merge affordable at 100 TB (test_cdc.py pins that plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """One winning row per key: max (seq, op) — deterministic total order."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """MERGE the change feed into the target; returns the merged table
    with the target's schema. ``changes`` must carry all target columns
    plus ``seq_col`` and ``op_col``."""
    winners = latest_changes(changes, key_cols, seq_col, op_col)
    kept = target.join(
        winners.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    upserts = winners.filter(F.col(op_col) != "D").select(*target.columns)
    return kept.unionByName(upserts)


def sql_apply_cdc(
    target: str,
    changes: str,
    key_cols: list[str],
    value_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> str:
    """DuckDB oracle for :func:`apply_cdc` (same order, same semantics)."""
    keys = ", ".join(key_cols)
    cols = ", ".join(key_cols + value_cols)
    return f"""
WITH _w AS (
  SELECT *, row_number() OVER (
      PARTITION BY {keys} ORDER BY {seq_col} DESC, {op_col} DESC) AS _rn
  FROM {changes}
), _win AS (SELECT * FROM _w WHERE _rn = 1)
SELECT {cols} FROM {target} t
WHERE NOT EXISTS (SELECT 1 FROM _win w WHERE {' AND '.join(f'w.{k} = t.{k}' for k in key_cols)})
UNION ALL
SELECT {cols} FROM _win WHERE {op_col} <> 'D'
"""


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    seq: int = 1,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """The inverse of :func:`apply_cdc`: derive the change feed between
    two table versions — rows only in ``new`` → I, keys in both with any
    non-key column changed → U, keys only in ``old`` → D (payload = the
    old row, matching the reference's versioned-snapshot model at
    /root/reference/src/dwca_parquet/libs/parquet.py:24-29 where versions
    are whole tables and the delta is implicit).

    Round trip: ``apply_cdc(old, diff_snapshots(old, new, keys), keys)``
    equals ``new`` — pinned in test_cdc.py. Unchanged rows emit nothing,
    so the feed is |changes|-sized, not table-sized.

    Shape: ONE full-outer equi-join on the keys (both sides shuffle once
    on the key — or zero Exchange when both snapshots are bucketed, the
    write_bucketed lever), change detection via null-safe equality on the
    non-key columns (<=> — engine-deterministic, null == null holds).
    """
    val_cols = [c for c in old.columns if c not in key_cols]
    o = old
    for c in old.columns:
        o = o.withColumnRenamed(c, f"_o_{c}")
    n = new
    for c in new.columns:
        n = n.withColumnRenamed(c, f"_n_{c}")
    # plain key equality (not eqNullSafe): merge keys are non-null by
    # contract, and null-safe key pairing would wrongly match null keys
    joined = o.join(
        n,
        [F.col(f"_o_{k}") == F.col(f"_n_{k}") for k in key_cols],
        "full_outer",
    )
    in_old = F.col(f"_o_{key_cols[0]}").isNotNull()
    in_new = F.col(f"_n_{key_cols[0]}").isNotNull()
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    out_cols = [
        F.coalesce(F.col(f"_n_{k}"), F.col(f"_o_{k}")).alias(k)
        for k in key_cols
    ] + [
        F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
        for c in val_cols
    ]
    op = (
        F.when(in_old & in_new & changed, F.lit("U"))
        .when(~in_old & in_new, F.lit("I"))
        .when(in_old & ~in_new, F.lit("D"))
    )
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(*out_cols, F.lit(seq).alias(seq_col), F.col(op_col))
    )
