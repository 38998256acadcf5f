"""File-level bloom + min/max sidecar index — point-lookup file skipping
on a NON-layout column (SURVEY §2 op 128).

z-order writes (op 63) buy range skipping on the columns the layout was
sorted for; a point lookup on any OTHER high-cardinality column (a doc
id, a URL hash, a customer key) still scans every file. The standard
lakehouse answer is a per-file secondary index: min/max plus a Bloom
filter per data file, consulted BEFORE the scan so the reader opens only
files that can possibly contain the probed keys. That sidecar-index
design is public knowledge (parquet's own optional bloom pages and every
table-format file-skipping implementation follow it); this module is
the Spark-first version with the index as plain parquet next to the
data, reusing op 59's distributed Bloom machinery.

Layout under ``path``:

* ``data/``              the rows (unchanged content)
* ``_fileindex/stats``   (file, min_key, max_key, cnt) per data file
* ``_fileindex/words``   (file, word_idx, word_val) per-file Bloom
                         bitmaps — ≤ m/32 rows per file
* ``_fileindex/meta``    (m, k, key_col) one row

Build: one write + one read-back pass grouped by ``input_file_name()``
— both the min/max and the Bloom words are map-side-combinable
aggregates (op 59's explode → bit_or shape, keyed by file). Keys hash
with the portable poly_hash (cast to string first), so the probe can
recompute positions ANYWHERE — including driver-side Python, where the
pruning decision is a dictionary lookup over the bounded sidecar
(files × m/32 words), never a corpus read.

Probe (:func:`read_pruned`): bloom-hit OR range-hit per (file, value),
union of survivors, then ``spark.read.parquet(surviving files)`` with
the exact residual filter. False positives cost one extra file read;
false negatives are IMPOSSIBLE (min/max and Bloom are both
no-false-negative structures) — so the result is EXACTLY the full-scan
filter, pinned in test_fileindex.py, with the measured skip fraction
returned alongside.

At 100 TB the sidecar stays ~bytes-per-file × files (e.g. 1 KiB × 1 M
files = 1 GiB — driver-loadable, or probed as a broadcast join if the
deployment outgrows that), while the data read drops from every file to
|values| + ε files. Key contract: integer or ASCII-string keys (the
portable-hash domain, same as every poly_hash consumer); NULL keys are
indexed by min/max only and match no probe value (SQL equality
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

from dwca_parquet_spark.functions import hashing as H
from dwca_parquet_spark.operators.bloom import _positions, bloom_params

_INTEGRAL_TYPES = (ByteType, ShortType, IntegerType, LongType)


def _require_indexable_key(df: DataFrame, key_col: str) -> None:
    """The documented key contract — integral or string only (ADVICE
    round 8): for any other type (double, date, decimal) the driver-side
    str(v) hash recompute and the Python `lo <= v <= hi` range check can
    disagree with Spark's string cast / ordering, silently breaking the
    no-false-negative claim. Enforced at build AND append."""
    kt = df.schema[key_col].dataType
    if not isinstance(kt, _INTEGRAL_TYPES + (StringType,)):
        raise ValueError(
            f"file index key {key_col!r} has type {kt.simpleString()}; "
            "only integral or string keys are indexable (the portable-"
            "hash contract — see module docstring)"
        )

__all__ = [
    "FileIndex",
    "write_with_file_index",
    "read_pruned",
    "file_index_append",
]


def _poly_hash_py(s: str) -> int:
    """Driver-side mirror of H.poly_hash (the op-68 cms_estimate fold)."""
    hv = 0
    for ch in s:
        hv = (hv * H.HASH_BASE + ord(ch)) % H.HASH_MOD
    return hv


def write_with_file_index(
    df: DataFrame,
    path: str,
    key_col: str,
    files: int | None = None,
    fpp: float = 0.01,
) -> dict:
    """Write ``df`` under ``path`` and build the per-file sidecar index
    on ``key_col``. ``files``: repartition count for the data write
    (None keeps the incoming partitioning). Returns {"files", "m", "k"}.
    """
    path = str(path).rstrip("/")
    _require_indexable_key(df, key_col)
    out = df.repartition(files) if files else df
    out.write.mode("overwrite").parquet(f"{path}/data")
    spark = df.sparkSession
    back = spark.read.parquet(f"{path}/data").select(
        F.input_file_name().alias("file"), F.col(key_col).alias("key")
    )
    n_files = back.select("file").distinct().count()
    total = back.count()
    per_file = max(1, (total + n_files - 1) // n_files)
    m, k = bloom_params(per_file, fpp)
    stats = back.groupBy("file").agg(
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
        F.count(F.lit(1)).alias("cnt"),
    )
    stats.write.mode("overwrite").parquet(f"{path}/_fileindex/stats")
    hashed = back.filter(F.col("key").isNotNull()).select(
        "file", H.poly_hash(F.col("key").cast("string")).alias("_h")
    )
    words = (
        hashed.select(
            "file",
            F.explode(F.array(*_positions(F.col("_h"), m, k))).alias("_pos"),
        )
        .select(
            "file",
            F.expr("_pos div 32").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(_pos % 32 as int))"
            ).alias("_bit"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("_bit").alias("word_val"))
    )
    words.write.mode("overwrite").parquet(f"{path}/_fileindex/words")
    spark.createDataFrame(
        [(m, k, key_col)], "m long, k long, key_col string"
    ).write.mode("overwrite").parquet(f"{path}/_fileindex/meta")
    return {"files": n_files, "m": m, "k": k}


class FileIndex:
    """A LOADED sidecar index: the bounded per-file stats/words tables
    held driver-side, so a point-lookup workload (many probes against a
    frozen table) reads the sidecar ONCE instead of three jobs per
    probe. `load` is the once-per-session cost; `probe` spawns exactly
    one Spark job (the pruned read). One-shot callers use
    :func:`read_pruned`, which is load + probe."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = str(path).rstrip("/")
        meta = spark.read.parquet(f"{self.path}/_fileindex/meta").collect()[0]
        self.key_col = meta["key_col"]
        self.m, self.k = int(meta["m"]), int(meta["k"])
        stats_df = spark.read.parquet(f"{self.path}/_fileindex/stats")
        # the key's type travels in the stats schema — probes coerce to
        # it so hash text and range comparisons match the build exactly
        self.key_type = stats_df.schema["min_key"].dataType
        self.stats = stats_df.collect()
        self.words: dict[str, dict[int, int]] = {}
        for r in spark.read.parquet(f"{self.path}/_fileindex/words").collect():
            self.words.setdefault(r["file"], {})[int(r["word_idx"])] = int(
                r["word_val"]
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "FileIndex":
        return cls(spark, path)

    def probe(self, key_col: str, values: list) -> tuple[DataFrame, dict]:
        """(rows with key ∈ values, skip report). EXACTLY ≡ reading
        ``data/`` whole and filtering (pinned); touches only files
        whose Bloom OR min/max admits at least one probed value."""
        if self.key_col != key_col:
            raise ValueError(
                f"index is on {self.key_col!r}, probe asked {key_col!r}"
            )
        from dwca_parquet_spark.operators.bloom import BLOOM_P, _bloom_ab

        # coerce probe values to the indexed key's type (ADVICE round
        # 8): an int probed against a string key (or "42" against a
        # long key) must hash and range-compare exactly as the build
        # did, or admission silently loses its no-false-negative law
        if isinstance(self.key_type, _INTEGRAL_TYPES):
            values = [int(v) for v in values]
        else:
            values = [v if isinstance(v, str) else str(v) for v in values]
        probes = []
        for v in values:
            hv = _poly_hash_py(str(v))
            pos = []
            for j in range(self.k):
                a, b = _bloom_ab(j)
                pos.append(((hv * a + b) % BLOOM_P) % self.m)
            probes.append((v, pos))

        def admits(file_row) -> bool:
            w = self.words.get(file_row["file"], {})
            lo, hi = file_row["min_key"], file_row["max_key"]
            for v, pos in probes:
                if (
                    lo is not None
                    and hi is not None
                    and not (lo <= v <= hi)
                ):
                    continue  # outside the file's range → absent
                if all((w.get(p // 32, 0) >> (p % 32)) & 1 for p in pos):
                    return True
            return False

        survivors = [r["file"] for r in self.stats if admits(r)]
        report = {
            "files_total": len(self.stats),
            "files_read": len(survivors),
        }
        if not survivors:
            empty = self.spark.read.parquet(f"{self.path}/data").filter(
                F.lit(False)
            )
            return empty, report
        out = self.spark.read.parquet(*survivors).filter(
            F.col(key_col).isin(list(values))
        )
        return out, report


def read_pruned(
    spark: SparkSession, path: str, key_col: str, values: list
) -> tuple[DataFrame, dict]:
    """One-shot convenience: :class:`FileIndex` load + probe. Repeated
    probes against the same frozen table should load once and reuse
    (after an append, reload — the sidecar on disk is the truth)."""
    return FileIndex.load(spark, path).probe(key_col, values)


def file_index_append(df: DataFrame, path: str) -> dict:
    """Append a batch to an indexed table (SURVEY §2 op 129 — the
    incremental leg of op 128, the op-118/120 frozen-state discipline):
    new data files land under ``data/``, and the sidecar gains rows FOR
    THE NEW FILES ONLY — existing files' stats and Bloom words are never
    recomputed or rewritten. The Bloom geometry (m, k) is frozen at
    first write (append batches of similar file size keep the designed
    fpp; a much larger batch should repartition first — documented, not
    silently resized, because per-file bitmaps with mixed m could not
    share probe positions).

    Returns {"files_new", "files_total"}. Probe correctness is
    unconditional: a pruned read after any append sequence equals the
    full-scan filter (pinned in test_fileindex.py) because admission
    stays no-false-negative per file regardless of when the file's
    sidecar rows were written.
    """
    path = str(path).rstrip("/")
    spark = df.sparkSession
    meta = spark.read.parquet(f"{path}/_fileindex/meta").collect()[0]
    m, k, key_col = int(meta["m"]), int(meta["k"]), meta["key_col"]
    _require_indexable_key(df, key_col)
    known = spark.read.parquet(f"{path}/_fileindex/stats").select("file")
    n_known = known.count()
    df.write.mode("append").parquet(f"{path}/data")
    back = spark.read.parquet(f"{path}/data").select(
        F.input_file_name().alias("file"), F.col(key_col).alias("key")
    )
    # anti-join against the stats table, NOT an isin literal list — at
    # 100k+ indexed files a NOT-IN literal is a plan-sized constant and
    # a per-row linear scan; the broadcast anti-join is one hash probe
    fresh = back.join(F.broadcast(known), "file", "left_anti")
    stats = fresh.groupBy("file").agg(
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
        F.count(F.lit(1)).alias("cnt"),
    )
    stats.write.mode("append").parquet(f"{path}/_fileindex/stats")
    hashed = fresh.filter(F.col("key").isNotNull()).select(
        "file", H.poly_hash(F.col("key").cast("string")).alias("_h")
    )
    words = (
        hashed.select(
            "file",
            F.explode(F.array(*_positions(F.col("_h"), m, k))).alias("_pos"),
        )
        .select(
            "file",
            F.expr("_pos div 32").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(_pos % 32 as int))"
            ).alias("_bit"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("_bit").alias("word_val"))
    )
    words.write.mode("append").parquet(f"{path}/_fileindex/words")
    n_total = (
        spark.read.parquet(f"{path}/_fileindex/stats")
        .select("file")
        .distinct()
        .count()
    )
    return {"files_new": n_total - n_known, "files_total": n_total}
