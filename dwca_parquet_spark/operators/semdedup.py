"""Semantic deduplication — SemDeDup (Abbas et al. 2023; PAPERS.md).

The third leg of the dedup family: exact (hash), fuzzy (MinHash-LSH /
SimHash on text, sign-LSH on embeddings), and SEMANTIC — near-duplicates
by meaning, found as high-cosine pairs inside k-means cells of the
embedding space. The paper's pipeline, re-expressed Spark-first:

1. k-means over the embeddings (``kmeans_fit`` — deterministic: the
   ``k_cells`` lowest-id vectors seed, then ``iters`` Lloyd rounds with
   INTEGER centroids, exactly the determinism protocol pq_fit uses for
   its subspace codebooks). Cells bound the pair search: pairs are only
   scored within a cell, so cost is Σ|cell|² instead of n² — this
   cell-locality IS the paper's scalability argument (they run 50k cells
   over LAION; cell count scales with the corpus so |cell| stays
   bounded).
2. within each cell, exact integer-cosine pairs ≥ ``threshold`` via the
   shared per-group matmul (one Arrow crossing per vector per cell,
   never per pair — ``similarity._group_cosine_pairs``).
3. connected components over the near-dup graph (shared
   ``dedup.connected_components`` — pointer-jumping, localCheckpoint per
   round), so transitively-connected semantic duplicates form one group.
4. keep ONE representative per group: the member with the LOWEST cosine
   to its cell centroid (the paper's choice — keeps the least typical
   exemplar, preserving diversity), ties by id. ``keep="min_id"`` keeps
   the smallest id instead (the cheap rule when centroid distance is not
   wanted).

Output: one row per input vector — (id, cell, cluster_id, cos_centroid,
keep). Downstream training exports filter ``keep``.

Shuffle/scale shape: one persisted prep table; Lloyd rounds are one
combinable groupBy each with a ≤ k·dim-row collect (bounded like the
IVF/PQ fits); assignment is an Arrow projection against the broadcast
centroid matrix; the pair stage shuffles once on cell id; CC is the
shared pointer-jumping loop; the keep rule is one window over cluster
id. Nothing all-pairs, nothing driver-side beyond the bounded centroid
table.

Approximation contract (documented, deterministic): pairs never cross
cells — a semantic duplicate split across cells is missed, tuned by
``k_cells``/``iters`` exactly as in the paper. Everything downstream of
the cell assignment is exact over the integer-scaled vectors.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dwca_parquet_spark.cache import persist_tracked
from dwca_parquet_spark.operators.similarity import (
    _cells_udf,
    _cosine_scaled,
    _group_cosine_pairs,
    _GROUP_PAIRS_SCHEMA,
    _prepped,
)


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_cells: int = 16,
    iters: int = 2,
    prepped: DataFrame | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic full-vector k-means: (cell_ids, centroid matrix).

    Seeds = the ``k_cells`` lowest-id scaled vectors; each Lloyd round
    reassigns by exact integer L2² and recomputes centroids as
    ``round(mean)`` per component (integer centroids → engine- and
    run-deterministic, the pq_fit protocol). Empty cells keep their
    previous centroid. Cell ids stay the seed ids throughout so the
    labels are stable and meaningful.

    One corpus scan per round against the PERSISTED prep table; the
    per-round shuffle is a combinable groupBy(cell, component) whose
    result (≤ k·dim rows) is the only collect.

    ``prepped``: pass an already-persisted prep table (id, svec, sdot) to
    share it with the caller (semantic_dedup does — one prep scan, not
    two); ownership stays with the caller then.
    """
    own = prepped is None
    if own:
        prepped = _prepped(df, id_col, vec_col).persist()
    seed_rows = (
        prepped.orderBy(F.col(id_col)).limit(k_cells).select(id_col, "svec").collect()
    )
    if len(seed_rows) < k_cells:
        raise ValueError(f"need at least {k_cells} vectors")
    cent_ids = np.array([r[0] for r in seed_rows], dtype=np.int64)
    cent_mat = np.stack([np.asarray(r[1], dtype=np.int64) for r in seed_rows])
    for _ in range(iters):
        assign = _cells_udf(cent_ids, cent_mat, 1)
        sums = (
            prepped.select(
                assign(F.col("svec")).getItem(0).alias("cell"),
                F.posexplode("svec").alias("pos", "v"),
            )
            .groupBy("cell", "pos")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()  # bounded: ≤ k_cells · dim rows
        )
        new_mat = cent_mat.copy()
        idx = {int(c): i for i, c in enumerate(cent_ids)}
        for r in sums:
            new_mat[idx[r["cell"]], r["pos"]] = int(round(r["s"] / r["n"]))
        cent_mat = new_mat
    if own:
        prepped.unpersist()
    return cent_ids, cent_mat


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_cells: int = 16,
    iters: int = 2,
    threshold: float = 0.95,
    keep: str = "centroid_far",
) -> DataFrame:
    """(id, cell, cluster_id, cos_centroid, keep) — SemDeDup labels.

    ``keep="centroid_far"``: per duplicate group, keep the member with
    the lowest centroid cosine (ties by id asc — the paper's rule).
    ``keep="min_id"``: keep the smallest id. Singleton vectors (no
    semantic duplicate) always keep.
    """
    if keep not in ("centroid_far", "min_id"):
        raise ValueError("keep must be 'centroid_far' or 'min_id'")
    from dwca_parquet_spark.operators.dedup import connected_components

    spark = df.sparkSession
    prepped = persist_tracked(_prepped(df, id_col, vec_col))
    cent_ids, cent_mat = kmeans_fit(
        df, id_col, vec_col, k_cells, iters, prepped=prepped
    )
    assign = _cells_udf(cent_ids, cent_mat, 1)
    assigned = persist_tracked(
        prepped.withColumn("cell", assign(F.col("svec")).getItem(0))
    )

    # centroid cosine via a broadcast join against the k-row centroid table
    cents = spark.createDataFrame(
        [
            (int(c), [int(x) for x in cent_mat[i]], int(cent_mat[i] @ cent_mat[i]))
            for i, c in enumerate(cent_ids)
        ],
        "cell long, csvec array<long>, csdot long",
    )
    with_cent = assigned.join(F.broadcast(cents), "cell").select(
        F.col(id_col),
        F.col("cell"),
        F.round(
            _cosine_scaled(
                F.col("svec"), F.col("csvec"), F.col("sdot"), F.col("csdot")
            ),
            4,
        ).alias("cos_centroid"),
    )

    pairs = (
        assigned.select(F.col(id_col).alias("_gid"), "svec", "cell")
        .groupBy("cell")
        .applyInPandas(
            lambda pdf: _group_cosine_pairs(pdf, ordered=False),
            _GROUP_PAIRS_SCHEMA,
        )
        .select(
            "id_a", "id_b", F.round(F.col("cosine"), 4).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
    comp = connected_components(pairs).withColumnRenamed("node", id_col)

    labeled = with_cent.join(comp, id_col, "left").select(
        F.col(id_col),
        "cell",
        F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id"),
        "cos_centroid",
    )
    order = (
        [F.col("cos_centroid").asc(), F.col(id_col).asc()]
        if keep == "centroid_far"
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return labeled.withColumn(
        "keep", F.row_number().over(w) == F.lit(1)
    )
