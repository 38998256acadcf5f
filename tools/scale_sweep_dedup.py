"""Honest scale sweep for the dedup/similarity family (VERDICT r3 item 1).

tools/scale_sweep.py deliberately excludes q30/q31/q44/q60/q47 because its
10x fixture is built by CLONING rows: identical texts/vectors land in the
same LSH buckets, growing candidate sets quadratically on both engines — a
cloning artifact, not a scale measurement.  This tool instead GENERATES
fixtures from scratch with the same statistical recipe as the driver's
testdata, measured from /root/testdata/sf0.1 (not copied from it):

documents (recipe measured 2026-08-14, see calibrate()):
  - 30-word uniform vocabulary (driver's word frequencies are flat:
    8.8k-9.2k occurrences each at sf0.1), doc length uniform in [10, 100]
    words (measured deciles 10/19/32/54/76/90/100).
  - 5.0% of docs are PLANTED NEAR-DUPS: a verbatim copy of another doc
    with 1 (98%) or 2 (2%) marker tokens ('dup') INSERTED at random
    positions — measured: 250/5000 docs contain 'dup', 255 total
    occurrences, and diffing each against its best-Jaccard partner shows
    exactly "delete ['dup']" (insertion-only perturbation).
  - 0.16% exact duplicate pairs (measured: 8 per 5000 docs).
  - lang ~ categorical(en .41, zh .15, es .15, fr .15, de .14);
    source = 'src' + (doc_id % 20); n_chars = len(text).
  - doc ids are a random permutation (a planted copy can precede its
    source, as observed in the driver data: doc 11's source is doc 4686).

embeddings: 64-dim standard normal, L2-normalized (measured norms
  1.0 +/- 3e-8), label uniform in 0..9.  The driver's "clusters" are NOT
  geometric (per-label centroid norm ~= 0.07 ~ 1/sqrt(n), within-cluster
  cosine mean 0.000, zero pairs above cos 0.9) — the honest 10x is simply
  10x more draws from the same spherical distribution.

With this recipe the background similarity density is a property of the
PROCESS (tiny vocab -> dense char-3-gram overlap), so candidate pairs grow
~n^2 at every engine equally — exactly what the driver's own data does
(measured: 4,864 LSH candidates at 500 docs, 472,141 at 5,000 docs, a 97x
growth for 10x docs).  The sweep therefore reports, per scale:
  - Spark median wall-time vs one DuckDB oracle run (ratio),
  - the LSH candidate count (the workload's true size parameter),
  - a full result cross-check (sorted-output hash, Spark vs DuckDB).

q44's recursive-CTE oracle is exponential-ish on dense graphs (the
(node,label) frontier explodes; 228 s at sf0.1 already); at 10x it is
infeasible.  The sweep uses an ITERATIVE min-label loop in DuckDB
(pointer-jumping, same algorithm the Spark operator uses), validated
output-equal to the recursive CTE at sf0.01 before use.

Usage:
    python tools/scale_sweep_dedup.py calibrate   # generator-vs-driver stats
    python tools/scale_sweep_dedup.py sweep sf0.3 # 15k docs / 6k vecs
    python tools/scale_sweep_dedup.py sweep sf1   # 50k docs / 20k vecs
    python tools/scale_sweep_dedup.py sweep sf1 --spark-runs 1
"""

from __future__ import annotations

import argparse
import hashlib
import json
import statistics
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

DRIVER_SF01 = "/root/testdata/sf0.1"
BASE_DIR = Path("/tmp/sfdedup")

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]  # the 30 uniform words; 'dup' is reserved as the near-dup marker
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
NEAR_FRAC = 0.05
TWO_MARKER_P = 0.02
EXACT_FRAC = 0.0016
EMB_DIM = 64
N_LABELS = 10

SCALES = {
    # name -> (n_docs, n_vecs, generator seed)
    "sf0.3": (15_000, 6_000, 303),
    "sf1": (50_000, 20_000, 1001),
    "sf0.1-cal": (5_000, 2_000, 101),  # calibration twin of the driver data
}
SWEEP = ["q30_minhash_lsh_pairs", "q31_simhash", "q44_dedup_clusters",
         "q60_ann_multitable", "q47_ivf_topk"]


# ---------------------------------------------------------------------------
# Fixture generation
# ---------------------------------------------------------------------------


def build_fixture(name: str, force: bool = False) -> Path:
    n_docs, n_vecs, seed = SCALES[name]
    dst = BASE_DIR / name
    if (dst / "documents.parquet").exists() and not force:
        return dst
    dst.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_near = round(n_docs * NEAR_FRAC)
    n_exact = round(n_docs * EXACT_FRAC)
    n_base = n_docs - n_near - n_exact
    lengths = rng.integers(10, 101, size=n_base)
    base = [
        " ".join(rng.choice(VOCAB, size=ln).tolist()) for ln in lengths
    ]
    texts = list(base)
    for _ in range(n_near):  # insertion-only perturbation, like the driver
        words = base[rng.integers(0, n_base)].split()
        for _ in range(1 + (rng.random() < TWO_MARKER_P)):
            words.insert(rng.integers(0, len(words) + 1), "dup")
        texts.append(" ".join(words))
    for _ in range(n_exact):
        texts.append(base[rng.integers(0, n_base)])
    order = rng.permutation(len(texts))
    texts = [texts[i] for i in order]

    doc_id = np.arange(n_docs, dtype=np.int64)
    lang = rng.choice(LANGS, size=n_docs, p=LANG_P)
    pq.write_table(
        pa.table({
            "doc_id": doc_id,
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang.tolist(), type=pa.string()),
            "source": pa.array([f"src{i % 20}" for i in doc_id],
                               type=pa.string()),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }),
        dst / "documents.parquet",
    )

    vecs = rng.standard_normal((n_vecs, EMB_DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.astype(np.float32).ravel(), type=pa.float32()), EMB_DIM
    ).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table({
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": emb,
            "label": rng.integers(0, N_LABELS, size=n_vecs).astype(np.int32),
        }),
        dst / "embeddings.parquet",
    )
    print(f"  built {name}: {n_docs} docs, {n_vecs} vecs -> {dst}",
          file=sys.stderr, flush=True)
    return dst


# ---------------------------------------------------------------------------
# Measurement helpers
# ---------------------------------------------------------------------------


def _docs_stats(con: duckdb.DuckDBPyConnection, label: str) -> dict:
    """The distributional facts the generator must reproduce."""
    from dwca_parquet_spark import queries as Q

    q30 = Q.ORACLES["q30_minhash_lsh_pairs"]
    cut = q30.rfind("SELECT id_a, id_b, jaccard FROM verified")
    cand_sql = q30[:cut] + "SELECT count(*) FROM cand"
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    stats = {
        "docs": n_docs,
        "lsh_candidates": con.execute(cand_sql).fetchone()[0],
        "pairs_ge_05": con.execute(
            f"SELECT count(*) FROM ({q30})").fetchone()[0],
        "jaccard_mean": round(con.execute(
            f"SELECT avg(jaccard) FROM ({q30})").fetchone()[0], 4),
        "pairs_ge_09": con.execute(
            f"SELECT count(*) FROM ({q30}) WHERE jaccard >= 0.9"
        ).fetchone()[0],
        "marker_docs": con.execute(
            "SELECT count(*) FROM documents"
            " WHERE list_contains(string_split(text,' '),'dup')"
        ).fetchone()[0],
        "exact_dup_rows": con.execute(
            "SELECT count(*) - count(DISTINCT text) FROM documents"
        ).fetchone()[0],
        "mean_words": round(con.execute(
            "SELECT avg(len(string_split(text,' '))) FROM documents"
        ).fetchone()[0], 2),
    }
    print(f"  {label}: {json.dumps(stats)}", file=sys.stderr, flush=True)
    return stats


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _result_hash(rows: list[tuple]) -> str:
    """Order-insensitive content hash for the cc-loop validation step."""
    canon = sorted(
        tuple(round(v, 4) if isinstance(v, float) else v for v in r)
        for r in rows
    )
    return hashlib.sha256(repr(canon).encode()).hexdigest()[:16]


def spark_checksum(df) -> tuple:
    """Engine-side order-insensitive checksum: (count, per-column sums).

    Collecting q30's ~n^2 pair output to the driver at sf1 would measure
    py4j serialization, not the engine — so the cross-check reduces each
    result to one row per engine instead.  Doubles are made integral with
    floor(x*1e6 + 0.5) (floor is bit-identical across engines; every float
    column here was already round()ed identically in both plans)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, FloatType

    aggs = [F.count(F.lit(1)).cast("long")]
    # columns sorted by name: the two engines may order projections
    # differently (the driver's own gate sorts by name for the same reason)
    for f in sorted(df.schema.fields, key=lambda f: f.name):
        c = F.col(f.name)
        if isinstance(f.dataType, (DoubleType, FloatType)):
            c = F.floor(c.cast("double") * 1e6 + F.lit(0.5))
        aggs.append(F.sum(c).cast("long"))
    return tuple(df.agg(*aggs).collect()[0])


def duckdb_checksum(con: duckdb.DuckDBPyConnection, sql_or_table: str) -> tuple:
    """The same checksum computed by DuckDB over an oracle query/table."""
    rel = con.sql(f"SELECT * FROM ({sql_or_table})") \
        if not sql_or_table.isidentifier() else con.table(sql_or_table)
    exprs = ["CAST(count(*) AS BIGINT)"]
    for name, dtype in sorted(zip(rel.columns, rel.types),
                              key=lambda nd: nd[0]):
        if str(dtype) in ("DOUBLE", "FLOAT"):
            exprs.append(
                f'CAST(sum(floor("{name}" * 1e6 + 0.5)) AS BIGINT)')
        else:
            exprs.append(f'CAST(sum("{name}") AS BIGINT)')
    src = sql_or_table if sql_or_table.isidentifier() \
        else f"({sql_or_table})"
    return tuple(con.execute(
        f"SELECT {', '.join(exprs)} FROM {src}").fetchone())


def duckdb_cc_loop(con: duckdb.DuckDBPyConnection, pairs_table: str) -> float:
    """Iterative min-label connected components in DuckDB (pointer jumping).

    The registry's recursive-CTE oracle enumerates every (node, reachable
    smaller label) pair before the final min() — on the dense near-dup
    graph this frontier is ~|V|*|component| and blows up at 10x scale.
    This loop is the standard iterative formulation (alternate min-label
    exchange along edges with pointer jumping, exactly what the Spark
    operator does) and is validated output-equal to the recursive CTE at
    sf0.01 by validate_cc_loop().  Returns wall seconds; leaves the result
    in table cc_result(node, cluster_id)."""
    t0 = time.perf_counter()
    con.execute(f"""
        CREATE OR REPLACE TABLE cc_edges AS
        SELECT id_a AS src, id_b AS dst FROM {pairs_table}
        UNION SELECT id_b, id_a FROM {pairs_table}
    """)
    con.execute("""
        CREATE OR REPLACE TABLE cc_lbl AS
        SELECT src AS node, least(src, min(dst)) AS label
        FROM cc_edges GROUP BY src
    """)
    while True:
        # keep own label, take min over neighbours' labels, then pointer-jump
        # (label <- old label of the new label); labels only ever decrease
        con.execute("""
            CREATE OR REPLACE TABLE cc_next AS
            WITH nbr AS (
                SELECT e.src AS node, min(l.label) AS nlabel
                FROM cc_edges e JOIN cc_lbl l ON e.dst = l.node
                GROUP BY e.src
            ),
            m AS (
                SELECT o.node, least(o.label, coalesce(n.nlabel, o.label)) AS label
                FROM cc_lbl o LEFT JOIN nbr n ON o.node = n.node
            )
            SELECT m.node, least(m.label, coalesce(l2.label, m.label)) AS label
            FROM m LEFT JOIN cc_lbl l2 ON m.label = l2.node
        """)
        changed = con.execute("""
            SELECT count(*) FROM cc_next n JOIN cc_lbl o ON n.node = o.node
            WHERE n.label != o.label
        """).fetchone()[0]
        con.execute("DROP TABLE cc_lbl")
        con.execute("ALTER TABLE cc_next RENAME TO cc_lbl")
        if changed == 0:
            break
    con.execute("""
        CREATE OR REPLACE TABLE cc_result AS
        SELECT d.doc_id AS node, coalesce(l.label, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN cc_lbl l ON d.doc_id = l.node
    """)
    return time.perf_counter() - t0


def validate_cc_loop() -> None:
    """Prove the iterative CC loop == the registry's recursive-CTE oracle."""
    from dwca_parquet_spark import queries as Q

    con = _connect("/root/testdata/sf0.01")
    ref = con.execute(Q.ORACLES["q44_dedup_clusters"]).fetchall()
    con.execute(
        "CREATE OR REPLACE TABLE pairs AS "
        + Q.ORACLES["q30_minhash_lsh_pairs"]
    )
    duckdb_cc_loop(con, "pairs")
    got = con.execute(
        "SELECT node AS doc_id, cluster_id FROM cc_result").fetchall()
    assert _result_hash(ref) == _result_hash(got), \
        "iterative CC loop diverges from the recursive-CTE oracle at sf0.01"
    print("  cc-loop validated == recursive CTE at sf0.01",
          file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Sweep
# ---------------------------------------------------------------------------


def run_sweep(scale: str, spark_runs: int, skip_oracle: set[str]) -> dict:
    from dwca_parquet_spark import queries as Q
    from dwca_parquet_spark.cache import release_caches
    from dwca_parquet_spark.session import get_spark

    sf_dir = str(build_fixture(scale))
    out: dict = {"scale": scale, "sf_dir": sf_dir,
                 "n_docs": SCALES[scale][0], "n_vecs": SCALES[scale][1]}

    spark = get_spark(f"dedup-sweep-{scale}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm JVM
    spark_times: dict[str, float] = {}
    spark_sums: dict[str, tuple] = {}
    for name in SWEEP:
        fn = Q.QUERIES[name]
        times = []
        for _ in range(spark_runs):
            # timing protocol == bench.py (full computation forced through a
            # one-row aggregate; tracked caches released between runs). The
            # timed aggregate IS the checksum — same upstream plan as
            # bench.py's xxhash fold, so no separate validation pass
            # recomputes a multi-minute query at sf1.
            t0 = time.perf_counter()
            spark_sums[name] = spark_checksum(fn(spark, sf_dir))
            times.append(time.perf_counter() - t0)
            release_caches()
            spark.catalog.clearCache()
        spark_times[name] = round(statistics.median(times), 3)
        print(f"  spark {scale} {name}: {spark_times[name]}s"
              f" rows={spark_sums[name][0]}", file=sys.stderr, flush=True)
    spark.stop()

    con = _connect(sf_dir)
    cut = Q.ORACLES["q30_minhash_lsh_pairs"].rfind(
        "SELECT id_a, id_b, jaccard FROM verified")
    out["lsh_candidates"] = con.execute(
        Q.ORACLES["q30_minhash_lsh_pairs"][:cut] + "SELECT count(*) FROM cand"
    ).fetchone()[0]

    oracle_times: dict[str, float] = {}
    match: dict[str, bool] = {}
    pairs_secs: float | None = None
    for name in SWEEP:
        if name in skip_oracle:
            continue
        if name == "q30_minhash_lsh_pairs":
            # materialize into a table so q44's oracle can reuse it — the
            # recursive-CTE oracle embeds the same minhash pipeline, so
            # q44_oracle = pairs_time + cc_time is the faithful total
            t0 = time.perf_counter()
            con.execute("CREATE OR REPLACE TABLE pairs AS "
                        + Q.ORACLES[name])
            pairs_secs = time.perf_counter() - t0
            oracle_times[name] = round(pairs_secs, 3)
            match[name] = duckdb_checksum(con, "pairs") == spark_sums[name]
        elif name == "q44_dedup_clusters":
            if pairs_secs is None:
                t0 = time.perf_counter()
                con.execute("CREATE OR REPLACE TABLE pairs AS "
                            + Q.ORACLES["q30_minhash_lsh_pairs"])
                pairs_secs = time.perf_counter() - t0
            # iterative CC loop (recursive CTE infeasible on the dense
            # graph at this scale; loop validated == CTE at sf0.01)
            cc_secs = duckdb_cc_loop(con, "pairs")
            oracle_times[name] = round(pairs_secs + cc_secs, 3)
            match[name] = duckdb_checksum(
                con, "SELECT node AS doc_id, cluster_id FROM cc_result"
            ) == spark_sums[name]
        else:
            # materialize once (timed), checksum the table untimed — a
            # second full execution of a 10-minute oracle would double the
            # sweep cost for nothing. CREATE TABLE is also cheaper for
            # DuckDB than fetchall's python conversion on wide outputs, so
            # the recorded oracle time is, if anything, conservative for
            # the Spark/DuckDB ratio claims.
            t0 = time.perf_counter()
            con.execute("CREATE OR REPLACE TABLE oracle_out AS "
                        + Q.ORACLES[name])
            oracle_times[name] = round(time.perf_counter() - t0, 3)
            match[name] = duckdb_checksum(
                con, "oracle_out") == spark_sums[name]
        print(f"  oracle {scale} {name}: {oracle_times[name]}s"
              f" match={match[name]}", file=sys.stderr, flush=True)

    out.update({
        "spark": spark_times, "oracle": oracle_times,
        "spark_rows": {n: s[0] for n, s in spark_sums.items()},
        "results_match": match,
        "ratio": {n: round(spark_times[n] / oracle_times[n], 2)
                  for n in oracle_times if oracle_times[n] > 0},
    })
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["calibrate", "sweep"])
    ap.add_argument("scale", nargs="?", default="sf1")
    ap.add_argument("--spark-runs", type=int, default=3)
    ap.add_argument("--skip-oracle", default="",
                    help="comma-separated query names to skip on the DuckDB side")
    args = ap.parse_args()

    if args.mode == "calibrate":
        build_fixture("sf0.1-cal")
        driver = _docs_stats(_connect(DRIVER_SF01), "driver sf0.1")
        mine = _docs_stats(_connect(str(BASE_DIR / "sf0.1-cal")),
                           "generated sf0.1-cal")
        print(json.dumps({"driver_sf01": driver, "generated_cal": mine}))
        return 0

    validate_cc_loop()
    out = run_sweep(args.scale, args.spark_runs,
                    set(filter(None, args.skip_oracle.split(","))))
    print(json.dumps(out))
    ok = all(out["results_match"].values())
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
