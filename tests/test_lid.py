"""Trained language ID (hashed char-n-gram NB — SURVEY §2.G op 153).

Gates:
  * differential: lid_score ≡ DuckDB literal-weights twin (sql_lid_score)
    row-for-row on the fixture — the nb_score pattern;
  * oracle rehearsal: the FULL in-SQL fit+score (sql_lid_fit_score, the
    q78 driver oracle) ≡ Spark fit+score — pins that DuckDB's own
    round(ln(·), 9) lands on the same decimal weights as the driver-side
    math.log (both call the platform libm on identical double args);
  * weight-grid equality: the DuckDB-computed weight grid == the Python
    _lid_weights grid, value-for-value (the direct probe behind the
    rehearsal — failure here localizes a libm/round divergence);
  * accuracy: on a constructed labeled corpus (the DRIVER fixture's
    `lang` is label noise — per-lang token distributions are uniform,
    measured round 10), held-out accuracy beats the stopword-vote
    heuristic on SHORT documents, the case that motivates a trained
    character model (CCNet gates on fastText for exactly this reason);
  * edges: NULL text → NULL prediction, empty/short text → prior argmax,
    NULL labels excluded from the fit.
"""

from __future__ import annotations

import random

import pytest

from dwca_parquet_spark.operators import text as T
from tests.conftest import SF_SMOKE, duck_con

pytestmark = pytest.mark.usefixtures("spark")


def _spark_rows(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = T.lid_fit(d, "text", "lang")
    out = T.lid_score(d, "doc_id", "text", model).orderBy("doc_id").collect()
    return model, [(r["doc_id"], r["lid_lang"], r["lid_score"]) for r in out]


def test_lid_differential_literal_twin(spark):
    model, sp = _spark_rows(spark, SF_SMOKE)
    con = duck_con(SF_SMOKE)
    lit = con.execute(
        T.sql_lid_score("doc_id", "text", model) + " ORDER BY doc_id"
    ).fetchall()
    assert sp == [tuple(r) for r in lit]


def test_lid_oracle_fit_score_parity(spark):
    model, sp = _spark_rows(spark, SF_SMOKE)
    con = duck_con(SF_SMOKE)
    fit = con.execute(
        T.sql_lid_fit_score("documents", "doc_id", "text", "lang")
        + " ORDER BY doc_id"
    ).fetchall()
    assert sp == [tuple(r) for r in fit]


def test_lid_weight_grid_cross_engine_equality(spark):
    """DuckDB's round(ln((n+α)/(t+α·B)), 9) == Python's
    round(math.log(...), 9) for EVERY (class, bucket) cell, and the
    priors likewise — the argument-identical-libm assumption the q78
    oracle rests on, probed directly."""
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    model = T.lid_fit(d, "text", "lang")
    classes, w, pri = T._lid_weights(model)
    b = model["buckets"]
    con = duck_con(SF_SMOKE)
    bs = T._sql_lid_buckets(model["k"], b)
    rows = con.execute(f"""
        WITH d0 AS (SELECT CAST(lang AS VARCHAR) AS y,
                           {T.H.sql_normalize_text('text')} AS nt
                    FROM documents WHERE lang IS NOT NULL),
        c0 AS (SELECT y, {T._SQL_CODES} AS cd FROM d0),
        b0 AS (SELECT y, {bs} AS bs FROM c0),
        pairs AS (SELECT y, unnest(bs) AS b FROM b0),
        cnt AS (SELECT y, b, count(*) AS n FROM pairs GROUP BY 1, 2),
        tots AS (SELECT y, CAST(sum(n) AS BIGINT) AS t FROM cnt GROUP BY 1),
        docs AS (SELECT y FROM cnt GROUP BY y),
        grid AS (SELECT docs.y, gb.b FROM docs CROSS JOIN
                 (SELECT unnest(range(0, {b})) AS b) gb)
        SELECT g.y AS gy, g.b AS gb,
               round(ln((coalesce(c.n, 0) + 1.0)
                        / (coalesce(t.t, 0) + 1.0 * {b})), 9) AS w
        FROM grid g
        LEFT JOIN cnt c ON c.y = g.y AND c.b = g.b
        LEFT JOIN tots t ON t.y = g.y
        ORDER BY gy, gb
    """).fetchall()
    duck_w = {}
    for y, g, val in rows:
        duck_w.setdefault(y, {})[g] = val
    for c in classes:
        assert [duck_w[c][g] for g in range(b)] == w[c]
    duck_pri = dict(
        con.execute(f"""
        WITH docs AS (SELECT CAST(lang AS VARCHAR) AS y, count(*) AS d
                      FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        nd AS (SELECT CAST(sum(d) AS BIGINT) AS n FROM docs)
        SELECT y, round(ln(d / nd.n), 9) FROM docs CROSS JOIN nd
        """).fetchall()
    )
    assert {c: duck_pri[c] for c in classes} == pri


# --- constructed labeled corpus: real signal, unlike the driver fixture ---

_VOCAB = {
    "en": ["processing", "speed", "dataset", "quality", "training"],
    "es": ["procesamiento", "velocidad", "datos", "calidad", "entrenar"],
    "fr": ["traitement", "vitesse", "donnees", "qualite", "entrainer"],
    "de": ["verarbeitung", "geschwindigkeit", "daten", "qualitaet", "lernen"],
    "zh": ["chuli", "sudu", "shuju", "zhiliang", "xunlian"],
}


def _synthetic_corpus(n_per_lang=200, stopword_rate=0.15, seed=7):
    """Per-language word soup: mostly lang-specific vocabulary, a few
    stopwords mixed in at ``stopword_rate`` — so SHORT samples often
    carry no stopword at all and the vote heuristic must abstain/guess
    while character n-grams still see the lang-specific morphology."""
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, vocab in sorted(_VOCAB.items()):
        stops = list(T.LANG_STOPWORDS[lang])
        for _ in range(n_per_lang):
            n_words = rng.randint(8, 20)
            words = [
                rng.choice(stops)
                if rng.random() < stopword_rate
                else rng.choice(vocab)
                for _ in range(n_words)
            ]
            rows.append((i, " ".join(words), lang))
            i += 1
    return rows


def test_lid_beats_stopword_heuristic_on_short_docs(spark):
    rows = _synthetic_corpus()
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    # leakage-safe split by id parity: fit on even ids, eval on odd
    train = df.filter(df.doc_id % 2 == 0)
    model = T.lid_fit(train, "text", "lang")
    # held-out SHORT docs: first 3 words only — usually stopword-free
    from pyspark.sql import functions as F

    short = df.filter(df.doc_id % 2 == 1).select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 3), " ").alias("text"),
        "lang",
    )
    nb = T.lid_score(short, "doc_id", "text", model)
    heur = T.language_id(short, "doc_id", "text")
    truth = {r["doc_id"]: r["lang"] for r in short.collect()}
    nb_acc = sum(
        1 for r in nb.collect() if r["lid_lang"] == truth[r["doc_id"]]
    ) / len(truth)
    h_acc = sum(
        1 for r in heur.collect() if r["lang_pred"] == truth[r["doc_id"]]
    ) / len(truth)
    assert nb_acc > h_acc, (nb_acc, h_acc)
    assert nb_acc >= 0.9, nb_acc
    # and the parity twin holds on this corpus too
    con = duck_con(SF_SMOKE)
    con.register("shortdocs", short.toPandas())
    lit = con.execute(
        T.sql_lid_score("doc_id", "text", model, source="shortdocs")
        + " ORDER BY doc_id"
    ).fetchall()
    sp = [
        (r["doc_id"], r["lid_lang"], r["lid_score"])
        for r in nb.orderBy("doc_id").collect()
    ]
    assert sp == [tuple(r) for r in lit]


def test_lid_edge_cases(spark):
    rows = [
        (1, "abcdef ghijkl", "en"),
        (2, "abcdef ghijkl mnopqr", "en"),
        (3, "zzzzzz yyyyyy", "fr"),
        (4, None, "en"),  # NULL text still counts toward the prior
        (5, "", "fr"),
        (6, "ab", "fr"),  # shorter than k=3 after normalize
        (7, "some text", None),  # NULL label: excluded from fit
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    model = T.lid_fit(df, "text", "lang")
    assert model["classes"] == ["en", "fr"]
    assert model["docs"] == {"en": 3, "fr": 3}
    out = {
        r["doc_id"]: (r["lid_lang"], r["lid_score"])
        for r in T.lid_score(df, "doc_id", "text", model).collect()
    }
    assert out[4] == (None, None)  # NULL text → NULL prediction
    # empty and sub-k texts score bare priors → majority class 'en'
    assert out[5][0] == "en" and out[6][0] == "en"
    assert out[5] == out[6]
    # trained cells recover their own training text
    assert out[1][0] == "en" and out[3][0] == "fr"
    # twin agrees on every edge
    con = duck_con(SF_SMOKE)
    import pandas as pd

    con.register(
        "edgedocs",
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    )
    lit = con.execute(
        T.sql_lid_score("doc_id", "text", model, source="edgedocs")
        + " ORDER BY doc_id"
    ).fetchall()
    sp = [
        (r["doc_id"], r["lid_lang"], r["lid_score"])
        for r in T.lid_score(df, "doc_id", "text", model)
        .orderBy("doc_id")
        .collect()
    ]
    assert sp == [tuple(r) for r in lit]
    fit = con.execute(
        T.sql_lid_fit_score("edgedocs", "doc_id", "text", "lang")
        + " ORDER BY doc_id"
    ).fetchall()
    assert sp == [tuple(r) for r in fit]


def test_bucket_counts_arrow_equals_hof_path(spark):
    """The Arrow-vectorized bucket-count path is BIT-identical to the
    JVM higher-order fold it replaced — same rolling hash, same
    multiplicities — on mixed/edge inputs."""
    from pyspark.sql import functions as F

    from dwca_parquet_spark.operators.text import (
        _lid_bucket_array,
        _lid_bucket_counts,
    )
    from dwca_parquet_spark.functions import hashing as H

    rows = [
        (1, "hello world hello"),
        (2, "ab"),  # shorter than k
        (3, ""),
        (4, None),
        (5, "ZZ  zz\t Zz"),  # normalization collapses/lowers
        (6, "x" * 5000),  # one long run → one bucket, high count
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, b in ((3, 256), (2, 64), (5, 512)):
        arrow = sorted(
            tuple(r)
            for r in _lid_bucket_counts(df, "doc_id", "text", k, b).collect()
        )
        hof = sorted(
            tuple(r)
            for r in (
                df.select(
                    "doc_id", H.normalize_text(F.col("text")).alias("_nt")
                )
                .select("doc_id", H.char_codes(F.col("_nt")).alias("_cd"))
                .select(
                    "doc_id",
                    F.explode(_lid_bucket_array(F.col("_cd"), k, b)).alias(
                        "b"
                    ),
                )
                .groupBy("doc_id", "b")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
        )
        assert arrow == hof, (k, b)


def test_lid_label_charset_guard(spark):
    """ADVICE r10: class labels are interpolated into column names and
    oracle SQL literals — an exotic label must fail loudly at fit time,
    not break column resolution (or inject SQL) downstream."""
    import pytest

    from dwca_parquet_spark.operators.text import lid_fit, lid_score

    df = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over things", "en"),
            ("b", "le renard brun saute par dessus tout", "fr'); --"),
        ],
        "doc_id string, text string, lang string",
    )
    with pytest.raises(ValueError, match="safe charset"):
        lid_fit(df, "text", "lang")
    # a hand-built model with a bad label fails at weight build too
    bad_model = {
        "k": 3, "buckets": 4, "alpha": 1.0,
        "classes": ["en", "x.y z"],
        "counts": {}, "totals": {"en": 0, "x.y z": 0},
        "docs": {"en": 1, "x.y z": 1}, "n_docs": 2,
    }
    with pytest.raises(ValueError, match="safe charset"):
        lid_score(df, "doc_id", "text", bad_model)
    # the safe charset itself still fits/scores
    ok = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over things", "en-US_1"),
            ("b", "le renard brun saute par dessus tout", "fr"),
        ],
        "doc_id string, text string, lang string",
    )
    model = lid_fit(ok, "text", "lang")
    assert lid_score(ok, "doc_id", "text", model).count() == 2
