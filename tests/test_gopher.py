"""Differential tests for the Gopher/MassiveText quality rules and the
corpus paragraph dedup (SURVEY §2 ops 102-103) — DuckDB computes the
identical semantics (same split/trim/threshold rules, same portable
hashes), the driver-gate discipline hosted in pytest because the
50-entry registry is full.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.text import (
    gopher_ngram_stats,
    gopher_quality,
    sql_gopher_ngram_stats,
    sql_gopher_quality,
)
from dwca_parquet_spark.operators.dedup import (
    dedup_paragraphs,
    sql_dedup_paragraphs,
)
from tests.conftest import SF_T2

GOOD = (
    "The quick brown fox jumps over the lazy dog near the river bank today. "
    "It would often be seen there with friends of that kind, and everyone "
    "would have agreed that the fox was quick. "
) * 3
ROWS = [
    (1, GOOD),
    (2, "- one\n- two\n- three\n- four\n" + GOOD),  # bullet lines + body
    (3, "spam spam\n\nspam spam\n\nspam spam\n\n" + GOOD),  # dup paragraphs
    (4, "too short to keep."),  # < 50 words
    (5, "#tag " * 60),  # hash spam, no stop words
    (6, ""),  # empty
    (7, "wait...\nreally...\nno...\n" + GOOD),  # ellipsis lines
    (8, "a\r\nb\r\n" + GOOD),  # CRLF normalization
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_T2}/documents.parquet')"
    )
    con.execute("CREATE TABLE rows (id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO rows VALUES (?, ?)", ROWS)
    return con


def _round_row(row, nd=12):
    return tuple(
        round(v, nd) if isinstance(v, float) else v for v in row
    )


def test_gopher_quality_parity_and_semantics(spark, duck):
    df = spark.createDataFrame(ROWS, "id long, t string")
    got = {r["id"]: _round_row(tuple(r)[1:]) for r in
           gopher_quality(df, "id", "t").collect()}
    cols = [d[0] for d in
            duck.execute(sql_gopher_quality("rows", "id", "t")).description]
    want = {row[0]: _round_row(row[1:]) for row in
            duck.execute(sql_gopher_quality("rows", "id", "t")).fetchall()}
    assert cols[1:] == [
        "n_words", "mean_word_len", "hash_word_ratio",
        "ellipsis_word_ratio", "alpha_word_frac", "n_stop_words",
        "bullet_line_frac", "ellipsis_line_frac", "dup_line_frac",
        "dup_line_char_frac", "dup_para_frac", "dup_para_char_frac",
        "keep",
    ]
    assert got == want

    by_id = {r["id"]: r for r in gopher_quality(df, "id", "t").collect()}
    assert by_id[1]["keep"] is True
    assert by_id[2]["bullet_line_frac"] > 0.3
    assert by_id[3]["dup_para_frac"] > 0.3 and by_id[3]["keep"] is False
    assert by_id[4]["keep"] is False  # word-count floor
    assert by_id[5]["hash_word_ratio"] >= 1.0
    assert by_id[5]["n_stop_words"] == 0 and by_id[5]["keep"] is False
    assert by_id[6]["n_words"] == 0 and by_id[6]["keep"] is False
    assert by_id[7]["ellipsis_line_frac"] > 0.3 and by_id[7]["keep"] is False


def test_gopher_quality_corpus_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        (r["doc_id"],) + _round_row(tuple(r)[1:])
        for r in gopher_quality(docs, "doc_id", "text").collect()
    )
    want = sorted(
        (row[0],) + _round_row(row[1:])
        for row in duck.execute(
            sql_gopher_quality("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want


def test_gopher_ngram_stats_parity(spark, duck):
    ns = (2, 3, 5, 10)
    df = spark.createDataFrame(ROWS, "id long, t string")
    got = sorted(
        (r["id"], r["n"], round(r["top_ngram_char_frac"], 12),
         round(r["dup_ngram_char_frac"], 12))
        for r in gopher_ngram_stats(df, "id", "t", ns=ns).collect()
    )
    want = sorted(
        (row[0], row[1], round(row[2], 12), round(row[3], 12))
        for row in duck.execute(
            sql_gopher_ngram_stats("rows", "id", "t", ns=ns)
        ).fetchall()
    )
    assert got == want
    # semantics: "spam spam" repeated -> high dup mass at n=2 for id 3
    d = {(i, n): (top, dup) for i, n, top, dup in got}
    assert d[(3, 2)][1] > 0.15
    # a doc with < n words emits no row for that n
    assert (4, 10) not in d and (4, 2) in d
    # empty doc emits nothing
    assert not any(i == 6 for i, _ in d)


def test_gopher_ngram_stats_corpus_parity(spark, duck):
    ns = (2, 3, 4)
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["n"], round(r["top_ngram_char_frac"], 12),
         round(r["dup_ngram_char_frac"], 12))
        for r in gopher_ngram_stats(docs, "doc_id", "text", ns=ns).collect()
    )
    want = sorted(
        (row[0], row[1], round(row[2], 12), round(row[3], 12))
        for row in duck.execute(
            sql_gopher_ngram_stats("documents", "doc_id", "text", ns=ns)
        ).fetchall()
    )
    assert got == want


PARA_ROWS = [
    (1, "shared header\n\nunique one\n\nshared footer"),
    (2, "shared header\n\nunique two\n\nshared footer"),  # loses both shared
    (3, "shared header"),  # fully duplicated -> empty
    (4, "unique three\r\n\r\nunique four"),  # CRLF paragraphs
    (5, ""),  # no paragraphs
    (6, "unique one"),  # dup of doc 1's paragraph
]


def test_dedup_paragraphs_parity_and_semantics(spark, duck):
    duck.execute("CREATE TABLE paras (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO paras VALUES (?, ?)", PARA_ROWS)
    df = spark.createDataFrame(PARA_ROWS, "id long, t string")
    got = {r["id"]: (r["text"], r["n_paras_kept"], r["n_paras"])
           for r in dedup_paragraphs(df, "id", "t").collect()}
    want = {row[0]: (row[1], row[2], row[3]) for row in duck.execute(
        sql_dedup_paragraphs("paras", "id", "t")).fetchall()}
    assert got == want
    assert got[1] == (
        "shared header\n\nunique one\n\nshared footer", 3, 3)
    assert got[2] == ("unique two", 1, 3)
    assert got[3] == ("", 0, 1)
    assert got[4] == ("unique three\n\nunique four", 2, 2)
    assert got[5] == ("", 0, 0)
    assert got[6] == ("", 0, 1)


def test_dedup_lines_unit_parity(spark, duck):
    """unit='line' — the RefinedWeb line-level variant — same machinery,
    single-newline boundaries, single-newline reassembly."""
    rows = [(1, "a\nb\nc"), (2, "b\nd\n\ne"), (3, "x")]
    duck.execute("CREATE TABLE line_rows (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO line_rows VALUES (?, ?)", rows)
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: tuple(r)[1:]
           for r in dedup_paragraphs(df, "id", "t", unit="line").collect()}
    want = {row[0]: row[1:] for row in duck.execute(
        sql_dedup_paragraphs("line_rows", "id", "t", unit="line")
    ).fetchall()}
    assert got == want
    assert got[1] == ("a\nb\nc", 3, 3)
    assert got[2] == ("d\ne", 2, 3)  # 'b' seen in doc 1; blank line dropped


def test_dedup_paragraphs_corpus_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in dedup_paragraphs(docs, "doc_id", "text").collect()
    )
    want = sorted(
        tuple(row)
        for row in duck.execute(
            sql_dedup_paragraphs("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got == want


def test_dedup_paragraphs_incremental_equivalence(spark, duck):
    """Incremental ≡ from-scratch over history ∪ batch restricted to the
    batch (history ids order first), on a corpus with cross-batch,
    within-batch, and history-internal duplicate paragraphs."""
    from dwca_parquet_spark.operators.dedup import (
        dedup_paragraphs_incremental,
        paragraph_state,
    )

    history = [
        (1, "boiler\n\nalpha"),
        (2, "boiler\n\nbeta"),  # history-internal dup of 'boiler'
    ]
    batch = [
        (10, "boiler\n\ngamma\n\nnew one"),   # history dup + fresh
        (11, "gamma\n\nnew two"),             # within-batch dup of gamma
        (12, "alpha"),                        # entirely history -> empty
        (13, ""),                             # empty doc
    ]
    h_df = spark.createDataFrame(history, "id long, t string")
    b_df = spark.createDataFrame(batch, "id long, t string")
    state = paragraph_state(h_df, "id", "t")
    got = {r["id"]: tuple(r)[1:] for r in
           dedup_paragraphs_incremental(b_df, state, "id", "t").collect()}

    both = spark.createDataFrame(history + batch, "id long, t string")
    want = {r["id"]: tuple(r)[1:]
            for r in dedup_paragraphs(both, "id", "t").collect()
            if r["id"] >= 10}
    assert got == want
    assert got[10] == ("gamma\n\nnew one", 2, 3)
    assert got[11] == ("new two", 1, 2)
    assert got[12] == ("", 0, 1)
    assert got[13] == ("", 0, 0)

    # corpus-scale: split the documents table into halves by id parity
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    lo = docs.filter("doc_id % 2 = 0")
    hi = docs.filter("doc_id % 2 = 1").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    inc = {r["doc_id"]: tuple(r)[1:] for r in dedup_paragraphs_incremental(
        hi, paragraph_state(lo, "doc_id", "text"), "doc_id", "text"
    ).collect()}
    scratch = {r["doc_id"]: tuple(r)[1:] for r in dedup_paragraphs(
        lo.unionByName(hi), "doc_id", "text").collect()
        if r["doc_id"] >= 1_000_000}
    assert inc == scratch


def test_filter_chain_composes(spark):
    """The web-filter chain composes lazily end-to-end:
    c4_clean → gopher_quality audit → corpus paragraph dedup, with
    paragraph accounting consistent at each stage and no collect
    between stages (one DataFrame chain)."""
    from dwca_parquet_spark.operators.text import c4_clean

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    cleaned = c4_clean(docs, "doc_id", "text")
    survivors = cleaned.filter("keep").select("doc_id", "text")

    gq = gopher_quality(survivors, "doc_id", "text")
    assert gq.count() == survivors.count()

    deduped = dedup_paragraphs(survivors, "doc_id", "text")
    # paragraph accounting: n_paras of the dedup stage equals the
    # paragraph count of its input text, computed independently
    audit = (
        survivors.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.regexp_replace("text", "\r", ""), "\n{2,}"),
                    lambda x: F.length(F.trim(x)) > 0,
                )
            ).cast("long").alias("expect_paras"),
        )
        .join(deduped, "doc_id")
        .filter(F.col("expect_paras") != F.col("n_paras"))
    )
    assert audit.count() == 0
    # kept text is never longer than input text
    joined = survivors.select("doc_id", F.length("text").alias("in_len")).join(
        deduped.select("doc_id", F.length("text").alias("out_len")), "doc_id"
    )
    assert joined.filter("out_len > in_len").count() == 0


def test_select_to_token_budget_parity(spark, duck):
    """Token-budget selection ≡ the DuckDB single-window oracle on real
    scores/token counts, including tied scores; bucket count never
    changes the result."""
    from dwca_parquet_spark.operators.sampling import (
        select_to_token_budget,
        sql_select_to_token_budget,
    )
    from dwca_parquet_spark.operators.text import quality_score, text_stats

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    scored = (
        quality_score(docs, "doc_id", "text")
        .join(
            text_stats(docs, "doc_id", "text").select(
                "doc_id", "n_tokens"
            ),
            "doc_id",
        )
        .select("doc_id", F.col("quality_score").alias("score"), "n_tokens")
    )
    budget = 15_000
    got = sorted(
        tuple(r)
        for r in select_to_token_budget(
            scored, "doc_id", "score", "n_tokens", budget
        ).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE scored (doc_id BIGINT, s DOUBLE, t BIGINT)"
    )
    duck.executemany(
        "INSERT INTO scored VALUES (?, ?, ?)",
        [(r["doc_id"], r["score"], r["n_tokens"]) for r in scored.collect()],
    )
    want = sorted(
        tuple(row)
        for row in duck.execute(
            sql_select_to_token_budget("scored", "doc_id", "s", "t", budget)
        ).fetchall()
    )
    assert got == want

    # bucket count is an execution knob, not a semantics knob
    one_bucket = sorted(
        tuple(r)
        for r in select_to_token_budget(
            scored, "doc_id", "score", "n_tokens", budget, n_buckets=1
        ).collect()
    )
    assert one_bucket == got

    # the greedy invariant: every selected doc STARTS under budget, and
    # dropping any selected doc's tokens stays under budget + max_doc
    sel = [r for r in got if r[4]]
    assert sel and all(r[3] - r[2] < budget for r in sel)
    assert all(not (r[3] - r[2] < budget) or r[4] for r in got)


def test_realize_mixture_parity(spark, duck):
    """Mixture realization ≡ the DuckDB per-source-window oracle with
    identical floored budgets; per-source selections respect budget +
    one straddling doc; weights come from the real temperature op."""
    from dwca_parquet_spark.operators.packing import temperature_weights
    from dwca_parquet_spark.operators.sampling import (
        realize_mixture,
        sql_realize_mixture,
    )
    from dwca_parquet_spark.operators.text import quality_score, text_stats

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    weights = temperature_weights(docs, "source", "text", tau=2.0)
    assert len(weights) > 1
    scored = (
        quality_score(docs, "doc_id", "text")
        .join(
            text_stats(docs, "doc_id", "text").select("doc_id", "n_tokens"),
            "doc_id",
        )
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id", "source",
            F.col("quality_score").alias("score"), "n_tokens",
        )
    )
    budget = 30_000
    got = sorted(
        tuple(r)
        for r in realize_mixture(
            scored, "doc_id", "source", "score", "n_tokens", budget, weights
        ).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE mix_scored "
        "(doc_id BIGINT, source VARCHAR, s DOUBLE, t BIGINT)"
    )
    duck.executemany(
        "INSERT INTO mix_scored VALUES (?, ?, ?, ?)",
        [(r["doc_id"], r["source"], r["score"], r["n_tokens"])
         for r in scored.collect()],
    )
    want = sorted(
        tuple(row)
        for row in duck.execute(
            sql_realize_mixture(
                "mix_scored", "doc_id", "source", "s", "t", budget, weights
            )
        ).fetchall()
    )
    assert got == want

    # per-source budget discipline: selected mass ∈ (budget - max_doc,
    # budget + max_doc) whenever the source had enough supply
    import collections

    by_src = collections.defaultdict(list)
    for r in got:
        by_src[r[5]].append(r)
    for s, rows in by_src.items():
        b = rows[0][6]
        sel_toks = sum(r[2] for r in rows if r[4])
        supply = sum(r[2] for r in rows)
        max_doc = max(r[2] for r in rows)
        if supply >= b:
            assert b - max_doc < sel_toks < b + max_doc
        else:
            assert sel_toks == supply  # took everything it had


def test_dedup_paragraphs_survives_polyhash_collision(spark):
    """Round-6 regression (ADVICE): a single poly_hash key is ~2^30
    wide — birthday collisions hit 50% at ~37k distinct paragraphs, and
    with no text-equality verify the colliding later paragraph was
    silently rewritten out of its document. The key is now the struct
    of two independent-modulus hashes (~2^87). This test birthday-mines
    a REAL poly_hash collision (two distinct strings, equal _k) and
    asserts both paragraphs survive."""
    from dwca_parquet_spark.functions.hashing import (
        HASH_BASE,
        HASH_BASE2,
        HASH_MOD,
        HASH_MOD2,
    )
    from dwca_parquet_spark.operators.dedup import dedup_paragraphs

    def ph(s, base, mod):
        h = 0
        for ch in s:
            h = (h * base + ord(ch)) % mod
        return h

    # deterministic birthday search over pseudo-random [a-z]{8} words
    seen, pair, x = {}, None, 1
    while pair is None:
        x = (x * 1103515245 + 12345) % (1 << 31)
        y, s = x, []
        for _ in range(8):
            s.append(chr(ord("a") + y % 26))
            y //= 26
        s = "".join(s)
        h = ph(s, HASH_BASE, HASH_MOD)
        if h in seen and seen[h] != s:
            pair = (seen[h], s)
        seen[h] = s
    a, b = pair
    assert a != b
    assert ph(a, HASH_BASE, HASH_MOD) == ph(b, HASH_BASE, HASH_MOD)
    assert ph(a, HASH_BASE2, HASH_MOD2) != ph(b, HASH_BASE2, HASH_MOD2)

    df = spark.createDataFrame(
        [(1, f"{a}\n\ncommon tail"), (2, f"{b}\n\ncommon tail")],
        "id long, t string",
    )
    out = {r["id"]: r for r in dedup_paragraphs(df, "id", "t").collect()}
    # both colliding-but-distinct paragraphs survive; the genuinely
    # duplicated 'common tail' still dedups to its first occurrence
    assert out[1]["text"] == f"{a}\n\ncommon tail"
    assert out[2]["text"] == b
    assert out[1]["n_paras_kept"] == 2 and out[2]["n_paras_kept"] == 1
