"""Differential tests for the round-3 text operators (PII redaction,
repetition ratio) against DuckDB computing the identical semantics — same
discipline as the driver's oracle gate, pytest-hosted because the 50-entry
query registry is full (these operators are SURVEY §2 round-3 extensions).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.text import (
    PII_PATTERNS,
    redact_pii,
    repetition_ratio,
)
from tests.conftest import SF_T2

PII_ROWS = [
    (1, "contact me at jane.doe+x@example.org or call +47 22 44-55 66 now"),
    (2, "server at 10.0.42.7 acked; backup 192.168.1.254 timed out"),
    (3, "no pii here, just words and the number 42"),
    (4, "two mails: a@b.co and c.d@e.museum; one phone 555-123-4567"),
    (5, ""),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_T2}/documents.parquet')"
    )
    return con


def _duck_redact_sql(source: str) -> str:
    expr = "t"
    counts = []
    for kind, pat in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({expr}, '{pat}')) AS BIGINT) AS n_{kind}"
        )
        expr = f"regexp_replace({expr}, '{pat}', '[PII:{kind}]', 'g')"
    return f"SELECT id, {expr} AS redacted_text, {', '.join(counts)} FROM {source}"


def test_redact_pii_synthetic(spark, duck):
    df = spark.createDataFrame(PII_ROWS, "id long, t string")
    got = {
        r["id"]: r.asDict() for r in redact_pii(df, "id", "t").collect()
    }
    duck.execute("CREATE OR REPLACE TABLE pii_rows (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO pii_rows VALUES (?, ?)", PII_ROWS)
    cur = duck.execute(_duck_redact_sql("pii_rows"))
    cols = [d[0] for d in cur.description]
    for row in cur.fetchall():
        want = dict(zip(cols, row))
        assert got[want["id"]] == want
    # sanity on the semantics themselves, not just parity
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "[PII:email]" in got[1]["redacted_text"]
    assert got[2]["n_ipv4"] == 2
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ipv4"] == 0
    assert got[5]["redacted_text"] == ""


def test_redact_pii_documents_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in redact_pii(docs, "doc_id", "text")
        .select("doc_id", "n_email", "n_phone", "n_ipv4")
        .collect()
    )
    want = sorted(
        duck.execute(
            _duck_redact_sql(
                "(SELECT doc_id AS id, text AS t FROM documents)"
            ).replace("redacted_text,", "redacted_text,")
        ).fetchall()
    )
    want = sorted((r[0], r[2], r[3], r[4]) for r in want)
    assert got == want


DUCK_REP_SQL = f"""
WITH d AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^\\x20-\\x7e]', '', 'g'),
                '\\s+', ' ', 'g')) AS s
    FROM documents
),
t AS (
    SELECT doc_id,
           CASE WHEN length(s) = 0 THEN CAST([] AS VARCHAR[])
                ELSE string_split_regex(s, '\\s+') END AS toks
    FROM d
),
g AS (
    SELECT doc_id, len(toks) AS n_tokens,
           CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                ELSE [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]
           END AS grams
    FROM t
),
c AS (
    SELECT doc_id, unnest(grams) AS gram FROM g
),
m AS (
    SELECT doc_id, gram, count(*) AS cnt FROM c GROUP BY doc_id, gram
),
best AS (
    SELECT doc_id, gram, cnt FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, gram ASC) AS rn
        FROM m
    ) WHERE rn = 1
)
SELECT g.doc_id,
       CAST(g.n_tokens AS BIGINT) AS n_tokens,
       coalesce(b.gram, '') AS top_ngram,
       CAST(coalesce(b.cnt, 0) AS BIGINT) AS top_count,
       round(coalesce(b.cnt, 0) * 2.0 / greatest(g.n_tokens, 1), 6) AS rep_ratio
FROM g LEFT JOIN best b USING (doc_id)
"""


def test_repetition_ratio_documents_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        tuple(r) for r in repetition_ratio(docs, "doc_id", "text").collect()
    )
    want = sorted(tuple(r) for r in duck.execute(DUCK_REP_SQL).fetchall())
    assert got == want


def test_hash_sample_deterministic_and_duck_parity(spark, duck):
    from dwca_parquet_spark.operators.sampling import (
        hash_sample,
        sql_hash_sample_pred,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in hash_sample(docs, "doc_id", 0.25).select("doc_id").collect()
    )
    # same keys on a repartitioned input — partition-layout independence,
    # the property df.sample() lacks
    again = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.25)
        .select("doc_id")
        .collect()
    )
    assert got == again
    pred = sql_hash_sample_pred("CAST(doc_id AS VARCHAR)", 0.25)
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE {pred}"
        ).fetchall()
    )
    assert got == want
    # roughly the requested fraction, and salts draw different samples
    assert 0.15 <= len(got) / docs.count() <= 0.35
    salted = sorted(
        r["doc_id"]
        for r in hash_sample(docs, "doc_id", 0.25, salt="s1")
        .select("doc_id")
        .collect()
    )
    assert salted != got


def test_hash_sample_quoted_salt_parity(spark, duck):
    """A salt containing a single quote must be escaped into the oracle SQL
    literal (regression: unescaped interpolation produced invalid SQL)."""
    from dwca_parquet_spark.operators.sampling import (
        hash_sample,
        sql_hash_sample_pred,
    )

    salt = "o'brien's"
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in hash_sample(docs, "doc_id", 0.3, salt=salt)
        .select("doc_id")
        .collect()
    )
    pred = sql_hash_sample_pred("CAST(doc_id AS VARCHAR)", 0.3, salt=salt)
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE {pred}"
        ).fetchall()
    )
    assert got == want and len(got) > 0


CHUNK, OVERLAP = 32, 8
STRIDE = CHUNK - OVERLAP
DUCK_CHUNK_SQL = f"""
WITH d AS (
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^\\x20-\\x7e]', '', 'g'),
                '\\s+', ' ', 'g')) AS s
    FROM documents
),
t AS (
    SELECT doc_id,
           CASE WHEN length(s) = 0 THEN CAST([] AS VARCHAR[])
                ELSE string_split_regex(s, '\\s+') END AS toks
    FROM d
),
x AS (
    SELECT doc_id, toks,
           CASE WHEN len(toks) <= 0 THEN 0
                ELSE (len(toks) - 1) // {STRIDE} + 1 END AS nc
    FROM t
),
e AS (
    SELECT doc_id, toks, unnest(range(nc)) AS chunk_idx FROM x
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       array_to_string(toks[chunk_idx * {STRIDE} + 1 :
                            chunk_idx * {STRIDE} + {CHUNK}], ' ') AS chunk_text,
       CAST(len(toks[chunk_idx * {STRIDE} + 1 :
                     chunk_idx * {STRIDE} + {CHUNK}]) AS BIGINT)
           AS n_chunk_tokens
FROM e
"""


def test_chunk_documents_parity(spark, duck):
    from dwca_parquet_spark.operators.text import chunk_documents

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in chunk_documents(
            docs, "doc_id", "text", chunk_tokens=CHUNK, overlap=OVERLAP
        ).collect()
    )
    want = sorted(tuple(r) for r in duck.execute(DUCK_CHUNK_SQL).fetchall())
    assert got == want
    # overlap really present: consecutive chunks share their boundary tokens
    by_doc = {}
    for doc_id, idx, text, n in got:
        by_doc.setdefault(doc_id, []).append((idx, text.split()))
    multi = next(v for v in by_doc.values() if len(v) >= 2)
    first, second = (toks for _, toks in sorted(multi)[:2])
    assert first[STRIDE:STRIDE + OVERLAP] == second[:OVERLAP]


def test_chunk_documents_empty_docs(spark):
    """Documents whose NORMALIZED text is empty must produce ZERO chunks
    (regression: F.sequence(1, 0) yields the descending [1, 0], which
    fabricated two phantom empty chunks before the guard)."""
    from dwca_parquet_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "   \t  "),          # whitespace-only → normalizes empty
            (3, "é中文"),  # non-ASCII only → normalizes empty
            (4, "one two three"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
        .collect()
    )
    assert got == [(4, 0, "one two three", 3)]


URL_ROWS = [
    (1, "see https://example.org/a/b?x=1 and http://sub.Example.COM."),
    (2, "bare domain example.org is not a url; https://a.b/c, done"),
    (3, "no links at all"),
    (4, "(wrapped https://x.y/z) [also https://q.r]"),
    (5, "ported http://h.x:9/ and http://host.example:8080/path end"),
]


def test_extract_urls_parity(spark, duck):
    from dwca_parquet_spark.operators.text import URL_PATTERN, extract_urls

    df = spark.createDataFrame(URL_ROWS, "id long, t string")
    got = sorted(
        tuple(r) for r in extract_urls(df, "id", "t").collect()
    )
    duck.execute("CREATE OR REPLACE TABLE url_rows (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO url_rows VALUES (?, ?)", URL_ROWS)
    pat = URL_PATTERN.replace("'", "''")
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT id, url,
                   lower(regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1))
                       AS domain
            FROM (SELECT id, unnest(regexp_extract_all(t, '{pat}')) AS url
                  FROM url_rows)
            """
        ).fetchall()
    )
    assert got == want
    by_id = {}
    for i, url, dom in got:  # sorted by (id, url)
        by_id.setdefault(i, []).append(dom)
    assert by_id[1] == ["sub.example.com", "example.org"]
    assert 3 not in by_id
    assert by_id[4] == ["q.r", "x.y"]
    # ports ride along on the URL but never pollute the domain
    assert by_id[5] == ["h.x", "host.example"]
    assert any(
        url == "http://host.example:8080/path" for _, url, _d in got
    )
    # sentence punctuation never rides along on the host
    assert all(not d.endswith(".") for doms in by_id.values() for d in doms)


def _psl_registrable_py(domain: str, suffixes) -> str:
    """Independent Python PSL implementation for the differential test:
    longest matching suffix wins; implicit * rule; single label passes."""
    labels = domain.split(".")
    best = 1
    for s in suffixes:
        k = s.count(".") + 1
        if len(labels) > k and ".".join(labels[-k:]) == s:
            best = max(best, k)
    if len(labels) > best:
        return ".".join(labels[-(best + 1):])
    return domain


def test_registrable_domain_parity(spark):
    from dwca_parquet_spark.operators.text import (
        PUBLIC_SUFFIX_SNAPSHOT,
        registrable_domain,
    )

    domains = [
        "sub.example.co.uk",          # 2-label registry suffix
        "deep.a.b.example.com",       # many subdomains
        "example.org",                # already registrable
        "localhost",                  # single label
        "x.y.unknowntld",             # implicit * rule → y.unknowntld
        "schools.pvt.k12.ma.us",      # 4-label registry suffix + 1 label
        "x.schools.pvt.k12.ma.us",    # deeper: collapses one level
        "www.nsw.edu.au",             # 3-label registry suffix
        "co.uk",                      # bare suffix: no extra label → itself
        "a.co",                       # co is a suffix → a.co
    ]
    df = spark.createDataFrame([(d,) for d in domains], "domain string")
    got = {
        r["domain"]: r["registrable_domain"]
        for r in registrable_domain(df, "domain").collect()
    }
    for d in domains:
        assert got[d] == _psl_registrable_py(d, PUBLIC_SUFFIX_SNAPSHOT), d
    assert got["sub.example.co.uk"] == "example.co.uk"
    assert got["deep.a.b.example.com"] == "example.com"
    assert got["localhost"] == "localhost"
    assert got["co.uk"] == "co.uk"
    assert got["schools.pvt.k12.ma.us"] == "schools.pvt.k12.ma.us"
    assert got["x.schools.pvt.k12.ma.us"] == "schools.pvt.k12.ma.us"


def test_extract_urls_collapse_suffix(spark):
    from dwca_parquet_spark.operators.text import extract_urls

    df = spark.createDataFrame(
        [
            (1, "read https://news.bbc.co.uk/story and https://www.bbc.co.uk/x"),
            (2, "https://a.blog.example.com/p https://example.com/q"),
        ],
        "id long, t string",
    )
    out = extract_urls(df, "id", "t", collapse_suffix=True)
    rows = out.collect()
    assert set(out.columns) == {"id", "url", "domain", "registrable_domain"}
    reg = {r["domain"]: r["registrable_domain"] for r in rows}
    # subdomains of one publisher collapse to a single source
    assert reg["news.bbc.co.uk"] == reg["www.bbc.co.uk"] == "bbc.co.uk"
    assert reg["a.blog.example.com"] == reg["example.com"] == "example.com"
    # no row multiplication from the suffix joins
    assert len(rows) == 4


def test_contamination_overlap_synthetic(spark, duck):
    """Graded n-gram-overlap decontamination: exact containment scores 1.0,
    a paraphrase scores in (0,1), unrelated text is absent; values match a
    DuckDB list_intersect oracle on the same shingle hashes."""
    from dwca_parquet_spark.functions import hashing as H
    from dwca_parquet_spark.operators.text import contamination_overlap

    docs = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank."),
        (2, "A quick brown fox leaps over a sleepy dog by the river."),
        (3, "Completely different text about Spark physical plans."),
        (4, ""),
    ]
    probes = [
        "quick brown fox jumps over the lazy dog",  # contained in doc 1
        "zzz",  # shorter than n after normalization → skipped
    ]
    n, min_frac = 8, 0.05
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        tuple(r)
        for r in contamination_overlap(
            df, "doc_id", "text", probes, n=n, min_frac=min_frac
        ).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE ov_docs (doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO ov_docs VALUES (?, ?)", docs)
    duck.execute(
        "CREATE OR REPLACE TABLE ov_probes (probe_idx BIGINT, probe VARCHAR)"
    )
    duck.executemany(
        "INSERT INTO ov_probes VALUES (?, ?)", list(enumerate(probes))
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH p AS (
                SELECT probe_idx, probe,
                       {H.sql_shingle_hashes(H.sql_normalize_text('probe'), n)} AS ph
                FROM ov_probes
            ),
            d AS (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_normalize_text('text'), n)} AS dh
                FROM ov_docs
            )
            SELECT doc_id, probe_idx, probe,
                   CAST(len(ph) AS BIGINT) AS n_probe_shingles,
                   CAST(len(list_intersect(dh, ph)) AS BIGINT) AS n_shared,
                   round(len(list_intersect(dh, ph)) / len(ph), 6) AS overlap_frac
            FROM d, p
            WHERE len(ph) > 0
              AND round(len(list_intersect(dh, ph)) / len(ph), 6) >= {min_frac}
            """
        ).fetchall()
    )
    assert got == want
    by_doc = {r[0]: r[5] for r in got}
    assert by_doc[1] == 1.0          # exact containment
    assert 0.05 <= by_doc[2] < 1.0   # paraphrase: partial overlap
    assert 3 not in by_doc and 4 not in by_doc
    # the sub-n probe was skipped entirely
    assert all(r[1] == 0 for r in got)


def test_contamination_overlap_documents_parity(spark, duck):
    """Parity on the real documents table with probes cut from document
    texts (one verbatim window, one mutated) — mid-range fractions."""
    from dwca_parquet_spark.functions import hashing as H
    from dwca_parquet_spark.operators.text import contamination_overlap

    texts = [
        r[0]
        for r in duck.execute(
            "SELECT text FROM documents WHERE length(text) > 120 "
            "ORDER BY doc_id LIMIT 2"
        ).fetchall()
    ]
    probes = [
        texts[0][20:90],
        texts[1][10:80].replace("e", "x"),
        "never anywhere in the corpus qqqqqq",
    ]
    n, min_frac = 8, 0.02
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in contamination_overlap(
            docs, "doc_id", "text", probes, n=n, min_frac=min_frac
        ).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE ov_probes2 (probe_idx BIGINT, probe VARCHAR)"
    )
    duck.executemany(
        "INSERT INTO ov_probes2 VALUES (?, ?)", list(enumerate(probes))
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            WITH p AS (
                SELECT probe_idx, probe,
                       {H.sql_shingle_hashes(H.sql_normalize_text('probe'), n)} AS ph
                FROM ov_probes2
            ),
            d AS (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_normalize_text('text'), n)} AS dh
                FROM documents
            )
            SELECT doc_id, probe_idx, probe,
                   CAST(len(ph) AS BIGINT) AS n_probe_shingles,
                   CAST(len(list_intersect(dh, ph)) AS BIGINT) AS n_shared,
                   round(len(list_intersect(dh, ph)) / len(ph), 6) AS overlap_frac
            FROM d, p
            WHERE len(ph) > 0
              AND round(len(list_intersect(dh, ph)) / len(ph), 6) >= {min_frac}
            """
        ).fetchall()
    )
    assert got == want and len(got) >= 2
    # the verbatim window hits its source doc at 1.0
    assert any(r[1] == 0 and r[5] == 1.0 for r in got)


def test_find_contaminated(spark):
    from dwca_parquet_spark.operators.text import find_contaminated

    docs = spark.createDataFrame(
        [
            (1, "The   QUICK brown fox JUMPS over the lazy dog."),
            (2, "An entirely unrelated sentence."),
            (3, "quick brown fox appears here too"),
        ],
        "doc_id long, text string",
    )
    probes = ["quick brown fox", "lazy dog", "benchmark answer 42"]
    got = sorted(
        (r.doc_id, r.probe_idx)
        for r in find_contaminated(docs, "doc_id", "text", probes).collect()
    )
    # normalization makes matching case/whitespace-insensitive
    assert got == [(1, 0), (1, 1), (3, 0)]


def test_find_contaminated_blocked_equals_exact(spark, duck):
    """The shingle-blocked scale path must return exactly the broadcast
    contains path's result — blocking is a lossless candidate superset
    (min probe shingle must appear in any containing doc), and the verify
    restores exactness. Checked on real documents plus planted probes,
    including a short probe (< k, falls back) and a never-matching one."""
    from dwca_parquet_spark.operators.text import (
        find_contaminated,
        find_contaminated_blocked,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    # real substrings from two fixture docs + a short probe + a miss
    frags = {
        r.doc_id: r.text
        for r in docs.filter(F.col("doc_id").isin(7, 123)).collect()
    }
    probes = [
        frags[7][10:48],
        frags[123][5:40],
        "the",                      # shorter than k=8 -> fallback leg
        "zz-never-in-corpus-zz",
    ]
    exact = sorted(
        (r.doc_id, r.probe_idx)
        for r in find_contaminated(docs, "doc_id", "text", probes).collect()
    )
    blocked = sorted(
        (r.doc_id, r.probe_idx)
        for r in find_contaminated_blocked(
            docs, "doc_id", "text", probes, k=8
        ).collect()
    )
    assert blocked == exact
    # the planted fragments really were found in their source docs
    assert (7, 0) in exact and (123, 1) in exact
    assert all(i != 3 for _, i in exact)


def test_hash_sample_join_consistency(spark):
    """The docstring's co-sampling claim, proven: sampling two tables by
    the SAME key and salt keeps the same keys on both sides, so the join
    of the samples equals the sample of the join — the property that lets
    a pipeline subsample facts and their feature tables independently."""
    from dwca_parquet_spark.operators.sampling import hash_sample

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select("o_orderkey", F.col("o_custkey").alias("custkey"))
    customer = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    ).select(F.col("c_custkey").alias("custkey"), "c_name")
    so = hash_sample(orders, "custkey", 0.4, salt="mix")
    sc = hash_sample(customer, "custkey", 0.4, salt="mix")
    joined_samples = sorted(
        tuple(r) for r in so.join(sc, "custkey").collect()
    )
    sampled_join = sorted(
        tuple(r)
        for r in hash_sample(
            orders.join(customer, "custkey"), "custkey", 0.4, salt="mix"
        ).collect()
    )
    assert joined_samples == sampled_join
    assert joined_samples  # non-vacuous: the sample actually kept rows


def test_stratified_sample(spark):
    from dwca_parquet_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, keep_some = sorted(langs)[0], sorted(langs)[1]
    out = stratified_sample(
        docs, "lang", "doc_id",
        {keep_all: 1.0, keep_some: 0.5},  # others default to 0
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in got}
    totals = {
        r.lang: r["count"] for r in docs.groupBy("lang").count().collect()
    }
    assert by_lang[keep_all] == totals[keep_all]          # fraction 1.0 keeps all
    assert 0 < by_lang.get(keep_some, 0) < totals[keep_some]
    assert set(by_lang) == {keep_all, keep_some}          # default 0 drops rest
    # per-stratum membership agrees with hash_sample at the same fraction
    want_some = {
        r.doc_id
        for r in hash_sample(
            docs.filter(F.col("lang") == keep_some), "doc_id", 0.5
        ).collect()
    }
    got_some = {
        r.doc_id for r in out.filter(F.col("lang") == keep_some).collect()
    }
    assert got_some == want_some


def test_repetition_ratio_flags_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now " * 50),           # pure boilerplate
            (2, "a quiet brown fox walked over seven distant hills today"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r.asDict() for r in repetition_ratio(df, "id", "t").collect()}
    assert out[1]["rep_ratio"] > 0.9
    assert out[2]["rep_ratio"] <= 0.3


def test_weighted_sample_parity_and_properties(spark, duck):
    from dwca_parquet_spark.operators.sampling import (
        weighted_sample,
        sql_weighted_sample_pred,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").withColumn(
        "w", (F.col("doc_id") % 100) / 100.0
    )
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(docs, "doc_id", "w", salt="s1").collect()
    )
    pred = sql_weighted_sample_pred("CAST(doc_id AS VARCHAR)", "(doc_id % 100) / 100.0", "s1")
    want = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT doc_id FROM documents WHERE {pred}"
        ).fetchall()
    )
    assert got == want
    assert 0 < len(got) < docs.count()

    # determinism + independence across salts
    again = sorted(
        r["doc_id"]
        for r in weighted_sample(docs, "doc_id", "w", salt="s1").collect()
    )
    assert again == got
    other = sorted(
        r["doc_id"]
        for r in weighted_sample(docs, "doc_id", "w", salt="s2").collect()
    )
    assert other != got

    # nesting: doubling every weight only ever ADDS rows
    more = weighted_sample(
        docs.withColumn("w", F.least(F.col("w") * 2, F.lit(1.0))),
        "doc_id", "w", salt="s1",
    )
    assert set(got) <= {r["doc_id"] for r in more.collect()}

    # weight extremes: 0 never kept, 1 always kept
    z = weighted_sample(docs.withColumn("w", F.lit(0.0)), "doc_id", "w")
    assert z.count() == 0
    o = weighted_sample(docs.withColumn("w", F.lit(1.0)), "doc_id", "w")
    assert o.count() == docs.count()


def test_contamination_overlap_sf01_timed(spark, capsys):
    """sf0.1 differential + wall-time row for contamination_overlap
    (VERDICT r4 ask #7: the operator landed with parity at sf0.01 only;
    this entry makes a regression at the 10x size visible).

    Parity: identical rows vs the DuckDB list_intersect oracle over the
    full 5,000-doc sf0.1 documents table with 12 probes (4 verbatim
    windows, 4 mutated, 4 misses). Timing: both legs' wall seconds print
    to the captured log; the gate is a generous absolute ceiling (60 s —
    measured 2026-08-14 on idle local[32]: Spark leg 10.7 s, DuckDB leg
    30.5 s, 26,813 rows) so only an order-of-magnitude plan regression
    trips it, not machine load. Writing this test CAUGHT one: the
    unstaged char_codes-in-transform-lambda re-evaluation (O(len²·n) per
    row — the Spark leg ran > 7 MINUTES at sf0.1 before the staging fix
    in contamination_overlap/find_contaminated_blocked).
    """
    import time

    import duckdb

    from dwca_parquet_spark.functions import hashing as H
    from dwca_parquet_spark.operators.text import contamination_overlap

    sf_dir = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    texts = [
        r[0]
        for r in con.execute(
            "SELECT text FROM documents WHERE length(text) > 160 "
            "ORDER BY doc_id LIMIT 4"
        ).fetchall()
    ]
    probes = (
        [t[25:105] for t in texts]                      # verbatim windows
        + [t[40:120].replace("a", "q") for t in texts]  # mutated
        + [f"zzzzqqqqxxxx{i}wwwwyyyyvvvvjjjjkkkk" for i in range(4)]
    )
    n, min_frac = 8, 0.02

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    got = sorted(
        tuple(r)
        for r in contamination_overlap(
            docs, "doc_id", "text", probes, n=n, min_frac=min_frac
        ).collect()
    )
    spark_s = time.perf_counter() - t0

    con.execute(
        "CREATE OR REPLACE TABLE ov_probes_sf01 "
        "(probe_idx BIGINT, probe VARCHAR)"
    )
    con.executemany(
        "INSERT INTO ov_probes_sf01 VALUES (?, ?)", list(enumerate(probes))
    )
    t0 = time.perf_counter()
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH p AS MATERIALIZED (
                SELECT probe_idx, probe,
                       {H.sql_shingle_hashes(H.sql_normalize_text('probe'), n)} AS ph
                FROM ov_probes_sf01
            ),
            -- MATERIALIZED: inlined, DuckDB recomputes the ~24 s
            -- all-docs shingle hashing once PER PROBE (12x)
            d AS MATERIALIZED (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_normalize_text('text'), n)} AS dh
                FROM documents
            )
            SELECT doc_id, probe_idx, probe,
                   CAST(len(ph) AS BIGINT) AS n_probe_shingles,
                   CAST(len(list_intersect(dh, ph)) AS BIGINT) AS n_shared,
                   round(len(list_intersect(dh, ph)) / len(ph), 6) AS overlap_frac
            FROM d, p
            WHERE len(ph) > 0
              AND round(len(list_intersect(dh, ph)) / len(ph), 6) >= {min_frac}
            """
        ).fetchall()
    )
    oracle_s = time.perf_counter() - t0

    print(
        f"contamination_overlap sf0.1: spark={spark_s:.2f}s "
        f"oracle={oracle_s:.2f}s rows={len(got)}"
    )
    assert got == want
    # every verbatim window flags its source at exactly 1.0; misses absent
    assert sum(1 for r in got if r[1] < 4 and r[5] == 1.0) >= 4
    assert not any(r[1] >= 8 for r in got)
    assert spark_s < 60, f"plan regression: spark leg took {spark_s:.1f}s"


def test_global_shuffle_parity_and_properties(spark, duck):
    """global_shuffle: ORDERED parity with the DuckDB twin (same hash,
    same total order), permutation property, seed independence,
    partitioning invariance, and shard semantics."""
    from dwca_parquet_spark.operators.sampling import (
        global_shuffle,
        sql_global_shuffle,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = [
        (r["doc_id"], r["shuffle_key"], r["shard"])
        for r in global_shuffle(docs, "doc_id", seed="s1", n_shards=4)
        .select("doc_id", "shuffle_key", "shard")
        .collect()
    ]
    want = duck.execute(
        sql_global_shuffle(
            "documents", "doc_id", cols="doc_id", seed="s1", n_shards=4
        )
    ).fetchall()
    assert got == [tuple(r) for r in want]  # ORDER included in the compare

    ids_in = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert sorted(g[0] for g in got) == ids_in  # a permutation, no loss
    assert got != [(i, k, s) for i, k, s in sorted(got)]  # actually shuffled

    # repartitioning must not change the permutation; a new seed must
    got_rep = [
        r["doc_id"]
        for r in global_shuffle(docs.repartition(13), "doc_id", seed="s1")
        .select("doc_id")
        .collect()
    ]
    assert got_rep == [g[0] for g in got]
    got_s2 = [
        r["doc_id"]
        for r in global_shuffle(docs, "doc_id", seed="s2")
        .select("doc_id")
        .collect()
    ]
    assert got_s2 != [g[0] for g in got]
    assert sorted(got_s2) == ids_in

    # shards: mod of the hash, all present, roughly balanced (hash-random)
    from collections import Counter

    shards = Counter(s for _, _, s in got)
    assert set(shards) == {0, 1, 2, 3}
    assert all(k == h % 4 for _, h, k in [(g[0], g[1], g[2]) for g in got])
    n = len(got)
    assert all(abs(c - n / 4) < n * 0.15 for c in shards.values())


def test_group_sample_k_parity_and_properties(spark, duck):
    from dwca_parquet_spark.operators.sampling import (
        group_sample_k,
        sql_group_sample_k,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet").withColumn(
        "grp", F.col("doc_id") % 7
    )
    got = sorted(
        (r["grp"], r["doc_id"])
        for r in group_sample_k(docs, "grp", "doc_id", 5, salt="gs")
        .select("grp", "doc_id")
        .collect()
    )
    want = sorted(
        duck.execute(
            sql_group_sample_k(
                "(SELECT *, doc_id % 7 AS grp FROM documents)",
                "grp",
                "doc_id",
                5,
                cols="grp, doc_id",
                salt="gs",
            )
        ).fetchall()
    )
    assert got == [tuple(r) for r in want]
    from collections import Counter

    per_group = Counter(g for g, _ in got)
    assert all(c == 5 for c in per_group.values())  # every group filled
    # nesting: k=3 is a prefix of k=5 per group
    got3 = set(
        (r["grp"], r["doc_id"])
        for r in group_sample_k(docs, "grp", "doc_id", 3, salt="gs")
        .select("grp", "doc_id")
        .collect()
    )
    assert got3 < set(got)
    # partitioning invariance
    got_rep = sorted(
        (r["grp"], r["doc_id"])
        for r in group_sample_k(docs.repartition(11), "grp", "doc_id", 5, salt="gs")
        .select("grp", "doc_id")
        .collect()
    )
    assert got_rep == got
    # the sample is not just the lowest ids (the mix actually mixes)
    lowest = sorted(
        (r["grp"], r["doc_id"])
        for r in docs.select("grp", "doc_id").collect()
    )
    by_grp = {}
    for g, i in lowest:
        by_grp.setdefault(g, []).append(i)
    naive = sorted((g, i) for g, ids in by_grp.items() for i in sorted(ids)[:5])
    assert got != naive


def test_temperature_weights_mixing(spark):
    from dwca_parquet_spark.operators.packing import (
        mix_sources,
        temperature_weights,
    )
    from dwca_parquet_spark.operators.text import token_count

    rows = []
    # three sources with very different token volumes
    for i in range(300):
        rows.append((i, "web", "w " * 20))
    for i in range(300, 360):
        rows.append((i, "books", "b " * 20))
    for i in range(360, 372):
        rows.append((i, "code", "c " * 20))
    df = spark.createDataFrame(rows, "id long, src string, text string")

    # tau=1 reproduces the natural mix -> every fraction is 1.0 (keep all)
    w1 = temperature_weights(df, "src", "text", tau=1.0)
    kept1 = mix_sources(df, "src", "id", "text", w1)
    assert kept1.count() == len(rows)

    # tau=3 flattens: the rare source binds at 1.0, the big one is cut
    w3 = temperature_weights(df, "src", "text", tau=3.0)
    kept3 = mix_sources(df, "src", "id", "text", w3)
    toks = {
        r["src"]: r["t"]
        for r in kept3.groupBy("src")
        .agg(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()
    }
    assert set(toks) == {"web", "books", "code"}
    assert toks["code"] == 12 * 20  # binding source kept whole
    # achieved shares approach the temperature targets (doc-quantized)
    total = sum(toks.values())
    wsum = sum(w3.values())
    for s in toks:
        assert abs(toks[s] / total - w3[s] / wsum) < 0.12
    # flatter than natural: web's share dropped well below its 83%
    assert toks["web"] / total < 0.6


CANON_URLS = [
    (1, "HTTP://Example.COM:80/Path/Page?b=2&utm_source=x&a=1#frag"),
    (2, "https://example.com:443/"),
    (3, "https://example.com"),
    (4, "https://example.com/?utm_campaign=spring&fbclid=abc"),
    (5, "http://sub.Example.org:8080/CaseSensitive?z=1&y=2"),
    (6, "https://example.com/p?a=1&b=2"),
    (7, "https://example.com/p?b=2&a=1"),  # same canonical as 6
    (8, "http://example.com/p?ref=tw&gclid=g&a=1"),
]


def test_canonical_url_parity_and_semantics(spark, duck):
    from dwca_parquet_spark.operators.text import (
        canonicalize_urls,
        sql_canonical_url,
    )

    df = spark.createDataFrame(CANON_URLS, "id long, url string")
    got = {
        r["id"]: r["canonical_url"]
        for r in canonicalize_urls(df, "url").collect()
    }
    duck.execute("CREATE OR REPLACE TABLE canon_urls (id BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO canon_urls VALUES (?, ?)", CANON_URLS)
    want = dict(
        duck.execute(
            f"SELECT id, {sql_canonical_url('url')} FROM canon_urls"
        ).fetchall()
    )
    assert got == want
    # semantics
    assert got[1] == "http://example.com/Path/Page?a=1&b=2"  # port, case,
    # tracking param, fragment all normalized; path case preserved
    assert got[2] == "https://example.com/"
    assert got[3] == "https://example.com/"  # empty path -> /
    assert got[4] == "https://example.com/"  # all params tracking -> no ?
    assert got[5] == "http://sub.example.org:8080/CaseSensitive?y=2&z=1"
    assert got[6] == got[7] == "https://example.com/p?a=1&b=2"
    assert got[8] == "http://example.com/p?a=1"


C4_ROWS = [
    (1, "This is a fine first sentence.\nShort line.\n"
        "Another good line with plenty of words here!\n"
        "Enable javascript to view this page properly.\n"
        'A third quoted keeper line ends well."\n'
        "and a fourth proper sentence line for the count?"),
    (2, "Only one good sentence lives in this page.\nnope\nnah"),
    (3, "Good line number one is right here today.\n"
        "Good line number two is right here today.\n"
        "Good line number three has lorem ipsum inside it."),
    (4, "A page with code tokens { should be dropped entirely.\n"
        "Even though this line is a fine sentence.\n"
        "And this one also ends correctly.\n"
        "And a third one ends correctly too."),
    (5, ""),
    (6, "CRLF line endings still count as terminal.\r\n"
        "Second proper line of the crlf page arrives.\r\n"
        "Third proper line of the crlf page lands."),
]


def test_c4_clean_parity_and_semantics(spark, duck):
    from dwca_parquet_spark.operators.text import c4_clean, sql_c4_clean

    df = spark.createDataFrame(C4_ROWS, "id long, t string")
    got = {
        r["id"]: (r["text"], r["n_lines_kept"], r["keep"])
        for r in c4_clean(df, "id", "t").collect()
    }
    duck.execute("CREATE OR REPLACE TABLE c4_rows (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO c4_rows VALUES (?, ?)", C4_ROWS)
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in duck.execute(sql_c4_clean("c4_rows", "id", "t")).fetchall()
    }
    assert got == want
    # semantics
    text1, n1, keep1 = got[1]
    assert keep1 and n1 == 4
    assert "Short line." not in text1  # < 5 words
    assert "javascript" not in text1  # boilerplate line dropped
    assert got[2][2] is False  # < 3 kept lines
    assert got[3][2] is False  # lorem ipsum page
    assert got[4][2] is False  # curly-brace page
    assert got[5] == ("", 0, False)
    assert got[6][2] is True and got[6][1] == 3  # CRLF handled

    # corpus-scale parity on the documents table
    got_docs = sorted(
        tuple(r)
        for r in c4_clean(
            spark.read.parquet(f"{SF_T2}/documents.parquet"), "doc_id", "text"
        ).collect()
    )
    want_docs = sorted(
        tuple(r)
        for r in duck.execute(
            sql_c4_clean("documents", "doc_id", "text")
        ).fetchall()
    )
    assert got_docs == want_docs


def test_quantile_bins_parity(spark, duck):
    from dwca_parquet_spark.operators.sampling import (
        quantile_bins,
        sql_quantile_bins,
    )
    from dwca_parquet_spark.operators.text import quality_score

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    scored = quality_score(docs, "doc_id", "text")
    got = sorted(
        (r["doc_id"], r["bin"])
        for r in quantile_bins(scored, "quality_score", "doc_id").collect()
    )
    # scores feed the oracle as data (quality_score itself is q26's
    # gated operator — this test gates the BINNING)
    duck.execute("CREATE OR REPLACE TABLE qscores (doc_id BIGINT, s DOUBLE)")
    duck.executemany(
        "INSERT INTO qscores VALUES (?, ?)",
        [(r["doc_id"], r["quality_score"]) for r in scored.collect()],
    )
    want = sorted(
        duck.execute(
            sql_quantile_bins("qscores", "s", "doc_id", cols="doc_id")
        ).fetchall()
    )
    assert got == [tuple(r) for r in want]
    # populations differ by at most one
    from collections import Counter

    sizes = Counter(b for _, b in got).values()
    assert max(sizes) - min(sizes) <= 1


def test_dsir_logratio_parity_and_separation(spark, duck):
    """DSIR importance scores (op 112): exact DuckDB parity on the corpus
    with REAL fitted models, partition-invariant fits, and the semantic
    contract — target-like documents outscore the rest."""
    from pyspark.sql import functions as F

    from dwca_parquet_spark.operators.text import (
        dsir_fit,
        dsir_logratio,
        sql_dsir_logratio,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    target = docs.filter(F.col("source") == "src1")
    nb = 512
    tl = dsir_fit(target, "text", n_buckets=nb)
    rl = dsir_fit(docs, "text", n_buckets=nb)
    assert len(tl) == nb == len(rl)
    # fit is partition-invariant (exact integer counts + driver-side log)
    assert dsir_fit(target.repartition(13), "text", n_buckets=nb) == tl

    got = sorted(
        tuple(r)
        for r in dsir_logratio(docs, "doc_id", "text", tl, rl).collect()
    )
    want = sorted(
        tuple(row)
        for row in duck.execute(
            sql_dsir_logratio("doc_id", "text", tl, rl, "documents")
        ).fetchall()
    )
    assert got == want

    # separation: the target source's mean score beats the corpus mean
    scored = dsir_logratio(docs, "doc_id", "text", tl, rl).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    means = {
        r["src"]: r["m"]
        for r in scored.groupBy(
            (F.col("source") == "src1").alias("src")
        ).agg(F.avg("dsir_logratio").alias("m")).collect()
    }
    assert means[True] > means[False]


def test_filter_url_blocklist_twin_and_semantics(spark, duck):
    """op 122 (round 7): domain suffix blocking, literal-pattern
    blocking, unparseable URLs kept — row-for-row vs the DuckDB twin,
    plus a zero-Exchange plan pin (broadcast joins only)."""
    from dwca_parquet_spark.operators.text import (
        filter_url_blocklist,
        sql_filter_url_blocklist,
    )

    rows = [
        (0, "https://ads.example.com/banner"),        # subdomain of blocked
        (1, "https://example.com/page"),              # blocked exactly
        (2, "https://notexample.com/page"),           # NOT a subdomain
        (3, "https://fine.org/a?utm_spam=1"),         # pattern hit
        (4, "https://fine.org/clean"),                # kept
        (5, "https://sub.tracker.co.uk/x"),           # multi-label entry
        (6, "not a url at all"),                      # unparseable → kept
        (7, None),                                    # NULL → kept
        (8, "https://EXAMPLE.com/upper"),             # case-folded host
    ]
    domains = ("example.com", "tracker.co.uk")
    patterns = ("utm_spam",)
    df = spark.createDataFrame(rows, "id long, url string")
    got = sorted(
        (r["id"], r["url_host"], r["domain_blocked"],
         r["pattern_blocked"], r["keep_url"])
        for r in filter_url_blocklist(df, "url", domains, patterns).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE urlsrc (id BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO urlsrc VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in duck.execute(
            "SELECT id, url_host, domain_blocked, pattern_blocked, keep_url "
            "FROM ("
            + sql_filter_url_blocklist("urlsrc", "url", domains, patterns)
            + ")"
        ).fetchall()
    )
    assert got == want
    by_id = {t[0]: t for t in got}
    assert [by_id[i][4] for i in range(9)] == [
        False, False, True, False, True, False, True, True, False
    ]
    plan = (
        filter_url_blocklist(df, "url", domains, patterns)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_bm25_topk_twin_and_ranking_sanity(spark, duck):
    """op 123 (round 7): BM25 ranked search — row-for-row vs the DuckDB
    twin on the real documents fixture (two queries, different k), plus
    ranking sanity on a planted corpus: term-matching docs only, more
    occurrences rank higher, rarer terms weigh more, and the
    length-normalization penalizes padded documents."""
    from dwca_parquet_spark.operators.text import bm25_topk, sql_bm25_topk

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    for q, k in (("data quality", 10), ("the model training", 7)):
        got = [
            (r["doc_id"], r["n_tokens"], r["score"])
            for r in bm25_topk(docs, "doc_id", "text", q, k=k).collect()
        ]
        want = [
            tuple(r)
            for r in duck.execute(
                sql_bm25_topk("documents", "doc_id", "text", q, k=k)
            ).fetchall()
        ]
        assert got == want and 0 < len(got) <= k
        scores = [s for _, _, s in got]
        assert scores == sorted(scores, reverse=True)

    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple apple banana"),           # more tf -> higher
        (2, "durian fig grape"),                    # no query term
        (3, "apple " + "pad " * 60),                # padded -> length-normalized down
        (4, "zebra apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(df, "doc_id", "text", "apple", k=5).collect()
    ]
    ids = [i for i, _ in got]
    assert 2 not in ids                      # zero-score excluded
    assert ids[0] == 1                       # highest tf wins
    by_id = dict(got)
    assert by_id[3] < by_id[0]               # padding penalized
    # rarer term outweighs common one: 'zebra' appears in 1 doc,
    # 'apple' in 4 -> doc 4 ranks first for the combined query
    got2 = [
        r["doc_id"]
        for r in bm25_topk(df, "doc_id", "text", "apple zebra", k=5).collect()
    ]
    assert got2[0] == 4

    import pytest

    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(df, "doc_id", "text", "   ")


def test_filter_url_blocklist_bypass_vectors(spark, duck):
    """Review finding (round 7): userinfo (http://user@blocked.com) and
    trailing-dot FQDNs (http://blocked.com./x) bypassed the naive
    authority regex in BOTH engines — the twin shared the bug, so only
    a hostile-input gate can hold the line. All three vectors now
    block, and the engines still agree row-for-row."""
    from dwca_parquet_spark.operators.text import (
        filter_url_blocklist,
        sql_filter_url_blocklist,
    )

    rows = [
        (0, "http://user@blocked.com/x"),          # userinfo
        (1, "http://a:b@blocked.com/x"),           # userinfo with password
        (2, "http://blocked.com./x"),              # trailing-dot FQDN
        (3, "http://sub.blocked.com.../x"),        # multi-dot tail
        (4, "https://blocked.com?page=2"),         # query right after host
        (5, "https://safe.org/u@name"),            # @ in PATH is not userinfo
    ]
    domains = ("blocked.com",)
    df = spark.createDataFrame(rows, "id long, url string")
    got = sorted(
        (r["id"], r["url_host"], r["keep_url"])
        for r in filter_url_blocklist(df, "url", domains).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE urlbypass (id BIGINT, url VARCHAR)")
    duck.executemany("INSERT INTO urlbypass VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in duck.execute(
            "SELECT id, url_host, keep_url FROM ("
            + sql_filter_url_blocklist("urlbypass", "url", domains)
            + ")"
        ).fetchall()
    )
    assert got == want
    by_id = {i: (h, k) for i, h, k in got}
    for i in range(5):
        assert by_id[i][0].rstrip(".") in ("blocked.com", "sub.blocked.com")
        assert by_id[i][1] is False, (i, by_id[i])
    assert by_id[5] == ("safe.org", True)


def test_bm25_all_null_corpus_clear_error(spark):
    """Review finding (round 7): an all-NULL-text corpus crashed with an
    opaque TypeError (sum(_dl) is NULL with n_docs > 0); it must raise
    the same class of clear error the empty corpus gets."""
    import pytest

    from dwca_parquet_spark.operators.text import bm25_topk

    df = spark.createDataFrame(
        [(0, None), (1, None)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no tokenizable text"):
        bm25_topk(df, "doc_id", "text", "apple")
