"""Gates for unicode hygiene (SURVEY §2 op 115): control-strip twin
parity, NFC vs DuckDB's NATIVE nfc_normalize (cross-engine, not a twin
of our own code), and mojibake repair vs an independent reference with
a no-false-positive sweep."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from dwca_parquet_spark.operators.unicode import (
    clean_controls,
    fix_mojibake,
    normalize_nfc,
    sql_clean_controls,
)

DIRTY = [
    (0, "\ufeffBOM lead and zero\u200bwidth\u200c joins\u200d here\u2060."),
    (1, "tabs\tand\nnewlines survive \x01\x02 but controls\x1f don't\x7f."),
    (2, "nb\u00a0sp en\u2002sp em\u2003sp thin\u2009sp ideographic\u3000sp"),
    (3, "line\u2028sep and para\u2029sep become spaces"),
    (4, "plain ascii stays byte-identical."),
    (5, None),
    (6, ""),
]


def test_clean_controls_duckdb_twin(spark, duck):
    df = spark.createDataFrame(DIRTY, "id long, t string")
    got = sorted(
        (r["id"], r["text"])
        for r in clean_controls(df, "id", "t").collect()
    )
    duck.execute("CREATE OR REPLACE TABLE dirty (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO dirty VALUES (?, ?)", DIRTY)
    want = sorted(
        tuple(r)
        for r in duck.execute(sql_clean_controls("dirty", "id", "t")).fetchall()
    )
    assert got == want
    by_id = dict(got)
    assert by_id[0] == "BOM lead and zerowidth joins here."
    assert by_id[1] == "tabs\tand\nnewlines survive  but controls don't."
    assert " " not in by_id[2] and by_id[2].count(" ") >= 5
    assert by_id[4] == "plain ascii stays byte-identical."


def test_nfc_matches_duckdb_native(spark, duck):
    """Cross-ENGINE gate: our pandas-UDF NFC vs DuckDB's built-in
    nfc_normalize on composed/decomposed/compatibility-edge strings."""
    rows = [
        (0, "caf\u00e9 and cafe\u0301"),        # composed vs e+combining acute
        (1, "\u00c5 vs \u212b vs A\u030a"),     # ring / angstrom-sign / A+ring
        (2, "plain ascii"),
        (3, "s\u0323\u0307 vs s\u0307\u0323"),  # mark reorderings
        (4, "a\u0301\u0300 stacked marks"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = sorted(
        (r["id"], r["text"]) for r in normalize_nfc(df, "id", "t").collect()
    )
    duck.execute("CREATE OR REPLACE TABLE nfcsrc (id BIGINT, t VARCHAR)")
    duck.executemany("INSERT INTO nfcsrc VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in duck.execute(
            "SELECT id, nfc_normalize(t) AS text FROM nfcsrc"
        ).fetchall()
    )
    assert got == want
    # and NFC actually composed the decomposed rows
    by_id = dict(got)
    assert by_id[0] == "caf\u00e9 and caf\u00e9"
    assert by_id[1] == "\u00c5 vs \u00c5 vs \u00c5"


def test_nfc_makes_dedup_see_through_encoding(spark):
    """The operator's purpose: composed/decomposed twins hash equal
    AFTER normalization, not before."""
    df = spark.createDataFrame(
        [(1, "caf\u00e9 menu"), (2, "cafe\u0301 menu")], "id long, t string"
    )
    raw = df.select(F.countDistinct("t").alias("n")).collect()[0]["n"]
    norm = (
        normalize_nfc(df, "id", "t")
        .select(F.countDistinct("text").alias("n"))
        .collect()[0]["n"]
    )
    assert raw == 2 and norm == 1


def _plant_mojibake(s: str, enc: str = "cp1252") -> str:
    return s.encode("utf-8").decode(enc)


def test_fix_mojibake_vs_reference_and_no_false_positives(spark):
    clean = [
        "café élan naïve — “smart quotes” and … ellipsis",
        "Größe straße über",
        "日本語のテキスト",
        "Ångström Å",
        "plain ascii, untouched.",
        "lone Ã with no valid continuation",
    ]
    planted = [
        _plant_mojibake("café élan naïve"),
        # the closing smart quote's UTF-8 tail byte 0x9D is unmapped in
        # cp1252 — real-world mojibake of this string arrives via the
        # latin-1 fallback path, so plant it that way
        _plant_mojibake("“smart quotes” — dash … done", "latin-1"),
        _plant_mojibake("Größe straße über", "latin-1"),
    ]
    rows = [(i, t) for i, t in enumerate(clean + planted)]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: (r["text"], r["fixed"])
           for r in fix_mojibake(df, "id", "t").collect()}

    # independent reference: same contract, written separately
    def ref(t):
        ind = "ÃÂâ€™“”…Ëœ"
        if t.isascii() or not any(ch in t for ch in ind):
            return t, False
        before = sum(t.count(c) for c in ind)
        for enc in ("cp1252", "latin-1"):
            try:
                f = t.encode(enc).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if sum(f.count(c) for c in ind) < before:
                return f, True
        return t, False

    for i, t in rows:
        assert got[i] == ref(t), (i, t, got[i], ref(t))
    # every planted row repaired to its original
    assert got[len(clean) + 0] == ("café élan naïve", True)
    assert got[len(clean) + 1] == ("“smart quotes” — dash … done", True)
    assert got[len(clean) + 2] == ("Größe straße über", True)
    # clean multilingual rows untouched (indicator chars alone must not
    # trigger a rewrite unless the round-trip strictly improves)
    for i in range(len(clean)):
        assert got[i][0] == clean[i]


def test_unicode_chain_is_idempotent(spark):
    rows = [(i, t) for i, t in enumerate(
        ["caf\u00e9\u200b menu here", _plant_mojibake("\u00e9lan \u2026"),
         "plain", "\ufeffbom", "cafe\u0301 twice"])]
    df = spark.createDataFrame(rows, "id long, t string")

    def chain(d):
        a = clean_controls(d, "id", "t")
        b = fix_mojibake(a, "id", "text").select("id", F.col("text").alias("t"))
        return normalize_nfc(b, "id", "t").select("id", F.col("text").alias("t"))

    once = sorted((r["id"], r["t"]) for r in chain(df).collect())
    twice = sorted(
        (r["id"], r["t"])
        for r in chain(spark.createDataFrame(once, "id long, t string")).collect()
    )
    assert once == twice


def test_unicode_nfc_idempotent_property(spark):
    # property over generated combining sequences
    import itertools

    marks = ["\u0300", "\u0301", "\u0323", "\u0327"]
    rows = [
        (i, "a" + "".join(p))
        for i, p in enumerate(itertools.permutations(marks, 3))
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["text"] for r in normalize_nfc(df, "id", "t").collect()}
    for i, t in rows:
        assert got[i] == unicodedata.normalize("NFC", t)
        assert unicodedata.normalize("NFC", got[i]) == got[i]
