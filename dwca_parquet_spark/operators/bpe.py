"""Distributed BPE vocabulary learning + subword encoding.

Byte-pair encoding (Sennrich et al. 2016 — the pretraining tokenizer
workhorse) learned from a corpus, Spark-first:

- The CORPUS-SCALE stage is the word-frequency count: one map-side-
  combinable groupBy over the tokenized corpus. Everything after runs on
  the word table — bounded by the distinct vocabulary, orders of
  magnitude below the corpus, and INDEPENDENT of corpus growth (100 TB of
  web text still yields a word table that a groupBy handles trivially).
  This is exactly how production tokenizer trainers work: count words
  distributed, learn merges over the counted table.
- Merge learning (``bpe_fit``) over the word table, two modes proved
  equal (test_bpe.py):

  * ``distributed=False`` (default): collect the word table (bounded by
    ``max_words`` most-frequent words — deterministic top-k with
    count-desc/word-asc ties) and run the exact sequential algorithm
    driver-side — a few MB of state, like nb_fit's bounded model
    collects.
  * ``distributed=True``: the faithful per-merge loop on executors —
    each round one combinable pair-count shuffle over the word table, a
    1-row argmax collect, and a pure-expression merge application (an
    ``aggregate`` fold with a skip flag — left-to-right non-overlapping,
    exactly the sequential semantics), ``localCheckpoint`` per round so
    the iterative lineage stays flat (the pagerank lesson). Rounds =
    n_merges; per-round cost is word-table-sized, not corpus-sized.

- ``bpe_encode``: Arrow-batched subword encoding with the learned merge
  ranks — greedy lowest-rank-first, the standard BPE apply. Python is
  the right tool here (per-word loop with data-dependent control flow),
  batched and MEMOIZED per Arrow batch: natural text repeats words
  heavily, so the loop runs per distinct word, not per token.

Determinism: tokenization is the shared ``tokens()`` (normalize +
whitespace split); merge ties break (count desc, pair lexicographic
asc); every mode and the independent test reference produce the
identical merge list.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from dwca_parquet_spark.operators.text import tokens

END = "</w>"  # end-of-word marker symbol (never collides: normalize
# strips nothing that could produce it inside a token — '<' '>' survive,
# but a TOKEN equal to '</w>' still differs from the marker SYMBOL
# because word chars are split to single chars before merging)


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wc) — the one corpus-scale shuffle (map-side combinable)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _sym_struct(out: Column, skip: Column) -> Column:
    return F.struct(out.alias("out"), skip.alias("skip"))


def _apply_merge_col(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of adjacent (a, b) with
    a+b — a pure expression fold with a one-step skip flag, identical to
    the sequential scan."""
    merged = a + b
    empty = F.array().cast("array<string>")

    def step(acc: Column, i: Column) -> Column:
        cur = F.element_at(syms, i)
        nxt = F.element_at(syms, i + 1)
        is_pair = (
            (i < F.size(syms)) & (cur == F.lit(a)) & (nxt == F.lit(b))
        )
        return (
            F.when(acc["skip"], _sym_struct(acc["out"], F.lit(False)))
            .when(
                is_pair,
                _sym_struct(
                    F.concat(acc["out"], F.array(F.lit(merged))), F.lit(True)
                ),
            )
            .otherwise(
                _sym_struct(F.concat(acc["out"], F.array(cur)), F.lit(False))
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.size(syms)),
        _sym_struct(empty, F.lit(False)),
        step,
        lambda acc: acc["out"],
    )


def _apply_merge_py(syms: list[str], a: str, b: str) -> list[str]:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _fit_sequential(
    wc: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """The exact sequential learner over a counted word list."""
    words = [([*w] + [END], c) for w, c in wc]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if best < min_count:
            break
        merges.append((a, b, best))
        words = [
            (_apply_merge_py(syms, a, b) if a in syms else syms, c)
            for syms, c in words
        ]
    return merges


def bpe_fit(
    df: DataFrame,
    text_col: str,
    n_merges: int = 1000,
    min_count: int = 2,
    max_words: int | None = None,
    distributed: bool = False,
) -> dict:
    """Learn the merge list: {"merges": [(a, b, count), ...]}.

    ``max_words`` caps the driver-side word table to the most frequent
    words (deterministic top-k) — the documented knob when the distinct
    vocabulary itself is huge; ``distributed=True`` never collects the
    word table at all.
    """
    wc_df = word_counts(df, text_col)
    if not distributed:
        q = wc_df.orderBy(F.desc("wc"), F.asc("word"))
        if max_words is not None:
            q = q.limit(max_words)
        wc = [(r["word"], r["wc"]) for r in q.collect()]
        return {"merges": _fit_sequential(wc, n_merges, min_count)}

    syms_df = wc_df.select(
        "wc",
        F.concat(
            # split keeps a trailing "" (the lookahead empty-matches at
            # end-of-word under Java's limit=-1) — drop empties
            F.filter(F.split(F.col("word"), "(?!^)"), lambda x: x != ""),
            F.array(F.lit(END)),
        ).alias("syms"),
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    prev = syms_df
    for _ in range(n_merges):
        pair_counts = (
            prev.filter(F.size("syms") >= 2)  # sequence(1,0) is DESCENDING,
            # not empty — fully-merged single-symbol words must not pair
            .select(
                "wc",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("a"),
                            F.element_at(F.col("syms"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wc").alias("n"))
        )
        top = (
            pair_counts.orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, n))
        nxt = prev.select(
            "wc", _apply_merge_col(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
        prev.unpersist()
        prev = nxt
    prev.unpersist()
    return {"merges": merges}


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = [*word] + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms = (
            syms[:best_i]
            + [syms[best_i] + syms[best_i + 1]]
            + syms[best_i + 2 :]
        )
    return syms


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, model: dict
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — greedy
    lowest-rank-first subword encoding (the standard BPE apply; applying
    merges in learned order gives the identical segmentation, which the
    test pins). Arrow-batched with a per-batch distinct-word memo."""
    ranks = {(a, b): i for i, (a, b, _n) in enumerate(model["merges"])}

    @pandas_udf(ArrayType(StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(t: str) -> list[str]:
            out: list[str] = []
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    toks = tokens(F.col(text_col))
    joined = F.array_join(toks, " ")  # already-normalized words
    return df.select(
        F.col(id_col),
        encode(joined).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
