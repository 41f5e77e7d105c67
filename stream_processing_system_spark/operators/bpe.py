"""Byte-pair-encoding tokenizer training as distributed DataFrame ops.

Why this belongs in a 100 TB training-data engine: BPE/WordPiece vocab
induction is a corpus-scale counting problem — the per-merge cost is
dominated by adjacent-pair counting over the (distinct-word,
frequency) table, which is exactly a Spark aggregation. The merge
*selection* is an argmax over that tiny aggregate; one (pair, count)
row reaches the driver per round, the corpus never does.

Scale shape:
- `bpe_pair_counts` (one round, the 99% cost): tokenize → word-freq
  aggregate → 2-char-substring explode → weighted count. Two shuffles,
  both with map-side combine; the pair domain is ~|alphabet|² keys.
- `bpe_train` (`n_merges` rounds): each round re-counts pairs over the
  DISTINCT-WORD table (vocabulary-sized — millions of rows at 100 TB,
  not trillions: Heaps' law, and it only shrinks as merges apply) and
  rewrites symbol strings with one regexp_replace. The corpus-sized
  word-frequency aggregation happens ONCE, up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_system_spark.functions.scalar import tokenize


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) corpus word-frequency table — the input BPE
    actually trains on (corpus-size work happens once, here)."""
    return (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """Adjacent character-pair counts weighted by word frequency —
    the first BPE iteration's candidate table. Output
    (pair, cnt) top `top_n` by (cnt desc, pair asc).

    A pair at word position i is just `substring(word, i, 2)` — the
    explode is over word LENGTH (bounded), and it runs on the
    vocabulary table, not the corpus."""
    wf = word_frequencies(docs, text_col)
    pairs = (
        wf.where(F.length("word") >= 2)
        .select(
            "cnt",
            F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
            "word",
        )
        .select(F.col("word").substr(F.col("i"), F.lit(2)).alias("pair"), "cnt")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def _pair_pattern(pair_str: str) -> str:
    """Java regex matching `pair_str` as whole space-separated symbols
    (zero-width boundaries so consecutive occurrences both match —
    the classic BPE lookaround trick)."""
    return r"(?<!\S)\Q" + pair_str + r"\E(?!\S)"


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges; returns the merge table
    (merge_rank, left, right, pair_count) — deterministic via the
    (count desc, pair asc) tie-break.

    Each round: weighted pair count over the symbolized vocabulary →
    argmax to the driver (ONE row) → regexp_replace rewrite of the
    symbol strings. `localCheckpoint` after each rewrite keeps the
    plan from growing by one regex per round (the same lineage-cut
    the connected-components fixpoint uses, dedup.py).

    The SQL oracle unrolls the loop (round 3): 20 CTE rounds of
    pair-count/argmax/rewrite, the rewrite as a list_reduce fold
    equivalent to the lookaround regex; tests/test_bpe.py additionally
    checks the merge table against an independent pure-Python BPE
    implementation.
    """
    spark = docs.sparkSession
    vocab = word_frequencies(docs, text_col).select(
        F.concat_ws(" ", F.split(F.col("word"), "")).alias("sym"), "cnt"
    )
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "cnt", F.split(F.col("sym"), " ").alias("s")
            )
            .where(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("s") - 2),
                        lambda i: F.concat_ws(
                            " ", F.element_at("s", i + 1), F.element_at("s", i + 2)
                        ),
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
        )
        top = (
            pairs.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(1).collect()
        )
        if not top:
            break
        pair_str, n = top[0]["pair"], int(top[0]["n"])
        left, right = pair_str.split(" ", 1)
        merges.append((rank, left, right, n))
        # Matcher.quoteReplacement: the merged token is a literal,
        # never a $-group reference.
        replacement = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        vocab = vocab.select(
            F.regexp_replace(
                "sym", _pair_pattern(pair_str), replacement
            ).alias("sym"),
            "cnt",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode the corpus with a learned merge list: per document, the
    BPE token count after applying `merges` in rank order (the
    training-data bookkeeping number — tokens-per-doc under the real
    tokenizer, not the whitespace proxy).

    Merge work runs on the DISTINCT-WORD table (vocabulary-sized),
    as one projection chaining `len(merges)` regexp_replaces inside a
    single codegen stage; per-word subtoken counts then join back to
    the corpus on the word key and sum per document. The corpus is
    touched twice (tokenize, final sum), the merge chain never sees
    it."""
    words = (
        docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
    )
    sym = F.concat_ws(" ", F.split(F.col("word"), ""))
    for left, right in merges:
        replacement = (left + right).replace("\\", "\\\\").replace("$", "\\$")
        sym = F.regexp_replace(sym, _pair_pattern(left + " " + right), replacement)
    vocab = words.select("word").distinct().select(
        "word", F.size(F.split(sym, " ")).cast("long").alias("_n_sub")
    )
    return (
        words.join(vocab, "word")
        .groupBy(id_col)
        .agg(F.sum("_n_sub").alias("n_bpe_tokens"))
        .orderBy(id_col)
    )
