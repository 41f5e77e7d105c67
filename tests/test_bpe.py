"""BPE training: the distributed merge table must equal an
independent pure-Python BPE implementation (the classic
Sennrich-style dict algorithm) on the same corpus — this is the
correctness evidence for the iterative (non-SQL-oracle) path."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from stream_processing_system_spark.operators.bpe import (
    bpe_pair_counts,
    bpe_train,
)
from stream_processing_system_spark.sources.tables import load_table


def _python_bpe(texts: list[str], n_merges: int):
    """Reference BPE: word-freq dict, argmax pair by (count desc,
    pair asc), lookaround regex merge — independent of the Spark
    implementation."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            if w:
                vocab[" ".join(w)] += 1
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            s = sym.split(" ")
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        (left, right), n = best
        merges.append((rank, left, right, n))
        pat = re.compile(r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
        merged = left + right  # literal replacement (no \-template parsing)
        vocab = Counter(
            {pat.sub(lambda _: merged, sym): cnt for sym, cnt in vocab.items()}
        )
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _python_bpe(texts, 12)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=12).orderBy("merge_rank").collect()
    ]
    assert got == want


def test_bpe_train_handles_regex_metachars(spark):
    # symbols that are regex/replacement metachars must merge literally
    docs = spark.createDataFrame(
        [(1, "$a $a $a b\\c b\\c")], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got[0] == (0, "$", "a", 3)
    # ties ('b','\\') vs ('\\','c') resolve by pair-string order ('\' < 'b')
    assert got == _python_bpe(["$a $a $a b\\c b\\c"], 3)


def test_bpe_pair_counts_consecutive_overlap(spark):
    # "aaa" has pairs aa (pos1) + aa (pos2): weighted count 2 per word
    docs = spark.createDataFrame([(1, "aaa aaa ab")], "doc_id long, text string")
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(docs).collect()}
    assert got == {"aa": 4, "ab": 1}


def test_bpe_apply_matches_python_reference(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "mat mat mat"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = _python_bpe(texts, 6)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in __import__(
            "stream_processing_system_spark.operators.bpe", fromlist=["bpe_apply"]
        ).bpe_apply(docs, [(m[1], m[2]) for m in merges]).collect()
    }

    # independent apply: fold the merges over each word
    import re

    def count_tokens(text):
        n = 0
        for w in text.split():
            if not w:
                continue
            sym = " ".join(w)
            for _, left, right, _ in merges:
                pat = re.compile(
                    r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)"
                )
                merged = left + right
                sym = pat.sub(lambda _: merged, sym)
            n += len(sym.split(" "))
        return n

    want = {i: count_tokens(t) for i, t in enumerate(texts)}
    assert got == want
    # merges actually compress: fewer BPE tokens than characters
    assert all(got[i] < len(t.replace(" ", "")) for i, t in enumerate(texts))
