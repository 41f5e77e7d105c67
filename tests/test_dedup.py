"""Dedup operator tests: exact dedup keeps one copy, MinHash-LSH
finds planted near-duplicates, SimHash matches a pure-Python
reference implementation (the oracle for non-SQL-expressible ops)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from stream_processing_system_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm sunny window sill and dreams of chasing birds all day"
)


def _docs_with_neardups(spark):
    """4 unique docs + near-dup of doc 0 (one word changed) + exact
    dup of doc 1."""
    rows = [
        (0, BASE),
        (1, "completely different content about database engines and query plans"),
        (2, "a third document with its own words entirely unrelated to others"),
        (3, "yet another unique piece of text talking about distributed systems"),
        (10, BASE.replace("sunny", "rainy")),  # near-dup of 0
        (11, "completely different content about database engines and query plans"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_keeps_min_id(spark):
    df = _docs_with_neardups(spark)
    kept = {r["doc_id"] for r in dedup.dedup_exact(df, "doc_id", "text").collect()}
    assert 1 in kept and 11 not in kept  # exact dup dropped, keeper = min id
    assert kept == {0, 1, 2, 3, 10}  # near-dup is NOT exact → survives


def test_minhash_lsh_finds_planted_neardup(spark):
    df = _docs_with_neardups(spark)
    pairs = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(df, "doc_id", "text", num_hashes=8),
        "doc_id",
        num_hashes=8,
        bands=4,
    ).collect()
    cand = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 10) in cand  # planted near-dup must be a candidate
    assert (1, 11) in cand  # exact dup certainly agrees on all bands


def test_lsh_max_bucket_size_drops_hot_buckets(spark):
    # 5 identical docs share every band bucket (bucket size 5); two
    # distinct docs form their own buckets. Capping at 4 must drop
    # all pairs among the clones but keep exact banding otherwise.
    rows = [(i, BASE) for i in range(5)] + [
        (20, "totally different words about compilers and type systems"),
        (21, "totally different words about compilers and type systems"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = dedup.minhash_signatures(df, "doc_id", "text", num_hashes=8)
    capped = dedup.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=8, bands=4, max_bucket_size=4
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {(20, 21)}  # clone bucket (size 5) dropped entirely
    uncapped = dedup.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=8, bands=4
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in uncapped} > got


def test_dedup_minhash_lsh_end_to_end(spark):
    df = _docs_with_neardups(spark)
    kept = {
        r["doc_id"]
        for r in dedup.dedup_minhash_lsh(
            df, "doc_id", "text", num_hashes=8, bands=4, threshold=0.5
        ).collect()
    }
    assert 0 in kept and 10 not in kept  # near-dup dropped, min id kept
    assert 1 in kept and 11 not in kept  # exact dup dropped
    assert {2, 3} <= kept


def test_jaccard_pairs_exact_value(spark):
    # doc A: tokens {a b c d}, shingle-3: {a b c, b c d} ; doc B shares 1 of its 2
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x")], ["doc_id", "text"]
    )
    rows = dedup.jaccard_pairs(df, "doc_id", "text", threshold=0.0, n=3).collect()
    assert len(rows) == 1
    r = rows[0]
    # shingles: {abc, bcd} vs {abc, bcx} → common=1, union=3 → 1/3
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert abs(r["jaccard"] - round(1 / 3, 6)) < 1e-9


def _py_simhash(text: str) -> int:
    """Independent pure-Python SimHash using the same md5 scheme."""
    tokens = {t for t in text.split(" ") if t}
    votes = [0] * 64
    for tok in tokens:
        digest = hashlib.md5(f"sh|{tok}".encode()).hexdigest()
        hi, lo = int(digest[:8], 16), int(digest[8:16], 16)
        for i in range(64):
            word = hi if i < 32 else lo
            votes[i] += 1 if (word >> (i % 32)) & 1 else -1
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    # interpret as signed 64-bit (Spark long)
    return out - (1 << 64) if out >= (1 << 63) else out


def test_simhash_matches_python_reference(spark):
    df = _docs_with_neardups(spark)
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(df, "doc_id", "text").collect()}
    want = {r["doc_id"]: _py_simhash(r["text"]) for r in df.collect()}
    assert got == want


def test_simhash_neardup_blocking(spark):
    df = _docs_with_neardups(spark)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_neardup_pairs(df, "doc_id", "text", max_hamming=8).collect()
    }
    assert pairs.get((1, 11)) == 0  # exact dup: distance 0
    assert (0, 10) in pairs  # one-word change: small distance


def test_dedup_against_corpus_incremental(spark):
    corpus = spark.createDataFrame(
        [
            (0, BASE),
            (2, "corpus doc about streaming joins and watermark semantics today"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (100, BASE.replace("sunny", "rainy")),  # near-dup of corpus 0
            (101, "a genuinely new document discussing vector indexes and recall"),
            (102, BASE),  # exact dup of corpus 0
        ],
        ["doc_id", "text"],
    )
    kept = {
        r["doc_id"]
        for r in dedup.dedup_against_corpus(
            batch, corpus, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert kept == {101}  # both the near-dup and exact dup are dropped


def test_sorted_neighborhood_pairs_are_true_jaccard_pairs(spark, sf_dir):
    """Every sorted-neighborhood pair is a genuine Jaccard pair: the
    exact all-pairs jaccard_pairs at the same threshold must be a
    superset (sorted-neighborhood only narrows the candidate set —
    its verify step is the same exact Jaccard)."""
    from stream_processing_system_spark.operators.dedup import (
        dedup_sorted_neighborhood,
        jaccard_pairs,
    )
    from stream_processing_system_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sn = {
        (r.id_a, r.id_b)
        for r in dedup_sorted_neighborhood(
            docs, "doc_id", "text", window=3, threshold=0.1
        ).collect()
    }
    exact = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.1).collect()
    }
    assert sn <= exact


def test_canonical_keeps_best_not_min(spark):
    """dedup_canonical must keep the highest-QUALITY member of a
    near-dup cluster, not the smallest id: a planted pair of
    near-identical docs where the LATER id is longer/cleaner keeps
    the later id."""
    import pandas as pd
    from pyspark.sql import functions as F

    from stream_processing_system_spark.operators import dedup, text_analysis

    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [
        (1, base),                                  # short copy
        (2, base + " gracefully tonight"),
        (3, "a completely different document about spark query planning"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dedup.dedup_canonical(
        docs,
        text_analysis.quality_score(docs),
        "doc_id",
        "text",
        num_hashes=8,
        bands=4,
        threshold=0.5,
    )
    got = {r["cluster_id"]: (r["kept_id"], r["n_members"]) for r in out.collect()}
    # docs 1,2 cluster (label 1); doc 2 is longer -> higher quality -> kept
    assert got[1] == (2, 2)
    assert got[3] == (3, 1)


def test_substring_dedup_spans_reference(spark):
    """substring_dedup_spans vs an independent pure-Python
    implementation of the same contract (window md5s -> cross-doc
    dup -> islands merge) on docs with a known shared region, a
    unique doc, and a short doc below the window width."""
    import hashlib

    from stream_processing_system_spark.operators.dedup import (
        substring_dedup_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again padding" * 3
    texts = {
        1: "AAA-unique-prefix-one " + shared + " tail-one-unique-xxxxxx",
        2: "BBBBBB-other-prefix-two-longer " + shared + " other-tail-yyyy",
        3: "completely unique document text " * 8,
        4: "short",  # below width -> no windows
    }
    # stride=1: the shared region sits at offsets 23 and 32 — any
    # stride > 1 with mismatched alignment (mod stride) misses it
    # entirely, which is exactly why the operator defaults to 1
    width, stride = 64, 1

    def ref_spans():
        wins = {}  # h -> set of doc ids
        per_doc = {}  # doc -> [pos]
        for d, t in texts.items():
            if len(t) < width:
                continue
            for pos in range(1, len(t) - width + 2, stride):
                h = hashlib.md5(t[pos - 1 : pos - 1 + width].encode()).hexdigest()
                wins.setdefault(h, set()).add(d)
                per_doc.setdefault(d, []).append((pos, h))
        out = []
        for d, pws in sorted(per_doc.items()):
            dups = sorted(p for p, h in pws if len(wins[h]) >= 2)
            cur = None
            for p in dups:
                end = p + width - 1
                if cur and p <= cur[1] + 1:
                    cur[1] = max(cur[1], end)
                else:
                    if cur:
                        out.append((d, cur[0], cur[1], cur[1] - cur[0] + 1))
                    cur = [p, end]
            if cur:
                out.append((d, cur[0], cur[1], cur[1] - cur[0] + 1))
        return out

    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = [
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in substring_dedup_spans(df, width=width, stride=stride).collect()
    ]
    expect = ref_spans()
    assert got == expect
    assert any(d == 1 for d, *_ in got) and any(d == 2 for d, *_ in got)
    assert all(d != 3 and d != 4 for d, *_ in got)


def test_banding_recall_is_sweep_at_one_point(spark):
    """ADVICE r3: banding_recall_report must be exactly
    banding_sweep_report evaluated at a single bands value (the two
    used to be ~40 duplicated lines that could drift)."""
    df = _docs_with_neardups(spark)
    single = dedup.banding_recall_report(df, bands=4).collect()
    sweep = (
        dedup.banding_sweep_report(df, bands_list=(4,))
        .select("n_true", "n_candidates", "n_hits", "recall", "precision")
        .collect()
    )
    assert single == sweep
