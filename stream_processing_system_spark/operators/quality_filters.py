"""Corpus quality-filter operators for training-data pipelines:
repetition statistics (Gopher/MassiveText-style), PII scrubbing
(C4-style), corpus-level passage dedup, and token-budget sequence
packing. Capability beyond the reference (which has no quality
pipeline at all — SURVEY.md §2 ends at wordcount-class aggregation);
these are the ops a 100 TB pretraining corpus pass actually runs.

All built-in expressions except nothing — zero Python in any path:
repetition is one explode + one hash aggregate, scrubbing is three
regexp_replace calls inside one codegen'd map stage, passage dedup
is the exact-dedup shape applied to chunk hashes, and packing is a
textbook two-level distributed prefix sum (no global single-reducer
window)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_system_spark.functions.scalar import det_round

#: Scrub patterns — kept to syntax shared by Java regex and RE2 so
#: the DuckDB oracle applies the literal same patterns.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phones", r"\+?\d{3}[- ]\d{3,4}[- ]\d{4}", "<PHONE>"),
]


def _toks(text_col):
    return F.filter(F.split(text_col, " "), lambda t: t != "")


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (docs with ≥2
    tokens): top_2gram_frac (occurrences of the most common 2-gram /
    all 2-grams), dup_2gram_frac (fraction of 2-gram occurrences
    beyond their first — 1 - distinct/total), and n_adjacent_repeats
    (count of immediately repeated tokens). The standard cheap
    filters against boilerplate/spam before model-based scoring.

    Plan: adjacency is computed in the map stage from the token
    array; the 2-gram stats are one explode + one (doc, gram) hash
    aggregate + one per-doc rollup — a single shuffle pair at any
    corpus size, with partial aggregation doing the heavy lifting
    map-side."""
    toks = _toks(F.col(text_col))
    # greatest(...,0) + null-safe get(): sequence(0, -1) is DESCENDING
    # ([0,-1]) and ANSI indexing throws on _l[size] — these forms stay
    # total even on 0/1-token docs (which the filter then drops)
    grams = F.expr(
        "transform(sequence(0, greatest(size(_l)-2, 0)),"
        " i -> concat(get(_l, i), ' ', get(_l, i+1)))"
    )
    n_adj = F.expr(
        "size(filter(sequence(0, greatest(size(_l)-2, 0)),"
        " i -> get(_l, i) = get(_l, i+1)))"
    )
    base = (
        df.select(F.col(id_col), toks.alias("_l"))
        .where(F.size("_l") >= 2)
        .select(F.col(id_col), n_adj.cast("long").alias("_adj"), grams.alias("_g"))
    )
    # explode_OUTER, not explode: identical here (the size >= 2
    # filter above guarantees every _g has >= 1 non-null element), but
    # inner explode lets InferFiltersFromGenerate push a size(_g) > 0
    # predicate below the projection, inlining the whole
    # filter(split(text)) chain inside the gram lambda — an O(tokens²)
    # re-tokenization per row at the scan (measured 5.4 s -> 0.6 s at
    # sf0.1 for this stage alone; guide §7.2 "duplicated subtrees").
    tf = (
        base.select(
            F.col(id_col), F.col("_adj"), F.explode_outer("_g").alias("gram")
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"), F.first("_adj").alias("_adj"))
    )
    return tf.groupBy(id_col).agg(
        det_round(F.max("c") / F.sum("c")).alias("top_2gram_frac"),
        det_round((F.sum("c") - F.count(F.lit(1))) / F.sum("c")).alias(
            "dup_2gram_frac"
        ),
        F.first("_adj").alias("n_adjacent_repeats"),
    )


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """C4-style PII scrubbing: replace emails, IPv4 addresses, and
    phone-shaped numbers with typed placeholder tokens, and count
    each match (counted on the ORIGINAL text). One codegen'd map
    stage — three regexp_replace + three regexp_count expressions;
    at 100 TB this runs at scan speed with no shuffle at all."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select("*", scrubbed.alias(out_col), *counts)


def passage_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 16,
) -> DataFrame:
    """Corpus-level exact passage dedup (boilerplate removal): split
    every document into fixed `chunk_tokens`-token passages, hash
    each, keep only the globally FIRST occurrence of every distinct
    passage (min (doc_id, position)), and reassemble documents from
    their surviving passages in order. Documents whose every passage
    was seen earlier disappear — the repeated-header/footer scrubber
    of web-corpus pipelines, applied exactly.

    Plan shape: one map-side chunker (no shuffle), one window over
    the passage hash to pick winners (single shuffle on the hash —
    the same cost profile as exact dedup over 16-byte digests), one
    per-doc reassembly aggregate. Passage text never joins against
    itself; only hashes shuffle."""
    toks = _toks(F.col(text_col))
    chunks = F.expr(
        f"transform(sequence(0, int(floor((size(_l)-1)/{chunk_tokens}))),"
        f" i -> concat_ws(' ', slice(_l, i*{chunk_tokens}+1, {chunk_tokens})))"
    )
    exploded = (
        df.select(F.col(id_col), toks.alias("_l"))
        .where(F.size("_l") >= 1)
        .select(F.col(id_col), F.posexplode(chunks).alias("pos", "chunk"))
        .withColumn("_h", F.md5(F.col("chunk")))
    )
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    kept = (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_h")
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("text_clean")
    )
    return reassembled


def pack_sequences(
    df: DataFrame,
    budget_tokens: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 100_000,
) -> DataFrame:
    """Token-budget sequence packing: assign documents (in id order)
    to contiguous training shards of ~`budget_tokens` whitespace
    tokens — shard = floor(running_token_start / budget). The shard
    writer of a pretraining pipeline.

    The running total is a TWO-LEVEL distributed prefix sum, not a
    global single-partition window: documents are range-chunked by
    id (`chunk_size` ids per chunk), a per-chunk window computes
    local prefix sums in parallel, per-chunk totals (one row per
    chunk — thousands of scalars at 100 TB, not data) come to the
    driver once and go back as a broadcast offset table. Equivalent
    to `SUM(n) OVER (ORDER BY id)` exactly, with no serial stage."""
    spark = df.sparkSession
    n_tokens = F.size(_toks(F.col(text_col))).cast("long")
    base = df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.floor(F.col(id_col) / chunk_size).cast("long").alias("_chunk"),
    )
    w = (
        Window.partitionBy("_chunk")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("_local_end", F.sum("n_tokens").over(w))
    totals = (
        local.groupBy("_chunk")
        .agg(F.max("_local_end").alias("_total"))
        .orderBy("_chunk")
        .collect()
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["_chunk"], acc))
        acc += r["_total"]
    offset_df = spark.createDataFrame(offsets, "_chunk long, _offset long")
    return (
        local.join(F.broadcast(offset_df), "_chunk")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.floor(
                (F.col("_local_end") + F.col("_offset") - F.col("n_tokens"))
                / budget_tokens
            )
            .cast("long")
            .alias("shard"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token-window chunking — the context-window splitter
    of a retrieval/pretraining pipeline: each document becomes
    ceil(max(n - window, 0) / stride) + 1 chunks of up to `window`
    whitespace tokens, consecutive chunks overlapping by
    window - stride tokens (chunk i starts at token i*stride). Stable
    addressing: (doc_id, chunk_id) with chunk_id = i.

    Scale shape: a single codegen'd map stage — sequence + transform
    over the token array, one explode; no shuffle at all until
    whatever consumes the chunks. Emitting md5(chunk) alongside keeps
    downstream exact-dedup/decontamination joins on 16-byte digests
    instead of text.

    Output: (doc_id, chunk_id, n_tokens, chunk_md5), one row per
    chunk; empty documents produce no rows."""
    # let-bind the token array via a 1-element transform (round 9,
    # guide §1.2): slicing the raw `_toks(...)` expression inside the
    # per-chunk lambda would re-run split+filter once per CHUNK —
    # O(tokens²/stride) per doc; the lambda variable evaluates it once
    toks = _toks(F.col(text_col))

    def _chunks(t):
        n = F.size(t)
        n_chunks = F.when(n <= window, F.lit(1)).otherwise(
            F.ceil((n - window) / F.lit(stride).cast("double")).cast("int") + 1
        )
        starts = F.sequence(F.lit(0), n_chunks - 1)
        return F.transform(
            starts,
            lambda i: F.struct(
                i.alias("chunk_id"),
                F.slice(t, i * stride + 1, window).alias("_ctoks"),
            ),
        )

    chunks = F.element_at(F.transform(F.array(toks), _chunks), 1)
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").cast("long").alias("chunk_id"),
            F.size("_c._ctoks").cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", F.col("_c._ctoks"))).alias("chunk_md5"),
        )
        .where(F.col("n_tokens") > 0)
        .orderBy(id_col, "chunk_id")
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term-blocklist policy filter (the C4-style "bad words" pass):
    per doc, the number of DISTINCT blocklisted terms present and a
    keep/drop verdict (drop on any hit). Complements `decontaminate`
    (which guards eval integrity with n-grams); this enforces content
    policy with a word list.

    Map-only: the blocklist is a constant array literal, membership
    is `size(array_intersect(tokens, blocklist))` inside one
    codegen'd projection — no join, no shuffle, no Python; at 100 TB
    this runs at scan speed. Case-folded on the token side so the
    list needs only lowercase entries.
    """
    toks = F.array_distinct(
        F.transform(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != ""),
            F.lower,
        )
    )
    bl = F.array(*[F.lit(t.lower()) for t in blocklist])
    hits = F.size(F.array_intersect(toks, bl))
    return df.select(
        F.col(id_col),
        hits.cast("long").alias("n_blocked_terms"),
        (hits == 0).alias("keep"),
    ).orderBy(id_col)
