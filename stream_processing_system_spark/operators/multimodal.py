"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payloads with typed metadata; all
per-payload compute is Arrow-batched Python (`mapInPandas`) because
codecs are Python/native libraries. The Spark-side contract — schema,
batch shape, partition sizing — is real and tested; the codec calls
themselves are STUBBED (this container ships no image/audio libs):
`decode_media(..., decoder=None)` uses a deterministic fake, and
`PILLOW_DECODER_DOC` documents the real drop-in.

Scale notes:
- payloads never pass through Python except inside the mapInPandas
  stage that needs them; metadata-only queries prune the binary
  column at the parquet scan (columnar layout keeps blobs unread).
- `spark.sql.files.maxPartitionBytes` governs blob-scan task sizing;
  with large media rows, lower it (or repartition on a key) so a
  task's Arrow batch fits executor memory.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, checksum long, "
    "width int, height int, duration_ms int"
)

PILLOW_DECODER_DOC = """Real decoder drop-in (requires pillow):
    from PIL import Image; import io
    def pillow_decode(media_id, media_type, payload):
        img = Image.open(io.BytesIO(payload))
        return dict(width=img.width, height=img.height, duration_ms=0)
Pass as decode_media(df, decoder=pillow_decode)."""


def fake_media_from_documents(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: payload
    = utf-8 bytes of the text. Lets every pipeline stage run and be
    asserted on without codecs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _fake_decode(media_id: int, media_type: str, payload: bytes) -> dict:
    """Deterministic stand-in for a codec: derives plausible
    dimensions from the payload hash. Replace with a real decoder
    (PILLOW_DECODER_DOC) in production."""
    h = int(hashlib.md5(payload).hexdigest()[:8], 16)
    if media_type == "image":
        return dict(width=64 + h % 1024, height=64 + (h >> 4) % 1024, duration_ms=0)
    if media_type == "audio":
        return dict(width=0, height=0, duration_ms=1000 + h % 600_000)
    return dict(width=320 + h % 1280, height=240 + (h >> 4) % 720,
                duration_ms=1000 + h % 7_200_000)


def decode_media(
    df: DataFrame,
    decoder: Callable[[int, str, bytes], dict] | None = None,
) -> DataFrame:
    """Decode/inspect payloads via mapInPandas (Arrow batches of
    binary). Output adds n_bytes, crc32 checksum, and decoder fields.
    `decoder=None` → deterministic fake (documented stub)."""
    dec = decoder or _fake_decode

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                dec(mid, mtype, bytes(payload))
                for mid, mtype, payload in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "checksum": [zlib.crc32(bytes(p)) for p in pdf["payload"]],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "duration_ms": [m["duration_ms"] for m in meta],
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize stage: STUB — real implementation needs pillow
    (see PILLOW_DECODER_DOC). The Spark plumbing (filter to images,
    mapInPandas over payloads, binary-out schema) is the tested part;
    the fake 'resize' truncates payload bytes deterministically."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [bytes(p)[: max_side * max_side // 64] for p in pdf["payload"]],
                }
            )

    return df.where(F.col("media_type") == "image").mapInPandas(
        _resize, schema="media_id long, payload binary"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: 1-in/N-out (one row per sampled frame).
    STUB decode; real implementation swaps in pyav/ffmpeg. Frame
    count derives from the fake duration, capped to keep output
    bounded."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": []}
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                d = _fake_decode(mid, mtype, bytes(payload))
                n = min(d["duration_ms"] // every_ms, 16)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
            yield pd.DataFrame(out)

    return df.where(F.col("media_type") == "video").mapInPandas(
        _sample, schema="media_id long, frame_idx int, ts_ms int"
    )


def media_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction stub: deterministic pseudo-embedding from
    the payload hash (real path: a model via pandas_udf on GPU
    executors; identical plan shape)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [((digest[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": feats})

    return df.mapInPandas(_feat, schema="media_id long, embedding array<double>")


#: aHash grid: 64 pseudo-pixels -> 64-bit signature.
AHASH_CELLS = 64


def ahash_signatures(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) signatures over media
    payloads: 'decode' each payload to a 64-cell grayscale grid, then
    set bit k iff cell k is brighter than the grid mean — the classic
    cheap perceptual fingerprint whose Hamming distance survives
    small content edits (the property cryptographic digests by
    design lack; cf. `dedup_exact`'s md5).

    The decode here is the repo's documented deterministic STUB
    (pixels = per-chunk byte sums of the payload, locality-preserving
    so near-identical payloads give near-equal grids); a real image
    pipeline swaps the chunk sums for an 8x8 downscaled luma plane
    (Pillow drop-in, see PILLOW_DECODER_DOC) — every Spark-side
    piece (Arrow batching, signature packing, the blocked join
    downstream) is unchanged.

    Output: (media_id, sig) with sig a SIGNED 64-bit long (bit 63 is
    the sign bit, matching the SimHash convention so the same SQL
    oracle machinery applies)."""

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for payload in pdf["payload"]:
                data = bytes(payload)
                n = len(data)
                cells = [0] * AHASH_CELLS
                for i, b in enumerate(data):
                    cells[(i * AHASH_CELLS) // n] += b
                cells = [c % 256 for c in cells]
                mean = sum(cells) / float(AHASH_CELLS)
                sig = 0
                for k, c in enumerate(cells):
                    if c > mean:
                        sig += 1 << k
                if sig >= 1 << 63:
                    sig -= 1 << 64  # two's-complement into a signed long
                sigs.append(sig)
            yield pd.DataFrame({"media_id": pdf["media_id"], "sig": sigs})

    return df.select("media_id", "payload").mapInPandas(
        _sig, schema="media_id long, sig long"
    )


def ahash_neardup_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup media pairs by aHash Hamming distance, found with the
    SimHash quarter-blocking construction (operators/dedup.py): four
    disjoint 16-bit blocks, equi-join per block, exact bit_count
    re-check. Lossless for max_hamming <= 3 by pigeonhole — at most
    3 differing bits cannot touch all 4 blocks. Never all-pairs."""
    if max_hamming > 3:
        raise ValueError("quarter-blocking is only lossless for max_hamming <= 3")
    blocks = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftrightunsigned(F.col("sig"), q * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("block"),
            )
            for q in range(4)
        ]
    )
    exploded = sigs.select(
        F.col("media_id"), F.col("sig"), F.explode(blocks).alias("_b")
    ).select(
        "media_id", "sig", F.col("_b.q").alias("q"), F.col("_b.block").alias("block")
    )
    a = exploded.select(
        F.col("q"),
        F.col("block"),
        F.col("media_id").alias("id_a"),
        F.col("sig").alias("_sa"),
    )
    b = exploded.select(
        F.col("q"),
        F.col("block"),
        F.col("media_id").alias("id_b"),
        F.col("sig").alias("_sb"),
    )
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        a.join(b, ["q", "block"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


#: frame-fingerprint modulus (prime, fits comfortably in int32)
FRAME_FP_MOD = 1_000_003


def frame_fingerprints(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Per-frame content fingerprints for video payloads: sample the
    same frames as `sample_frames` (1-in/every_ms, capped 16) and
    fingerprint each frame's byte slice — fp = (Σ bytes · 31 +
    n_bytes) mod 1000003. Frame membership of byte j is
    (j·n_frames) // n_bytes, the exact expression the SQL oracle
    uses (slice arithmetic must match to the byte or the fingerprints
    diverge). STUB decode as everywhere in this module: a real
    pipeline fingerprints decoded luma planes; the Spark shape
    (Arrow batch in, long-format sigs out) is identical."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "fp": []}
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                data = bytes(payload)
                d = _fake_decode(mid, mtype, data)
                n = min(d["duration_ms"] // every_ms, 16)
                if n <= 0 or not data:
                    continue
                ln = len(data)
                sums = [0] * n
                counts = [0] * n
                for j, b in enumerate(data):
                    k = (j * n) // ln
                    sums[k] += b
                    counts[k] += 1
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["fp"].append((sums[i] * 31 + counts[i]) % FRAME_FP_MOD)
            yield pd.DataFrame(out)

    return df.where(F.col("media_type") == "video").mapInPandas(
        _fp, schema="media_id long, frame_idx int, fp long"
    )


def video_frame_neardup(sigs: DataFrame, min_shared: int = 3) -> DataFrame:
    """Video near-dup pairs by shared frame fingerprints: distinct
    (video, fp) sets equi-joined on fp (blocked — never all-pairs),
    pairs counted, kept at >= min_shared common frames. The frame-sig
    containment join every video dedup pipeline runs; fingerprint
    collisions are filtered by the threshold."""
    s = sigs.select("media_id", "fp").distinct()
    a = s.select(F.col("media_id").alias("id_a"), "fp")
    b = s.select(F.col("media_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_frames"))
        .where(F.col("shared_frames") >= min_shared)
    )


def audio_energy(
    df: DataFrame, window: int = 32, silence_threshold: int = 1000
) -> DataFrame:
    """Windowed energy profile per AUDIO item — the silence-trim /
    loudness-normalization precursor every speech pipeline runs:
    fixed `window`-sample frames, per-frame energy Σ(s²) over
    centered samples, rolled up to (n_windows, total/peak energy,
    silent-frame count). The 'waveform' is the repo's documented
    deterministic stub (samples = payload bytes − 128); a real
    pipeline swaps in soundfile/librosa decode (PILLOW_DECODER_DOC's
    audio analogue) — the Arrow batching, framing arithmetic, and
    rollup are unchanged. Trailing partial frames are dropped
    (len div window full frames), keeping every number an exact
    integer in both engines."""

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nw, tot, peak, silent = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_full = len(data) // window
                if n_full == 0:
                    continue
                energies = [
                    sum(
                        (b - 128) * (b - 128)
                        for b in data[wi * window : (wi + 1) * window]
                    )
                    for wi in range(n_full)
                ]
                ids.append(mid)
                nw.append(n_full)
                tot.append(sum(energies))
                peak.append(max(energies))
                silent.append(sum(1 for e in energies if e < silence_threshold))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_windows": pd.Series(nw, dtype="int64"),
                    "total_energy": pd.Series(tot, dtype="int64"),
                    "peak_energy": pd.Series(peak, dtype="int64"),
                    "n_silent": pd.Series(silent, dtype="int64"),
                }
            )

    audio = df.where(F.col("media_type") == "audio")
    out = audio.select("media_id", "payload").mapInPandas(
        _energy,
        schema="media_id long, n_windows long, total_energy long, "
        "peak_energy long, n_silent long",
    )
    from stream_processing_system_spark.functions.scalar import det_round

    return out.select(
        "media_id",
        "n_windows",
        det_round(
            F.col("total_energy").cast("double") / F.col("n_windows").cast("double")
        ).alias("mean_energy"),
        "peak_energy",
        det_round(
            F.col("n_silent").cast("double") / F.col("n_windows").cast("double")
        ).alias("silence_ratio"),
    ).orderBy("media_id")


def audio_silence_runs(
    df: DataFrame, window: int = 32, silence_threshold: int = 1000
) -> DataFrame:
    """Silence-RUN structure per audio item: number of maximal silent
    frame runs, the longest run, and total silent frames — what a
    speech pipeline needs to TRIM (leading/trailing hush) and SPLIT
    (long internal pauses) rather than just count, extending
    `audio_energy`'s per-frame flags with the gaps-and-islands
    grouping.

    Only the decode (stub waveform: payload bytes − 128) runs in the
    Arrow batch; frames come back as ROWS and the island detection
    is pure relational — island key = frame index − rank among the
    item's silent frames, one window + one groupBy, the same
    construction both engines execute (the oracle mirrors it over
    the documents-derived payload)."""
    from pyspark.sql import Window

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, es = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n_full = len(data) // window
                for wi in range(n_full):
                    ids.append(mid)
                    ws.append(wi)
                    es.append(
                        sum(
                            (b - 128) * (b - 128)
                            for b in data[wi * window : (wi + 1) * window]
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "w": pd.Series(ws, dtype="int64"),
                    "e": pd.Series(es, dtype="int64"),
                }
            )

    audio = df.where(F.col("media_type") == "audio")
    frames = audio.select("media_id", "payload").mapInPandas(
        _frames, schema="media_id long, w long, e long"
    )
    silent = frames.where(F.col("e") < silence_threshold)
    w_rank = Window.partitionBy("media_id").orderBy("w")
    islands = silent.select(
        "media_id",
        "w",
        (F.col("w") - F.row_number().over(w_rank)).alias("_isl"),
    )
    runs = islands.groupBy("media_id", "_isl").agg(
        F.count(F.lit(1)).alias("_len")
    )
    per_media = runs.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.max("_len").alias("longest_run"),
        F.sum("_len").alias("n_silent"),
    )
    totals = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_windows")
    )
    return (
        totals.join(per_media, "media_id", "left")
        .select(
            "media_id",
            F.col("n_windows").cast("long").alias("n_windows"),
            F.coalesce(F.col("n_runs"), F.lit(0)).cast("long").alias("n_runs"),
            F.coalesce(F.col("longest_run"), F.lit(0))
            .cast("long")
            .alias("longest_run"),
            F.coalesce(F.col("n_silent"), F.lit(0))
            .cast("long")
            .alias("n_silent"),
        )
        .orderBy("media_id")
    )


#: Integer DCT-II basis, K[u][x] = floor(cos(pi*(2x+1)*u/16)*1e6+0.5):
#: module-level constants shared (as literals) with the SQL oracle, so
#: the whole pHash pipeline is exact integer arithmetic on both engines.
import math as _math

DCT_K = [
    [
        _math.floor(_math.cos(_math.pi * (2 * x + 1) * u / 16.0) * 1e6 + 0.5)
        for x in range(8)
    ]
    for u in range(8)
]


def phash_signatures(df: DataFrame) -> DataFrame:
    """Perceptual DCT hash (pHash) signatures: the stub-decoded 8x8
    grayscale grid (same per-chunk byte sums as `ahash_signatures`)
    is transformed by an INTEGER 2-D DCT-II (basis values pre-floored
    to the 1e-6 grid, see DCT_K) and the 15 low-frequency
    coefficients (u,v < 4, excluding DC) are thresholded at their
    median - the classic pHash construction, which survives
    brightness shifts that flip aHash bits (DC carries the shift;
    the AC bits compare against their own median). Everything after
    the byte sums is exact int64, so the Arrow-batched stage
    value-hashes against the SQL mirror. Output: (media_id, phash
    15-bit long, dc, dom_u, dom_v) where (dom_u, dom_v) is the
    argmax-|coef| AC frequency (smallest (u,v) on ties)."""

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "phash": [], "dc": [], "dom_u": [], "dom_v": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n = len(data)
                cells = [0] * AHASH_CELLS
                for i, b in enumerate(data):
                    cells[(i * AHASH_CELLS) // n] += b
                cells = [c % 256 for c in cells]
                # p[x][y] with k = x*8 + y
                coefs = {}
                for u in range(4):
                    for v in range(4):
                        c = 0
                        for k, pix in enumerate(cells):
                            x, y = k // 8, k % 8
                            c += pix * DCT_K[u][x] * DCT_K[v][y]
                        coefs[(u, v)] = c
                ac = [coefs[(u, v)] for u in range(4) for v in range(4)
                      if (u, v) != (0, 0)]
                med = sorted(ac)[7]
                phash = 0
                for i2, val in enumerate(ac):
                    if val > med:
                        phash += 1 << i2
                dom = max(
                    ((u, v) for u in range(4) for v in range(4)
                     if (u, v) != (0, 0)),
                    key=lambda uv: (abs(coefs[uv]), (-uv[0], -uv[1])),
                )
                out["media_id"].append(media_id)
                out["phash"].append(phash)
                out["dc"].append(coefs[(0, 0)])
                out["dom_u"].append(dom[0])
                out["dom_v"].append(dom[1])
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        _sig, schema="media_id long, phash long, dc long, dom_u int, dom_v int"
    )
