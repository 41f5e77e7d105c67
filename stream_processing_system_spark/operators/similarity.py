"""Similarity search over embedding columns (array<float>).

North-star extension (SURVEY.md §7.2 step 6); the reference has no
vector operations. Two paths:

- `cosine_topk`: brute-force scan — the correctness baseline. The
  whole computation is `zip_with`+`aggregate` built-ins inside one
  codegen'd map stage plus a TakeOrderedAndProject top-k: at 100 TB
  this is a single pass with no shuffle (the top-k merge moves k rows
  per partition to the driver).
- `lsh_topk`: random-hyperplane LSH — the sub-linear scale path.
  Vectors are bucketed by sign-bit signature; the exact cosine runs
  only inside the query's bucket (probing multi-bucket neighborhoods
  for recall). Hyperplanes are seeded-deterministic so results are
  reproducible run to run.

`ivf_topk` gives the IVF (inverted-file) variant: k-means-style
coarse centroids (sampled deterministically), each vector assigned to
its nearest centroid at index time; queries probe the nearest
`n_probe` centroids. Same recall/speed trade as FAISS-IVF, expressed
relationally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_processing_system_spark.functions import (
    cosine_similarity,
    dot_product,
    vector_norm,
)
from stream_processing_system_spark.functions.scalar import det_round


def attach_query_vector(
    df: DataFrame, query_df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Cross-join a single-row query-vector frame (broadcast — adds
    one column to every row, no shuffle, no driver collect)."""
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    return df.crossJoin(F.broadcast(q))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a 1-row query DataFrame.
    Output (id, sim) with sim rounded to 6dp and ties broken by id."""
    with_q = attach_query_vector(df, query_df, vec_col)
    sim = F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6)
    return (
        with_q.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, not
    data — broadcast as literals into the plan)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature: bit_j = 1 if <v, plane_j> >= 0, packed into
    a bigint. Built-in expressions only (aggregate over zip_with)."""
    bits = []
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(2**j).cast("long")).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_signature_udf(planes: list[list[float]]):
    """Vectorized twin of `lsh_signature`: one Arrow crossing and a
    single (batch × dim) @ (dim × planes) matmul per batch, vs
    n_planes interpreted HOF dot products per row. Sign agreement
    with the expression form (and the SQL oracle) would only break
    for |dot| < ~1e-13 — not observed at any SF; the differential
    gate guards it."""
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64).T  # dim × n_planes
    powers = (2 ** np.arange(mat.shape[1], dtype=np.int64)).astype(np.int64)

    @pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        bits = (v @ mat) >= 0
        return pd.Series(bits @ powers)

    return _sig


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: restrict the exact cosine scan to vectors whose LSH
    bucket is within hamming distance 1 of the query's bucket, then
    brute-force inside that slice. Recall is tunable via n_planes
    (fewer planes → bigger buckets → higher recall, more compute)."""
    planes = _hyperplanes(dim, n_planes, seed)
    sig = lsh_signature(F.col(vec_col), planes)
    tagged = df.withColumn("_sig", sig)
    q = query_df.select(
        F.col(vec_col).alias("_qvec"), lsh_signature(F.col(vec_col), planes).alias("_qsig")
    )
    joined = tagged.crossJoin(F.broadcast(q))
    near_bucket = F.bit_count(F.col("_sig").bitwiseXOR(F.col("_qsig"))) <= 1
    sim = F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6)
    return (
        joined.where(near_bucket)
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def projection_matrix(out_dim: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Seeded Johnson–Lindenstrauss projection rows, scaled by
    1/sqrt(out_dim) (driver-side constants, inlined as literals —
    same contract as `_hyperplanes`)."""
    rng = np.random.RandomState(seed)
    return (rng.standard_normal((out_dim, dim)) / np.sqrt(out_dim)).tolist()


def project_expr(vec_col, mat: list[list[float]]):
    """Random-projection expression: out_dim codegen'd dot products,
    each coordinate det-rounded to 6dp so the projected vectors are
    bit-identical across engines AND across partition orderings."""
    coords = []
    for row in mat:
        lit = F.array(*[F.lit(float(x)) for x in row])
        coords.append(det_round(dot_product(vec_col, lit)))
    return F.array(*coords)


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    out_col: str = "rp",
) -> DataFrame:
    """JL random projection dim→out_dim: the standard pre-ANN
    shrink (store/scan 4× fewer floats; JL preserves pairwise
    distances within ~1/sqrt(out_dim)). One codegen'd map stage, no
    shuffle, no Python — at 100 TB this runs at scan speed."""
    mat = projection_matrix(out_dim, dim, seed)
    return df.select(F.col(id_col), project_expr(F.col(vec_col), mat).alias(out_col))


def rp_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Brute-force cosine top-k in the PROJECTED space: the
    reduced-dimension variant of cosine_topk — 4× less arithmetic
    and I/O per candidate at the cost of JL distortion (recall vs
    full-dim measured in tests). Same single-map-pass +
    TakeOrderedAndProject shape."""
    mat = projection_matrix(out_dim, dim, seed)
    tagged = df.select(F.col(id_col), project_expr(F.col(vec_col), mat).alias("_rp"))
    q = query_df.select(project_expr(F.col(vec_col), mat).alias("_qrp"))
    sim = F.round(cosine_similarity(F.col("_rp"), F.col("_qrp")), 6)
    return (
        tagged.crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def train_ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
    sample_mod: int = 1,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for the IVF coarse codebook.

    Init = the embeddings of the `n_centroids` smallest ids (a
    reproducible seed choice); then `iters` rounds of assign (argmax
    cosine, ties to the lower centroid id) + per-dimension mean.
    Each new centroid coordinate is quantized to the 1e-6 grid with
    the det_round formula (`floor(x*1e6+0.5)/1e6`), which makes the
    whole training reproducible ACROSS ENGINES: the DuckDB oracle
    re-derives the identical codebook in SQL (unrolled CTEs, see
    `__spark_entry__._ivf_trained_cte`), so trained-IVF results stay
    value-hash checkable. Cells that lose every member keep their
    previous centroid. `iters=0` degrades to the seeded-sample
    fallback (the round-1 behavior).

    Scale shape: each round is one broadcast crossJoin assignment +
    one posexplode per-dim mean — two shuffles of (K·dim) cells, and
    only K×dim rounded floats (constants, not data) reach the driver
    per round. At 100 TB train on a deterministic hash-mod sample
    (`sample_mod=m` keeps id % m == 0): k-means needs a sample, not
    the corpus; the full corpus is assigned once, at index build."""
    import math

    spark = df.sparkSession
    train = df.where(F.col(id_col) % sample_mod == 0) if sample_mod > 1 else df
    rows = (
        train.orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    cents = [[float(x) for x in r[0]] for r in rows]
    dim = len(cents[0])
    for _ in range(iters):
        # round-10: the per-round argmax assignment runs as the
        # bit-exact Arrow fold (`assign_centroids`) — the K× crossJoin
        # fan-out + max_by exchange per round are gone; the mean
        # aggregate below is UNCHANGED (same posexplode + avg plan)
        assigned = assign_centroids(train, cents, id_col, vec_col).select(
            F.col(vec_col), F.col("_centroid").alias("_c")
        )
        means = (
            assigned.select("_c", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("_c", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("mv"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["_c"], {})[r["pos"]] = (
                math.floor(r["mv"] * 1e6 + 0.5) / 1e6
            )
        cents = [
            [by_cid[i][p] for p in range(dim)] if i in by_cid else cents[i]
            for i in range(len(cents))
        ]
    return cents


def _centroid_frame(spark, cents: list[list[float]]) -> DataFrame:
    """(cid 0..K-1, cvec) frame from a trained codebook — K×dim
    constants, always broadcast."""
    return spark.createDataFrame(
        list(enumerate(cents)), "_cid int, _cvec array<double>"
    )


def _fold_cosine_sims(x, cents: list[list[float]]):
    """Row-vectorized replica of `cosine_similarity`'s EXACT IEEE
    arithmetic: the fold runs sequentially over dimensions (one
    multiply, one add per step — precisely the JVM `aggregate` order,
    no FMA, no pairwise regrouping) and is vectorized over rows, so
    every produced double is bit-identical to the expression lane it
    replaces. Returns an (n_rows, K) sims matrix. Zero-norm rows are
    out of contract (the expression lane degenerates there too)."""
    import math

    import numpy as np

    n, d = x.shape
    na = np.zeros(n)
    for j in range(d):
        na = na + x[:, j] * x[:, j]
    na = np.sqrt(na)
    sims = np.empty((n, len(cents)))
    for ci, c in enumerate(cents):
        nc = 0.0
        for v in c:
            nc = nc + v * v
        nc = math.sqrt(nc)
        acc = np.zeros(n)
        for j in range(d):
            acc = acc + x[:, j] * c[j]
        sims[:, ci] = acc / (na * nc)
    return sims


def assign_centroids(
    df: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_sim: bool = False,
) -> DataFrame:
    """Argmax-cosine centroid assignment as ONE Arrow pass:
    (id, vec, _centroid[, _csim]) against the K×dim codebook shipped
    in the task closure — replaces the
    `crossJoin(broadcast(K-centroid frame))` K× row fan-out + max_by
    hash aggregate, removing the assignment exchange outright (guide
    §2.4) and the K·dim interpreted higher-order cosine per row
    (guide §4.2). The round-9 map-side rewrites were rejected because
    Catalyst literal trees blow up analysis/codegen and broadcast
    HOF columns stay interpreted; this lane has neither cost — the
    codebook is plain numpy data and the kernel is BLAS-shaped.

    Bit-exact: cosines come from `_fold_cosine_sims` (the IEEE fold
    replica), the argmax ties break to the LOWER cid (np.argmax picks
    the first maximum — exactly max_by on (sim, −cid)), and any
    emitted `_csim` is the identical double."""
    import numpy as np
    import pandas as pd

    carr = [[float(v) for v in c] for c in cents]
    schema_fields = dict(df.dtypes)
    schema = (
        f"{id_col} {schema_fields[id_col]}, "
        f"{vec_col} {schema_fields[vec_col]}, _centroid int"
    )
    if with_sim:
        schema += ", _csim double"

    def assign(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            sims = _fold_cosine_sims(x, carr)
            cid = sims.argmax(axis=1)
            cols = {
                id_col: pdf[id_col],
                vec_col: pdf[vec_col],
                "_centroid": cid.astype(np.int32),
            }
            if with_sim:
                cols["_csim"] = sims[np.arange(len(cid)), cid]
            yield pd.DataFrame(cols)

    return df.select(id_col, vec_col).mapInPandas(assign, schema=schema)


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    sample_mod: int = 1,
) -> DataFrame:
    """IVF ANN with a TRAINED coarse codebook (`train_ivf_centroids`
    — deterministic Lloyd's, cross-engine reproducible), assign every
    vector to its best centroid (argmax cosine — one broadcast of a
    tiny centroid array), probe the query's best `n_probe` centroids.
    All relational: the index is just an extra int column; at scale
    you'd persist it partitioned by centroid for partition pruning
    (`build_ivf_index`)."""
    cents = train_ivf_centroids(
        df, id_col, vec_col, n_centroids, iters=iters, sample_mod=sample_mod
    )
    centroids = _centroid_frame(df.sparkSession, cents)
    # round-10: argmax assignment as the bit-exact Arrow fold — no
    # K× fan-out, no assignment exchange (guide §2.4/§4.2)
    assigned = assign_centroids(df, cents, id_col, vec_col)

    qsims = query_df.crossJoin(F.broadcast(centroids)).select(
        F.col("_cid"),
        cosine_similarity(F.col(vec_col), F.col("_cvec")).alias("_csim"),
    )
    probe = qsims.orderBy(F.col("_csim").desc(), F.col("_cid").asc()).limit(n_probe)
    probe_ids = F.broadcast(probe.select(F.col("_cid").alias("_centroid")))

    candidates = assigned.join(probe_ids, "_centroid")
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    sim = F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6)
    return (
        candidates.crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-shaped semantic dedup (cluster-then-prune, per the
    public SemDeDup preprint): cluster every embedding with the
    trained coarse codebook (the same deterministic Lloyd's as IVF),
    then WITHIN each cluster drop any item whose cosine similarity
    to a LOWER-id cluster-mate reaches `threshold` — keep-first, the
    same keeper rule as the text dedup family.

    Scale shape: candidate pairs are generated per cluster —
    O(Σ|cell|²), not O(n²) — and cells shard across executors on the
    cluster-id join key; the codebook broadcast is K·dim constants.
    With balanced trained cells (asserted in tests) a 1B-vector
    corpus at K=10k centroids means ~100k-vector cells, each a
    self-contained task. Complements `embedding_neardup_pairs` (LSH
    blocking): clustering catches near-dups that straddle hyperplane
    boundaries; LSH catches items near cell borders.

    Output: kept rows (id, centroid), ordered by id — the centroid
    column means an oracle hash-match verifies the whole clustering,
    not just the surviving ids.

    Round-10 (guide §4.2, §2.4): the within-cluster prune runs as a
    per-cluster gram matrix inside applyInPandas (the
    `knn_join_lsh_gemm` lane) instead of the O(Σ|cell|²)-row
    self-join + rounded-HOF-cosine + dropDuplicates + left_anti
    chain: each cell's vectors cross the Arrow boundary ONCE, BLAS
    computes the cell² similarity block (column-chunked so peak task
    memory is ~|cell|·chunk doubles, never |cell|²), and the keep
    mask ("drop j iff some i<j has round(sim,6) ≥ threshold" — the
    same keep-first rule) is a vectorized any() over the strict
    upper triangle. The assignment subtree is referenced once, so
    the two extra exchanges (pair dedup + left_anti) disappear;
    rounding emulates Spark/DuckDB ROUND half-away-from-zero exactly
    as in `knn_join_lsh_gemm`, so the oracle hash-match is
    unchanged."""
    import numpy as np
    import pandas as pd

    cents = train_ivf_centroids(df, id_col, vec_col, n_centroids, iters=iters)
    # round-10: argmax assignment as the bit-exact Arrow fold — no
    # K× fan-out, no assignment exchange (guide §2.4/§4.2)
    assigned = assign_centroids(df, cents, id_col, vec_col)

    def prune_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)[order]
        norms = np.linalg.norm(vecs, axis=1)
        n = len(ids)
        drop = np.zeros(n, dtype=bool)
        # column-chunked upper-triangle scan: peak memory n·chunk
        chunk = max(256, (1 << 22) // max(n, 1))
        for j0 in range(1, n, chunk):
            j1 = min(j0 + chunk, n)
            block = (vecs[:j1] @ vecs[j0:j1].T) / np.outer(
                norms[:j1], norms[j0:j1]
            )
            # ROUND half away from zero, matching Spark/DuckDB ROUND(x, 6)
            block = np.sign(block) * np.floor(np.abs(block) * 1e6 + 0.5) / 1e6
            hit = block >= threshold
            # only strictly-lower-id rows count: i < j
            rows = np.arange(j1)[:, None]
            cols = np.arange(j0, j1)[None, :]
            drop[j0:j1] |= (hit & (rows < cols)).any(axis=0)
        keep = ~drop
        return pd.DataFrame(
            {id_col: ids[keep], "centroid": pdf["_centroid"].iloc[0]}
        )

    return (
        assigned.groupBy("_centroid")
        .applyInPandas(prune_cell, schema=f"{id_col} long, centroid int")
        .orderBy(id_col)
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
    sample_mod: int = 1,
) -> None:
    """Persist an IVF index: every vector assigned to its nearest
    TRAINED coarse centroid (same deterministic Lloyd's codebook as
    `ivf_topk`), written as parquet PARTITIONED BY centroid, plus the
    tiny centroid table alongside. This is the 100 TB ANN shape: the
    training runs on a sample, the O(n·centroids) assignment runs
    once at index-build; each query then reads only its probed
    centroid partitions — the scan cost is corpus_size × n_probe /
    n_centroids, enforced by partition pruning rather than a runtime
    filter."""
    cents = train_ivf_centroids(
        df, id_col, vec_col, n_centroids, iters=iters, sample_mod=sample_mod
    )
    centroids = _centroid_frame(df.sparkSession, cents)
    # round-10: argmax assignment as the bit-exact Arrow fold — no
    # K× fan-out, no assignment exchange (guide §2.4/§4.2)
    assigned = assign_centroids(df, cents, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("_centroid").parquet(
        f"{path}/vectors"
    )
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_topk(
    spark,
    path: str,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Query a `build_ivf_index` index: pick the query's best
    `n_probe` centroids, then scan ONLY those partitions.

    The probe list is collected to the driver — that's `n_probe`
    ints (a constant, not data-sized), and inlining them as literals
    is what turns centroid selection into static PartitionFilters on
    the parquet scan (visible in `.explain`), so unprobed partitions
    are never opened."""
    centroids = spark.read.parquet(f"{path}/centroids")
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    qsims = q.crossJoin(F.broadcast(centroids)).select(
        F.col("_cid"),
        cosine_similarity(F.col("_cvec"), F.col("_qvec")).alias("_csim"),
    )
    probe = [
        r["_cid"]
        for r in qsims.orderBy(F.col("_csim").desc(), F.col("_cid").asc())
        .limit(n_probe)
        .collect()
    ]
    vectors = spark.read.parquet(f"{path}/vectors").where(
        F.col("_centroid").isin(probe)
    )
    sim = F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6)
    return (
        vectors.crossJoin(F.broadcast(q))
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Batch KNN similarity join: top-k corpus neighbors for EVERY
    query row. Output (query_id, neighbor_id, sim, rnk).

    exact=True: full cross join — O(|Q|·|C|), the correctness
    baseline. exact=False (default): LSH-blocked — queries only meet
    corpus vectors in the same hyperplane bucket, then a windowed
    row_number keeps k per query. This is the 100 TB shape: the
    bucket equi-join is a plain shuffle join on the signature, cost
    ~ sum over buckets of |Q_b|·|C_b|; recall is tuned by n_planes
    (fewer planes → bigger buckets → higher recall/cost).

    Note: with LSH blocking a query may return fewer than k rows
    (bucket smaller than k) — the standard ANN trade; use
    multi-probe (lsh_topk) or fewer planes when coverage matters."""
    # Norms are precomputed per ROW before the join: each of the
    # O(|Q|·|C|) (or per-bucket) pairs then costs one dot product
    # instead of three array passes. Same doubles as
    # cosine_similarity (vector_norm is its exact norm expression).
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        vector_norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        vector_norm(F.col(vec_col)).alias("_cn"),
    )
    if exact:
        joined = q.crossJoin(c)
    else:
        planes = _hyperplanes(dim, n_planes, seed)
        q = q.withColumn("_sig", lsh_signature(F.col("_qv"), planes))
        c = c.withColumn("_sig", lsh_signature(F.col("_cv"), planes))
        joined = q.join(c, "_sig")
    sim = F.round(
        dot_product(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
    )
    ranked = joined.select("query_id", "neighbor_id", sim.alias("sim")).withColumn(
        "rnk",
        F.row_number()
        .over(
            Window.partitionBy("query_id").orderBy(
                F.col("sim").desc(), F.col("neighbor_id").asc()
            )
        )
        .cast("long"),
    )
    return ranked.where(F.col("rnk") <= k)


def knn_join_lsh_gemm(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    max_bucket_size: int | None = 65536,
) -> DataFrame:
    """Self KNN join, LSH-blocked, with the per-bucket work done as a
    numpy gram matrix inside applyInPandas.

    Same candidate semantics as `knn_join(exact=False)` but a
    different cost model: instead of one interpreted
    zip_with/aggregate dot per PAIR (O(bucket²) higher-order-function
    evals), each bucket's vectors cross the Arrow boundary ONCE and
    BLAS computes the whole bucket² similarity block. Rounding
    emulates Spark/DuckDB ROUND (half away from zero) so results
    value-hash match the same SQL oracle as the expression-based
    variant.

    Hot buckets degrade AUTOMATICALLY: one cheap signature count
    first (a 2^n_planes-row aggregate); if any bucket exceeds
    `max_bucket_size`, the corpus side of each oversized bucket is
    salted into ceil(n/max) sub-buckets (queries replicated to every
    sub-bucket) and per-query local top-ks are merged by a global
    window — value-hash IDENTICAL output (top-k of per-partition
    top-ks), but parallelism becomes sum(ceil(n_b/max)) tasks and
    peak task memory is capped at ~max_bucket_size × dim doubles
    instead of the whole bucket. Pass max_bucket_size=None to skip
    the pre-count when bucket sizes are known-small."""
    import numpy as np
    import pandas as pd

    planes = _hyperplanes(dim, n_planes, seed)
    tagged = df.select(
        F.col(id_col), F.col(vec_col), lsh_signature(F.col(vec_col), planes).alias("_sig")
    )
    if max_bucket_size is not None:
        # one scalar to the driver (max over ≤ 2^n_planes group counts)
        biggest = (
            tagged.groupBy("_sig")
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n"))
            .collect()[0][0]
            or 0
        )
        if biggest > max_bucket_size:
            return _knn_join_lsh_gemm_split(
                tagged, k, id_col, vec_col, max_bucket_size
            )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids, vecs = ids[order], vecs[order]
        norms = np.linalg.norm(vecs, axis=1)
        sims = (vecs @ vecs.T) / np.outer(norms, norms)
        # ROUND half away from zero, matching Spark/DuckDB ROUND(x, 6)
        sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
        n = len(ids)
        kk = min(k, n)
        out_q, out_n, out_s, out_r = [], [], [], []
        for i in range(n):
            row = sims[i]
            # top-k by (sim desc, neighbor_id asc); ids pre-sorted so
            # stable mergesort on -sim preserves the id tie-break
            top = np.argsort(-row, kind="stable")[:kk]
            out_q.extend([ids[i]] * kk)
            out_n.extend(ids[top])
            out_s.extend(row[top])
            out_r.extend(range(1, kk + 1))
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "sim": out_s, "rnk": out_r}
        )

    return tagged.groupBy("_sig").applyInPandas(
        per_bucket, schema="query_id long, neighbor_id long, sim double, rnk long"
    )


def _knn_join_lsh_gemm_split(
    tagged: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    max_bucket_size: int,
) -> DataFrame:
    """Hot-bucket path for `knn_join_lsh_gemm`: salt each oversized
    bucket's CORPUS rows into ceil(n/max) sub-buckets (deterministic
    id-hash salt), replicate each QUERY row to every sub-bucket of
    its bucket, gram-matrix a local top-k per (bucket, salt) group,
    then merge with one global per-query window. Top-k of a union is
    the top-k of per-partition top-ks, and ties break on
    (sim desc, neighbor_id asc) everywhere, so the output is
    value-hash identical to the unsplit path — only the task
    granularity changes."""
    import numpy as np
    import pandas as pd

    splits = (
        tagged.groupBy("_sig")
        .agg(
            F.ceil(F.count(F.lit(1)) / F.lit(max_bucket_size))
            .cast("int")
            .alias("_ns")
        )
    )
    t = tagged.join(F.broadcast(splits), "_sig")
    corpus = t.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_sig"),
        F.pmod(F.xxhash64(F.col(id_col)), F.col("_ns")).cast("int").alias("_salt"),
        F.lit(False).alias("_isq"),
    )
    queries = t.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_sig"),
        F.explode(F.sequence(F.lit(0), F.col("_ns") - 1)).alias("_salt"),
        F.lit(True).alias("_isq"),
    )
    both = corpus.unionByName(queries)

    def per_subbucket(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf[~pdf["_isq"]]
        q = pdf[pdf["_isq"]]
        if c.empty or q.empty:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "sim": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64", "sim": "float64"})
        cv = np.asarray(c[vec_col].tolist(), dtype=np.float64)
        cids = c[id_col].to_numpy()
        order = np.argsort(cids)
        cids, cv = cids[order], cv[order]
        qv = np.asarray(q[vec_col].tolist(), dtype=np.float64)
        qids = q[id_col].to_numpy()
        sims = (qv @ cv.T) / np.outer(
            np.linalg.norm(qv, axis=1), np.linalg.norm(cv, axis=1)
        )
        sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
        kk = min(k, len(cids))
        out_q, out_n, out_s = [], [], []
        for i in range(len(qids)):
            row = sims[i]
            top = np.argsort(-row, kind="stable")[:kk]
            out_q.extend([qids[i]] * kk)
            out_n.extend(cids[top])
            out_s.extend(row[top])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "sim": out_s})

    local = both.groupBy("_sig", "_salt").applyInPandas(
        per_subbucket, schema="query_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def knn_join_exact_gemm(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 512,
) -> DataFrame:
    """Exact brute-force self-KNN (the correctness baseline), executed
    through the SPLIT gram-matrix machinery instead of a crossJoin of
    interpreted higher-order-function dots: every row goes into one
    logical bucket (constant signature), which the splitter salts
    into ceil(n/max_bucket_size) sub-buckets — BLAS computes each
    |Q|x|sub-corpus| block after ONE Arrow crossing, and the global
    per-query window merges local top-ks. Value-hash identical to
    `knn_join(exact=True)` (same 1e-6 ROUND grid, same
    (sim desc, id asc) tie-break — the grid is what absorbs
    BLAS-vs-fold summation-order differences, proven driver-green by
    knn_join_lsh_split) but ~17x faster at sf0.1 (34 s -> 2 s) and
    parallelism/task memory stay bounded at any corpus size.
    O(n^2) TOTAL work is inherent to the exact baseline; this fixes
    the CONSTANT and the distribution, not the asymptotics."""
    tagged = df.select(
        F.col(id_col), F.col(vec_col), F.lit(0).alias("_sig")
    )
    return _knn_join_lsh_gemm_split(tagged, k, id_col, vec_col, max_bucket_size)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking: only
    same-bucket pairs get the exact cosine check. Output
    (id_a, id_b, sim) above threshold, 6dp."""
    planes = _hyperplanes(dim, n_planes, seed)
    tagged = df.select(
        F.col(id_col),
        F.col(vec_col),
        lsh_signature(F.col(vec_col), planes).alias("_sig"),
        vector_norm(F.col(vec_col)).alias("_n"),
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    sim = F.round(
        dot_product(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._n") * F.col("b._n")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def _l2_sq(a, b):
    """Squared L2 distance between two array<double> columns, as a
    sequential left-fold (same summation order as DuckDB's
    list_distance, so cross-engine argmin agrees)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    df: DataFrame,
    books: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    extra_cols: tuple[str, ...] = (),
    emit_svec: bool = False,
    code_col: str = "code",
) -> DataFrame:
    """Argmin-L2 PQ sub-codes as ONE Arrow pass: (id[, extras], sub,
    [svec,] code) against the n_sub×n_codes codebook shipped in the
    task closure — replaces the posexplode ×n_sub + broadcast-join
    ×n_codes fan-out + interpreted `_l2_sq` fold + min_by exchange
    (guide §2.4/§4.2, the `assign_centroids` lane for the PQ family).

    Bit-exact: each distance replicates `_l2_sq`'s sequential
    left-fold IEEE order (d=(x−y); acc+=d·d per dimension, vectorized
    over rows only), and np.argmin picks the FIRST minimum — exactly
    min_by on (_d, cid). Subvector slices cast float→double, which is
    exact."""
    import numpy as np
    import pandas as pd

    n_sub = len(books)
    width = len(books[0][0])
    carr = [
        [[float(v) for v in c] for c in books[s]] for s in range(n_sub)
    ]
    dtypes = dict(df.dtypes)
    fields = [f"{id_col} {dtypes[id_col]}"]
    fields += [f"{c} {dtypes[c]}" for c in extra_cols]
    fields.append("sub int")
    if emit_svec:
        fields.append("svec array<double>")
    fields.append(f"{code_col} int")
    schema = ", ".join(fields)
    cols_in = [id_col, *extra_cols, vec_col]

    def encode(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            n = len(pdf)
            blocks = []
            for s in range(n_sub):
                off = s * width
                dists = np.empty((n, len(carr[s])))
                for ci, c in enumerate(carr[s]):
                    acc = np.zeros(n)
                    for j in range(width):
                        d = x[:, off + j] - c[j]
                        acc = acc + d * d
                    dists[:, ci] = acc
                codes = dists.argmin(axis=1).astype(np.int32)
                cols = {id_col: pdf[id_col]}
                for e in extra_cols:
                    cols[e] = pdf[e]
                cols["sub"] = np.full(n, s, dtype=np.int32)
                if emit_svec:
                    cols["svec"] = list(x[:, off : off + width])
                cols[code_col] = codes
                blocks.append(pd.DataFrame(cols))
            yield pd.concat(blocks, ignore_index=True)

    return df.select(*cols_in).mapInPandas(encode, schema=schema)


def train_pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    dim: int = 64,
    sample_mod: int = 1,
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: the vector is cut
    into `n_sub` contiguous subspaces; each gets its own `n_codes`-entry
    codebook trained with Lloyd's over squared-L2 (classic PQ,
    Jégou et al. 2011).

    Same cross-engine reproducibility contract as
    `train_ivf_centroids`: init = the subvectors of the `n_codes`
    smallest ids, assignment = argmin L2 with ties to the lower code,
    means quantized to the 1e-6 grid (det_round formula) each round —
    so the DuckDB oracle re-derives the IDENTICAL codebooks from
    unrolled SQL CTEs and the PQ query stays value-hash checkable.

    Scale shape: all subspaces train in ONE distributed pass per
    round — a single broadcast join against the (n_sub·n_codes)-row
    codebook frame, one (id,sub) argmin aggregate, one per-dimension
    mean. Driver traffic is n_sub·n_codes·(dim/n_sub) rounded floats
    per round — constants, not data. At 100 TB, train on a
    deterministic id-mod sample (`sample_mod`) exactly like IVF.
    """
    import math

    spark = df.sparkSession
    train = df.where(F.col(id_col) % sample_mod == 0) if sample_mod > 1 else df
    width = dim // n_sub
    seed_rows = (
        train.orderBy(F.col(id_col).asc())
        .limit(n_codes)
        .select(vec_col)
        .collect()
    )
    books = [
        [[float(x) for x in r[0][s * width : (s + 1) * width]] for r in seed_rows]
        for s in range(n_sub)
    ]
    for _ in range(iters):
        # round-10: the per-round argmin-L2 sub-assignment runs as
        # the bit-exact Arrow fold (`pq_encode`) — the ×n_sub
        # posexplode + ×n_codes broadcast-join fan-out and the
        # (id,sub) argmin exchange are gone; the mean aggregate below
        # is UNCHANGED (same posexplode + avg plan)
        assigned = pq_encode(
            train, books, id_col, vec_col, emit_svec=True, code_col="_c"
        )
        means = (
            assigned.select("sub", "_c", F.posexplode("svec").alias("pos", "v"))
            .groupBy("sub", "_c", "pos")
            .agg(F.avg("v").alias("mv"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r["sub"], r["_c"]), {})[r["pos"]] = (
                math.floor(r["mv"] * 1e6 + 0.5) / 1e6
            )
        books = [
            [
                [got[(s, c)][p] for p in range(width)]
                if (s, c) in got
                else books[s][c]
                for c in range(n_codes)
            ]
            for s in range(n_sub)
        ]
    return books


def pq_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 4,
    n_codes: int = 8,
    iters: int = 1,
    dim: int = 64,
    sample_mod: int = 1,
    rerank: int = 0,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ approximate top-k by inner product with asymmetric distance
    computation (ADC): encode every corpus vector as `n_sub` small
    codes (argmin-L2 per subspace), precompute the query's dot product
    against every codebook entry, and score a vector as the SUM of the
    `n_sub` table lookups — the corpus vectors themselves are never
    touched at query time.

    Memory story at 100 TB: a 64-dim float vector is 256 bytes; its PQ
    code is `n_sub` bytes (32× smaller at the defaults) — the entire
    encoded corpus fits where 3% of the raw vectors would, and the
    scan is a broadcast-join + integer adds inside codegen.

    Determinism: each lookup-table entry is quantized to the 1e-6 grid
    AS AN INTEGER (floor(dot·1e6+0.5) as BIGINT) and scores sum those
    integers — integer addition is order-independent, so the score is
    bit-identical across partitionings and engines (same trick as the
    BM25 oracle). Output (vec_id, score) ranked score DESC, id ASC.

    `rerank=R` adds the standard two-stage retrieval: ADC shortlists
    the top R candidates, then ONLY those R rows are re-scored with
    the exact dot product (score = det_round(q·v)). This is how PQ is
    deployed in practice (FAISS's IndexRefine): the compressed scan
    bounds I/O, the exact pass restores ranking quality, and at 100 TB
    the re-rank join touches R raw vectors — a broadcast of R ids
    against the corpus, one semi-join, no second full scan ordering.
    """
    # Codebook training (two driver round-trips per Lloyd's round) is
    # the BUILD half of PQ — callers that query repeatedly pass
    # pre-trained `books` and pay it once (plans/pipeline.py caches
    # per process, the vector-DB-load analogue, same split as the
    # persisted IVF index).
    if books is None:
        books = train_pq_codebooks(
            df, id_col, vec_col, n_sub, n_codes, iters, dim, sample_mod
        )
    spark = df.sparkSession
    width = dim // n_sub
    book_df = spark.createDataFrame(
        [(s, c, books[s][c]) for s in range(n_sub) for c in range(n_codes)],
        "sub int, cid int, cvec array<double>",
    )

    # Encode: one Arrow pass, (id, sub) -> code (round-10: the
    # bit-exact `pq_encode` fold — no fan-out, no argmin exchange).
    encoded = pq_encode(df, books, id_col, vec_col)

    # ADC lookup table: query dot each codebook entry, on the 1e-6
    # integer grid. n_sub×n_codes rows — broadcast.
    qsubs = query_df.select(
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec_col), s * width + 1, width).cast("array<double>")
                    for s in range(n_sub)
                ]
            )
        ).alias("sub", "qvec")
    )
    qtable = (
        qsubs.join(book_df, "sub")
        .select(
            "sub",
            F.col("cid").alias("code"),
            F.floor(dot_product(F.col("qvec"), F.col("cvec")) * 1e6 + 0.5)
            .cast("long")
            .alias("contrib"),
        )
    )
    adc = (
        encoded.join(F.broadcast(qtable), ["sub", "code"])
        .groupBy(id_col)
        .agg((F.sum("contrib").cast("double") / F.lit(1e6)).alias("score"))
    )
    if not rerank:
        return adc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)

    shortlist = (
        adc.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(rerank)
        .select(id_col)
    )
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    exact = det_round(dot_product(F.col(vec_col), F.col("_qvec")))
    return (
        df.join(F.broadcast(shortlist), id_col)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), exact.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scalar (per-dimension min/max) int8 quantization of an
    embedding column — the storage/bandwidth path every vector store
    ships (4× smaller vectors, ~1% recall cost). Returns per vector:
    the code checksum `q_sum` (bigint — proves the engine's codes are
    integer-identical to the oracle's, not merely close) and the max
    absolute reconstruction error.

    Scale shape: ONE tiny aggregate computes all 128 per-dimension
    min/max stats with map-side combine (output: a single row of two
    64-wide arrays), broadcast back, then a single codegen'd map pass
    quantizes every vector with array higher-order functions — no
    Python, no second shuffle. All arithmetic is double IEEE with
    identical operand order in both engines, so codes (an integer
    floor) are exactly reproducible."""
    v = F.col(vec_col)
    stats = df.agg(
        F.array(*[F.min(v[i].cast("double")) for i in range(dim)]).alias("_mins"),
        F.array(*[F.max(v[i].cast("double")) for i in range(dim)]).alias("_maxs"),
    ).select(
        "_mins",
        F.zip_with(
            "_maxs",
            "_mins",
            lambda mx, mn: F.when(mx == mn, F.lit(1.0)).otherwise(
                (mx - mn) / F.lit(255.0)
            ),
        ).alias("_scales"),
    )

    def _code(x, i):
        mn = F.element_at(F.col("_mins"), i + 1)
        sc = F.element_at(F.col("_scales"), i + 1)
        raw = F.floor((x.cast("double") - mn) / sc + F.lit(0.5))
        return F.least(F.lit(255).cast("long"), F.greatest(F.lit(0).cast("long"), raw))

    def _err(x, i):
        mn = F.element_at(F.col("_mins"), i + 1)
        sc = F.element_at(F.col("_scales"), i + 1)
        return F.abs(x.cast("double") - (mn + _code(x, i).cast("double") * sc))

    return (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.aggregate(
                F.transform(v, _code),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("q_sum"),
            det_round(F.array_max(F.transform(v, _err))).alias("max_abs_err"),
        )
        .orderBy(id_col)
    )


def embedding_dim_stats(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(label, dimension) feature statistics — count, mean,
    variance — the monitoring pass that catches dead dimensions,
    scaling drift, and label-conditional shift in an embedding
    column before it poisons retrieval or training.

    Float sums are partition-order-dependent, so the moments are
    accumulated in exact MICRO-UNIT integers instead: each component
    is quantized once (floor(x·1e6 + 0.5), the det_round grid), the
    per-group Σq and Σq² are exact int64 sums (order-independent),
    and mean/variance are derived from those two integers by the
    same fixed division sequence in both engines — bit-identical
    results with no rounding grid on the output.

    Scale: ONE posexplode (rows × dim cells, all codegen) into one
    hash aggregate keyed by (label, dim) — cardinality
    |labels|·dim, constant-ish in corpus size; map-side combine does
    the heavy reduction. Σq² of unit-scale micro-ints stays within
    int64 up to ~10⁶ rows per group; above that, cast the
    accumulators to decimal(38,0) — same exactness, wider lane.
    """
    flat = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    )
    q = F.floor(F.col("_v").cast("double") * 1e6 + F.lit(0.5)).cast("long")
    return (
        flat.select("label", "dim", q.alias("_q"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_q").alias("sum_micro"),
            F.sum(F.col("_q") * F.col("_q")).alias("sumsq_micro"),
        )
        .select(
            "label",
            "dim",
            "n",
            "sum_micro",
            "sumsq_micro",
            (F.col("sum_micro").cast("double") / F.col("n") / F.lit(1e6)).alias(
                "mean"
            ),
            (
                (
                    F.col("sumsq_micro").cast("double") / F.col("n")
                    - (F.col("sum_micro").cast("double") / F.col("n"))
                    * (F.col("sum_micro").cast("double") / F.col("n"))
                )
                / F.lit(1e12)
            ).alias("variance"),
        )
        .orderBy("label", "dim")
    )


def hard_negative_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    min_sim: float = 0.4,
    limit: int = 100,
) -> DataFrame:
    """Contrastive hard-negative mining: pairs that are CLOSE in
    embedding space (same LSH bucket, cosine >= min_sim) but carry
    DIFFERENT labels — exactly the negatives that teach a contrastive
    or metric-learning model its decision boundary (random negatives
    are trivially far; these are the hard ones).

    Same sub-quadratic LSH blocking as `embedding_neardup_pairs` —
    the exact cosine runs only inside buckets — plus the cross-label
    filter and a distributed top-`limit` by similarity
    (TakeOrderedAndProject). Output: (id_a, id_b, label_a, label_b,
    sim), hardest first."""
    planes = _hyperplanes(dim, n_planes, seed)
    tagged = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        lsh_signature(F.col(vec_col), planes).alias("_sig"),
        vector_norm(F.col(vec_col)).alias("_n"),
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    sim = F.round(
        dot_product(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
        / (F.col("a._n") * F.col("b._n")),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a._sig") == F.col("b._sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .where(F.col(f"a.{label_col}") != F.col(f"b.{label_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{label_col}").alias("label_a"),
            F.col(f"b.{label_col}").alias("label_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= min_sim)
        .orderBy(F.col("sim").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(limit)
    )


def kmeans_cluster_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """K-means clustering exposed as a first-class result: train the
    deterministic Lloyd's codebook (`train_ivf_centroids` — the same
    one IVF search uses), assign every vector by argmax cosine, and
    report per-cluster size and mean cohesion (average cosine of
    members to their centroid).

    Cohesion is averaged from MICRO-FLOORED per-row cosines summed as
    exact int64 — partition-order-free, so the whole clustering
    (codebook, assignment, stats) hash-matches its SQL mirror.
    Shape: one broadcast of K centroid vectors + one hash aggregate;
    the training adds `iters` assign+mean rounds (two data passes
    each)."""
    cents = train_ivf_centroids(df, id_col, vec_col, n_centroids, iters=iters)
    # round-10: argmax assignment as the bit-exact Arrow fold — the
    # emitted _csim is the identical double, so the micro-floor and
    # the int64 cohesion sum are unchanged (guide §2.4/§4.2)
    member = assign_centroids(df, cents, id_col, vec_col, with_sim=True).select(
        F.col("_centroid").alias("cluster"),
        F.floor(F.col("_csim") * 1_000_000.0 + F.lit(0.5))
        .cast("long")
        .alias("_cu"),
    )
    return (
        member.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.sum("_cu").cast("double")
                / F.lit(1_000_000.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("cohesion"),
        )
        .orderBy("cluster")
    )


def mmr_rerank(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from the cosine top-`pool` candidates, greedily pick
    `k` results maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
    the diversity-aware final stage of a retrieval pipeline (don't
    return 5 near-copies of the best hit).

    Shape: candidate generation is the DISTRIBUTED stage (the same
    brute-force/ANN top-k machinery, here `cosine_topk`); the greedy
    then runs over the constant-size pool (pool², 400 pairwise sims)
    with one driver row per round — the n_probe/PCA driver-scalar
    contract, never data-sized collection. Pairwise sims use the
    same fold-based cosine as the candidate stage, 6dp-rounded, so
    the unrolled SQL oracle reproduces every comparison; λ and 1−λ
    enter both engines as the IDENTICAL binary doubles (repr'd into
    the SQL)."""
    cand = cosine_topk(df, query_df, k=pool, id_col=id_col, vec_col=vec_col)
    cand = cand.localCheckpoint(eager=True)
    cv = (
        df.join(cand.select(id_col), id_col)
        .select(id_col, vec_col)
        .localCheckpoint(eager=True)
    )
    a = cv.select(F.col(id_col).alias("ida"), F.col(vec_col).alias("va"))
    b = cv.select(F.col(id_col).alias("idb"), F.col(vec_col).alias("vb"))
    pw = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ida") != F.col("idb"))
        .select(
            "ida",
            "idb",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    first = (
        cand.orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(1)
        .select(
            id_col,
            "sim",
            # engine-side HALF_UP round — python round() is banker's
            F.round(F.lit(lam) * F.col("sim"), 6).alias("mmr"),
        )
        .collect()
    )[0]
    picks = [(1, first[id_col], first["sim"], first["mmr"])]
    sel = [first[id_col]]
    for r in range(2, k + 1):
        rows = (
            cand.where(~F.col(id_col).isin(sel))
            .join(
                pw.where(F.col("idb").isin(sel))
                .groupBy("ida")
                .agg(F.max("s").alias("mx")),
                cand[id_col] == F.col("ida"),
            )
            .select(
                id_col,
                "sim",
                F.round(
                    F.lit(lam) * F.col("sim") - F.lit(1 - lam) * F.col("mx"), 6
                ).alias("mmr"),
            )
            .orderBy(F.col("mmr").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not rows:
            break
        row = rows[0]
        picks.append((r, row[id_col], row["sim"], row["mmr"]))
        sel.append(row[id_col])
    return df.sparkSession.createDataFrame(
        picks, f"rank int, {id_col} long, sim double, mmr double"
    )


def ivfpq_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    ivf_iters: int = 2,
    n_probe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    pq_iters: int = 1,
    dim: int = 64,
    rerank: int = 50,
    cents: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF+PQ composite index (FAISS IndexIVFPQ, Jégou et al. 2011):
    the trained IVF coarse quantizer partitions the corpus into
    cells, each vector's RESIDUAL (v − centroid) is product-quantized
    to `n_sub` byte codes, and a query scans only its `n_probe` best
    cells with ADC over residual codes. This is THE standard
    billion-vector layout: the coarse index bounds the scan, PQ
    bounds the memory (8 bytes/vector at the defaults vs 256 raw).

    Inner-product decomposition makes the compose exact-in-structure:
    q·v = q·c + q·r, so ADC score = grid(q·c_cell) + Σ grid lookups
    of q against the SHARED residual codebooks — the per-cell base
    term is one broadcast join, the lookup table is the same
    n_sub×n_codes frame PQ alone uses. Residuals concentrate much
    tighter than raw vectors, so the same codebook budget quantizes
    finer — the reason FAISS trains PQ on residuals.

    Determinism contract: both trainers are the det-round-grid
    Lloyd's (`train_ivf_centroids`, `train_pq_codebooks` — the DuckDB
    oracle re-derives identical codebooks from unrolled CTEs); ADC
    scores are exact BIGINT sums of 1e-6-grid terms, top-`rerank`
    shortlist orders by that integer, and the final `k` are exact
    dot products on the det_round grid.

    Scale shape: residuals materialize once (at 100 TB: persisted
    partitioned by cell, as `build_ivf_index` does for raw vectors);
    the query never touches a non-probed cell, and every query-side
    frame (centroids, lookup table, shortlist) is broadcast."""
    spark = df.sparkSession
    if cents is None:
        cents = train_ivf_centroids(
            df, id_col, vec_col, n_centroids, iters=ivf_iters
        )
    centroids = _centroid_frame(spark, cents)
    # round-10: argmax assignment as the bit-exact Arrow fold — no
    # K× fan-out, no assignment exchange (guide §2.4/§4.2)
    assigned = assign_centroids(df, cents, id_col, vec_col)
    resid = (
        assigned.join(
            F.broadcast(
                centroids.select(F.col("_cid").alias("_centroid"), "_cvec")
            ),
            "_centroid",
        )
        .select(
            F.col(id_col),
            "_centroid",
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col("_cvec"),
                lambda a, b: a - b,
            ).alias("_rvec"),
        )
        .localCheckpoint(eager=True)
    )
    if books is None:
        books = train_pq_codebooks(
            resid, id_col, "_rvec", n_sub, n_codes, pq_iters, dim
        )
    width = dim // n_sub
    book_df = spark.createDataFrame(
        [(s, c, books[s][c]) for s in range(n_sub) for c in range(n_codes)],
        "sub int, cid int, cvec array<double>",
    )
    # round-10: residual sub-codes via the bit-exact Arrow fold
    # (`pq_encode`) — no ×n_sub/×n_codes fan-out, no argmin exchange
    encoded = pq_encode(
        resid, books, id_col, "_rvec", extra_cols=("_centroid",)
    )

    qsims = query_df.crossJoin(F.broadcast(centroids)).select(
        F.col("_cid"),
        cosine_similarity(F.col(vec_col), F.col("_cvec")).alias("_csim"),
    )
    probe = qsims.orderBy(F.col("_csim").desc(), F.col("_cid").asc()).limit(
        n_probe
    )
    qbase = (
        query_df.crossJoin(F.broadcast(centroids))
        .join(
            F.broadcast(probe.select("_cid")),
            "_cid",
        )
        .select(
            F.col("_cid").alias("_centroid"),
            F.floor(
                dot_product(F.col(vec_col).cast("array<double>"), F.col("_cvec"))
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("_qc"),
        )
    )
    qsubs = query_df.select(
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec_col), s * width + 1, width).cast(
                        "array<double>"
                    )
                    for s in range(n_sub)
                ]
            )
        ).alias("sub", "qvec")
    )
    qtable = qsubs.join(book_df, "sub").select(
        "sub",
        F.col("cid").alias("code"),
        F.floor(dot_product(F.col("qvec"), F.col("cvec")) * 1e6 + 0.5)
        .cast("long")
        .alias("_contrib"),
    )
    adc = (
        encoded.join(F.broadcast(qtable), ["sub", "code"])
        .groupBy(id_col, "_centroid")
        .agg(F.sum("_contrib").alias("_sr"))
    )
    shortlist = (
        adc.join(F.broadcast(qbase), "_centroid")
        .select(F.col(id_col), (F.col("_qc") + F.col("_sr")).alias("_si"))
        .orderBy(F.col("_si").desc(), F.col(id_col).asc())
        .limit(rerank)
        .select(id_col)
    )
    q = query_df.select(F.col(vec_col).alias("_qvec"))
    exact = det_round(dot_product(F.col(vec_col), F.col("_qvec")))
    return (
        df.join(F.broadcast(shortlist), id_col)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), exact.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_mmd_shift(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise distribution-shift audit between embedding groups:
    for every label pair (a < b) the squared linear-kernel Maximum
    Mean Discrepancy MMD² = ‖μ_a − μ_b‖² (Gretton et al., JMLR
    2012 — the linear kernel makes the witness function the mean
    difference, the standard first-order domain-shift screen before
    mixing corpora for training) plus the cosine between the two
    mean vectors.

    Float sums are partition-order-dependent, so everything exact:
    components are quantized once onto the 1e-6 det_round grid, the
    per-(label, dim) Σq are exact DECIMAL(38,0), the per-dim mean
    gap is cleared of divisions as n_b·S_a − n_a·S_b (still an
    exact integer), and the 64-dim reductions Σgap², ΣS_aS_b, ΣS²
    are exact integer sums. Only the final normalizations
    (÷ n_a²n_b²·1e12 and the cosine ratio) run in fixed-order
    doubles — bit-identical across engines and partitionings.

    Scale: ONE posexplode (rows × dim, all codegen) into a hash
    aggregate keyed by (label, dim) — output |labels|·dim rows, so
    the pair join and final reduce are constant-size no matter how
    many vectors the corpus holds."""
    d38 = "decimal(38,0)"
    flat = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("_v").cast("double") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("_q"),
    )
    agg = flat.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_q").cast(d38)).alias("s"),
    )
    a = agg.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = agg.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    pairs = a.join(b, "dim").where(F.col("label_a") < F.col("label_b"))
    gap = F.col("nb").cast(d38) * F.col("sa") - F.col("na").cast(
        d38
    ) * F.col("sb")
    pa = pairs.groupBy("label_a", "label_b").agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(gap * gap).alias("ssq"),
        F.sum(F.col("sa") * F.col("sb")).alias("dot"),
        F.sum(F.col("sa") * F.col("sa")).alias("qa"),
        F.sum(F.col("sb") * F.col("sb")).alias("qb"),
        # per-dim overflow detector: a decimal overflow in one dim's
        # product NULLs just that row and SUM would skip it — count
        # NULL terms explicitly (inputs are never NULL, so a NULL
        # product IS an overflow)
        F.sum(
            F.when(
                (gap * gap).isNull()
                | (F.col("sa") * F.col("sb")).isNull()
                | (F.col("sa") * F.col("sa")).isNull()
                | (F.col("sb") * F.col("sb")).isNull(),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_ovf"),
    )
    # Overflow guard: gap² ~ (na·nb·1e6·|v|)², so decimal(38,0)
    # holds up to na·nb ≈ 1e13 (≈3e6 rows/label at |v|≈1) — ~1e8×
    # headroom over current scales.  Past it, non-ANSI Spark decimal
    # arithmetic yields NULL *silently* while the DuckDB oracle's
    # HUGEINT raises; converge the failure modes by raising loudly
    # (beyond the bound, re-grid with a second-level chunked
    # reduction as quality_filters does).
    _ovf = (
        F.col("ssq").isNull()
        | F.col("dot").isNull()
        | F.col("qa").isNull()
        | F.col("qb").isNull()
        | (F.col("n_ovf") > 0)
    )
    _raise = F.raise_error(
        F.lit(
            "embedding_mmd_shift: decimal(38,0) overflow in a "
            "per-pair component sum (label counts exceed the "
            "documented na*nb~1e13 bound); re-grid via a "
            "second-level chunked reduction"
        )
    ).cast("double")
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    mmd2 = F.when(_ovf, _raise).otherwise(
        F.col("ssq").cast("double")
        / (nad * nad * nbd * nbd * F.lit(1e12))
    )
    den = F.sqrt(F.col("qa").cast("double")) * F.sqrt(
        F.col("qb").cast("double")
    )
    cosine = F.when(den > F.lit(0.0), F.col("dot").cast("double") / den)
    return pa.select(
        "label_a",
        "label_b",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        det_round(mmd2, 6).alias("mmd2"),
        det_round(F.sqrt(mmd2), 6).alias("mmd"),
        det_round(cosine, 6).alias("mean_cosine"),
    ).orderBy("label_a", "label_b")


def knn_label_eval(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    sample_mod: int = 10,
    max_probes: int = 200,
) -> DataFrame:
    """Leave-one-out k-NN classifier evaluation: for a deterministic
    BOUNDED eval sample (id % sample_mod == 0, smallest max_probes
    ids) find the k nearest OTHER vectors by exact integer-grid dot
    product, take the majority label (ties → smallest label), and
    report per-true-label accuracy — the standard "are these
    embeddings linearly useful" probe run before committing a corpus
    to training.

    Exactness: components are quantized once onto the 1e-6 grid, so
    every pairwise dot is an exact INT64 sum of integer products —
    ranking needs no float comparisons at all (dot DESC, neighbor id
    ASC is a total order on exact integers); majority voting and
    accuracy are integer counting with one final division. Int64 is
    the exact lane here for the same reason as embedding_dim_stats:
    |dot| ≤ dim·(|x|·1e6+0.5)² ≤ dim·1.1e12 at unit scale (test
    corpus |x| < 0.6), in-range to dim ~10⁶; the decimal(38,0) lane
    this replaced cost ~3× the scan in BigDecimal allocations for
    headroom no embedding table needs.

    Scale: the candidate side is the full corpus but the query side
    is capped at max_probes rows (a TakeOrdered, never a full
    sample), so the score join is O(max_probes·|corpus|) — LINEAR in
    corpus size by construction (a proportional sample would make
    the brute-force eval quadratic); the LSH/IVF family provides the
    sublinear path when even one corpus pass is too much.

    Round-10 (guide §4.2): the probe×corpus dot products run as one
    float64 GEMM per Arrow batch instead of an interpreted
    zip_with/aggregate per PAIR. The probe matrix is a constant-size
    collect (max_probes × dim longs — the trainers' bounded-collect
    contract) shipped in the task closure; each batch emits only its
    LOCAL top-k per probe (top-k of a union is the top-k of
    per-partition top-ks) and the global window merges
    O(max_probes · k · n_batches) candidate rows, so the fan-out
    never materializes as rows. Bit-exact: components sit on the 1e6
    integer grid, so every product (≤ dim·1.1e12) and partial sum
    stays an integer < 2⁵³ — float64 GEMM is EXACT arithmetic here,
    and ranking stays a total order on exact integers (dot desc,
    vid asc), the same order the oracle ranks by."""
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5))
            .cast("long"),
        ).alias("q"),
    )
    probe_rows = (
        base.where(F.col("vid") % sample_mod == 0)
        .orderBy("vid")
        .limit(max_probes)
        .collect()
    )
    pids = np.array([r["vid"] for r in probe_rows], dtype=np.int64)
    true_lbls = np.array([r["lbl"] for r in probe_rows], dtype=np.int32)
    pmat = np.array([r["q"] for r in probe_rows], dtype=np.float64)

    def local_topk(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            vids = pdf["vid"].to_numpy(dtype=np.int64)
            lbls = pdf["lbl"].to_numpy(dtype=np.int64)
            x = np.asarray(pdf["q"].tolist(), dtype=np.float64)
            dots = pmat @ x.T  # exact: integer-valued, < 2^53
            o_p, o_t, o_v, o_l, o_d = [], [], [], [], []
            for i in range(len(pids)):
                row = dots[i]
                valid = vids != pids[i]
                cv, cl, cd = vids[valid], lbls[valid], row[valid]
                top = np.lexsort((cv, -cd))[: min(k, len(cd))]
                o_p.extend([pids[i]] * len(top))
                o_t.extend([true_lbls[i]] * len(top))
                o_v.extend(cv[top])
                o_l.extend(cl[top])
                o_d.extend(cd[top].astype(np.int64))
            if o_p:
                yield pd.DataFrame(
                    {"pid": o_p, "true_lbl": o_t, "vid": o_v,
                     "lbl": o_l, "dot": o_d}
                )

    scored = base.mapInPandas(
        local_topk,
        schema="pid long, true_lbl int, vid long, lbl int, dot long",
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("dot").desc(), F.col("vid").asc()
    )
    topk = scored.select(
        "pid", "true_lbl", "lbl", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= k)
    votes = topk.groupBy("pid", "true_lbl", "lbl").agg(
        F.count(F.lit(1)).alias("v")
    )
    wv = Window.partitionBy("pid").orderBy(
        F.col("v").desc(), F.col("lbl").asc()
    )
    pred = votes.select(
        "pid", "true_lbl", "lbl", F.row_number().over(wv).alias("rn")
    ).where(F.col("rn") == 1)
    agg = pred.groupBy("true_lbl").agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.sum(
            (F.col("lbl") == F.col("true_lbl")).cast("long")
        ).alias("n_correct"),
    )
    return agg.select(
        F.col("true_lbl").alias("label"),
        F.col("n_eval").cast("long").alias("n_eval"),
        F.col("n_correct").cast("long").alias("n_correct"),
        det_round(
            F.col("n_correct").cast("double")
            / F.col("n_eval").cast("double"),
            6,
        ).alias("accuracy"),
    ).orderBy("label")


def twonn_intrinsic_dim(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 10,
    max_probes: int = 200,
) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding manifold: for each probe, the ratio μ = r₂/r₁ of its
    two nearest-neighbor distances follows a Pareto with exponent =
    the intrinsic dimension, so d̂ = n / Σ ln μ = 2n / Σ ln(d₂/d₁)
    on squared distances — the "how curled is this embedding space"
    number that predicts whether ANN recall will hold at scale (IVF
    and LSH degrade with intrinsic, not ambient, dimension).

    Exactness: components quantized once onto the 1e-6 grid, so
    every pairwise SQUARED distance is an exact INT64 sum of integer
    squares (ranking is a total order on exact integers, ties →
    smallest neighbor id); per-probe ln(d₂/d₁) is floored once onto
    the 1e-9 grid; one double chain at the end. Int64 is exact here
    (the embedding_dim_stats convention): d² ≤ dim·4·(|x|·1e6+0.5)²
    ≤ dim·4.4e12 at unit scale — in-range to dim ~10⁶, and < 2⁵³ to
    dim ~2·10³ so the double casts below are exact too; the
    decimal(38,0) lane this replaced spent ~3× the scan in
    BigDecimal allocations (5.9 s → see OPTIMIZATION_r09.md).
    Zero-distance PAIRS are dropped (the `d2 > 0` filter), so a
    probe whose nearest neighbor is an exact duplicate still ranks
    its nearest NON-duplicate neighbors — a deliberate convention
    (not the textbook probe-discard) mirrored exactly in the
    oracle.

    Scale: the `knn_label_eval` posture — probe side capped at
    `max_probes` (a TakeOrdered, never a sample), so the distance
    join is O(max_probes·|corpus|), LINEAR in corpus size.

    Round-10 (guide §4.2): same GEMM lane as `knn_label_eval` — the
    probe×corpus squared distances run as |p|² + |x|² − 2·(P·Xᵀ) in
    one float64 GEMM per Arrow batch instead of an interpreted
    zip_with/aggregate per PAIR; each batch emits only its LOCAL
    top-2 per probe and the global window merges the
    O(max_probes · 2 · n_batches) candidates. Bit-exact: every term
    is an integer < 2⁵³ on the 1e6 grid (d² ≤ dim·4.4e12, the sum of
    three such terms < 3.7e14), so the GEMM arithmetic is exact and
    ranking stays a total order on exact integers (d² asc, vid
    asc) — identical to the pair-expression lane it replaces."""
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(1e6) + F.lit(0.5))
            .cast("long"),
        ).alias("q"),
    )
    probe_rows = (
        base.where(F.col("vid") % sample_mod == 0)
        .orderBy("vid")
        .limit(max_probes)
        .collect()
    )
    pids = np.array([r["vid"] for r in probe_rows], dtype=np.int64)
    pmat = np.array([r["q"] for r in probe_rows], dtype=np.float64)
    pnorm2 = (pmat * pmat).sum(axis=1)

    def local_top2(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            vids = pdf["vid"].to_numpy(dtype=np.int64)
            x = np.asarray(pdf["q"].tolist(), dtype=np.float64)
            xnorm2 = (x * x).sum(axis=1)
            # exact: every term integer-valued < 2^53
            d2 = pnorm2[:, None] + xnorm2[None, :] - 2.0 * (pmat @ x.T)
            o_p, o_v, o_d = [], [], []
            for i in range(len(pids)):
                row = d2[i]
                valid = (vids != pids[i]) & (row > 0)
                cv, cd = vids[valid], row[valid]
                top = np.lexsort((cv, cd))[: min(2, len(cd))]
                o_p.extend([pids[i]] * len(top))
                o_v.extend(cv[top])
                o_d.extend(cd[top].astype(np.int64))
            if o_p:
                yield pd.DataFrame({"pid": o_p, "vid": o_v, "d2": o_d})

    scored = base.mapInPandas(
        local_top2, schema="pid long, vid long, d2 long"
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("d2").asc(), F.col("vid").asc()
    )
    top2 = scored.select(
        "pid", "d2", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 2)
    per_probe = top2.groupBy("pid").agg(
        F.min(F.when(F.col("rn") == 1, F.col("d2"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("d2"))).alias("dd2"),
        F.count(F.lit(1)).alias("nn"),
    ).where(F.col("nn") == 2)
    lr = F.floor(
        F.log(
            F.col("dd2").cast("double") / F.col("d1").cast("double")
        )
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    agg = per_probe.select(lr.alias("lr")).agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("lr").cast("decimal(38,0)")).alias("sl"),
    )
    dim = (
        F.lit(2.0)
        * F.col("n_probes").cast("double")
        / (F.col("sl").cast("double") / F.lit(1e9))
    )
    return agg.select(
        F.coalesce(F.col("n_probes"), F.lit(0))
        .cast("long")
        .alias("n_probes"),
        F.when(F.col("sl") > 0, det_round(dim, 6)).alias(
            "intrinsic_dim"
        ),
    )
