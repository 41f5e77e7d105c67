"""Distributed deterministic linear algebra: power-iteration PCA.

Top principal components of an embedding table by power iteration on
the (mean-centered) Gram operator: v ← normalize(Cᵀ(C v)), with
further components obtained by integer-grid DEFLATION (subtract each
row's projection onto the previous component, floored back onto the
grid). Each iteration is two data-sized aggregates — y_i = <c_i, v>
per row, then z_d = Σ_i y'_i·c_i[d] per dimension — exactly the
map/reduce shape a 1000-executor Gramian uses; only the
64-component iterate v crosses the driver (constant size, the
IVF-centroid pattern).

Determinism (the integer-grid PageRank device, applied to PCA):
every quantity in the iteration is an EXACT integer carried in
int64/double —

- inputs quantized to a 1e4 grid; the mean is floor-divided onto the
  same grid before centering (an O(1e-4) approximation, documented);
- y_i is an exact integer dot product; it is floor-rescaled
  (y' = floor(y/1e3)) so the next product stays within exact-double
  range at any row count up to ~1e5 per the bound in
  `pca_components` (rescale harder for bigger corpora — one
  constant);
- z_d is an exact integer sum, so NO aggregation-order dependence
  anywhere in the data-sized stages;
- the only inexact steps (norm fold, final grid projection) run in a
  FIXED operand order on both engines: the norm is a left fold over
  z² in dimension order, and v_next[d] = floor(z_d·grid/norm + 0.5);
- deflation is exact: c2[d] = c[d] − floor(y·v[d]/(v·v) + 0.5),
  all integer-valued operands.

The result hash-matches an unrolled SQL mirror of every iteration —
a property no floating-point PCA has.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _power_iterate(cl, dim: int, iters: int, grid: int, y_scale: int):
    """Run `iters` power iterations over a centered long-format frame
    (_id, d, c); returns the final grid iterate v as a python list
    (constant-size driver data, the IVF-centroid pattern)."""
    v = [float(grid)] * dim
    for _ in range(iters):
        varr = F.array(*[F.lit(x) for x in v])
        y = (
            cl.withColumn("_vd", F.element_at(varr, F.col("d") + 1))
            .groupBy("_id")
            .agg(F.sum(F.col("c") * F.col("_vd")).alias("y"))
        )
        yp = y.select("_id", F.floor(F.col("y") / y_scale).alias("yp"))
        z = (
            cl.join(yp, "_id")
            .groupBy("d")
            .agg(F.sum(F.col("c") * F.col("yp")).alias("z"))
        )
        zmap = {r["d"]: float(r["z"]) for r in z.collect()}
        zs = [zmap.get(d, 0.0) for d in range(dim)]
        s = 0.0
        for d in range(dim):  # fixed-order left fold, mirrored in SQL
            s = s + zs[d] * zs[d]
        norm = math.sqrt(s)
        if norm == 0.0:
            break
        v = [float(math.floor(zd * float(grid) / norm + 0.5)) for zd in zs]
    return v


def _sign_fixed(v):
    for x in v:
        if x != 0.0:
            return [-y for y in v] if x < 0 else list(v)
    return list(v)


def pca_components(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 1,
    iters: int = 8,
    grid: int = 10_000,
    y_scale: int = 1_000,
) -> DataFrame:
    """Top `n_components` principal components as (component, d,
    loading) rows (component 1-based), loadings on a 1/grid grid,
    each component's sign fixed so its first nonzero loading is
    positive.

    Exactness bounds (all intermediates exactly representable):
    |c| <= ~2·grid, |y| <= dim·2·grid·grid ~ 1.3e10,
    |y'| <= 1.3e7, |z| <= n·1.3e7·2e4 — exact in double up to
    n ~ 3·1e5 rows at these constants; larger corpora raise
    `y_scale` (one knob, same algorithm). Deflation doubles the |c|
    bound per extracted component."""
    spark = df.sparkSession
    # cast each float32 element to double BEFORE scaling: float32
    # arithmetic would round differently than the SQL mirror's
    # double path (float->double conversion itself is exact)
    q = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * grid + F.lit(0.5))
    )
    base = df.select(F.col(id_col).alias("_id"), q.alias("_q"))
    cl_raw = base.select("_id", F.posexplode("_q").alias("d", "q"))
    m = cl_raw.groupBy("d").agg(
        F.floor(F.sum("q") / F.count(F.lit(1))).alias("m")
    )
    # the long-format centered frame is rows x dim cells but each
    # power-iteration action only aggregates it — 4 partitions keeps
    # the 16 sequential mat-vec jobs from paying 32-task scheduling
    # overhead each (the frame is O(n*dim) cells, repartition before
    # cache so every downstream job reads the compact layout)
    cl = (
        cl_raw.join(F.broadcast(m), "d")
        .select("_id", "d", (F.col("q") - F.col("m")).alias("c"))
        .repartition(4, "_id")
        .cache()
    )
    rows = []
    comp = 1
    while True:
        v = _power_iterate(cl, dim, iters, grid, y_scale)
        vf = _sign_fixed(v)
        rows += [(comp, d, vf[d] / grid) for d in range(dim)]
        if comp == n_components:
            break
        # integer-grid deflation: subtract each row's (floored)
        # projection onto v — c and the projection are exact ints
        vv = 0.0
        for x in v:  # fixed-order fold; exact (<= dim * grid^2)
            vv = vv + x * x
        varr = F.array(*[F.lit(x) for x in v])
        y = (
            cl.withColumn("_vd", F.element_at(varr, F.col("d") + 1))
            .groupBy("_id")
            .agg(F.sum(F.col("c") * F.col("_vd")).alias("y"))
        )
        nxt = (
            cl.join(y, "_id")
            .select(
                "_id",
                "d",
                (
                    F.col("c")
                    - F.floor(
                        F.col("y")
                        * F.element_at(varr, F.col("d") + 1)
                        / F.lit(vv)
                        + F.lit(0.5)
                    )
                ).alias("c"),
            )
            .cache()
        )
        nxt.count()  # materialize before dropping the parent
        cl.unpersist()
        cl = nxt
        comp += 1
    cl.unpersist()
    return spark.createDataFrame(rows, "component int, d int, loading double")


def pca_top_component(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 8,
    grid: int = 10_000,
    y_scale: int = 1_000,
) -> DataFrame:
    """Top principal component as (d, loading) rows — the
    single-component view of `pca_components` (same math, same
    oracle)."""
    return pca_components(
        df,
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        n_components=1,
        iters=iters,
        grid=grid,
        y_scale=y_scale,
    ).select("d", "loading")


def als_factorize(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "r",
    rounds: int = 2,
    reg: float = 0.1,
) -> tuple[DataFrame, DataFrame]:
    """Rank-2 alternating least squares (Koren/Hu-style explicit
    ALS): item factors initialize from md5-derived uniforms in [0,1)
    (deterministic, engine-portable), then `rounds` alternations of
    the closed-form ridge solves — per user
    (Σ vvᵀ + λI)x = Σ r·v over that user's rated items, then the
    symmetric item step. Rank 2 keeps each solve a literal 2×2
    Cramer inverse, so the WHOLE optimizer is joins + aggregates —
    no driver round-trips at all (cf. the k-means/IRLS trainers,
    which pull a constant-size codebook per round; here even that is
    avoided because the normal matrix is per-ROW of the factor
    frame).

    Determinism contract: factors live on the 1e-6 grid after every
    solve; every summed moment term (v·v, r·v products) is floored
    per-row onto the 1e-6 grid as BIGINT before the exact integer
    sum, so each step is bit-reproducible across engines and
    partitionings, and the DuckDB oracle unrolls the identical
    rounds.

    Scale shape per step: one join of the ratings against the
    (small, per-entity) factor frame + one groupBy — the classic
    distributed-ALS layout where only factor vectors shuffle, never
    the ratings twice. Returns (user_factors(user,u1,u2),
    item_factors(item,v1,v2))."""
    from stream_processing_system_spark.functions.scalar import (
        md5_prefix_long,
    )

    lam = float(reg)

    def init_items(items: DataFrame) -> DataFrame:
        sid = F.col(item_col).cast("string")
        return items.select(
            item_col,
            (
                (md5_prefix_long(sid, salt="als1|") % F.lit(1_000_000)).cast(
                    "double"
                )
                / F.lit(1e6)
            ).alias("v1"),
            (
                (md5_prefix_long(sid, salt="als2|") % F.lit(1_000_000)).cast(
                    "double"
                )
                / F.lit(1e6)
            ).alias("v2"),
        )

    def q6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    def solve_step(
        facs: DataFrame, fixed_col: str, solve_col: str
    ) -> DataFrame:
        """One ridge solve: factors of `fixed_col` entities are known
        (frame `facs` with f1/f2), produce factors for `solve_col`."""
        j = ratings.join(
            facs.select(
                F.col(fixed_col),
                F.col("v1").alias("f1"),
                F.col("v2").alias("f2"),
            ),
            fixed_col,
        )
        rd = F.col(rating_col).cast("double")
        m = j.groupBy(solve_col).agg(
            F.sum(q6(F.col("f1") * F.col("f1"))).alias("a11"),
            F.sum(q6(F.col("f1") * F.col("f2"))).alias("a12"),
            F.sum(q6(F.col("f2") * F.col("f2"))).alias("a22"),
            F.sum(q6(rd * F.col("f1"))).alias("b1"),
            F.sum(q6(rd * F.col("f2"))).alias("b2"),
        )
        a11 = F.col("a11").cast("double") / F.lit(1e6) + F.lit(lam)
        a12 = F.col("a12").cast("double") / F.lit(1e6)
        a22 = F.col("a22").cast("double") / F.lit(1e6) + F.lit(lam)
        b1 = F.col("b1").cast("double") / F.lit(1e6)
        b2 = F.col("b2").cast("double") / F.lit(1e6)
        det = a11 * a22 - a12 * a12
        x1 = (b1 * a22 - a12 * b2) / det
        x2 = (a11 * b2 - a12 * b1) / det
        return m.select(
            solve_col,
            (q6(x1).cast("double") / F.lit(1e6)).alias("v1"),
            (q6(x2).cast("double") / F.lit(1e6)).alias("v2"),
        ).localCheckpoint(eager=True)

    if rounds < 1:
        raise ValueError(f"als_factorize needs rounds >= 1, got {rounds}")
    items = ratings.select(item_col).distinct()
    v = init_items(items).localCheckpoint(eager=True)
    u = None
    for _ in range(rounds):
        u = solve_step(v, item_col, user_col)
        v = solve_step(
            u.select(
                F.col(user_col), F.col("v1"), F.col("v2")
            ),
            user_col,
            item_col,
        )
    return (
        u.select(
            user_col, F.col("v1").alias("u1"), F.col("v2").alias("u2")
        ),
        v,
    )
