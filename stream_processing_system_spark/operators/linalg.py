"""Distributed deterministic linear algebra: power-iteration PCA.

Top principal component of an embedding table by power iteration on
the (mean-centered) Gram operator: v ← normalize(Cᵀ(C v)). Each
iteration is two data-sized aggregates — y_i = <c_i, v> per row, then
z_d = Σ_i y'_i·c_i[d] per dimension — exactly the map/reduce shape a
1000-executor Gramian uses; only the 64-component iterate v crosses
the driver (constant size, the IVF-centroid pattern).

Determinism (the integer-grid PageRank device, applied to PCA):
every quantity in the iteration is an EXACT integer carried in
int64/double —

- inputs quantized to a 1e4 grid; the mean is floor-divided onto the
  same grid before centering (an O(1e-4) approximation, documented);
- y_i is an exact integer dot product; it is floor-rescaled
  (y' = floor(y/1e3)) so the next product stays within exact-double
  range at any row count up to ~1e5 per the bound in `pca_top_component`
  (rescale harder for bigger corpora — one constant);
- z_d is an exact integer sum, so NO aggregation-order dependence
  anywhere in the data-sized stages;
- the only inexact steps (norm fold, final grid projection) run in a
  FIXED operand order on both engines: the norm is a left fold over
  z² in dimension order, and v_next[d] = floor(z_d·grid/norm + 0.5).

The result hash-matches an 8-iteration unrolled SQL mirror — a
property no floating-point PCA has.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_top_component(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 8,
    grid: int = 10_000,
    y_scale: int = 1_000,
) -> DataFrame:
    """Top principal component as (d, loading) rows, loadings on a
    1/grid grid, sign fixed so the first nonzero loading is positive.

    Exactness bounds (all intermediates exactly representable):
    |c| <= ~2·grid, |y| <= dim·2·grid·grid ~ 1.3e10,
    |y'| <= 1.3e7, |z| <= n·1.3e7·2e4 — exact in double up to
    n ~ 3·1e5 rows at these constants; larger corpora raise
    `y_scale` (one knob, same algorithm)."""
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
    cl = (
        cl_raw.join(F.broadcast(m), "d")
        .select("_id", "d", (F.col("q") - F.col("m")).alias("c"))
        .cache()
    )
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
    sign = 1.0
    for x in v:
        if x != 0.0:
            sign = -1.0 if x < 0 else 1.0
            break
    cl.unpersist()
    rows = [(d, (sign * v[d]) / grid) for d in range(dim)]
    return spark.createDataFrame(rows, "d int, loading double")
