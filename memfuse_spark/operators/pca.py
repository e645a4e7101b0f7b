"""Distributed PCA (top principal component) over an embedding column.

The scalable split is MLlib's own: the DATA-sized work — the d×d
covariance Gramian — is a single Spark scan with map-side-combined
aggregation (one shuffle of at most partitions × d² partial products);
the d-sized work — eigenextraction — is deterministic power iteration on
the driver over the 64×64 matrix (4 KB), the same "Gramian distributed,
eigen local" shape as RowMatrix.computePrincipalComponents, but
reproducible: fixed start vector, fixed iteration count, deterministic
sign convention — so a DuckDB oracle can recompute it independently
(chained mat-vec CTEs). Power iteration CONVERGES, so low-bit float
differences between engines damp instead of amplifying; outputs round
to 5 decimals.

Uses: embedding whitening/decorrelation diagnostics, drift detection
between corpus snapshots (compare loadings), and the first step of an
IVF-style dimensionality split. No reference analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 100 iterations: the synthetic embeddings are near-isotropic (top
# eigengap ratio ~0.99 — power iteration's worst case); real embedding
# spectra converge in ~10. The cost is a driver loop over a d×d matrix
# and d²-row CTE stages in the oracle — both trivial.
PCA_ITERATIONS = 100


def covariance_entries(
    items: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, cov) — the d×d covariance via one scan: Arrow-batched
    partial Gramians (each task matmuls its batch, X_b^T X_b — the
    vectorized kernel, same precedent as pairwise_scores_blocked) that
    reduce in a d²-row keyed aggregation; means subtracted at the end
    (E[xy] − E[x]E[y]). Shuffle volume is partitions × d² partials,
    independent of row count."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            g = x.T @ x
            d = g.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            # column sums ride the same batch as j = -1 rows, so the
            # means need no second corpus scan
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(d)]).astype("int32"),
                    "j": np.concatenate(
                        [jj.ravel(), np.full(d, -1)]
                    ).astype("int32"),
                    "sp": np.concatenate([g.ravel(), x.sum(axis=0)]),
                    "n": np.full(d * d + d, len(pdf), dtype="int64"),
                }
            )

    from memfuse_spark import cache

    # generation-scoped persist (cache.py): sums and means both read the
    # partials, which would otherwise re-run the Gramian pass twice; the
    # next PCA call releases this generation
    cache.begin("pca.partials")
    partials = cache.scoped_persist(
        items.select(vec_col)
        .mapInPandas(gram, "i int, j int, sp double, n long")
        .groupBy("i", "j")
        .agg(F.sum("sp").alias("sp"), F.sum("n").alias("n")),
        "pca.partials",
    )
    sums = partials.filter(F.col("j") >= 0)
    means = partials.filter(F.col("j") == -1).select(
        "i", (F.col("sp") / F.col("n")).alias("m")
    )
    mi = means.select(F.col("i"), F.col("m").alias("mi"))
    mj = means.select(F.col("i").alias("j"), F.col("m").alias("mj"))
    return (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i", "j",
            (F.col("sp") / F.col("n") - F.col("mi") * F.col("mj")).alias("cov"),
        )
    )


def _power_iteration(cov: dict, d: int, iters: int) -> tuple[list, float]:
    """Deterministic driver-side power iteration over the tiny d×d
    matrix (ascending-index summation order, fixed uniform start)."""
    v = [1.0 / (d ** 0.5)] * d
    for _ in range(iters):
        w = [sum(cov.get((i, j), 0.0) * v[j] for j in range(d)) for i in range(d)]
        norm = sum(x * x for x in w) ** 0.5
        v = [x / norm for x in w]
    eig = sum(
        v[i] * sum(cov.get((i, j), 0.0) * v[j] for j in range(d))
        for i in range(d)
    )
    return v, eig


def pca_top_component(
    items: DataFrame, vec_col: str = "embedding", iters: int = PCA_ITERATIONS
) -> DataFrame:
    """(pos, loading, eigenvalue, variance_share) — the dominant
    principal direction, its eigenvalue, and its share of total
    variance (trace). Sign convention: the largest-|loading| component
    is positive."""
    spark = items.sparkSession
    entries = covariance_entries(items, vec_col).collect()
    cov = {(r["i"], r["j"]): r["cov"] for r in entries}
    d = max(i for i, _ in cov) + 1
    v, eig = _power_iteration(cov, d, iters)
    flip = max(range(d), key=lambda i: abs(v[i]))
    if v[flip] < 0:
        v = [-x for x in v]
    trace = sum(cov.get((i, i), 0.0) for i in range(d))
    rows = [
        (i, round(v[i], 5), round(eig, 5), round(eig / trace, 5))
        for i in range(d)
    ]
    return spark.createDataFrame(
        rows, "pos int, loading double, eigenvalue double, variance_share double"
    )


def pca_top_component_sql(
    iters: int = PCA_ITERATIONS, table: str = "embeddings",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin: covariance via lateral double-unnest, then ``iters``
    chained mat-vec CTEs (same fixed start, same sign convention)."""
    arr = f"CAST({vec_col} AS DOUBLE[])"
    parts = [
        f"""cov AS MATERIALIZED (
  SELECT i, j, sum(p) / count(*) - avg_i * avg_j AS cov
  FROM (
    SELECT ti.i AS i, tj.j AS j,
           v[ti.i] * v[tj.j] AS p
    FROM (SELECT {arr} AS v FROM {table}),
         unnest(range(1, 1 + len(v))) AS ti(i),
         unnest(range(1, 1 + len(v))) AS tj(j)
  )
  JOIN (SELECT i, avg(x) AS avg_i
        FROM (SELECT unnest({arr}) AS x,
                     generate_subscripts({arr}, 1) AS i FROM {table})
        GROUP BY i) USING (i)
  JOIN (SELECT i AS j, avg(x) AS avg_j
        FROM (SELECT unnest({arr}) AS x,
                     generate_subscripts({arr}, 1) AS i FROM {table})
        GROUP BY i) USING (j)
  GROUP BY i, j, avg_i, avg_j
)""",
        """dim AS (SELECT max(i) AS d FROM cov)""",
        """v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt(d) AS x FROM cov, dim
  WHERE j = 1)""",
    ]
    prev = "v0"
    for k in range(1, iters + 1):
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT cov.i AS i, sum(cov.cov * {prev}.x) AS x
  FROM cov JOIN {prev} ON cov.j = {prev}.i
  GROUP BY cov.i
),
v{k} AS MATERIALIZED (
  SELECT i, x / sqrt((SELECT sum(x * x) FROM w{k})) AS x FROM w{k}
)"""
        )
        prev = f"v{k}"
    parts.append(
        f"""signfix AS (
  SELECT CASE WHEN (SELECT x FROM {prev}
                    ORDER BY abs(x) DESC, i ASC LIMIT 1) < 0
              THEN -1.0 ELSE 1.0 END AS s
)""",
        )
    parts.append(
        f"""eig AS (
  SELECT sum(a.x * cov.cov * b.x) AS e
  FROM {prev} a JOIN cov ON cov.i = a.i JOIN {prev} b ON cov.j = b.i
)""",
    )
    parts.append(
        """tr AS (SELECT sum(cov) AS t FROM cov WHERE i = j)""",
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(i - 1 AS INTEGER) AS pos,
       round(x * s, 5) AS loading,
       round(e, 5) AS eigenvalue,
       round(e / t, 5) AS variance_share
FROM {prev}, signfix, eig, tr
ORDER BY pos
"""
    )


def pca_components(
    items: DataFrame,
    n_components: int = 3,
    vec_col: str = "embedding",
    iters: int = PCA_ITERATIONS,
) -> DataFrame:
    """(component, pos, loading, eigenvalue, variance_share) — the top
    n principal components via Hotelling deflation: extract the
    dominant eigenpair, subtract λ·vvᵀ from the (driver-local, d×d)
    covariance, repeat. The corpus is scanned ONCE (the Gramian);
    every further component costs only driver arithmetic.

    Oracle note: `pca_top` hash-checks component 1 (same covariance,
    same iteration); deflation is verified against numpy.linalg.eigh in
    tests — a 100-iteration×n-component CTE chain would be a parser
    stress test, not a better check."""
    spark = items.sparkSession
    entries = covariance_entries(items, vec_col).collect()
    cov = {(r["i"], r["j"]): r["cov"] for r in entries}
    d = max(i for i, _ in cov) + 1
    trace = sum(cov.get((i, i), 0.0) for i in range(d))
    rows = []
    for comp in range(1, n_components + 1):
        v, eig = _power_iteration(cov, d, iters)
        flip = max(range(d), key=lambda i: abs(v[i]))
        if v[flip] < 0:
            v = [-x for x in v]
        rows.extend(
            (comp, i, round(v[i], 5), round(eig, 5), round(eig / trace, 5))
            for i in range(d)
        )
        for i in range(d):
            for j in range(d):
                cov[(i, j)] = cov.get((i, j), 0.0) - eig * v[i] * v[j]
    return spark.createDataFrame(
        rows,
        "component int, pos int, loading double, eigenvalue double,"
        " variance_share double",
    )


def embedding_drift(
    items_a: DataFrame, items_b: DataFrame, vec_col: str = "embedding",
    iters: int = PCA_ITERATIONS,
) -> DataFrame:
    """One row: (loading_cosine, eig_ratio, mean_shift) — has the
    embedding DISTRIBUTION moved between two corpus snapshots (model
    upgrade, domain mix change, pipeline regression)?

    - loading_cosine: |cos| between the snapshots' top principal
      directions (1.0 = same dominant axis of variation)
    - eig_ratio: top-eigenvalue ratio b/a (variance scale change)
    - mean_shift: L2 distance between mean vectors

    Each snapshot costs one Gramian scan; the comparison is driver
    arithmetic on two d-vectors. Complements value_drift_psi (scalar
    distributions) for the vector column."""
    def summarize(items):
        entries = covariance_entries(items, vec_col).collect()
        cov = {(r["i"], r["j"]): r["cov"] for r in entries}
        d = max(i for i, _ in cov) + 1
        v, eig = _power_iteration(cov, d, iters)
        # means were computed inside covariance_entries' single scan;
        # recover them from a tiny dedicated agg over the same items
        m = [
            r["m"]
            for r in items.select(
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("i", "x")
            )
            .groupBy("i")
            .agg(F.avg("x").alias("m"))
            .orderBy("i")
            .collect()
        ]
        return v, eig, m

    va, ea, ma = summarize(items_a)
    vb, eb, mb = summarize(items_b)
    cos = abs(sum(x * y for x, y in zip(va, vb))) / (
        (sum(x * x for x in va) ** 0.5) * (sum(y * y for y in vb) ** 0.5)
    )
    shift = sum((x - y) ** 2 for x, y in zip(ma, mb)) ** 0.5
    spark = items_a.sparkSession
    return spark.createDataFrame(
        [(round(cos, 5), round(eb / ea, 5), round(shift, 6))],
        "loading_cosine double, eig_ratio double, mean_shift double",
    )
