"""Iterative Lloyd's k-means over an embedding column — the honest IVF
training path (q31's fixed deterministic sample is the zero-training
bootstrap; this refines those centroids).

Scale shape (the same one MLlib uses, minus its abstractions):

- centroids live on the DRIVER between iterations (k x dims doubles —
  kilobytes) and ship to executors in the task closure each pass.
- each iteration is ONE mapInPandas pass: every Arrow batch assigns its
  vectors to the nearest centroid with a single BLAS matmul and emits at
  most k rows of (centroid_id, partial_sum_vector, count) — the map-side
  combine that keeps shuffle volume at n_partitions * k rows regardless
  of corpus size. The tiny partials are merged driver-side in numpy.
- iteration count is FIXED (no convergence-dependent job count), so the
  whole fit is `iters` deterministic Spark jobs.

Determinism: init = the k lowest vec_ids (same rule as q31's sample);
argmin ties resolve to the lowest centroid id; partial sums add in
partition order, which is fixed for a given file layout — stable enough
for tests, while the registry entry is declared rows-only (iterative
algorithms are exactly the non-SQL-expressible case the driver's weaker
check exists for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fit k centroids; returns them as a plain list (driver-sized)."""
    import numpy as np

    init_rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    if not init_rows:
        raise ValueError("kmeans_fit: input DataFrame has no rows")
    # fewer rows than k: fit the clusters that exist (k is an upper bound)
    k = len(init_rows)
    centroids = np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows])

    for _ in range(iters):
        cents = centroids  # rebind for closure capture (self-contained)
        kk = cents.shape[0]

        def partials(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, 1]]
                )
                # squared euclidean via ||x||^2 - 2xC' + ||c||^2; argmin
                # ties -> lowest centroid id (np.argmin first-index rule)
                d = (
                    (mat * mat).sum(axis=1)[:, None]
                    - 2.0 * (mat @ cents.T)
                    + (cents * cents).sum(axis=1)[None, :]
                )
                a = d.argmin(axis=1)
                rows = []
                for c in range(kk):
                    mask = a == c
                    n = int(mask.sum())
                    if n:
                        rows.append(
                            {
                                "centroid_id": c,
                                "vec_sum": mat[mask].sum(axis=0).tolist(),
                                "n": n,
                            }
                        )
                yield pd.DataFrame(rows)

        part_rows = (
            emb.select(id_col, vec_col)
            .mapInPandas(partials, "centroid_id int, vec_sum array<double>, n long")
            .collect()
        )
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        # collect() row order follows partition report order, which is NOT
        # guaranteed (AQE, speculative tasks); sort the tiny partial list by
        # its full content so the float64 accumulation order — and hence the
        # fitted centroids — is deterministic by construction.
        for r in sorted(
            part_rows, key=lambda r: (r["centroid_id"], r["n"], tuple(r["vec_sum"]))
        ):
            sums[r["centroid_id"]] += np.asarray(r["vec_sum"])
            counts[r["centroid_id"]] += r["n"]
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    return [c.tolist() for c in centroids]


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, sq_dist): map-side nearest-centroid assignment
    against driver-held centroids — zero shuffle."""

    def assign(batches):
        import numpy as np
        import pandas as pd

        cents = np.asarray(centroids, dtype=np.float64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf.iloc[:, 1]])
            d = (
                (mat * mat).sum(axis=1)[:, None]
                - 2.0 * (mat @ cents.T)
                + (cents * cents).sum(axis=1)[None, :]
            )
            a = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf.iloc[:, 0].to_numpy(),
                    "centroid_id": a.astype("int32"),
                    "sq_dist": d[np.arange(len(a)), a],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, "vec_id long, centroid_id int, sq_dist double"
    )
