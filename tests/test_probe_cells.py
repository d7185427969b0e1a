"""r14 probe-cell expansion parity: _explode_probe_cells must emit exactly
the rows of the direct explode(slice(array_sort(cells))["cell"]) form —
same cells, same multiplicity — including the n_probe > n_cells edge where
slice emits fewer than n_probe rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.operators.similarity import (
    _explode_probe_cells,
)


def _cells_expr(centroids):
    def dist_to(center):
        arr = F.array(*[F.lit(x) for x in center])
        return F.aggregate(
            F.zip_with(F.col("qv"), arr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    return F.array(
        *[
            F.struct(dist_to(ctr).alias("d"), F.lit(i).alias("cell"))
            for i, ctr in enumerate(centroids)
        ]
    )


def _q(spark):
    rows = [(i, [float(i), float(3 - i)]) for i in range(4)]
    return spark.createDataFrame(rows, "qid bigint, qv array<double>")


def test_probe_cells_match_direct_form(spark):
    centroids = [[0.0, 0.0], [1.0, 2.0], [3.0, 0.5]]
    for n_probe in (1, 2, 3, 5):  # 5 > n_cells exercises the size guard
        cells = _cells_expr(centroids)
        direct = (
            _q(spark)
            .withColumn(
                "cell", F.explode(F.slice(F.array_sort(cells), 1, n_probe)["cell"])
            )
            .select("qid", "cell")
            .collect()
        )
        staged = (
            _explode_probe_cells(_q(spark), _cells_expr(centroids), n_probe)
            .select("qid", "cell")
            .collect()
        )
        assert sorted(map(tuple, staged)) == sorted(map(tuple, direct)), n_probe
