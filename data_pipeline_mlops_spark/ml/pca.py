"""PCA dimensionality reduction for the embedding tier (Spark ML).

The second `pyspark.ml` surface next to ALS (ml/als.py): a fitted
`PCA(k)` model projects the `array<float>` embedding column into a
k-dim subspace before similarity search. At 100 TB this is a real
lever, not a demo — every downstream ANN stage (brute-force scoring,
LSH bucketing, IVF probing) moves k/d fewer bytes through broadcast
and shuffle (64 -> 16 dims = 4x), and the reduced vectors keep
neighbor structure (recall gate in tests/test_ml.py).

Determinism: Spark ML PCA solves an eigendecomposition whose float
reduction order varies with partitioning, and eigenvectors carry a
sign ambiguity — so, like ALS, the registry entry (`ann_pca_topk`) is
rows/schema-checked and the VALUE gates live in the eval harness:
recall@k of the PCA-space top-k against the exact full-dim top-k, and
a PCAModel save/load roundtrip serving identical rows.

Spark shape: `array_to_vector` -> `PCA.transform` (JVM matrix
multiply, no Python in the loop) -> `vector_to_array`; the projected
frame feeds the existing similarity operators unchanged
(functions/similarity.py::brute_force_topk and the LSH/IVF tiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_VEC_IN = "__pca_in"
_VEC_OUT = "__pca_out"


def fit_pca(df: DataFrame, *, vec_col: str, k: int):
    """Fit a `pyspark.ml.feature.PCA` on the array-typed embedding
    column; returns the fitted PCAModel (inputCol/outputCol are
    module-internal names so any frame can be projected later)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector

    train = df.select(
        array_to_vector(
            F.col(vec_col).cast("array<double>")
        ).alias(_VEC_IN)
    )
    return PCA(k=k, inputCol=_VEC_IN, outputCol=_VEC_OUT).fit(train)


def pca_project(
    model,
    df: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    out_col: str = "pvec",
) -> DataFrame:
    """(id_col, out_col) with out_col = the k-dim projection as
    array<double> — ready for the array-based similarity operators."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    t = df.select(
        F.col(id_col),
        array_to_vector(
            F.col(vec_col).cast("array<double>")
        ).alias(_VEC_IN),
    )
    return model.transform(t).select(
        F.col(id_col),
        vector_to_array(F.col(_VEC_OUT)).alias(out_col),
    )
