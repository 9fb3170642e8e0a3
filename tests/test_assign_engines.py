"""Engine equality: literal-centroid vs arrow centroid assignment.

The round-4 verdict flagged the O(k·dim) literal plans in ivf_assign /
assign_with_centroid_cos / kmeans_fit_distributed as a Catalyst
plan-compile hazard at the k ≈ √N sizes derive_ivf_params prescribes for
N ≥ ~10⁶. engine='arrow' carries the centroid matrix as task data
(O(1) plan size in k) — these tests pin the contract that makes the
switch safe: BIT-IDENTICAL results, no tolerance, including the NULL /
zero-vector / float32-widening edges.
"""
from __future__ import annotations

import math
import random

import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from ocr_spark.operators.similarity import (
    assign_with_centroid_cos,
    ivf_assign,
    kmeans_fit_distributed,
    semantic_dedup,
)

DIM = 16
K = 5


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def cents():
    rng = random.Random(7)
    return [_unit([rng.gauss(0, 1) for _ in range(DIM)]) for _ in range(K)]


@pytest.fixture(scope="module")
def edge_vectors(spark):
    """float32 corpus + the edges: NULL vector, zero vector, a vector
    equal to a centroid-ish direction (near-tie stress)."""
    rng = random.Random(23)
    rows = [
        (i, [float(rng.gauss(0, 1)) for _ in range(DIM)]) for i in range(60)
    ]
    rows.append((60, None))  # NULL -> NULL cell both engines
    rows.append((61, [0.0] * DIM))  # zero -> cell 0, cos 0.0 both engines
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _by_id(rows, *cols):
    return {r["vec_id"] if "vec_id" in r else r["id"]: tuple(r[c] for c in cols)
            for r in rows}


def test_ivf_assign_engines_bit_equal(edge_vectors, cents):
    lit = ivf_assign(edge_vectors, cents).collect()
    arw = ivf_assign(edge_vectors, cents, engine="arrow").collect()
    assert _by_id(lit, "cell") == _by_id(arw, "cell")
    cells = _by_id(arw, "cell")
    assert cells[60] == (None,)  # NULL vector
    assert cells[61] == (0,)  # zero vector: first-max of all-zero scores


def test_assign_with_centroid_cos_engines_bit_equal(edge_vectors, cents):
    lit = assign_with_centroid_cos(edge_vectors, cents).collect()
    arw = assign_with_centroid_cos(
        edge_vectors, cents, engine="arrow"
    ).collect()
    # bit-identical doubles (the 6-dp round happens JVM-side either way),
    # identical cells, identical widened vd
    def key(rows):
        return {
            r["id"]: (
                r["cell"],
                r["centroid_cos"],
                tuple(r["vd"]) if r["vd"] is not None else None,
            )
            for r in rows
        }

    want, got = key(lit), key(arw)
    assert got == want
    assert got[60][0] is None and got[60][1] is None
    assert got[61][0] == 0 and got[61][1] == 0.0


def test_semantic_dedup_engine_passthrough(edge_vectors, cents):
    lit = sorted(
        map(tuple, semantic_dedup(edge_vectors, cents, threshold=0.5).collect())
    )
    arw = sorted(
        map(
            tuple,
            semantic_dedup(
                edge_vectors, cents, threshold=0.5, engine="arrow"
            ).collect(),
        )
    )
    assert lit == arw


def test_kmeans_engines_bit_equal(spark):
    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    lit = kmeans_fit_distributed(df, 4, iters=3, sample_n=16)
    arw = kmeans_fit_distributed(df, 4, iters=3, sample_n=16, engine="arrow")
    assert lit == arw  # bit-identical doubles, no tolerance


def test_rejects_unknown_engine(edge_vectors, cents):
    with pytest.raises(ValueError):
        ivf_assign(edge_vectors, cents, engine="numpy")
    with pytest.raises(ValueError):
        assign_with_centroid_cos(edge_vectors, cents, engine="numpy")
    with pytest.raises(ValueError):
        kmeans_fit_distributed(edge_vectors, 2, engine="numpy")


def test_arrow_rejects_ragged_and_wrong_dim(spark, cents):
    schema = "vec_id: long, embedding: array<double>"
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    bad_dim = spark.createDataFrame([(1, [1.0, 2.0])], schema)
    with pytest.raises((PythonException, Py4JJavaError)):
        ivf_assign(bad_dim, cents, engine="arrow").collect()
    with pytest.raises(ValueError):
        ivf_assign(bad_dim, [], engine="arrow")


def test_auto_engine_resolves_by_literal_count():
    """'auto' (the default) picks literal below the k·dim compile-cliff
    boundary and arrow above it — so derive_ivf_params-sized quantizers
    (k ≈ √N) are safe by default while every shipped small-k call keeps
    its codegen-able literal plan."""
    from ocr_spark.operators.similarity import (
        _AUTO_ARROW_LITERALS,
        _resolve_engine,
    )

    dim = 64
    small = [[0.0] * dim for _ in range(_AUTO_ARROW_LITERALS // dim - 1)]
    # the boundary itself is the measured 28x point (k=256, dim=64 in
    # BENCH/assign_engines.json) — inclusive, it resolves to arrow
    at_boundary = small + [[0.0] * dim]
    assert _resolve_engine("auto", small) == "literal"
    assert _resolve_engine("auto", at_boundary) == "arrow"
    # explicit choices pass through regardless of size
    assert _resolve_engine("literal", at_boundary) == "literal"
    assert _resolve_engine("arrow", small) == "arrow"
    with pytest.raises(ValueError):
        _resolve_engine("numpy", small)


def test_auto_engine_default_plan_shape(edge_vectors, cents):
    """With the shipped small quantizer the default engine stays literal:
    no ArrowEvalPython node appears in the assignment plan (the zero-
    Python codegen path the plan dumps pin)."""
    plan = ivf_assign(edge_vectors, cents)._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in plan


def test_null_element_and_nan_parity(spark, cents):
    """A NULL *element* inside a vector null-propagates to NULL cell/cos
    in the literal engine; the arrow engine must match even though the
    Arrow->pandas transfer erases the null-vs-NaN distinction (flag
    computed JVM-side). A genuine NaN value yields cell 0 with a NaN
    (not NULL) cosine in BOTH engines."""
    from pyspark.sql.types import DoubleType

    rows = [
        (0, [0.1 if j != 3 else None for j in range(DIM)]),  # null element
        (1, [float("nan") if j == 0 else 0.1 for j in range(DIM)]),  # NaN
        (2, [0.1] * DIM),  # control
    ]
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = {}
    for eng in ("literal", "arrow"):
        out[eng] = {
            r["id"]: (r["cell"], r["centroid_cos"])
            for r in assign_with_centroid_cos(df, cents, engine=eng).collect()
        }
    for eng in ("literal", "arrow"):
        assert out[eng][0] == (None, None), eng  # null element -> NULL row
        cell, cos = out[eng][1]
        assert cell == 0 and math.isnan(cos), eng  # NaN stays NaN, not NULL
    assert out["literal"][2] == out["arrow"][2]
    cells_lit = {r["vec_id"]: r["cell"]
                 for r in ivf_assign(df, cents, engine="literal").collect()}
    cells_arw = {r["vec_id"]: r["cell"]
                 for r in ivf_assign(df, cents, engine="arrow").collect()}
    assert cells_lit == cells_arw == {0: None, 1: 0, 2: cells_lit[2]}
