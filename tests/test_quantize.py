"""int8 embedding quantization tests (SURVEY §2.8 X64)."""
from __future__ import annotations

import contextlib
import io

import pytest

from ocr_spark.operators.similarity import quantize_embeddings


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, -2.0, 0.5, 4.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector
        (3, None),                    # NULL vector
        (4, [-3.0]),                  # single negative component
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def test_quantize_reference(vecs):
    import math

    out = {r["id"]: r for r in quantize_embeddings(vecs).collect()}
    v1 = out[1]
    assert v1["dim"] == 4 and v1["max_abs"] == 4.0
    expect = [
        int(math.floor(x * 127.0 / 4.0 + 0.5)) for x in (1.0, -2.0, 0.5, 4.0)
    ]
    assert v1["qvec"] == expect
    # the max-magnitude component always hits ±127 exactly
    assert max(abs(q) for q in v1["qvec"]) == 127
    assert out[4]["qvec"] == [-127]
    # round-trip error bounded by half a quantization step
    step = v1["max_abs"] / 127.0
    for x, q in zip([1.0, -2.0, 0.5, 4.0], v1["qvec"]):
        assert abs(q * step - x) <= step / 2 + 1e-12


def test_quantize_zero_and_null_vectors(vecs):
    out = {r["id"]: r for r in quantize_embeddings(vecs).collect()}
    z = out[2]
    assert z["max_abs"] == 0.0 and z["qvec"] == [0, 0, 0, 0]
    n = out[3]
    assert n["dim"] is None and n["max_abs"] is None and n["qvec"] is None


def test_quantize_is_narrow(vecs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        quantize_embeddings(vecs).explain("formatted")
    plan = buf.getvalue()
    for node in ("Exchange", "Window", "Join", "ArrowEvalPython",
                 "BatchEvalPython"):
        assert node not in plan
