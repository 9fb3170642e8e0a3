"""Distributed spherical k-means trainer (kmeans_fit_distributed).

The determinism contract is the whole point: fixed-point accumulation
makes the distributed mean an exact integer sum, so training must be
bit-identical (a) to a sequential pure-Python reference and (b) across
arbitrary repartitionings of the input.
"""
from __future__ import annotations

import math
import random

import pytest

from ocr_spark.operators.similarity import kmeans_fit_distributed

DIM = 5


def _kmeans_ref(vecs, n_cells, iters, scale_bits, sample_n):
    """Sequential reference with the operator's exact IEEE op order:
    index-order norm fold, x/n unit, floor(u*s+0.5) quantize, first-max
    assignment, integer sums, sum/(s*cnt) mean, index-order re-norm."""
    scale = float(1 << scale_bits)
    units = []
    for i in sorted(vecs):
        v = vecs[i]
        if v is None:
            continue
        acc = 0.0
        for x in v:
            acc = acc + x * x
        n = math.sqrt(acc)
        if n > 0.0:
            units.append((i, [x / n for x in v]))
    cents = []
    seen = set()
    for _, u in units[:sample_n]:
        key = tuple(u)
        if key not in seen:
            seen.add(key)
            cents.append(list(u))
        if len(cents) == n_cells:
            break
    assert len(cents) == n_cells
    q = {i: [math.floor(x * scale + 0.5) for x in u] for i, u in units}
    dim = len(units[0][1])
    for _ in range(iters):
        sums = [[0] * dim for _ in range(n_cells)]
        cnts = [0] * n_cells
        for i, u in units:
            scores = []
            for cent in cents:
                acc = 0.0
                for a, b in zip(u, cent):
                    acc = acc + a * b
                scores.append(acc)
            cell = scores.index(max(scores))
            cnts[cell] += 1
            for j, val in enumerate(q[i]):
                sums[cell][j] += val
        nxt = [list(r) for r in cents]
        for cell in range(n_cells):
            if cnts[cell] == 0:
                continue
            mean = [sums[cell][j] / (scale * cnts[cell]) for j in range(dim)]
            acc = 0.0
            for x in mean:
                acc = acc + x * x
            nn = math.sqrt(acc)
            if nn > 0.0:
                nxt[cell] = [x / nn for x in mean]
        cents = nxt
    return cents


@pytest.fixture(scope="module")
def train_vecs():
    rng = random.Random(3)
    vecs = {
        i: [rng.gauss(0.0, 1.0) for _ in range(DIM)] for i in range(20)
    }
    vecs[20] = list(vecs[0])          # exact duplicate: seed init must skip
    vecs[21] = [0.0] * DIM            # zero vector: excluded
    vecs[22] = None                   # NULL vector: excluded
    return vecs


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id: long, embedding: array<double>"
    )


def test_matches_sequential_reference_exactly(spark, train_vecs):
    got = kmeans_fit_distributed(
        _df(spark, train_vecs), 3, iters=4, scale_bits=20, sample_n=16
    )
    want = _kmeans_ref(train_vecs, 3, iters=4, scale_bits=20, sample_n=16)
    assert got == want  # bit-identical doubles, no tolerance


def test_partitioning_does_not_change_the_result(spark, train_vecs):
    df = _df(spark, train_vecs)
    one = kmeans_fit_distributed(df.repartition(1), 3, iters=3, sample_n=16)
    many = kmeans_fit_distributed(df.repartition(7), 3, iters=3, sample_n=16)
    assert one == many


def test_centroids_are_unit_and_distinct(spark, train_vecs):
    cents = kmeans_fit_distributed(_df(spark, train_vecs), 3, iters=4, sample_n=16)
    assert len(cents) == 3
    assert len({tuple(c) for c in cents}) == 3
    for c in cents:
        assert math.sqrt(sum(x * x for x in c)) == pytest.approx(1.0, abs=1e-12)


def test_trained_centroids_compose_with_assignment(spark, train_vecs):
    from ocr_spark.operators.similarity import assign_with_centroid_cos

    df = _df(spark, train_vecs)
    cents = kmeans_fit_distributed(df, 3, iters=2, sample_n=16)
    out = assign_with_centroid_cos(df, cents).collect()
    live = [r for r in out if r["cell"] is not None]
    assert {r["cell"] for r in live} <= {0, 1, 2}
    assert len(out) == 23


def test_rejects_bad_params(spark, train_vecs):
    df = _df(spark, train_vecs)
    with pytest.raises(ValueError):
        kmeans_fit_distributed(df, 0)
    with pytest.raises(ValueError):
        kmeans_fit_distributed(df, 3, iters=0)
    with pytest.raises(ValueError):
        # 21 live vectors but only 20 distinct units in the seed window
        kmeans_fit_distributed(df, 21, sample_n=64)
    empty = spark.createDataFrame(
        [(1, None)], "vec_id: long, embedding: array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_fit_distributed(empty, 2)
