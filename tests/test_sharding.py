"""Training-shard assignment and sharded-write tests."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.sharding import (
    assign_shards,
    shard_histogram,
    shard_id,
    write_training_shards,
)

N = 64  # docs in the fixture
SHARDS = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc number {i}", 11 + i) for i in range(N)],
        ["doc_id", "text", "n_chars"],
    )


def expected_shard(i: int, n_shards: int = SHARDS) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % n_shards


def test_assignment_matches_local_md5(docs):
    rows = assign_shards(docs, SHARDS).select("doc_id", "shard").collect()
    assert len(rows) == N
    for r in rows:
        assert r["shard"] == expected_shard(r["doc_id"])


def test_assignment_independent_of_partitioning(docs):
    base = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs, SHARDS).collect()
    }
    re_parted = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs.repartition(7), SHARDS).collect()
    }
    assert base == re_parted


def test_histogram_partitions_the_corpus(docs):
    rows = shard_histogram(docs, SHARDS).collect()
    assert sum(r["n_docs"] for r in rows) == N
    assert sum(r["total_chars"] for r in rows) == sum(11 + i for i in range(N))
    assert {r["shard"] for r in rows} <= set(range(SHARDS))
    for r in rows:
        assert r["min_doc_id"] <= r["max_doc_id"]


def test_invalid_shard_count():
    with pytest.raises(ValueError):
        shard_id(F.col("doc_id"), 0)


def test_write_roundtrip_and_layout(docs, spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, SHARDS)

    back = spark.read.parquet(out)
    assert back.count() == N
    # partition column survives and matches the deterministic assignment
    for r in back.select("doc_id", "shard").collect():
        assert int(r["shard"]) == expected_shard(r["doc_id"])
    # every occupied shard is its own directory
    occupied = {expected_shard(i) for i in range(N)}
    dirs = {p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()}
    assert dirs == {f"shard={s}" for s in occupied}


def test_write_sorted_within_shard(docs, spark, tmp_path):
    out = str(tmp_path / "sorted")
    write_training_shards(docs, out, SHARDS)
    for s in {expected_shard(i) for i in range(N)}:
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/shard={s}").collect()
        ]
        # one sorted file per shard → read order is id order
        assert ids == sorted(ids)


def test_max_records_per_file_bounds_files(docs, tmp_path):
    out = tmp_path / "capped"
    write_training_shards(docs, str(out), 1, max_records_per_file=10)
    files = [p for p in (out / "shard=0").iterdir() if p.suffix == ".parquet"]
    assert len(files) >= N // 10


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-cut sample packing).
# ---------------------------------------------------------------------------


def _expected_packing(rows, max_tokens, n_shards):
    """Driver-side reference: shard by md5, order by id, running offset."""
    import re

    toks = {i: len(re.findall(r"[a-z]{3,}", t.lower())) for i, t in rows}
    out = {}
    by_shard = {}
    for i, _ in rows:
        by_shard.setdefault(expected_shard(i, n_shards), []).append(i)
    for shard, ids in by_shard.items():
        off = 0
        for i in sorted(ids):
            out[i] = (shard, off, toks[i], off // max_tokens)
            off += toks[i]
    return out


def test_pack_sequences_matches_local_reference(spark):
    from ocr_spark.operators.sharding import pack_sequences

    rows = [
        (i, " ".join(f"tok{chr(97 + j)}" for j in range(1 + i % 7)))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (r["shard"], r["offset"], r["n_tokens"], r["pack"])
        for r in pack_sequences(df, max_tokens=10, n_shards=4).collect()
    }
    assert got == _expected_packing(rows, 10, 4)


def test_pack_sequences_covers_every_doc_once(spark):
    from ocr_spark.operators.sharding import pack_sequences, pack_summary

    rows = [(i, "alpha bravo charlie " * (1 + i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    packed = pack_sequences(df, max_tokens=32, n_shards=8).collect()
    assert sorted(r["id"] for r in packed) == list(range(300))
    # packs are contiguous from 0 within each shard; a doc's pack is where
    # its first token lands
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        packs = sorted({r["pack"] for r in rs})
        assert packs == list(range(len(packs))), shard
        for r in rs:
            assert r["pack"] == r["offset"] // 32
    summary = pack_summary(df, max_tokens=32, n_shards=8).collect()
    assert sum(r["n_docs"] for r in summary) == 300
    assert sum(r["pack_tokens"] for r in summary) == sum(
        r["n_tokens"] for r in packed
    )


def test_pack_sequences_plan_one_shuffle_no_python(spark):
    """One Exchange (the per-shard window partitioning), no Python, no
    extra sort beyond the window's."""
    from ocr_spark.operators.sharding import pack_sequences

    df = spark.createDataFrame([(0, "alpha bravo")], ["doc_id", "text"])
    plan = (
        pack_sequences(df, max_tokens=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "Window" in plan and "Python" not in plan


def test_pack_sequences_validates_budget(spark):
    from ocr_spark.operators.sharding import pack_sequences

    df = spark.createDataFrame([(0, "alpha")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        pack_sequences(df, max_tokens=0)


def test_chunk_documents_matches_python_reference(spark):
    """Sliding-window chunking vs a driver-side reference: window k
    covers tokens [k*stride, k*stride+size), emitted while k*stride < n;
    short docs yield one chunk; empty/NULL docs yield none."""
    import re

    from ocr_spark.operators.sharding import chunk_documents

    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        1: "one two three",     # shorter than chunk_size -> one chunk
        2: "",                  # zero tokens -> no rows
        3: None,                # NULL -> no rows
        4: "solo",
    }
    size, stride = 4, 3
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_size=size, stride=stride).collect()
    )
    want = []
    for did, t in texts.items():
        ts = re.findall(r"[a-z]{3,}", (t or "").lower())
        k = 0
        while k * stride < len(ts):
            win = ts[k * stride : k * stride + size]
            want.append((did, k, " ".join(win), len(win)))
            k += 1
    assert got == sorted(want)


def test_chunk_documents_full_coverage_no_drops(spark):
    """Every token position is covered by at least one window whenever
    stride <= chunk_size (the validation boundary)."""
    from ocr_spark.operators.sharding import chunk_documents

    # tokens must survive the [a-z]{3,} tokenizer: letters only
    text = " ".join(
        f"tok{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(50)
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_size=8, stride=8).collect()
    covered = [t for r in sorted(rows, key=lambda r: r["chunk_idx"])
               for t in r["chunk_text"].split(" ")]
    assert covered == text.split(" ")  # stride == size -> exact partition


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from ocr_spark.operators.sharding import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(df, chunk_size=0)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_size=4, stride=5)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_size=4, stride=0)


def test_chunk_documents_plan_is_narrow(spark):
    """One Project + Generate chain — zero Exchange, zero Python."""
    from ocr_spark.operators.sharding import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = (
        chunk_documents(df, chunk_size=4, stride=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


# --- deterministic splits ---------------------------------------------------


def test_assign_splits_matches_md5_reference(spark):
    import hashlib

    from ocr_spark.operators.sharding import DEFAULT_SPLITS, assign_splits

    docs = [(i, f"text {i}") for i in range(200)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["split"] for r in assign_splits(sdf).collect()
    }

    def ref(i):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10000
        for name, ub in DEFAULT_SPLITS:
            if b < ub:
                return name

    assert got == {i: ref(i) for i, _ in docs}
    assert set(got.values()) == {"train", "val", "test"}


def test_assign_splits_partitioning_invariant(spark):
    from ocr_spark.operators.sharding import assign_splits

    docs = [(i, "x") for i in range(300)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    one = {
        r["doc_id"]: r["split"]
        for r in assign_splits(sdf.coalesce(1)).collect()
    }
    many = {
        r["doc_id"]: r["split"]
        for r in assign_splits(sdf.repartition(7)).collect()
    }
    assert one == many


def test_split_summary_fractions(spark):
    from ocr_spark.operators.sharding import split_summary

    docs = [(i, "alpha beta gamma") for i in range(500)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["split"]: r for r in split_summary(sdf).collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 500
    assert abs(sum(r["frac_docs"] for r in rows.values()) - 1.0) < 2e-4
    # 3 regex tokens per doc
    for r in rows.values():
        assert r["n_tokens"] == 3 * r["n_docs"]
    # realized fractions binomially near the declared 90/5/5
    assert 0.8 < rows["train"]["frac_docs"] < 0.97


def test_assign_splits_validates_bounds(spark):
    import pytest as _pytest

    from ocr_spark.operators.sharding import assign_splits

    sdf = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bounds"):
        assign_splits(sdf, splits=(("train", 5000), ("val", 4000)))
    with _pytest.raises(ValueError, match="bounds"):
        assign_splits(sdf, splits=(("train", 5000), ("val", 9999)))


# ---------------------------------------------------------------------------
# temperature_resample
# ---------------------------------------------------------------------------


def _u32(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # head source 120 docs, mid 30, tail 10
    rows = []
    i = 0
    for src, n in (("head", 120), ("mid", 30), ("tail", 10)):
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "source"])


def test_temperature_resample_matches_local_recompute(skewed_docs):
    import math

    from ocr_spark.operators.sharding import temperature_resample

    counts = {"head": 120, "mid": 30, "tail": 10}
    w = {s: math.floor(math.sqrt(float(n)) * (1 << 20)) for s, n in counts.items()}
    n_total, w_total = sum(counts.values()), sum(w.values())
    keep_prob = {
        s: min(1.0, (0.5 * n_total * w[s]) / (w_total * float(n)))
        for s, n in counts.items()
    }
    rows = temperature_resample(skewed_docs, 0.5, 0.5).collect()
    got = {r["doc_id"]: r["keep_prob"] for r in rows}
    i = 0
    expected = {}
    for src, n in (("head", 120), ("mid", 30), ("tail", 10)):
        thresh = math.floor(keep_prob[src] * 2**32)
        for _ in range(n):
            if _u32(i) < thresh:
                expected[i] = round(keep_prob[src], 6)
            i += 1
    assert got == expected
    # flattening: the tail source keeps a HIGHER fraction than the head
    assert keep_prob["tail"] > keep_prob["head"]


def test_temperature_resample_alpha_one_is_uniform_thinning(skewed_docs):
    from ocr_spark.operators.sharding import temperature_resample

    # alpha=1 -> q_s = p_s -> keep_prob = target_frac everywhere
    rows = temperature_resample(skewed_docs, alpha=1.0, target_frac=0.25).collect()
    assert {r["keep_prob"] for r in rows} == {0.25}


def test_temperature_resample_cap_keeps_whole_tail(spark):
    from ocr_spark.operators.sharding import temperature_resample

    # extreme skew at alpha=0.5: the 4-doc tail's quota exceeds its
    # population -> capped at 1.0, every tail doc kept
    rows = [(i, "head") for i in range(996)] + [
        (996 + j, "tail") for j in range(4)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_resample(df, 0.5, 0.5)
    tail = out.filter(F.col("source") == "tail").collect()
    assert len(tail) == 4 and all(r["keep_prob"] == 1.0 for r in tail)


def test_temperature_resample_partitioning_invariant(skewed_docs):
    from ocr_spark.operators.sharding import temperature_resample

    a = sorted(map(tuple, temperature_resample(skewed_docs, 0.5, 0.5).collect()))
    b = sorted(
        map(
            tuple,
            temperature_resample(skewed_docs.repartition(13), 0.5, 0.5).collect(),
        )
    )
    assert a == b


def test_temperature_resample_validation(skewed_docs):
    from ocr_spark.operators.sharding import temperature_resample

    with pytest.raises(ValueError):
        temperature_resample(skewed_docs, target_frac=0.0)
    with pytest.raises(ValueError):
        temperature_resample(skewed_docs, target_frac=1.5)
    with pytest.raises(ValueError):
        temperature_resample(skewed_docs, alpha=-0.5)


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_groups_clusters(spark):
    from ocr_spark.operators.sharding import (
        SPLIT_DOMAIN,
        DEFAULT_SPLITS,
        assign_splits,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], ["doc_id", "text"]
    )
    # clusters: {0,1,2} (chained pairs), {7,15}; everything else singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (7, 15)], ["id_a", "id_b"]
    )
    rows = leakage_safe_split(pairs, docs).collect()
    assert len(rows) == 20
    by_id = {r["doc_id"]: r for r in rows}
    # cluster canonical = min member id
    assert {by_id[i]["cluster"] for i in (0, 1, 2)} == {0}
    assert {by_id[i]["cluster"] for i in (7, 15)} == {7}
    # every cluster member shares one split, derived from the CLUSTER id
    def split_of(cluster_id):
        b = int(hashlib.md5(str(cluster_id).encode()).hexdigest()[:8], 16) % SPLIT_DOMAIN
        for name, ub in DEFAULT_SPLITS:
            if b < ub:
                return name

    for i in range(20):
        assert by_id[i]["split"] == split_of(by_id[i]["cluster"]), i
    # singletons degrade to exactly assign_splits placement
    plain = {
        r["doc_id"]: r["split"]
        for r in assign_splits(docs.select("doc_id")).collect()
    }
    for i in range(20):
        if i not in (0, 1, 2, 7, 15):
            assert by_id[i]["split"] == plain[i]


def test_temperature_resample_excludes_null_source(spark):
    from ocr_spark.operators.sharding import temperature_resample

    labeled = [(i, "a") for i in range(100)]
    unlabeled = [(100 + i, None) for i in range(100)]
    df = spark.createDataFrame(
        labeled + unlabeled, "doc_id long, source string"
    )
    rows = temperature_resample(df, alpha=1.0, target_frac=0.5).collect()
    # NULL stratum is excluded from totals AND output: the single real
    # source keeps exactly target_frac (alpha=1 -> uniform thinning), not
    # target_frac scaled against an unsampleable population
    assert all(r["source"] == "a" for r in rows)
    assert {r["keep_prob"] for r in rows} == {0.5}
