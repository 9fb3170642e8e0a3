"""Per-turn equality through the REAL Spark path (Arrow batches, pandas UDF,
flattening, ordering) — not just the pure-Python core."""
import json
import pathlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.extraction import (
    assemble_conversations,
    extract_turns,
    salted_repartition,
)

FIXTURES = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "golden.json").read_text()
)


@pytest.fixture(scope="module")
def golden_df(spark):
    """All both-flags-on fixtures as one transcript-shaped DataFrame."""
    rows = [
        (i, fx["input"], fx["name"])
        for i, fx in enumerate(FIXTURES)
        if fx["use_dictionary"] and fx["use_spelling"] and not fx["confidences"]
    ]
    return spark.createDataFrame(rows, "turn_idx int, text string, name string"), rows


def test_udf_equality(spark, golden_df):
    df, rows = golden_df
    got = {
        r["name"]: r
        for r in extract_turns(df, use_dictionary=True, use_spelling=True).collect()
    }
    expected = {fx["name"]: fx["expected"] for fx in FIXTURES}
    assert len(got) == len(rows)
    for name, row in got.items():
        exp = expected[name]
        assert row["extracted_text"] == exp["extracted_text"], name
        assert row["normalized_text"] == exp["normalized_text"], name
        assert row["dictionary_corrections"] == exp["dictionary_corrections"], name
        assert row["spelling_changes"] == exp["spelling_changes"], name
        q = row["quality"].asDict()
        assert q == exp["quality"], name
        assert sorted(row["unknown_words"]) == exp["unknown_words"], name


def test_flag_combinations(spark):
    df = spark.createDataFrame(
        [("Djelan Krmet 63 jang baik Rp.277.--",)], "text string"
    )
    off = extract_turns(df, use_dictionary=False, use_spelling=False).first()
    assert off["normalized_text"] == off["extracted_text"] == df.first()["text"]
    dict_only = extract_turns(df, use_dictionary=True, use_spelling=False).first()
    assert "Kramat" in dict_only["extracted_text"]
    assert "Djelan" in dict_only["normalized_text"]  # spelling untouched
    both = extract_turns(df, use_dictionary=True, use_spelling=True).first()
    assert both["normalized_text"].startswith("Jelan Kramat 63 yang baik Rp 277,-")


def test_assembly_order_and_headers(spark):
    # shuffled input, one empty turn to skip — analog of page assembly
    rows = [
        ("c1", 2, "third"),
        ("c1", 0, "first"),
        ("c1", 1, "   "),
        ("c1", 3, ""),
        ("c2", 0, "solo"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, normalized_text string")
    out = {r["conv_id"]: r for r in assemble_conversations(df).collect()}
    assert out["c1"]["document"] == (
        "--- Halaman 1 ---\nfirst\n\n--- Halaman 3 ---\nthird"
    )
    assert out["c1"]["n_turns"] == 2
    assert out["c2"]["document"] == "--- Halaman 1 ---\nsolo"


def test_salted_repartition_is_lossless(spark):
    df = spark.range(0, 500).select(
        F.concat(F.lit("conv-"), (F.col("id") % 3).cast("string")).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
    )
    salted = salted_repartition(df, 8)
    assert salted.count() == 500
    assert salted.rdd.getNumPartitions() == 8
    # no duplicated or lost keys
    assert salted.distinct().count() == df.distinct().count()
