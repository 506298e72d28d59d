"""Spark-level tests for the conversation stitching operator (O27)."""

import pytest

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.001"


def test_stitched_documents_three_pages_per_conv(spark):
    from nreadability_spark.operators.stitch import stitched_documents

    rows = stitched_documents(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) == (n_docs + 2) // 3
    # full conversations visit all 3 pages and extract content
    full = [r for r in rows if r["conv_id"] != rows[-1]["conv_id"]]
    assert all(r["n_pages_visited"] == 3 for r in full)
    assert all(r["extracted"] for r in full)
    assert all(r["content_len"] > 0 for r in full)


def test_stitch_contains_all_pages_and_separators(spark):
    from nreadability_spark.operators.stitch import stitch_conversations
    from nreadability_spark.operators.stitch import _page_html

    rows = [
        ("c1", i, f"http://synth.example/c1" + ("" if i == 0 else f"/page/{i+1}"),
         _page_html("c1", i + 1, 3, f"Unique sentence number {i} with plenty of padding text, "
                    "and some more words to pass the length thresholds easily here."))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, url string, text string")
    out = stitch_conversations(df).collect()
    assert len(out) == 1
    html = out[0]["html"]
    for i in range(3):
        assert f"Unique sentence number {i}" in html
    assert 'id="readability-page-1"' in html
    assert 'id="readability-page-3"' in html
    assert "page-separator" in html
