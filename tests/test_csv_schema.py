"""CSV column-role inference (reference generate_csv_schema heuristic)."""

from caterpillar_spark.sources import classify_csv_columns, read_csv_with_schema


def test_classify_text_vs_ignore(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as fh:
        fh.write("id,label,comment\n")
        for i in range(30):
            fh.write(
                f"{i},cat{i % 3},this is a long free text answer "
                f"with many words number {i}\n"
            )
    df, roles = read_csv_with_schema(spark, p)
    assert roles == {"id": "IGNORE", "label": "IGNORE", "comment": "TEXT"}
    assert df.count() == 30


def test_nulls_and_short_text(spark):
    df = spark.createDataFrame(
        [(None, "one two three four five six")] * 5 + [("x", None)] * 5,
        "a string, b string",
    )
    roles = classify_csv_columns(df)
    assert roles["a"] == "IGNORE"
    # 6-word text in half the rows, nulls counted as 0 words: avg 3 < 5
    assert roles["b"] == "IGNORE"


def test_header_autodetect_reference_goldens():
    """csv_has_header reproduces the reference's fixture goldens
    (processing/test/test_schema.py:99-133): header-row size vs average
    data-row size, threshold 0.33 (true division — reference schema.py
    carries `from __future__ import division`)."""
    import os

    import pytest

    from caterpillar_spark.sources.csv_schema import sniff_csv_header

    res = "/root/reference/caterpillar/test_resources"
    if not os.path.isdir(res):
        pytest.skip("reference corpus not available")
    assert sniff_csv_header(f"{res}/twitter_sentiment.csv") is True
    assert sniff_csv_header(f"{res}/test_small.csv") is True
    assert sniff_csv_header(f"{res}/test_no_header.csv") is False


def test_read_csv_header_auto(spark, tmp_path):
    """header='auto' (now the default) reads a headered file with its
    column names and a headerless file positionally — the r2 'delegated
    to caller' gap closed."""
    from caterpillar_spark.sources.csv_schema import csv_has_header

    withhdr = str(tmp_path / "hdr.csv")
    with open(withhdr, "w") as fh:
        fh.write("id,comment\n")
        for i in range(30):
            fh.write(f"{i},a rather long free text answer with words {i}\n")
    df, roles = read_csv_with_schema(spark, withhdr)
    assert df.columns == ["id", "comment"]
    assert df.count() == 30

    nohdr = str(tmp_path / "nohdr.csv")
    with open(nohdr, "w") as fh:
        for i in range(30):
            fh.write(f"{i},a rather long free text answer with words {i}\n")
    df2, _ = read_csv_with_schema(spark, nohdr)
    assert df2.count() == 30  # first row NOT consumed as a header
    assert df2.columns[0].startswith("_c")  # positional names

    # empty / single-line degenerate inputs do not raise
    assert csv_has_header("") is False
    assert csv_has_header("only,one,row\n") is False


def test_resolve_header_falls_back_when_unsniffable(tmp_path):
    """The r3 advisory: header='auto' must never be weaker than the old
    header='true' default — remote paths and local paths without a
    readable plain-text *.csv head fall back to 'true' instead of
    raising driver-side."""
    from caterpillar_spark.sources.csv_schema import resolve_csv_header

    # remote filesystems: no driver-side head to read
    assert resolve_csv_header("s3a://bucket/data.csv") == "true"
    assert resolve_csv_header("hdfs://nn/warehouse/t") == "true"
    # local directory holding only compressed parts
    gz_dir = tmp_path / "gzdir"
    gz_dir.mkdir()
    (gz_dir / "part-000.csv.gz").write_bytes(b"\x1f\x8b\x08\x00binary")
    assert resolve_csv_header(str(gz_dir)) == "true"
    # nonexistent path: Spark will raise its own error later; the sniff
    # must not preempt it with a FileNotFoundError of its own
    assert resolve_csv_header(str(tmp_path / "missing")) == "true"
    # explicit override passes through untouched
    assert resolve_csv_header("s3a://bucket/x.csv", header="false") == "false"
    # a sniffable local file still sniffs
    hdr = tmp_path / "h.csv"
    with open(hdr, "w") as fh:
        fh.write("id,comment\n")
        for i in range(30):
            fh.write(f"{i},quite a long free text answer with many words {i}\n")
    assert resolve_csv_header(str(hdr)) == "true"
    nohdr = tmp_path / "n.csv"
    with open(nohdr, "w") as fh:
        for i in range(30):
            fh.write(f"{i},quite a long free text answer with many words {i}\n")
    assert resolve_csv_header(str(nohdr)) == "false"
