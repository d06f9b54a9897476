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
