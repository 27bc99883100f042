"""HTML text extraction (operators/html.py)."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import html as H


def _extract(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "html string")
    return df.select(H.html_to_text(F.col("html")).alias("t")).collect()[0]["t"]


def test_script_style_comments_drop(spark):
    raw = (
        "<html><head><title>T</title><style>p {color: red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden -->visible</body></html>"
    )
    # documented regex limit: the </p> inside the JS STRING is fine (only
    # a literal </script> terminates the block early)
    assert _extract(spark, raw) == "T\nvisible"


def test_block_tags_become_lines_inline_tags_spaces(spark):
    raw = "<div>a<b>bold</b>c</div><p>two</p>three <a href='#'>link</a>!"
    assert _extract(spark, raw) == "a bold c\ntwo\nthree link !"


def test_entities_decode_without_double_decode(spark):
    raw = "<p>x &amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt;</p>"
    assert _extract(spark, raw) == 'x & y <tag> "q" \'s\' &lt;'


def test_whitespace_collapse_and_trim(spark):
    raw = "<p>  a   b  </p>\n\n<p>c</p>  "
    assert _extract(spark, raw) == "a b\nc"


def test_html_extract_counts(spark):
    raw = (
        '<html><body><p>t</p><a href="x">l1</a><A HREF="y">l2</a>'
        "</body></html>"
    )
    df = spark.createDataFrame([(7, raw)], "doc_id bigint, html string")
    r = H.html_extract(df).collect()[0]
    assert r["doc_id"] == 7
    assert r["text"] == "t\nl1 l2"
    assert r["n_links"] == 2
    # html body p /p a /a A /a /body /html = 10 tags
    assert r["n_tags"] == 10
    assert 0 < r["text_frac"] < 1


def test_extraction_is_single_codegen_projection(spark):
    """Scale contract: the whole extraction is one shuffle-free projection
    inside WholeStageCodegen — no UDF, no exchange."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("<p>doc "), F.col("id").cast("string"), F.lit("</p>")).alias("html"),
    )
    plan = H.html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the *(n) prefix is executedPlan().toString()'s codegen-span marker
    assert plan.lstrip().startswith("*("), plan[:200]
