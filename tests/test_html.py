"""HTML stripping (functions/html.py): tag/script/entity handling, block
structure preservation, and the no-double-decode property."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_fraud_detection_spark.functions.html import strip_html


def _strip(spark, html):
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(strip_html(F.col("h")).alias("t")).first()["t"]


def test_basic_page(spark):
    html = """<html><head><title>T</title><style>.x{color:red}</style>
    <script>var a = '<p>not text</p>';</script></head>
    <body><h1>Header</h1><p>First <b>bold</b> paragraph.</p>
    <p>Second &amp; last &lt;one&gt;.</p>
    <ul><li>item 1</li><li>item 2</li></ul></body></html>"""
    t = _strip(spark, html)
    assert "var a" not in t and "color:red" not in t
    assert "Header" in t and "First bold paragraph." in t
    assert "Second & last <one>." in t
    # block tags produce line structure
    lines = [ln for ln in t.split("\n") if ln]
    assert "item 1" in lines and "item 2" in lines
    assert t.index("Header") < t.index("First")


def test_no_double_decode(spark):
    # text that NAMES a script tag must survive as text, not execute as
    # markup: entities unescape only after tag stripping
    t = _strip(spark, "<p>Use &lt;script&gt; tags wisely &#120;</p>")
    assert "<script>" in t
    assert "wisely" in t


def test_comments_and_selfclosing(spark):
    t = _strip(spark, "a<!-- hidden \n multiline -->b<br/>c<img src='x'>d")
    assert "hidden" not in t
    assert t.splitlines()[0].replace(" ", "") == "ab"
    assert "c d" in t or "c\nd" in t.replace("  ", " ")


def test_plain_text_unchanged_shape(spark):
    t = _strip(spark, "no markup here, 2 < 3 stays?\n\nsecond para")
    assert "no markup here" in t and "second para" in t


def test_numeric_and_typographic_entities(spark):
    # common typographic entities decode to ASCII equivalents in every
    # spelling (named / decimal / hex); don&#8217;t keeps its apostrophe
    t = _strip(spark, "<p>don&#8217;t &ldquo;quote&#8221; A&ndash;B &#x2026; x&#39;y</p>")
    assert t.strip() == "don't \"quote\" A-B ... x'y"
    # uncommon numeric entities strip to whitespace, decimal and hex alike
    t2 = _strip(spark, "a&#128512;b &#x1F600;c")
    assert t2.strip() == "a b c"
    # &amp; in all spellings decodes last
    assert _strip(spark, "x &#38; y &amp; z") == "x & y & z"
