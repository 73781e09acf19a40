"""HTML extraction (functions/html) — q276 gates the corpus path; units
pin nesting/entity/edge behavior."""

from pyspark.sql import functions as F

from etl_market_survey_spark.functions.html import (
    html_links,
    html_title,
    strip_html,
)


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "page string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_strip_blocks_tags_entities(spark):
    page = (
        "<html><head><style>a{x:1}</style></head><body>"
        "<script>if (a < b) { alert('hi'); }</script>"
        "<!-- drop\nme -->"
        "<p>Hello <b>bold</b> &amp; &lt;tag&gt; &quot;quoted&quot;</p>"
        "</body></html>"
    )
    assert _one(spark, page, strip_html("page")) == 'Hello bold & <tag> "quoted"'


def test_double_encoded_entity_not_double_decoded(spark):
    # &amp;lt; must become the literal text "&lt;", never "<"
    assert _one(spark, "<p>&amp;lt;</p>", strip_html("page")) == "&lt;"


def test_title_and_links(spark):
    page = (
        '<title>My\nPage</title><a href="https://a/1">x</a>'
        '<a class="z" href="https://a/2">y</a><a href="">empty</a>'
    )
    assert _one(spark, page, html_title("page")) == "My\nPage"
    assert _one(spark, page, html_links("page")) == ["https://a/1", "https://a/2", ""]


def test_no_html_passthrough(spark):
    assert _one(spark, "plain  text   here", strip_html("page")) == "plain text here"
