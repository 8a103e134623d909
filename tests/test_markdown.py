"""Reference-behavior fixtures for the high-fidelity markdown path
(handlers/comments.js:43-55: md.render → querySelectorAll('img') →
double HTML strip). Pure-python function tested directly, then the
pandas_udf end to end."""

from chain_sync_spark.functions.markdown_udf import parse_post_py


def test_emphasis_and_heading_stripped():
    text, imgs = parse_post_py("# Title\nSome **bold** and *em* text.")
    assert "bold" in text and "em" in text
    assert "*" not in text and "#" not in text
    assert imgs == []


def test_link_text_kept_url_dropped():
    text, imgs = parse_post_py("see [the docs](http://l/d) now")
    assert "the docs" in text
    assert "http://l/d" not in text


def test_markdown_and_html_images_collected():
    text, imgs = parse_post_py(
        'Photo: ![cat](http://i/cat.png) and <img src="http://i/dog.png">'
    )
    assert imgs == ["http://i/cat.png", "http://i/dog.png"]
    assert "http://i/cat.png" not in text  # images leave no text


def test_code_content_preserved():
    text, _ = parse_post_py("code `inline` and\n```\nfenced block\n```\ndone")
    assert "inline" in text and "fenced block" in text
    assert "`" not in text


def test_double_strip_catches_escaped_html():
    # After the first strip pass unescapes entities, the second pass
    # sees live markup — the reference strips twice for exactly this
    # (comments.js:53-55).
    text, imgs = parse_post_py('escaped &lt;img src="http://i/esc.png"&gt; markup')
    assert imgs == ["http://i/esc.png"]
    assert "<img" not in text


def test_newline_spacing_applied():
    text, _ = parse_post_py("a\nb")
    assert " \n " in text  # F6: newline spacing for token splitting


def test_none_body():
    assert parse_post_py(None) == (None, [])


def test_udf_end_to_end(spark):
    from pyspark.sql import functions as F
    from chain_sync_spark.functions.markdown_udf import parse_post
    df = spark.createDataFrame(
        [(1, "**x** ![i](http://u/1)"), (2, None)], "id int, body string"
    )
    rows = {r["id"]: r for r in df.select("id", parse_post(F.col("body")).alias("p")).collect()}
    assert rows[1]["p"]["images"] == ["http://u/1"]
    assert "x" in rows[1]["p"]["text"]
    assert rows[2]["p"]["text"] is None
