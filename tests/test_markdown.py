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


def test_builtin_extract_known_answer(spark, tmp_path):
    """markdown_extract_builtin (the oracle-checkable F4/F5 regex
    path): known answers per augmentation arm — md+html images
    deduped/sorted on arm 0, link text kept and markers stripped on
    arm 1, quoted-attr html img on arm 2, untouched text on arm 3."""
    from chain_sync_spark.operators.sync_queries import markdown_extract_builtin

    rows = [(i, "plain words here", "en", "s", 16) for i in range(4)]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{src}/documents.parquet")
    out = {r.doc_id: r for r in markdown_extract_builtin(spark, src).collect()}

    assert out[0].n_imgs == 2  # duplicate md image collapses
    assert out[0].img_srcs == "http://img/a0.png http://img/b0.png"
    assert out[0].plain_head.startswith("plain words here")

    assert out[1].n_imgs == 0 and out[1].img_srcs == ""
    # link text kept, url dropped, emphasis/backtick markers stripped
    assert "docs" in out[1].plain_head and "http://l/1" not in out[1].plain_head
    assert "*" not in out[1].plain_head and "`" not in out[1].plain_head

    assert out[2].n_imgs == 1 and out[2].img_srcs == "http://img/c2.gif"
    assert out[3].n_imgs == 0 and out[3].plain_head == "plain words here"
