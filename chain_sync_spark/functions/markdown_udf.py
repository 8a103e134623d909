"""High-fidelity post parsing as a vectorized pandas_udf (F3–F5).

The reference renders markdown to HTML with markdown-it, collects
<img src> attributes with an HTML parser, and strips tags TWICE to
catch markdown-escaped HTML (handlers/comments.js:43-55). The
builtin-regex approximation in functions/text_funcs.py is the fast
path (whole-stage codegen, used by the sync handlers); this module is
the faithful path: a small pure-stdlib markdown renderer + a real
HTML parser, Arrow-batched so the Python cost is per-batch, not
per-row. No external markdown library exists in this environment, so
the renderer implements the constructs the reference pipeline's
output actually depends on (images, links, emphasis, code spans and
fences, headings, entities); it is NOT a full CommonMark renderer —
divergences beyond these constructs are possible and covered by the
regex fallback being the default.

UDF choice per SURVEY §2.8: one `parse_post` pandas_udf returning a
struct (text + images), so the three reference steps cost one Arrow
round-trip.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# markdown constructs the reference pipeline depends on
_MD_IMG = re.compile(r"!\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_MD_LINK = re.compile(r"(?<!!)\[([^\]]*)\]\(([^)\s]+)(?:\s+\"[^\"]*\")?\)")
_MD_FENCE = re.compile(r"^```[^\n]*\n(.*?)^```\s*$", re.M | re.S)
_MD_CODE = re.compile(r"`([^`]+)`")
_MD_EMPH = re.compile(r"(\*\*\*|\*\*|\*|___|__|_)(?=\S)(.+?)(?<=\S)\1")
_MD_HEADING = re.compile(r"^#{1,6}\s+", re.M)
_MD_QUOTE = re.compile(r"^>\s?", re.M)


def _md_render(md: str) -> str:
    """Markdown → HTML for the constructs that affect text/img
    extraction (markdown-it stand-in, see module docstring)."""
    out = _MD_FENCE.sub(lambda m: "<pre>" + m.group(1) + "</pre>", md)
    out = _MD_IMG.sub(lambda m: f'<img src="{m.group(2)}" alt="{m.group(1)}">', out)
    out = _MD_LINK.sub(lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', out)
    out = _MD_CODE.sub(lambda m: "<code>" + m.group(1) + "</code>", out)
    # innermost-first emphasis resolution
    prev = None
    while prev != out:
        prev = out
        out = _MD_EMPH.sub(lambda m: "<em>" + m.group(2) + "</em>", out)
    out = _MD_HEADING.sub("", out)
    out = _MD_QUOTE.sub("", out)
    return out


class _Extractor(HTMLParser):
    """Text + <img src> collection (node-html-parser stand-in)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.images: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "img":
            src = dict(attrs).get("src")
            if src:
                self.images.append(src)

    def handle_data(self, data: str) -> None:
        self.parts.append(data)

    @property
    def text(self) -> str:
        return "".join(self.parts)


def _strip_html(s: str) -> tuple[str, list[str]]:
    p = _Extractor()
    p.feed(s)
    p.close()
    return p.text, p.images


def parse_post_py(body: str | None) -> tuple[str | None, list[str]]:
    """The full reference pipeline for one body: render markdown,
    extract/strip once, then strip AGAIN (markdown-escaped HTML
    becomes live markup after the first pass unescapes entities,
    comments.js:53-55), and space newlines (F6)."""
    if body is None:
        return None, []
    rendered = _md_render(body)
    text1, imgs1 = _strip_html(rendered)
    text2, imgs2 = _strip_html(text1)
    text = text2.replace("\n", " \n ")
    images = list(dict.fromkeys(imgs1 + imgs2))  # ordered dedup
    return text, images


def _parse_post_batches(bodies: pd.Series) -> pd.DataFrame:
    parsed = [parse_post_py(b) for b in bodies]
    return pd.DataFrame(
        {"text": [p[0] for p in parsed], "images": [p[1] for p in parsed]}
    )


_udf = None


def parse_post(body: Column) -> Column:
    """Column form: struct<text, images> per post body. The UDF is
    built lazily — pandas_udf parses its DDL schema against the
    active SparkSession, which need not exist at import time."""
    global _udf
    if _udf is None:
        _udf = pandas_udf("struct<text:string, images:array<string>>")(
            _parse_post_batches
        )
    return _udf(body)
