"""HTML text extraction (brief §"Beyond").

The step between the WARC response scan (sources/warc.py) and line-grain
boilerplate removal (textops.boilerplate_strip): turn raw crawled HTML
into line-structured plain text. Trafilatura/jusText-class extractors do
this with a DOM parse; at 100 TB the DOM is the wrong tool — a Python
parser per document is the row-at-a-time UDF trap. This module does the
extraction as a chain of codegen'd regex/column transforms that runs
inside the scan's WholeStageCodegen span: script/style/comment blocks
drop, BLOCK-level tags become newlines (so the output keeps the line
grain boilerplate_strip consumes), remaining tags strip to spaces,
HTML entities decode (non-amp first, so ``&amp;lt;`` round-trips
correctly), and whitespace collapses per line.

Regex-over-HTML is a deliberate 99%-case trade (documented limit: a
literal ``</script>`` inside a JS string terminates that block early);
the wins are zero Python, zero shuffle, and text that never leaves the
executor. Link/tag counts ride the same pass for the link-density
signal quality filters read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tags whose boundaries are line boundaries in rendered text — their
# open/close both become newlines so downstream line-grain operators
# (boilerplate_strip) see the document's visual structure.
_BLOCK_TAGS = (
    "html|head|body|title|p|div|br|hr|li|ul|ol|h[1-6]|tr|table|thead|"
    "tbody|section|article|header|footer|blockquote|pre|form"
)

# Named entities decoded without a parser; &amp; LAST so &amp;lt; becomes
# the literal "&lt;", not "<" (double-decoding is the classic bug).
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_to_text(html: Column) -> Column:
    """Extracted plain text, newline-delimited at block-tag boundaries,
    entities decoded, whitespace collapsed, no leading/trailing blank."""
    x = F.regexp_replace(html, r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n")
    x = F.regexp_replace(x, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        x = F.regexp_replace(x, ent, rep)
    x = F.regexp_replace(x, r"[ \t\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n+", "\n")
    return F.regexp_replace(x, r"^\n|\n$", "")


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document extraction frame: ``text`` (line-structured plain
    text), ``n_links`` (anchor count — the numerator of link density),
    ``n_tags``, and ``text_frac`` (plain-text chars / raw chars — the
    markup-heaviness signal; boilerplate pages sit low). One projection,
    no shuffle, no UDF."""
    html = F.col(html_col)
    text = html_to_text(html)
    return df.select(
        F.col(id_col),
        text.alias("text"),
        (F.size(F.split(html, r"(?i)<a[\s>]")) - 1)
        .cast("long")
        .alias("n_links"),
        (F.size(F.split(html, r"<[a-zA-Z!/]")) - 1)
        .cast("long")
        .alias("n_tags"),
        F.round(
            F.length(text) / F.greatest(F.length(html), F.lit(1)), 6
        ).alias("text_frac"),
    )
