"""HTML-to-text extraction — the pre-clean that turns crawled markup into
the text the quality/dedup operators consume (the WET-extraction step of
CommonCrawl-style pipelines). Pure JVM regexp expressions: the goal is
the standard 95% case (drop script/style/comments, strip tags, unescape
the common entities, normalize whitespace), not a browser-grade parser —
swap in a real extractor (trafilatura/jusText) behind mapInPandas where
fidelity matters; THIS path is the one that runs at full-corpus scan
speed with no Python.

Block-level tags become newlines (so line-based quality signals — C4
rules, boilerplate line dedup — see the document's visual structure);
inline tags vanish.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|tr|table|h1|h2|h3|h4|h5|h6|section|article|header|"
    "footer|blockquote|pre"
)

_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
]


def strip_html(col: Column) -> Column:
    """Visible text of an HTML fragment (see module doc for scope).

    Order matters: script/style/comment SUBTREES drop first (their text
    is not content), block tags map to newlines, remaining tags drop,
    entities unescape LAST (so '&lt;script&gt;' in text never becomes a
    strippable tag — the classic double-decode bug), then whitespace
    normalizes (3+ newlines collapse to 2, spaces/tabs collapse, lines
    trim)."""
    x = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, rf"(?i)</?({_BLOCK_TAGS})\b[^>]*/?>", "\n")
    x = F.regexp_replace(x, r"(?s)<[A-Za-z/!][^>]*>", " ")
    for ent, rep in _ENTITIES:
        x = F.regexp_replace(x, ent, rep)
    # numeric entities (decimal) for the printable ASCII range
    x = F.regexp_replace(x, r"&#(\d+);", " ")
    x = F.regexp_replace(x, r"&amp;", "&")  # last: may reveal literal text
    x = F.regexp_replace(x, r"[ \t\x0b\f\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{3,}", "\n\n")
    return F.trim(x)
