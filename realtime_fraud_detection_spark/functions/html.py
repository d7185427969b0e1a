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

# entity aliases grouped BY REPLACEMENT, so each target character costs
# one regexp pass however many named/decimal/hex spellings it has.
# Typographic forms (curly quotes, dashes, ellipsis) normalize to their
# ASCII equivalents — the choice every text-normalization pre-clean makes
# so word- and punctuation-level signals see one spelling; in particular
# &#8217; (don&#8217;t) decodes to an apostrophe instead of vanishing.
_ENTITIES = [
    (r"&nbsp;|&#0*160;|&#[xX]0*[aA]0;", " "),
    (r"&quot;|&#0*34;|&#[xX]0*22;|&ldquo;|&rdquo;|&#0*822[01];|&#[xX]0*201[cdCD];", '"'),
    (r"&apos;|&#0*39;|&#[xX]0*27;|&lsquo;|&rsquo;|&#0*821[67];|&#[xX]0*201[89];", "'"),
    (r"&ndash;|&mdash;|&#0*821[12];|&#[xX]0*201[34];", "-"),
    (r"&hellip;|&#0*8230;|&#[xX]0*2026;", "..."),
    (r"&lt;|&#0*60;|&#[xX]0*3[cC];", "<"),
    (r"&gt;|&#0*62;|&#[xX]0*3[eE];", ">"),
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
    # remaining numeric entities (decimal or hex) are STRIPPED to a space
    # — anything outside the common set above is overwhelmingly symbol/
    # emoji noise for the downstream text signals. The ampersand forms
    # (&#38;/&#x26;) are excluded here: & decodes LAST with &amp; so
    # "&amp;lt;" stays the literal text "&lt;" (no double decode)
    x = F.regexp_replace(
        x, r"&#(?!0*38;|[xX]0*26;)(\d+|[xX][0-9a-fA-F]+);", " "
    )
    x = F.regexp_replace(x, r"&amp;|&#0*38;|&#[xX]0*26;", "&")  # last: may reveal literal text
    x = F.regexp_replace(x, r"[ \t\x0b\f\r]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{3,}", "\n\n")
    return F.trim(x)
