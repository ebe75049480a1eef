"""S1: HTML -> main-text extraction (boilerplate stripping).

Trafilatura-equivalent *logic* implemented as a self-contained, pure,
deterministic function (BASELINE.json ``north_star``): the library itself is
not installed and would not pin bytes across versions, so we implement the
stripping pipeline directly and freeze its behavior with per-url SHA-256
goldens (``input_hint`` byte-identity invariant).

Guarantees (SURVEY.md §7.3-1):
* pure function of the html bytes — no locale, wall-clock, or partition
  dependence; bytes are decoded explicitly as UTF-8 with ``errors="replace"``;
* deterministic whitespace canonicalization: newline-separated block text,
  single-space-collapsed within lines;
* executed as an Arrow-batched pandas UDF — the sanctioned Python path; the
  surrounding plan stays whole-stage codegen.

Pipeline: drop <script>/<style>/<head>/<nav>/<header>/<footer>/<aside> and
comments -> block tags become newlines -> remaining tags drop -> entities
unescape -> per-line whitespace collapse -> blank lines drop.
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DROP_RE = re.compile(
    r"<(script|style|head|nav|header|footer|aside|noscript|form|iframe|svg)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|table|tr|td|th|h[1-6]|section|article|main|blockquote|pre|hr)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
# an UNCLOSED raw-text element opener (malformed page, or the closer cut
# off by the MAX_HTML_BYTES truncation / left by the pass cap): its body
# is code, never document text — drop to end-of-string. Only script/style
# qualify: the structural containers' contents are markup that the tag
# strip handles, and sloppy pages legitimately leave e.g. <head> unclosed
# (dropping to EOS there would delete the whole document).
_UNCLOSED_RE = re.compile(
    r"<(script|style)\b[^>]*>.*$",
    re.IGNORECASE | re.DOTALL,
)
_SPACES_RE = re.compile(r"[ \t\r\f\v ]+")


# Crawl-grade input bounds (both DOCUMENTED output-affecting only for
# pathological pages — every golden/real page is far below them):
# * MAX_HTML_BYTES caps per-page input so one multi-hundred-MB page cannot
#   inflate an Arrow batch (maxRecordsPerBatch pages x cap bounds executor
#   memory) — the same truncation every production crawl extractor applies;
# * MAX_DROP_PASSES bounds the nested-dropped-container fixpoint loop so an
#   adversarial <div><script><script>... nesting bomb terminates in
#   O(cap x bytes) instead of unbounded passes.
MAX_HTML_BYTES = 8 << 20
MAX_DROP_PASSES = 10


def strip_html(
    html_bytes: bytes | bytearray | None,
    max_html_bytes: int = MAX_HTML_BYTES,
) -> str:
    """Extract main text from HTML bytes. Pure and deterministic."""
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes)[:max_html_bytes].decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", raw)
    # bounded repeated pass handles nesting of dropped containers
    for _ in range(MAX_DROP_PASSES):
        new = _DROP_RE.sub(" ", s)
        if new == s:
            break
        s = new
    # any surviving opener is unclosed (truncated by the byte cap, deeper
    # than the pass cap, or just malformed) — drop it to end-of-string so
    # raw script/style bodies can never leak into the corpus as text
    s = _UNCLOSED_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    # one space-collapse pass over the whole document (the class excludes
    # \n, so this is identical to per-line sub) instead of a C regex call
    # per line; str.strip then drops the collapsed edge spaces
    s = _SPACES_RE.sub(" ", s)
    lines = []
    for line in s.split("\n"):
        line = line.strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def _strip_html_batch(html: pd.Series) -> pd.Series:
    return html.map(strip_html)


def strip_html_udf():
    """Arrow-batched UDF factory (lazy: pandas_udf needs an active session)."""
    return F.pandas_udf(_strip_html_batch, "string")


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> + extracted ``text`` and
    ``text_sha256`` columns. ``html`` is read only here — downstream stages
    must never touch it so Catalyst prunes the binary column out of every
    other scan (SURVEY.md §4)."""
    return pages.withColumn("text", strip_html_udf()(F.col("html"))).withColumn(
        "text_sha256", F.sha2(F.col("text"), 256)
    )
