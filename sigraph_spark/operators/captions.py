"""Image-caption pair mining: the multimodal training-data channel
(round 5).

Web-scale image-text datasets (the LAION/alt-text recipe) are mined
from exactly two HTML shapes: the ``alt`` attribute on ``<img>`` tags
and ``<figcaption>`` inside a ``<figure>`` wrapping an image. This
channel extracts both as ``(url, img_idx, src, caption, source)``
rows — the join key against the media corpus (``src``) plus the text
the vision-language pair trains on.

Extraction is pure-codegen (the webtext-channel contract: tags via
``regexp_extract_all``, per-tag attributes via ``regexp_extract``
inside ``transform`` lambdas, text through the shared ``clean_cell``
contract — zero UDF, zero shuffle). ``img_idx`` numbers the page's
``<img>`` tags in document order so multi-image pages keep stable
keys. Empty alts (the accessibility-spacer convention ``alt=""``) are
DROPPED — they are deliberate no-captions, not captions; images
without any caption simply emit nothing (this is a pair miner, not an
image inventory — ``media_sniff`` inventories).

Scale shape: one narrow map over ``html``; composes with the fused
scan the same way the other channels do (each page's html is
projected once per plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .htmltables import clean_cell

__all__ = ["image_captions"]

IMG_TAG_RE = r"(?is)<img\b[^>]*>"
FIGURE_RE = r"(?is)<figure\b[^>]*>((?:(?!</figure\s*>).)*)</figure\s*>"
FIGCAP_RE = r"(?is)<figcaption\b[^>]*>((?:(?!</figcaption\s*>).)*)</figcaption\s*>"
_SRC_RE = r"""(?is)(?<![\w-])src\s*=\s*["']([^"']+)["']"""
_DATA_SRC_RE = r"""(?is)\bdata-src\s*=\s*["']([^"']+)["']"""
_ALT_RE = r"""(?is)(?<![\w-])alt\s*=\s*["']([^"']*)["']"""


def _src_of(tag):
    """src with the lazy-loading fallback: real crawls ship
    ``<img data-src=...>`` (loader scripts fill src later); the
    negative lookbehind on _SRC_RE keeps ``data-src`` from matching
    AS ``src``."""
    s = F.regexp_extract(tag, _SRC_RE, 1)
    d = F.regexp_extract(tag, _DATA_SRC_RE, 1)
    return F.when(s != "", s).otherwise(d)


def image_captions(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Pages -> ``(url, img_idx, src, caption, source)`` with source
    'alt' or 'figcaption'; a figure-wrapped image with BOTH yields two
    rows (downstream fusion arbitrates, the multi-source convention)."""
    src_ty = pages.schema[html_col].dataType.typeName()
    html = (F.decode(F.col(html_col), "UTF-8") if src_ty == "binary"
            else F.col(html_col))

    tags = F.regexp_extract_all(html, F.lit(IMG_TAG_RE), 0)
    alt_rows = (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(tags).alias("img_idx", "_tag"),
        )
        .select(
            "url", "img_idx",
            _src_of(F.col("_tag")).alias("src"),
            clean_cell(F.regexp_extract("_tag", _ALT_RE, 1))
            .alias("caption"),
        )
        .filter((F.col("src") != "") & (F.col("caption") != ""))
        .withColumn("source", F.lit("alt"))
    )

    # figcaption rows need the page-global img_idx of the figure's
    # image: join figure-scoped src back to the tag enumeration
    # (src occurring twice keeps the FIRST index — min, deterministic)
    idx_map = (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(tags).alias("img_idx", "_tag"),
        )
        .select("url", "img_idx", _src_of(F.col("_tag")).alias("src"))
        .filter(F.col("src") != "")
        .groupBy("url", "src")
        .agg(F.min("img_idx").alias("img_idx"))
    )
    figs = (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(F.regexp_extract_all(html, F.lit(FIGURE_RE), 1))
            .alias("_fig"),
        )
        .select(
            "url",
            _src_of(F.col("_fig")).alias("src"),
            clean_cell(F.regexp_extract("_fig", FIGCAP_RE, 1))
            .alias("caption"),
        )
        .filter((F.col("src") != "") & (F.col("caption") != ""))
    )
    fig_rows = figs.join(idx_map, ["url", "src"]) \
        .select("url", "img_idx", "src", "caption",
                F.lit("figcaption").alias("source"))

    return alt_rows.unionByName(fig_rows)
