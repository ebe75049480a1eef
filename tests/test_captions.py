"""Image-caption mining (operators/captions.py)."""

from __future__ import annotations

from sigraph_spark.operators.captions import image_captions


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _rows(df):
    return {(r["url"], r["img_idx"], r["src"], r["caption"], r["source"])
            for r in df.collect()}


def test_alt_pairs_and_empty_alt_dropped(spark):
    html = ('<img src="/a.jpg" alt="A red fox">'
            '<img alt="Order swapped" src="/b.png">'
            '<img src="/spacer.gif" alt="">'
            '<img src="/nocap.png">')
    got = _rows(image_captions(_pages(spark, [("u", html)])))
    assert got == {
        ("u", 0, "/a.jpg", "A red fox", "alt"),
        ("u", 1, "/b.png", "Order swapped", "alt"),
    }


def test_figcaption_joins_to_global_index(spark):
    html = ('<img src="/lead.jpg" alt="Lead">'
            '<figure><img src="/fig.png">'
            "<figcaption>The <b>figure</b> caption</figcaption></figure>")
    got = _rows(image_captions(_pages(spark, [("u", html)])))
    assert got == {
        ("u", 0, "/lead.jpg", "Lead", "alt"),
        ("u", 1, "/fig.png", "The figure caption", "figcaption"),
    }


def test_both_sources_yield_two_rows(spark):
    html = ('<figure><img src="/x.png" alt="Alt text">'
            "<figcaption>Cap text</figcaption></figure>")
    got = _rows(image_captions(_pages(spark, [("u", html)])))
    assert got == {
        ("u", 0, "/x.png", "Alt text", "alt"),
        ("u", 0, "/x.png", "Cap text", "figcaption"),
    }


def test_lazy_loading_data_src(spark):
    html = ('<img data-src="/lazy.jpg" alt="Lazy loaded">'
            '<img src="/eager.png" data-src="/ignored.png" alt="Eager">')
    got = _rows(image_captions(_pages(spark, [("u", html)])))
    assert got == {
        ("u", 0, "/lazy.jpg", "Lazy loaded", "alt"),
        ("u", 1, "/eager.png", "Eager", "alt"),  # real src wins
    }


def test_binary_html_and_no_images(spark):
    pages = spark.createDataFrame(
        [("u", bytearray('<img src="/z.jpg" alt="Bin page">'.encode())),
         ("v", bytearray(b"<p>no images at all</p>"))],
        "url string, html binary")
    got = _rows(image_captions(pages))
    assert got == {("u", 0, "/z.jpg", "Bin page", "alt")}
