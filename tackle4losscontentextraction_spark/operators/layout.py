"""PDF/layout parsing — page-box spans and reading-order linearization.

The north star names "PDF/layout parse" alongside HTML extraction; the
reference's fallback extractor role is extractContent.py:208-217 (take
the raw fetched body when structured extraction fails). The box table
has two entry surfaces:

- :func:`synth_layout_boxes` — the deterministic arithmetic generator
  (mirrored in the DuckDB oracle, so the driver gate covers the whole
  path without binary fixtures);
- operators/pdf.py (round 4) — a REAL binary surface: `render_pdf`
  emits complete FlateDecode-compressed PDFs from a box table and
  `parse_pdf` tokenizes actual PDF content streams back into it; the
  round trip is exact on synth_layout_boxes' output (test_pdf), so
  :func:`linearize_layout` is proven over parsed binary documents,
  not only over the generator.

Column detection and reading-order linearization
(:func:`linearize_layout`) are the scale-designed operators both
surfaces feed.

Box model: (doc_id, box_id, page, x, y, w, h, text) — one row per
layout block, coordinates in points, origin top-left (the pdfminer /
pdfium convention modulo y-flip).

Reading order (the deterministic rule, same in both engines):

  1. column detection: a box belongs to column
     ``floor(x_center * n_cols / page_width)`` (x-bucketing — the
     degenerate-but-deterministic form of x-clustering; a quantile
     split learns column boundaries at scale but is oracle-hostile);
  2. linearize: sort by (page, column, y, x, box_id) — top-to-bottom
     within a column, columns left-to-right, pages in order — and
     join block texts with newlines.

Scale: one hash aggregation keyed on doc_id (boxes per doc are tens to
thousands — far under any aggregation-buffer limit); the sort is
per-doc inside the collected array (``array_sort`` on a struct whose
field order IS the sort key), so there is no global sort and no window
— the only shuffle is the groupBy(doc_id) exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOXES_PER_PAGE = 6
N_COLS = 2
PAGE_WIDTH = 600.0
COL_WIDTH = 300.0  # synthetic two-column layout
BOX_W = 260.0
BOX_H = 200.0


def synth_layout_boxes(docs: DataFrame) -> DataFrame:
    """Deterministic page-box table derived from ``documents`` — the
    parse-kernel stand-in (see module docstring).

    Box i of a doc (i in reading order) lands on page ``i // 6``, in a
    2-column grid (3 rows per column), with small arithmetic jitter on
    x/y so the linearizer has to actually bucket x-centers rather than
    equality-match, and carries a 30-char slice of the doc text.
    Pure projection + explode — no shuffle.
    """
    n_boxes = (F.lit(8) + F.col("n_chars") % 7).cast("int")
    boxes = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "text",
        "n_chars",
        F.explode(F.sequence(F.lit(0), n_boxes - 1)).alias("box_id"),
    )
    i = F.col("box_id")
    j = i % BOXES_PER_PAGE
    col0 = (j / (BOXES_PER_PAGE // N_COLS)).cast("int")  # 0,0,0,1,1,1
    row0 = j % (BOXES_PER_PAGE // N_COLS)
    start = (F.lit(1) + (i * 30) % F.greatest(F.col("n_chars") - 30, F.lit(1))).cast("int")
    return boxes.select(
        "doc_id",
        F.col("box_id").cast("bigint").alias("box_id"),
        (i / BOXES_PER_PAGE).cast("bigint").alias("page"),
        (col0 * F.lit(COL_WIDTH) + 20 + (i % 5)).cast("double").alias("x"),
        (row0 * F.lit(250.0) + 40 + (i * 3) % 7).cast("double").alias("y"),
        F.lit(BOX_W).alias("w"),
        F.lit(BOX_H).alias("h"),
        F.substring(F.col("text"), start, 30).alias("text"),
    )


def detect_column(x: Column, w: Column, n_cols: int = N_COLS,
                  page_width: float = PAGE_WIDTH) -> Column:
    """Column index of a box by x-center bucketing, clamped to range."""
    raw = F.floor((x + w / 2) * n_cols / F.lit(page_width)).cast("int")
    return F.greatest(F.lit(0), F.least(raw, F.lit(n_cols - 1)))


def linearize_layout(
    boxes: DataFrame, n_cols: int = N_COLS, page_width: float = PAGE_WIDTH
) -> DataFrame:
    """(doc_id, n_pages, n_boxes, linearized) — reading-order text.

    The sort key is the struct field order (page, col, y, x, box_id),
    so ``array_sort`` IS the reading-order comparator; ``box_id`` is
    the unique tie-break. One groupBy(doc_id) shuffle total.
    """
    keyed = boxes.select(
        "doc_id",
        F.struct(
            F.col("page"),
            detect_column(F.col("x"), F.col("w"), n_cols, page_width).alias("col"),
            F.col("y"),
            F.col("x"),
            F.col("box_id"),
            F.col("text"),
        ).alias("b"),
    )
    agg = keyed.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("b")).alias("bs"),
    )
    return agg.select(
        "doc_id",
        (F.array_max(F.transform("bs", lambda b: b["page"])) + 1).cast("bigint").alias("n_pages"),
        F.size("bs").cast("bigint").alias("n_boxes"),
        F.array_join(F.transform("bs", lambda b: b["text"]), "\n").alias("linearized"),
    )
