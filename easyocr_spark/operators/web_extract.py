"""Main-content extraction from markup and layout — the north rule's
named extraction axes (HTML boilerplate strip via DOM heuristics;
PDF/layout parse) made runnable on this corpus.

The driver tables carry plain text, so each query first SYNTHESIZES the
structured form deterministically from (doc_id, text) — a full HTML
page with nav/ads/script/footer chrome around the real text, and a
two-column positioned line layout — identically in the DuckDB oracle
(the pii_scan augmentation pattern). The EXTRACTION bodies never look
at the augmentation rule: they are the corpus-agnostic heuristics a
real pipeline runs (Readability/Boilerpipe-style link-density blocks;
column-detection + reading-order sort), and the planted ground truth
makes them exactly verifiable — the extracted main content must equal
the original document text byte-for-byte.

Both queries are pure JVM-side regex/array codegen — narrow
projections (HTML) plus the per-doc layout windows — no Python in the
row path, scaling like the parquet scan.

Reference parity note: EasyOCR consumes images, not markup
(easyocr/easyocr.py:385 readtext takes image bytes); these operators
are the round brief's extraction-tier additions, not reference ports.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- HTML
LINK_DENSITY_MAX_MILLI = 300  # Boilerpipe-ish: drop blocks >30% link text
MIN_BLOCK_WORDS = 3
BLOCK_SPLIT_RE = r"</(?:p|div|nav|footer|header|li|aside)>"
TAG_RE = r"<[^>]*>"
ANCHOR_TEXT_RE = r"<a [^>]*>([^<]*)</a>"
SCRIPT_STYLE_RE = r"(?s)<(script|style)[^>]*>.*?</(script|style)>"


def _block_text(b: Column) -> Column:
    return F.trim(
        F.regexp_replace(F.regexp_replace(b, TAG_RE, " "), r"\s+", " ")
    )


def html_extract(docs: DataFrame) -> DataFrame:
    """DOM-heuristic main-content extraction (the Readability /
    Boilerpipe recipe, declaratively): strip script/style wholesale,
    split the page into closing-tag blocks, keep a block when its
    LINK DENSITY (anchor-text chars / visible chars, milli) is at most
    LINK_DENSITY_MAX_MILLI and it has at least MIN_BLOCK_WORDS words —
    navigation, ad boxes and link-heavy footers fail the density test,
    paragraphs pass. Extracted main text = kept blocks joined with a
    space, whitespace-normalized.

    The planted truth makes this exactly checkable: on the synthetic
    pages the extraction must recover the ORIGINAL document text, so
    the output carries matches_original computed against md5(text).

    The page build is inline (chrome = nav links, an ad box, a script,
    a style block, a link-heavy footer; the doc text split into two
    <p> blocks at the token midpoint; doc_id % 3 varies the nav width)
    and mirrored exactly in the oracle CTE.

    Output: (doc_id, n_blocks, n_kept, main_words, main_md5,
    matches_original)."""
    toks = F.split(F.col("text"), r"\s+")
    pages = docs.select(
        "doc_id",
        F.md5(
            F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
        ).alias("orig_md5"),
        toks.alias("toks"),
    )
    half = F.expr("(size(toks) + 1) div 2")
    p1 = F.array_join(F.slice("toks", F.lit(1), half), " ")
    p2 = F.when(
        F.size("toks") > half,
        F.array_join(F.slice("toks", half + 1, F.size("toks") - half), " "),
    ).otherwise(F.lit(""))
    nav = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit('<a href="/">home</a> <a href="/a">about</a>'),
    ).otherwise(
        F.lit(
            '<a href="/">home</a> <a href="/a">about</a> '
            '<a href="/c">contact</a> <a href="/n">news</a>'
        )
    )
    html = F.concat(
        F.lit("<html><head><title>d"),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p {margin:0}</style></head><body><nav>"),
        nav,
        F.lit(
            '</nav><div class="ad"><a href="/buy">buy now</a> '
            '<a href="/click">click here</a></div><p>'
        ),
        p1,
        F.lit("</p><p>"),
        p2,
        F.lit("</p><script>var x = 1;</script><footer>"
              '<a href="/privacy">privacy</a> terms</footer></body></html>'),
    )
    staged = pages.select(
        "doc_id",
        "orig_md5",
        F.split(
            F.regexp_replace(html, SCRIPT_STYLE_RE, " "), BLOCK_SPLIT_RE
        ).alias("blocks"),
    )
    txt = lambda b: _block_text(b)  # noqa: E731

    def _link_len(b: Column) -> Column:
        return F.aggregate(
            F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), 1),
            F.lit(0),
            lambda acc, t: acc + F.length(F.trim(t)),
        )

    def _keep(b: Column) -> Column:
        t = txt(b)
        return (
            (F.size(F.split(t, r"\s+")) >= MIN_BLOCK_WORDS)
            & (t != "")
            & (
                _link_len(b) * 1000
                <= F.length(t) * LINK_DENSITY_MAX_MILLI
            )
        )

    kept = F.filter(F.col("blocks"), _keep)
    main = F.trim(
        F.regexp_replace(
            F.array_join(F.transform(kept, txt), " "), r"\s+", " "
        )
    )
    return staged.select(
        "doc_id",
        F.size("blocks").cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
        F.size(F.split(main, r"\s+")).cast("long").alias("main_words"),
        F.md5(main).alias("main_md5"),
        (F.md5(main) == F.col("orig_md5")).alias("matches_original"),
    )


def duckdb_html_extract_sql(table: str = "documents") -> str:
    block_txt = (
        "trim(regexp_replace(regexp_replace(b, '<[^>]*>', ' ', 'g'),"
        " '\\s+', ' ', 'g'))"
    )
    link_len = (
        "list_reduce(list_prepend(0::BIGINT, list_transform("
        "regexp_extract_all(b, '<a [^>]*>([^<]*)</a>', 1),"
        " t -> length(trim(t))::BIGINT)), (acc, x) -> acc + x)"
    )
    keep = (
        f"len(regexp_split_to_array({block_txt}, '\\s+')) >= {MIN_BLOCK_WORDS} "
        f"AND {block_txt} != '' "
        f"AND {link_len} * 1000 <= length({block_txt}) * {LINK_DENSITY_MAX_MILLI}"
    )
    return f"""
    WITH pages AS (
      SELECT doc_id,
             md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS orig_md5,
             regexp_split_to_array(text, '\\s+') AS toks
      FROM {table}
    ),
    built AS (
      SELECT doc_id, orig_md5,
        '<html><head><title>d' || doc_id ||
        '</title><style>p {{margin:0}}</style></head><body><nav>' ||
        CASE WHEN doc_id % 3 = 0
             THEN '<a href="/">home</a> <a href="/a">about</a>'
             ELSE '<a href="/">home</a> <a href="/a">about</a> ' ||
                  '<a href="/c">contact</a> <a href="/n">news</a>'
        END ||
        '</nav><div class="ad"><a href="/buy">buy now</a> ' ||
        '<a href="/click">click here</a></div><p>' ||
        array_to_string(toks[1:(len(toks)+1)//2], ' ') ||
        '</p><p>' ||
        CASE WHEN len(toks) > (len(toks)+1)//2
             THEN array_to_string(toks[(len(toks)+1)//2+1:len(toks)], ' ')
             ELSE '' END ||
        '</p><script>var x = 1;</script><footer>' ||
        '<a href="/privacy">privacy</a> terms</footer></body></html>'
          AS html
      FROM pages
    ),
    blk AS (
      SELECT doc_id, orig_md5,
             regexp_split_to_array(
               regexp_replace(html,
                 '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
               '</(?:p|div|nav|footer|header|li|aside)>') AS blocks
      FROM built
    ),
    picked AS (
      SELECT doc_id, orig_md5, blocks,
             list_filter(blocks, b -> {keep}) AS kept
      FROM blk
    )
    SELECT doc_id,
           len(blocks)::BIGINT AS n_blocks,
           len(kept)::BIGINT AS n_kept,
           len(regexp_split_to_array(
             trim(regexp_replace(coalesce(array_to_string(
               list_transform(kept, b -> {block_txt}), ' '), ''),
               '\\s+', ' ', 'g')), '\\s+'))::BIGINT AS main_words,
           md5(trim(regexp_replace(coalesce(array_to_string(
             list_transform(kept, b -> {block_txt}), ' '), ''),
             '\\s+', ' ', 'g'))) AS main_md5,
           (md5(trim(regexp_replace(coalesce(array_to_string(
             list_transform(kept, b -> {block_txt}), ' '), ''),
             '\\s+', ' ', 'g'))) = orig_md5) AS matches_original
    FROM picked
    """


# -------------------------------------------------- PDF-style layout parse
LINE_TOKENS = 4      # tokens per rendered line
ROWS_PER_COL = 4     # lines per column
COLS_PER_PAGE = 2    # two-column layout
X_LEFT_MILLI = 150   # column x anchors
X_COL_STEP_MILLI = 400
Y_TOP_MILLI = 100
Y_STEP_MILLI = 50


def layout_reading_order(docs: DataFrame) -> DataFrame:
    """PDF/layout parse — reading-order reconstruction from positioned
    text lines (the extraction step a PDF pipeline runs after the
    low-level text dump): given an UNORDERED set of
    (page, x, y, line_text) boxes, detect the two-column layout per
    page (x midpoint split between the observed min and max line x —
    the classic column heuristic) and emit the text in reading order
    (page, column, y). The layout synthesis distributes the doc's
    tokens into 4-token lines column-major over 2x4 pages, so a
    correct parse must recover the ORIGINAL token order —
    matches_original is the per-doc invariant, exactly as the OCR
    flagship's span-sequence equality.

    Plan: the line table is a per-doc Generate (explode) — linear; the
    column threshold is a per-(doc, page) min/max window; the
    reconstruction is ONE per-doc aggregation whose sort_array runs on
    that document's OWN lines (bounded by doc size, never cross-doc).

    Output: (doc_id, n_pages, n_lines, text_md5, matches_original)."""
    per_page = ROWS_PER_COL * COLS_PER_PAGE
    toks = F.split(F.col("text"), r"\s+")
    staged = docs.select(
        "doc_id",
        F.md5(
            F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))
        ).alias("orig_md5"),
        toks.alias("toks"),
    )
    n_lines = F.expr(f"(size(toks) + {LINE_TOKENS} - 1) div {LINE_TOKENS}")
    lines = staged.select(
        "doc_id",
        "orig_md5",
        F.explode(
            F.sequence(F.lit(0), n_lines - 1)
        ).alias("j"),
        F.col("toks"),
    ).select(
        "doc_id",
        "orig_md5",
        (F.col("j") / per_page).cast("long").alias("page"),
        (
            F.lit(X_LEFT_MILLI)
            + ((F.col("j") % per_page) / ROWS_PER_COL).cast("long")
            * X_COL_STEP_MILLI
        ).alias("x_milli"),
        (
            F.lit(Y_TOP_MILLI)
            + (F.col("j") % ROWS_PER_COL) * Y_STEP_MILLI
        ).alias("y_milli"),
        F.array_join(
            F.slice(
                "toks", F.col("j") * LINE_TOKENS + 1, F.lit(LINE_TOKENS)
            ),
            " ",
        ).alias("line_text"),
    )
    # ---- extraction body (corpus-agnostic from here): unordered lines
    # -> column split at the per-page x midpoint -> reading-order sort
    from pyspark.sql import Window

    wpage = Window.partitionBy("doc_id", "page")
    with_col = lines.select(
        "doc_id",
        "orig_md5",
        "page",
        "y_milli",
        "x_milli",
        "line_text",
        (
            F.col("x_milli") * 2
            >= F.min("x_milli").over(wpage) + F.max("x_milli").over(wpage)
        ).cast("int").alias("col"),
    )
    rebuilt = (
        with_col.groupBy("doc_id", "orig_md5")
        .agg(
            (F.max("page") + 1).cast("long").alias("n_pages"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "page", "col", "y_milli", "x_milli",
                                "line_text",
                            )
                        )
                    ),
                    lambda s: s["line_text"],
                ),
                " ",
            ).alias("joined"),
        )
    )
    return rebuilt.select(
        "doc_id",
        "n_pages",
        "n_lines",
        F.md5(
            F.trim(F.regexp_replace("joined", r"\s+", " "))
        ).alias("text_md5"),
        (
            F.md5(F.trim(F.regexp_replace("joined", r"\s+", " ")))
            == F.col("orig_md5")
        ).alias("matches_original"),
    )


def duckdb_layout_sql(table: str = "documents") -> str:
    per_page = ROWS_PER_COL * COLS_PER_PAGE
    return f"""
    WITH staged AS (
      SELECT doc_id,
             md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS orig_md5,
             regexp_split_to_array(text, '\\s+') AS toks
      FROM {table}
    ),
    lines AS (
      SELECT doc_id, orig_md5,
             j // {per_page} AS page,
             {X_LEFT_MILLI} + ((j % {per_page}) // {ROWS_PER_COL})
               * {X_COL_STEP_MILLI} AS x_milli,
             {Y_TOP_MILLI} + (j % {ROWS_PER_COL}) * {Y_STEP_MILLI} AS y_milli,
             array_to_string(
               toks[CAST(j * {LINE_TOKENS} + 1 AS INT)
                    :CAST(least((j + 1) * {LINE_TOKENS}, len(toks)) AS INT)],
               ' ') AS line_text
      FROM staged,
           UNNEST(range(0, (len(toks) + {LINE_TOKENS} - 1)
                           // {LINE_TOKENS})) AS t(j)
    ),
    with_col AS (
      SELECT *,
             CASE WHEN x_milli * 2 >=
               min(x_milli) OVER (PARTITION BY doc_id, page)
               + max(x_milli) OVER (PARTITION BY doc_id, page)
             THEN 1 ELSE 0 END AS col
      FROM lines
    ),
    rebuilt AS (
      SELECT doc_id, orig_md5,
             (max(page) + 1)::BIGINT AS n_pages,
             count(*)::BIGINT AS n_lines,
             string_agg(line_text, ' '
               ORDER BY page, col, y_milli, x_milli) AS joined
      FROM with_col GROUP BY 1, 2
    )
    SELECT doc_id, n_pages, n_lines,
           md5(trim(regexp_replace(joined, '\\s+', ' ', 'g'))) AS text_md5,
           (md5(trim(regexp_replace(joined, '\\s+', ' ', 'g'))) = orig_md5)
             AS matches_original
    FROM rebuilt
    """
