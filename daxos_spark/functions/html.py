"""HTML main-content extraction — the boilerplate-removal stage of a
training-data pipeline (jusText / trafilatura shape; Pomikálek 2011).

Every text gate in the refinery (Gopher rules, perplexity, dedup)
assumes EXTRACTED text; this module supplies the extraction stage
itself as pure map-side JVM expressions — split the page into
block-level segments, score each block by text length and link
density, keep the content blocks, reassemble. Zero shuffles, zero
Python: at 100 TB the extraction pass is scan-bound, exactly where a
per-row Python UDF would dominate the cluster bill.

Block scoring (jusText-lite):
  - a block is CONTENT if it has >= MIN_WORDS words and its link
    density (chars inside <a> anchors / total block chars) is <= 0.3
    (the jusText "good" link-density bound); the length and density
    comparisons are pure-integer (lc*10 <= 3*chars) so both engines
    decide identically without float division.
  - navigation/ads/footer chrome fails on link density, titles and
    button stubs fail on length — the two published jusText signals
    that carry most of its accuracy; stopword density is available
    downstream via the Gopher gate the extracted text feeds.

Limitations (documented, deterministic): anchor inner text is counted
raw (a nested tag inside <a> overcounts link chars — conservative:
pushes chrome-like blocks toward drop); script/style bodies are
treated as blocks and fail the word/density gates only if they look
like chrome. Both engines share every limitation, so the cross-engine
hash gate is exact.

Spark and duckdb sides are generated from the SAME regex/threshold
constants so the two engines cannot drift. The patterns avoid
everything RE2 lacks (no backrefs, no lookaround), and tag names are
terminated by ``(?:[\\s/][^>]*)?>`` so ``p`` cannot match ``<pre>``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# block-level boundaries: splitting on these yields the candidate
# segments; inline tags (<a>, <b>, <span>, ...) stay inside the block
BLOCK_TAG_RE = (
    r"(?i)</?(?:html|head|title|body|div|p|br|ul|ol|li|h[1-6]|table|thead"
    r"|tbody|tr|td|th|nav|header|footer|article|section|aside|form"
    r"|blockquote)(?:[\s/][^>]*)?>"
)
ANCHOR_RE = r"(?i)<a[\s/>][^>]*?>(.*?)</a>|(?i)<a>(.*?)</a>"
TAG_RE = r"<[^>]*>"
MIN_WORDS = 5
# link density keep-bound 0.3 expressed integrally: lc*10 <= chars*3
LINK_DENS_NUM, LINK_DENS_DEN = 3, 10

# anchor matching needs one regex with ONE capture group for
# regexp_extract_all in both engines; the alternation above would need
# group juggling — use the simpler attribute-tolerant single-group form
ANCHOR_RE = r"(?i)<a(?:[\s/][^>]*)?>(.*?)</a>"


def _spark_lit(pat: str) -> str:
    """Embed a regex in a Spark SQL single-quoted literal (backslashes
    are escape chars there; duckdb literals keep them raw)."""
    return pat.replace("\\", "\\\\")


def block_stats(html_col: str) -> Column:
    """array<struct<txt: string, lc: int>> — one entry per raw block:
    the tag-stripped whitespace-collapsed block text and its total
    anchor-text char count. Pure JVM higher-order expression."""
    return F.expr(
        f"""
        transform(split({html_col}, '{_spark_lit(BLOCK_TAG_RE)}'),
          b -> struct(
            trim(regexp_replace(regexp_replace(b, '{_spark_lit(TAG_RE)}', ' '), '\\\\s+', ' ')) AS txt,
            coalesce(aggregate(
              transform(regexp_extract_all(b, '{_spark_lit(ANCHOR_RE)}', 1), x -> length(x)),
              0, (a, v) -> a + v), 0) AS lc
          ))
        """
    )


def keep_cond(s: str = "s") -> str:
    """Spark-SQL boolean over a block-stats struct ``s``: is this block
    main content? Integer-only math — both engines decide identically."""
    return (
        f"length({s}.txt) > 0 AND size(split({s}.txt, ' ')) >= {MIN_WORDS}"
        f" AND {s}.lc * {LINK_DENS_DEN} <= length({s}.txt) * {LINK_DENS_NUM}"
    )


def extract_main(stats_col: str) -> Column:
    """Reassembled main-content text: kept blocks joined in document
    order. One HOF chain — the stats array is evaluated once more for
    this consumer (bounded x2 total with the metrics consumer; never
    per-element re-evaluation)."""
    return F.expr(
        f"array_join(transform(filter({stats_col}, s -> {keep_cond('s')}),"
        f" x -> x.txt), ' ')"
    )


# ----------------------------------------------------------------- SQL side
# duckdb twins generated from the SAME constants (raw backslashes).


def sql_block_stats(html_expr: str) -> str:
    """duckdb: list<struct(txt, lc)> of block stats for ``html_expr``."""
    return f"""list_transform(regexp_split_to_array({html_expr}, '{BLOCK_TAG_RE}'),
      b -> struct_pack(
        txt := trim(regexp_replace(regexp_replace(b, '{TAG_RE}', ' ', 'g'), '\\s+', ' ', 'g')),
        lc := coalesce(list_sum(list_transform(
                regexp_extract_all(b, '{ANCHOR_RE}', 1), x -> len(x))), 0)
      ))"""


def sql_keep_cond(s: str = "s") -> str:
    return (
        f"len({s}.txt) > 0 AND len(string_split({s}.txt, ' ')) >= {MIN_WORDS}"
        f" AND {s}.lc * {LINK_DENS_DEN} <= len({s}.txt) * {LINK_DENS_NUM}"
    )


def sql_extract_main(stats_expr: str) -> str:
    return (
        f"array_to_string(list_transform(list_filter({stats_expr},"
        f" s -> {sql_keep_cond('s')}), x -> x.txt), ' ')"
    )
