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

Entities: the named core set (&amp; &lt; &gt; &quot; &nbsp; &apos;)
plus the numeric apostrophe are decoded after tag strip, before
whitespace collapse, in BOTH engines (see _ENTITIES); arbitrary
&#NN; stays literal (deterministic, shared).

Limitations (documented, deterministic): anchor inner text is counted
with inline tags intact (a nested tag inside <a> overcounts link
chars — conservative: pushes chrome-like blocks toward drop);
script/style bodies are treated as blocks and fail the word/density
gates only if they look like chrome. Both engines share every
limitation, so the cross-engine hash gate is exact.

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
# anchor matching needs one regex with ONE capture group for
# regexp_extract_all in both engines — the attribute-tolerant
# single-group form. (?s) is load-bearing for cross-engine identity:
# without it `.`'s line-terminator exclusion set DIFFERS between Java
# regex (excludes \r, U+0085, U+2028, U+2029) and RE2 (excludes only
# \n), so an anchor whose inner text contains a bare \r would count as
# link mass in duckdb but not Spark. DOTALL is supported identically by
# both engines and makes `.` truly universal, so multi-line anchors in
# real crawled HTML score the same link density on both sides.
ANCHOR_RE = r"(?is)<a(?:[\s/][^>]*)?>(.*?)</a>"
TAG_RE = r"<[^>]*>"
MIN_WORDS = 5
# link density keep-bound 0.3 expressed integrally: lc*10 <= chars*3
LINK_DENS_NUM, LINK_DENS_DEN = 3, 10

# named/numeric entities decoded AFTER tag strip (safe: a decoded '<'
# is plain text by then, never re-parsed) and BEFORE whitespace
# collapse (&nbsp; becomes a collapsible space). &amp; is decoded LAST
# so '&amp;lt;' round-trips to the literal '&lt;' per the HTML spec's
# single-decode semantics. The set is the named core + the numeric
# apostrophe — the entities that actually dominate crawled text;
# arbitrary &#NN; stays literal (documented, deterministic, and
# identical in both engines).
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def _decode_expr(expr: str, quote_fn) -> str:
    """Wrap ``expr`` in the chained replace() entity decode; quote_fn
    renders a python string as the dialect's string literal."""
    out = expr
    for ent, ch in _ENTITIES:
        out = f"replace({out}, {quote_fn(ent)}, {quote_fn(ch)})"
    return out


def _sql_q(s: str) -> str:
    """duckdb string literal (doubled-quote escaping)."""
    return "'" + s.replace("'", "''") + "'"


def _spark_q(s: str) -> str:
    """Spark SQL string literal (backslash escaping)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _spark_lit(pat: str) -> str:
    """Embed a regex in a Spark SQL single-quoted literal (backslashes
    are escape chars there; duckdb literals keep them raw)."""
    return pat.replace("\\", "\\\\")


def block_stats(html_col: str) -> Column:
    """array<struct<txt: string, lc: int>> — one entry per raw block:
    the tag-stripped whitespace-collapsed block text and its total
    anchor-text char count. Pure JVM higher-order expression."""
    stripped = f"regexp_replace(b, '{_spark_lit(TAG_RE)}', ' ')"
    decoded = _decode_expr(stripped, _spark_q)
    inner = _decode_expr("x", _spark_q)
    return F.expr(
        f"""
        transform(split({html_col}, '{_spark_lit(BLOCK_TAG_RE)}'),
          b -> struct(
            trim(regexp_replace({decoded}, '\\\\s+', ' ')) AS txt,
            coalesce(aggregate(
              transform(regexp_extract_all(b, '{_spark_lit(ANCHOR_RE)}', 1), x -> length({inner})),
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
    decoded = _decode_expr(f"regexp_replace(b, '{TAG_RE}', ' ', 'g')", _sql_q)
    inner = _decode_expr("x", _sql_q)
    return f"""list_transform(regexp_split_to_array({html_expr}, '{BLOCK_TAG_RE}'),
      b -> struct_pack(
        txt := trim(regexp_replace({decoded}, '\\s+', ' ', 'g')),
        lc := coalesce(list_sum(list_transform(
                regexp_extract_all(b, '{ANCHOR_RE}', 1), x -> len({inner}))), 0)
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


def page_text(html_expr: str) -> str:
    """Spark-SQL fragment: the whole page tag-stripped, entity-decoded,
    whitespace-collapsed (the raw-text face of the page, boilerplate
    included — what the refinery's stage-1 token mass counts)."""
    decoded = _decode_expr(
        f"regexp_replace({html_expr}, '{_spark_lit(TAG_RE)}', ' ')", _spark_q
    )
    return f"trim(regexp_replace({decoded}, '\\\\s+', ' '))"


def sql_page_text(html_expr: str) -> str:
    decoded = _decode_expr(f"regexp_replace({html_expr}, '{TAG_RE}', ' ', 'g')", _sql_q)
    return f"trim(regexp_replace({decoded}, '\\s+', ' ', 'g'))"
