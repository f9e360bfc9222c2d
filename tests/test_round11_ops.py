"""Round-11 additions: cap-fire census (no-silent-caps monitor),
ANCHOR_RE DOTALL cross-engine alignment, URL canonicalization + dedup,
opt-out gate, HTML end-to-end refinery composition."""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _mini_sf_dir(spark, tmp_path, docs_rows):
    """A tmp sf_dir whose documents table is the given rows and whose
    other tables are symlinks into sf0.001 (load_tables opens all)."""
    from daxos_spark.catalog import TABLES

    d = tmp_path / "sf"
    d.mkdir()
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    spark.createDataFrame(
        pd.DataFrame(docs_rows, columns=["doc_id", "source", "text"])
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_cap_census_fires_on_planted_family(spark, tmp_path):
    """The no-silent-caps monitor: on a corpus with a planted duplicate
    family, the census (a) matches duckdb exactly, (b) raises the alarm
    (rows_dropped > 0) at the small ladder steps where a cap WOULD drop
    the family, (c) stays quiet at every lane's real production cap on
    a healthy-sized corpus, and (d) names exactly the mass a capped
    dedup run silently skips."""
    import duckdb

    from daxos_spark.plans.docpipe2 import (
        _cap_census_oracle,
        d_simhash_neardup,
        t_cap_census,
    )

    fam = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pair = "one two three four five six seven eight nine ten"
    rows = (
        [(i, "web", fam) for i in range(5)]  # family of 5 > ladder step 2
        + [(10, "web", pair), (11, "web", pair)]
        + [(20, "web", "lorem ipsum dolor sit amet consectetur adipiscing")]
    )
    sf = _mini_sf_dir(spark, tmp_path, rows)

    got = {
        (r["lane"], r["cap"]): (
            r["n_buckets"],
            r["max_bucket"],
            r["n_over"],
            r["rows_dropped"],
        )
        for r in t_cap_census(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    oracle = {
        (r[0], r[1]): tuple(r[2:])
        for r in con.execute(_cap_census_oracle()).fetchall()
    }
    assert got == oracle
    assert len(got) == 12  # 3 lanes x (3 ladder steps + real cap)

    # (b) the alarm fires at cap=2 in every lane (the family of 5
    # shares every band bucket and every shingle)
    for lane in ("lsh_shingle", "lsh_band", "simhash_band"):
        n_b, mx, n_over, dropped = got[(lane, 2)]
        assert n_over > 0 and dropped > 0, lane
        assert mx >= 5, lane  # the family is the max bucket

    # (c) quiet at the real caps — no bucket outgrows this corpus
    from daxos_spark.plans.docpipe import _LSH_BUCKET_CAP, _MAX_SHINGLE_DF
    from daxos_spark.plans.docpipe2 import _SIMHASH_BUCKET_CAP

    for lane, real in (
        ("lsh_shingle", _MAX_SHINGLE_DF),
        ("lsh_band", _LSH_BUCKET_CAP),
        ("simhash_band", _SIMHASH_BUCKET_CAP),
    ):
        assert got[(lane, real)][2:] == (0, 0), lane

    # (d) the pairing that makes the cap non-silent: a dedup run capped
    # at 2 flags ZERO family pairs — and the census at that threshold
    # is exactly the signal that says so
    capped_pairs = {
        (r["da"], r["db"]) for r in d_simhash_neardup(spark, sf, bucket_cap=2).collect()
    }
    assert capped_pairs == {(10, 11)}  # family silently absent...
    assert got[("simhash_band", 2)][3] >= 5 * 4  # ...but census names its mass


def test_anchor_re_dotall_cross_engine(spark):
    """ADVICE r10: without (?s), `.`'s line-terminator exclusion set
    differs between Java regex (excludes \\r) and RE2 (excludes only
    \\n), so an anchor whose inner text contains a bare \\r counted as
    link mass in duckdb but NOT in Spark. With (?is) both engines must
    count the identical anchor chars."""
    import duckdb

    from daxos_spark.functions.html import block_stats, sql_block_stats

    inner = "line one\rline two"  # bare \r — the exact divergence case
    html = f'<p><a href="/x">{inner}</a> tail words</p>'
    row = (
        spark.range(1)
        .select(F.lit(html).alias("html"))
        .select(block_stats("html").alias("st"))
        # Spark's [] indexing is 0-based: st[1] is the <p> inner block
        .select(F.expr("st[1].lc").alias("lc"), F.expr("st[1].txt").alias("txt"))
        .first()
    )
    # duckdb literal built via chr(13) (no escape-string dialect games);
    # duckdb's [] indexing is 1-based: s[2] is the same block
    duck_html = (
        "'<p><a href=\"/x\">line one' || chr(13) || 'line two</a> tail words</p>'"
    )
    lc_d, txt_d = duckdb.sql(
        f"SELECT s[2].lc, s[2].txt FROM (SELECT {sql_block_stats(duck_html)} AS s)"
    ).fetchone()
    assert row["lc"] == lc_d == len(inner)  # both count through the \r
    assert row["txt"] == txt_d == "line one line two tail words"
