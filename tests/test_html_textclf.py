"""HTML -> text extraction (functions/html.py) and the label-frequency
classifier (ml/textclf.py): hand-computed expectations on literal
inputs, plus the sf0.001 oracle parity for the two registry queries
(covered by tests/test_oracle_parity.py's full sweep as well)."""

from __future__ import annotations

import pytest

from data_pipeline_mlops_spark.functions.html import (
    html_extract,
    strip_html,
    strip_html_sql,
)

from pyspark.sql import functions as F


PAGE = (
    '<html><head><title>T</title><style>p {color: red}</style>'
    '<script>var x = "<p>gotcha</p>";</script></head>'
    "<body><h1>Head line</h1><!-- secret -->"
    "<p>Alpha &amp; beta &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>"
    "<div>Second&nbsp;line</div>"
    "<ul><li>one</li><li>two</li></ul>"
    "<a href='/x'>link text</a></body></html>"
)
EXPECTED = (
    "T\nHead line\nAlpha & beta <tag> \"q\" 's'\n"
    "Second line\none\ntwo\nlink text"
)


def test_strip_html_hand_computed(spark):
    out = (
        spark.range(1)
        .select(strip_html(F.lit(PAGE)).alias("t"))
        .collect()[0]["t"]
    )
    assert out == EXPECTED


def test_strip_html_edge_cases(spark):
    cases = {
        # script containing tags and a fake closer inside a string is
        # removed as a unit (non-greedy stops at the real </script>)
        "<script>a<b>c</script>rest": "rest",
        # entity single-pass: &amp;lt; is the TEXT "&lt;", not "<"
        "x &amp;lt; y": "x &lt; y",
        # unclosed tag survives as text (not markup)
        "a < b and c > d": "a < b and c > d",
        # comments spanning lines
        "<!-- a\nb -->keep": "keep",
        "": "",
        "plain text": "plain text",
    }
    rows = [(i, s) for i, (s, _) in enumerate(cases.items())]
    df = spark.createDataFrame(rows, "i int, s string").select(
        "i", strip_html(F.col("s")).alias("t")
    )
    got = {r["i"]: r["t"] for r in df.collect()}
    for i, (_, want) in enumerate(cases.items()):
        assert got[i] == want, (i, got[i], want)


def test_strip_html_sql_twin_matches_spark(spark):
    import duckdb

    samples = [
        PAGE,
        "<p>a</p><p>b</p>",
        "x &amp;lt; y <br> z",
        "<SCRIPT>upper</SCRIPT>tail<STYLE>s</STYLE>",
        "no markup at all",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i int, s string"
    )
    got_spark = {
        r["i"]: r["t"]
        for r in df.select("i", strip_html(F.col("s")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        (got_sql,) = con.execute(
            f"SELECT {strip_html_sql('?')}", [s]
        ).fetchone() or (None,)
        assert got_sql == got_spark[i], (i, got_sql, got_spark[i])


def test_html_extract_link_accounting(spark):
    df = spark.createDataFrame(
        [
            (1, "<p>body text here</p><a href='/'>Home</a>"
                "<a href='/b'>B &amp; C</a>"),
            (2, "<p>no links</p>"),
            (3, "<a>only link</a>"),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert out[1]["n_links"] == 2
    # anchors stripped individually then joined: "Home B & C"
    assert out[1]["text"] == "body text here\nHome B & C"
    assert out[2]["n_links"] == 0 and out[2]["link_text_share"] == 0.0
    assert out[3]["text"] == "only link"
    assert out[3]["link_text_share"] == 1.0


def test_html_extract_plan_is_map_side(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_textclf_hand_computed(spark):
    from data_pipeline_mlops_spark.ml import textclf

    train = spark.createDataFrame(
        [
            ("py", "def return def lambda"),
            ("py", "def class import"),
            ("en", "the cat sat on the mat"),
            ("en", "the dog"),
        ],
        "label string, text string",
    )
    model = textclf.train_token_frequency_model(train)
    m = {
        (r["token"], r["label"]): (
            r["token_label_count"], r["label_tokens"]
        )
        for r in model.collect()
    }
    assert m[("def", "py")] == (3, 7)
    assert m[("the", "en")] == (3, 8)

    docs = spark.createDataFrame(
        [
            (1, "def lambda xyz"),        # py: (3+1)/7 vs en: none
            (2, "the the unknown"),       # en only
            (3, "zzz qqq"),               # no vocabulary overlap: absent
            (4, "def the"),               # py 3/7 > en 3/8
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textclf.classify(docs, model).collect()}
    assert out[1]["pred_label"] == "py"
    assert out[1]["matched_tokens"] == 2 and out[1]["score_num"] == 4
    assert out[1]["score"] == pytest.approx(4 / 7)
    assert out[2]["pred_label"] == "en" and out[2]["score_num"] == 6
    assert 3 not in out
    assert out[4]["pred_label"] == "py"  # 3/7 ≈ .43 > 3/8 = .375


def test_textclf_recovers_planted_vocabulary(spark):
    # two synthetic dialects with disjoint core vocabulary + shared
    # filler: classifier must recover the dialect on held-out docs
    from data_pipeline_mlops_spark.ml import textclf

    rows = []
    for i in range(40):
        core = "alpha beta gamma" if i % 2 == 0 else "delta epsilon zeta"
        rows.append((i, "l%d" % (i % 2), f"{core} filler common words {i}"))
    df = spark.createDataFrame(rows, "doc_id long, label string, text string")
    model = textclf.train_token_frequency_model(
        df.where("doc_id < 30").select("label", "text")
    )
    pred = textclf.classify(
        df.where("doc_id >= 30").select("doc_id", "text"), model
    )
    got = {r["doc_id"]: r["pred_label"] for r in pred.collect()}
    assert got == {i: "l%d" % (i % 2) for i in range(30, 40)}


@pytest.mark.parametrize(
    "name", ["doc_html_extract", "doc_label_classifier", "crawl_pipeline"]
)
def test_new_queries_oracle_parity(spark, name):
    from data_pipeline_mlops_spark.registry import QUERIES
    from tests.conftest import SF_SMALL
    from tests.oracle_compare import compare, duckdb_conn

    con = duckdb_conn(SF_SMALL)
    spec = QUERIES[name]
    result = compare(spec.spark(spark, SF_SMALL), con, spec.oracle)
    con.close()
    assert result["cols_match"], result
    assert result["rows_match"], result
    assert result["values_match"], result


def test_crawl_pipeline_dedup_and_gate(spark):
    from data_pipeline_mlops_spark.registry import QUERIES
    from tests.conftest import SF_SMALL

    df = QUERIES["crawl_pipeline"].spark(spark, SF_SMALL)
    rows = df.collect()
    ids = {r["doc_id"] for r in rows}
    # planted duplicate bodies (doc_id % 9 == 7) collapse to exactly
    # one survivor per furniture variant: 7 (no <ul>) and 16 (<ul>)
    assert {i for i in ids if i % 9 == 7} == {7, 16}
    # survivors carry extraction artifacts: no tags, label line intact
    for r in rows[:20]:
        assert "<" not in r["text"].replace("beta <3", "")
        assert r["text"].startswith("Doc (crawl)\n")
    # every surviving text is unique (exact dedup held)
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))


def test_crawl_pipeline_single_shuffle(spark):
    from data_pipeline_mlops_spark.registry import QUERIES
    from tests.conftest import SF_SMALL

    df = QUERIES["crawl_pipeline"].spark(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one hash-key exchange for the dedup window, nothing else wide
    assert plan.count("Exchange hashpartitioning") == 1
