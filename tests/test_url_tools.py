"""URL canonicalization + host-blocklist operators (crawl-frontier
hygiene): planted-case semantics and the broadcast-join plan shape."""

from pyspark.sql import functions as F

from databricks_pdf_ocr_spark.operators import linkgraph


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = linkgraph.url_normalize(df).collect()
    return {r["url"]: (r["url_norm"], r["host"]) for r in rows}


def test_url_normalize_planted_cases(spark):
    got = _norm(spark, [
        "HTTP://Example.COM:80/Path/File?q=1#frag",
        "https://example.com:443/",
        "http://example.com:8080/x",          # non-default port kept
        "https://Sub.Example.org",            # authority-only -> '/'
        "http://example.com/a?",              # empty query dropped
        "http://example.com/a?b=2",           # real query kept
        "HTTPS://X.Y/UPPER/Case?Q=Z",         # path/query case kept
    ])
    assert got["HTTP://Example.COM:80/Path/File?q=1#frag"] == \
        ("http://example.com/Path/File?q=1", "example.com")
    assert got["https://example.com:443/"] == \
        ("https://example.com/", "example.com")
    assert got["http://example.com:8080/x"] == \
        ("http://example.com:8080/x", "example.com")
    assert got["https://Sub.Example.org"] == \
        ("https://sub.example.org/", "sub.example.org")
    assert got["http://example.com/a?"] == \
        ("http://example.com/a", "example.com")
    assert got["http://example.com/a?b=2"] == \
        ("http://example.com/a?b=2", "example.com")
    assert got["HTTPS://X.Y/UPPER/Case?Q=Z"] == \
        ("https://x.y/UPPER/Case?Q=Z", "x.y")


def test_url_normalize_is_narrow(spark):
    """Chained regexps only — the plan must contain no exchange."""
    df = spark.createDataFrame([("http://A.b/c#d",)], "url string")
    plan = linkgraph.url_normalize(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_host_suffixes(spark):
    df = spark.createDataFrame([("a.b.co.uk",), ("com",)], "host string")
    rows = df.select(linkgraph.host_suffixes(F.col("host"))
                     .alias("s")).collect()
    assert rows[0]["s"] == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]
    assert rows[1]["s"] == ["com"]


def test_blocklist_filter_semantics_and_plan(spark):
    rows = [(i, h) for i, h in enumerate([
        "ads.tracker.com",          # subdomain of blocked suffix
        "tracker.com",              # exact match
        "nottracker.com",           # must survive (no '.tracker.com' cut)
        "deep.sub.ads.tracker.com",  # deep subdomain blocked
        "fine.example.org",         # survives
        "tracker.com.evil.net",     # prefix only -> survives
    ])]
    df = spark.createDataFrame(rows, "id int, host string")
    out = linkgraph.blocklist_filter(df, ["tracker.com"])
    kept = sorted(r["host"] for r in out.collect())
    assert kept == ["fine.example.org", "nottracker.com",
                    "tracker.com.evil.net"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, \
        "blocklist must join broadcast, not nested-loop"
    assert "NestedLoop" not in plan


def test_frontier_schedule_politeness_invariant(spark):
    """No host may exceed per_wave rows in any wave; waves are dense
    from 0 per host; higher priority fetches first."""
    rows = [(i, f"h{i % 3}.com", i * 7 % 13) for i in range(40)]
    df = spark.createDataFrame(rows, "id int, host string, priority int")
    out = linkgraph.frontier_schedule(df, per_wave=2).collect()
    per = {}
    for r in out:
        per.setdefault((r["host"], r["wave"]), []).append(r)
    assert all(len(v) <= 2 for v in per.values())
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        waves = sorted({r["wave"] for r in rs})
        assert waves == list(range(len(waves)))          # dense from 0
        # priority monotone: a later wave never outranks an earlier one
        best_next = [max(r["priority"] for r in rs if r["wave"] == w)
                     for w in waves]
        worst_prev = [min(r["priority"] for r in rs if r["wave"] == w)
                      for w in waves]
        for w in range(1, len(waves)):
            assert best_next[w] <= worst_prev[w - 1]


def test_anchor_texts_pairing_and_normalization(spark):
    """Two-group extraction stays positionally paired; inner markup is
    stripped, whitespace collapsed, case folded; relative hrefs and
    empty anchors are dropped."""
    html = ("<p><a href='http://A.example/x'>First  <b>Link</b></a> "
            "<a href=\"https://b.example/y?z=1\">second\n link</a> "
            "<a href='/relative'>skip me</a> "
            "<a href='http://a.example/z'><img src='i.png'></a> "
            "<a href='http://a.example/w'>first link</a></p>")
    docs = spark.createDataFrame(
        [("d1", [{"kind": "html", "text": html,
                  "media_ref": None, "offset": 0}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    got = {(r["dst_host"], r["anchor"]): r["n"]
           for r in linkgraph.anchor_texts(docs).collect()}
    assert got == {("a.example", "first link"): 2,
                   ("b.example", "second link"): 1}
