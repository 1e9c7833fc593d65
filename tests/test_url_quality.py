"""URL frontier quality filter (functions/urltools.py:
url_quality_features) on hand-built planted cases."""

import pytest

from baselinr_spark.functions.urltools import url_quality_features

CASES = [
    # (id, url, expected_keep, note)
    (1, "https://example.com/articles/42", True, "clean"),
    (2, "https://example.com/a/b/c/d/e/f/g/h/i/42", False, "deep path"),
    (3, "https://d712345.biz/p/7", False, "digit host"),
    (4, "https://example.com/files/setup-9.exe", False, "binary ext"),
    (5, "https://example.com/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7", False,
     "param flood"),
    (6, "https://best-casino-3.example/p/3", False, "spam keyword"),
    (7, "https://example.com/p/" + "x" * 2100, False, "over-length"),
    (8, "https://example.com/p/9?id=3", True, "clean with params"),
    (9, "https://example.com/IMG.JPG", False, "ext is case-insensitive"),
    (10, "https://sub.example.co.uk/one/two/three?x=1&y=2", True,
     "depth 3 params 2 ok"),
]


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(
        [(i, u) for i, u, _, _ in CASES], ["doc_id", "url"]
    )
    return {r["doc_id"]: r for r in url_quality_features(df).collect()}


def test_keep_flags(feats):
    for i, _, keep, note in CASES:
        assert feats[i]["url_keep"] == keep, note


def test_feature_values(feats):
    assert feats[2]["path_depth"] == 10
    assert feats[5]["n_params"] == 7
    assert feats[4]["bad_ext"] and not feats[4]["spam_kw"]
    assert feats[6]["spam_kw"] and not feats[6]["bad_ext"]
    assert feats[9]["bad_ext"]
    # d712345.biz: 6 digits / 11 chars
    assert feats[3]["host_digit_ratio"] == pytest.approx(6 / 11)
    assert feats[7]["url_len"] > 2048
    assert feats[10]["path_depth"] == 3
    assert feats[10]["n_params"] == 2


def test_single_reason_is_sufficient(feats):
    # every planted drop fails on exactly the planted axis, so the
    # conjunction can't pass a URL that any single rule rejects
    assert not feats[2]["bad_ext"] and not feats[2]["spam_kw"]
    assert feats[2]["path_depth"] > 8


def test_robots_filter_longest_match_semantics(spark):
    """RFC 9309: /admin/public beats /admin; equal-length tie -> allow;
    no matching rule -> allowed with NULL matched_prefix."""
    from baselinr_spark.functions.urltools import robots_filter

    urls = spark.createDataFrame(
        [("d.com", "/admin/x"), ("d.com", "/admin/public/y"),
         ("d.com", "/free"), ("d.com", "/tie/z")],
        ["domain", "path"],
    )
    rules = spark.createDataFrame(
        [("d.com", "/admin", False), ("d.com", "/admin/public", True),
         ("d.com", "/tie/", False), ("d.com", "/tie/", True)],
        ["domain", "path_prefix", "allow"],
    )
    got = {r["path"]: r for r in robots_filter(urls, rules).collect()}
    assert not got["/admin/x"]["allowed"]
    assert got["/admin/x"]["matched_prefix"] == "/admin"
    assert got["/admin/public/y"]["allowed"]
    assert got["/admin/public/y"]["matched_prefix"] == "/admin/public"
    assert got["/free"]["allowed"]
    assert got["/free"]["matched_prefix"] is None
    assert got["/tie/z"]["allowed"]  # tie at same length -> allow wins
