"""Property tests for URL canonicalization (hypothesis-generated URLs,
complementing the 12-case table in test_webcrawl_ops.py).

Each example is a BATCH of generated URLs evaluated in one Spark job —
per-URL jobs would make hypothesis exploration prohibitively slow."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from baselinr_spark.functions.urltools import canonical_url_expr

_label = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1,
                 max_size=8).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_seg = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
                        "0123456789._~-", min_size=1, max_size=10)
# 'ref' and utm_* are tracking params by design — excluded from the
# "real param" generator so assertions about preserved params hold
_pname = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
                 max_size=6).filter(lambda s: s != "ref" and not s.startswith("utm"))


@st.composite
def _url(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = www + ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "".join("/" + draw(_seg) for _ in range(draw(st.integers(0, 3))))
    path += draw(st.sampled_from(["", "/", "//"]))
    real = [f"{draw(_pname)}={draw(_seg)}" for _ in range(draw(st.integers(0, 2)))]
    track = draw(st.lists(st.sampled_from(
        ["utm_source=x", "utm_campaign=y", "fbclid=abc", "gclid=1", "ref=hn"]
    ), max_size=2))
    params = draw(st.permutations(real + track))
    query = "?" + "&".join(params) if params else ""
    frag = draw(st.sampled_from(["", "#frag", "#a/b?c"]))
    # expected survivors: the real params in their PERMUTED (URL) order —
    # the canonicalizer preserves order, it does not sort
    kept = [p for p in params if p in real]
    return scheme + "://" + host + port + path + query + frag, kept


def _canon_batch(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, u string")
    return [
        r["c"]
        for r in df.select("i", canonical_url_expr(F.col("u")).alias("c"))
        .orderBy("i").collect()
    ]


@settings(max_examples=12, deadline=None)
@given(st.lists(_url(), min_size=1, max_size=12))
def test_canonicalization_properties(spark, batch):
    urls = [u for u, _ in batch]
    canon = _canon_batch(spark, urls)
    # idempotence: canon is a fixed point
    again = _canon_batch(spark, canon)
    assert again == canon
    for (raw, real_params), c in zip(batch, canon):
        # fragment never survives
        assert "#" not in c
        # host block is lowercase, never www., never a default port
        m = re.match(r"^(https?)://([^/?#]*)", c)
        assert m, c
        scheme, host = m.group(1), m.group(2)
        assert host == host.lower() and not host.startswith("www.")
        assert not (scheme == "http" and host.endswith(":80"))
        assert not (scheme == "https" and host.endswith(":443"))
        # tracking params dropped, real params preserved in order
        qs = c.split("?", 1)[1] if "?" in c else ""
        kept = [p for p in qs.split("&") if p]
        assert kept == real_params, (raw, c)
        # path never ends with '/'
        path = re.sub(r"^https?://[^/?#]*", "", c).split("?", 1)[0]
        assert not path.endswith("/")


@settings(max_examples=12, deadline=None)
@given(st.lists(_url(), min_size=1, max_size=8))
def test_trivial_variants_collapse(spark, batch):
    """The crawl-variant transformations the canonicalizer exists to
    merge — case changes, added fragment, added tracking params — all
    land on the same canonical URL as the original."""
    urls = [u for u, _ in batch]
    variants = []
    for u in urls:
        scheme, rest = u.split("://", 1)
        variants.extend([
            scheme.upper() + "://" + rest,
            u if "#" in u else u + "#extra",
            u + ("&" if "?" in u.split("#")[0] else "?") + "utm_medium=z"
            if "#" not in u else u,
        ])
    canon = _canon_batch(spark, urls)
    vcanon = _canon_batch(spark, variants)
    for i in range(len(urls)):
        assert vcanon[3 * i] == canon[i]
        assert vcanon[3 * i + 1] == canon[i]
        assert vcanon[3 * i + 2] == canon[i]
