"""Property tests for the frontier/dedup operators added late in
round 5: CDC chunk tiling, robots longest-match vs a brute-force
Python reference, HRW minimal movement. Each example is a BATCH
evaluated in one Spark job (the test_url_properties.py discipline)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from baselinr_spark.operators.cdc import cdc_chunks
from baselinr_spark.operators.sharding import hrw_assign
from baselinr_spark.functions.urltools import robots_filter

_text = st.text(
    alphabet="abcdefghij XYZ.,!", min_size=0, max_size=120
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_text, min_size=1, max_size=10))
def test_cdc_chunks_tile_any_text(spark, texts):
    """For ANY input text: chunks are gapless, ordered, start at 1,
    and cover exactly the normalized length; empty normalized text
    yields no chunks."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    rows = cdc_chunks(df, "doc_id", "text").collect()
    per = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        got = sorted(per.get(i, []), key=lambda r: r["chunk_idx"])
        if not norm:
            assert got == []
            continue
        pos = 1
        for r in got:
            assert r["start"] == pos
            pos += r["chunk_len"]
        assert pos - 1 == len(norm)


def _robots_ref(path, rules):
    """Brute-force reference: longest matching prefix wins; allow wins
    length ties; no match = allowed."""
    best = None
    for pfx, allow in rules:
        if path.startswith(pfx):
            key = (len(pfx), allow)
            if best is None or key > best[0]:
                best = (key, pfx, allow)
    if best is None:
        return True, None
    return best[2], best[1]


_pfx = st.text(alphabet="ab/", min_size=1, max_size=6).map(lambda s: "/" + s)
_path = st.text(alphabet="ab/", min_size=0, max_size=10).map(lambda s: "/" + s)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(_pfx, st.booleans()), min_size=1, max_size=6,
             unique_by=lambda r: r),
    st.lists(_path, min_size=1, max_size=10),
)
def test_robots_filter_matches_bruteforce(spark, rules, paths):
    urls = spark.createDataFrame(
        [("d.com", p) for p in sorted(set(paths))], ["domain", "path"]
    )
    rdf = spark.createDataFrame(
        [("d.com", p, a) for p, a in rules], ["domain", "path_prefix", "allow"]
    )
    got = {r["path"]: (r["allowed"], r["matched_prefix"])
           for r in robots_filter(urls, rdf).collect()}
    for p in set(paths):
        exp_allow, exp_pfx = _robots_ref(p, rules)
        assert got[p] == (exp_allow, exp_pfx), (p, rules)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.sampled_from(["s1", "s2", "s3", "s4", "s5", "s6"]),
             min_size=2, max_size=6, unique=True),
)
def test_hrw_minimal_movement_any_shardset(spark, shards):
    """Dropping the LAST shard of any shard set moves exactly the keys
    that lived on it."""
    ids = spark.range(60).withColumnRenamed("id", "doc_id")
    before = {r["doc_id"]: r["shard"]
              for r in hrw_assign(ids, "doc_id", shards).collect()}
    dropped = shards[-1]
    after = {r["doc_id"]: r["shard"]
             for r in hrw_assign(ids, "doc_id", shards[:-1]).collect()}
    for k, s in before.items():
        if s == dropped:
            assert after[k] != dropped
        else:
            assert after[k] == s
