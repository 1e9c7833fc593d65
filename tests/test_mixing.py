"""Tests for the data-mixing operators: LSH parameter planner,
epoch-capped token-budget water-filling, and DoReMi-style domain
reweighting (operators/dedup.py:lsh_plan,
operators/selection.py:token_budget_mix / doremi_domain_weights).

Expectations are hand-computed or checked against an independent
NumPy/brute-force reference inside the test, never against the
implementation itself.
"""

import math

import pytest

from baselinr_spark.operators.dedup import lsh_plan
from baselinr_spark.operators.selection import (
    doremi_domain_weights,
    token_budget_mix,
)


# ---------------------------------------------------------------- lsh_plan
def test_lsh_plan_matches_closed_form(spark):
    out = lsh_plan(
        spark, max_sig_len=32, s_hi=0.8, s_lo=0.4,
        recall_target=0.9, fp_budget=0.1,
    )
    rows = {(r["bands"], r["rows"]): r for r in out.collect()}
    # grid shape: every (b, r) with b*r <= 32
    assert len(rows) == sum(32 // b for b in range(1, 33))
    # spot-check the canonical MMDS numbers for b=16, r=2 (sig_len 32)
    r = rows[(16, 2)]
    p = lambda s: 1 - (1 - s**2) ** 16  # noqa: E731
    assert r["recall_hi"] == pytest.approx(p(0.8), abs=1e-12)
    assert r["fp_lo"] == pytest.approx(p(0.4), abs=1e-12)
    assert r["s50"] == pytest.approx((1 / 16) ** 0.5, abs=1e-12)
    assert bool(r["feasible"]) == (p(0.8) >= 0.9 and p(0.4) <= 0.1)
    # every feasibility flag agrees with the formula
    for (b, rr), row in rows.items():
        ph = 1 - (1 - 0.8**rr) ** b
        pl = 1 - (1 - 0.4**rr) ** b
        assert row["recall_hi"] == pytest.approx(ph, abs=1e-9)
        assert bool(row["feasible"]) == (ph >= 0.9 and pl <= 0.1)


# ---------------------------------------------------- token_budget_mix
def _brute_lambda(caps, ws, budget):
    """Independent reference: bisect λ so Σ min(λw, cap) = budget."""
    lo, hi = 0.0, max(c / w for c, w in zip(caps, ws)) + 1.0
    if sum(caps) <= budget:
        return float("inf")
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(mid * w, c) for c, w in zip(caps, ws)) < budget:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def _mix(spark, rows, **kw):
    df = spark.createDataFrame(rows, "domain string, n_tokens double, weight double")
    out = token_budget_mix(df, **kw)
    return {r["domain"]: r for r in out.collect()}


def test_token_budget_mix_hand_case(spark):
    # caps (E=2): web 200, code 40, books 20; B=130
    # ratios: web 200/.5=400, code 40/.3=133.3, books 20/.2=100
    # cutoff: books+code capped -> lam=(130-60)/.5=140 >= 133.3 ok,
    # < 400 ok.  alloc: web 70, code 40, books 20.
    got = _mix(
        spark,
        [("web", 100.0, 0.5), ("code", 20.0, 0.3), ("books", 10.0, 0.2)],
        budget=130.0, max_epochs=2.0,
    )
    assert got["web"]["alloc_tokens"] == pytest.approx(70.0)
    assert got["code"]["alloc_tokens"] == pytest.approx(40.0)
    assert got["books"]["alloc_tokens"] == pytest.approx(20.0)
    assert not got["web"]["capped"]
    assert got["code"]["capped"] and got["books"]["capped"]
    assert got["web"]["epochs"] == pytest.approx(0.7)
    assert all(r["feasible"] for r in got.values())


def test_token_budget_mix_nobody_capped(spark):
    got = _mix(
        spark,
        [("a", 100.0, 0.5), ("b", 100.0, 0.5)],
        budget=50.0, max_epochs=1.0,
    )
    # lam = 50/1.0 = 50 < min ratio 200 -> alloc 25/25, nobody capped
    assert got["a"]["alloc_tokens"] == pytest.approx(25.0)
    assert not got["a"]["capped"] and not got["b"]["capped"]


def test_token_budget_mix_infeasible_budget(spark):
    got = _mix(
        spark,
        [("a", 10.0, 0.5), ("b", 10.0, 0.5)],
        budget=100.0, max_epochs=2.0,
    )
    # sum caps = 40 < 100 -> everyone capped, feasible False
    assert got["a"]["alloc_tokens"] == pytest.approx(20.0)
    assert got["a"]["capped"] and got["b"]["capped"]
    assert not got["a"]["feasible"]


def test_token_budget_mix_matches_bisection(spark):
    rows = [
        ("d%02d" % i, float(10 + 37 * i % 90), float(1 + (i * 13) % 7))
        for i in range(12)
    ]
    budget, E = 700.0, 3.0
    got = _mix(spark, rows, budget=budget, max_epochs=E)
    caps = [E * r[1] for r in rows]
    ws = [r[2] for r in rows]
    lam = _brute_lambda(caps, ws, budget)
    total = 0.0
    for (d, n, w), cap in zip(rows, caps):
        want = min(lam * w, cap)
        assert got[d]["alloc_tokens"] == pytest.approx(want, rel=1e-6)
        total += got[d]["alloc_tokens"]
    assert total == pytest.approx(budget, rel=1e-6)


def test_token_budget_mix_ratio_ties(spark):
    # two domains with identical cap/weight ratio straddling the cutoff
    got = _mix(
        spark,
        [("a", 10.0, 1.0), ("b", 10.0, 1.0), ("c", 100.0, 1.0)],
        budget=60.0, max_epochs=2.0,
    )
    # caps 20,20,200; ratios 20,20,200. capped={a,b}: lam=(60-40)/1=20
    # >= 20 ok, < 200 ok. alloc a=b=20, c=20.
    assert got["a"]["alloc_tokens"] == pytest.approx(20.0)
    assert got["b"]["alloc_tokens"] == pytest.approx(20.0)
    assert got["c"]["alloc_tokens"] == pytest.approx(20.0)
    s = sum(r["alloc_tokens"] for r in got.values())
    assert s == pytest.approx(60.0)


# ------------------------------------------------ doremi_domain_weights
def test_doremi_weights_hand_corpus(spark):
    docs = spark.createDataFrame(
        [
            ("web", "the cat sat"),
            ("web", "the dog sat"),
            ("code", "def def foo"),
        ],
        "domain string, text string",
    )
    out = {r["domain"]: r for r in doremi_domain_weights(docs, eta=1.0, k=0.5).collect()}

    # independent NumPy-free reference
    corpus = {
        "web": ["the", "cat", "sat", "the", "dog", "sat"],
        "code": ["def", "def", "foo"],
    }
    c_all, c_dom = {}, {d: {} for d in corpus}
    for d, toks in corpus.items():
        for t in toks:
            c_all[t] = c_all.get(t, 0) + 1
            c_dom[d][t] = c_dom[d].get(t, 0) + 1
    V = len(c_all)
    N = sum(c_all.values())
    k = 0.5
    expect = {}
    for d, toks in corpus.items():
        nd = len(toks)
        hg = -sum(
            c * math.log((c_all[w] + k) / (N + k * V))
            for w, c in c_dom[d].items()
        ) / nd
        ho = -sum(
            c * math.log((c + k) / (nd + k * V))
            for w, c in c_dom[d].items()
        ) / nd
        expect[d] = (nd, hg, ho)
    uw = {
        d: (nd / N) * math.exp(max(0.0, hg - ho))
        for d, (nd, hg, ho) in expect.items()
    }
    z = sum(uw.values())
    for d, (nd, hg, ho) in expect.items():
        assert out[d]["n_tokens"] == nd
        assert out[d]["h_global"] == pytest.approx(hg, rel=1e-9)
        assert out[d]["h_own"] == pytest.approx(ho, rel=1e-9)
        assert out[d]["weight"] == pytest.approx(uw[d] / z, rel=1e-9)
    assert sum(r["weight"] for r in out.values()) == pytest.approx(1.0)


def test_doremi_upweights_poorly_fit_domain(spark):
    # 'rare' domain shares no vocabulary with the bulk -> big excess
    rows = [("bulk", "alpha beta gamma delta")] * 8 + [
        ("rare", "zeta zeta eta theta")
    ]
    docs = spark.createDataFrame(rows, "domain string, text string")
    out = {r["domain"]: r for r in doremi_domain_weights(docs).collect()}
    assert out["rare"]["excess"] > out["bulk"]["excess"]
    # weight boost vs raw share is larger for the poorly-fit domain
    boost_rare = out["rare"]["weight"] / out["rare"]["share"]
    boost_bulk = out["bulk"]["weight"] / out["bulk"]["share"]
    assert boost_rare > boost_bulk


# ------------------------------------------------- domain_rate_shrunk
def test_domain_rate_shrunk_hand_case(spark):
    from baselinr_spark.operators.selection import domain_rate_shrunk

    rows = (
        [("big", True)] * 80 + [("big", False)] * 20      # rate .8, n=100
        + [("tiny", False)] * 2                            # rate 0, n=2
    )
    df = spark.createDataFrame(rows, "domain string, keep boolean")
    out = {r["domain"]: r for r in
           domain_rate_shrunk(df, "domain", "keep", prior_strength=50).collect()}
    p = 80 / 102  # corpus rate
    assert out["big"]["rate"] == pytest.approx(0.8)
    assert out["big"]["shrunk_rate"] == pytest.approx((80 + 50 * p) / 150)
    assert out["tiny"]["rate"] == 0.0
    # tiny domain reverts most of the way to the corpus mean
    assert out["tiny"]["shrunk_rate"] == pytest.approx((0 + 50 * p) / 52)
    assert out["tiny"]["shrunk_rate"] > 0.7


def test_domain_rate_shrunk_order_preserved_at_equal_n(spark):
    from baselinr_spark.operators.selection import domain_rate_shrunk

    rows = [("a", True)] * 30 + [("a", False)] * 10 + \
           [("b", True)] * 10 + [("b", False)] * 30
    df = spark.createDataFrame(rows, "domain string, keep boolean")
    out = {r["domain"]: r["shrunk_rate"] for r in
           domain_rate_shrunk(df, "domain", "keep").collect()}
    assert out["a"] > out["b"]  # shrinkage never reorders equal-n domains
