"""BM25 lexical retrieval vs a direct Python reference, topk==join
cross-shape equality, validations, and the plan shapes each variant
claims (topk: zero corpus shuffle + TakeOrderedAndProject; join: no
cartesian, partial-agg postings)."""
from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.retrieval import BM25_B, BM25_K1, bm25_join, bm25_topk

DOCS = [
    (1, "spark window merge join the fast table scan"),
    (2, "window window window merge slow"),
    (3, "completely unrelated words appear here often"),
    (4, "spark spark spark spark window"),
    (5, "merge merge scan scan scan window spark data data"),
    (6, None),
    (7, "tiny doc"),
]


def _tok(t):
    return re.findall(r"[a-z]{3,}", t.lower()) if t else []


def _ref(docs, terms, k1=BM25_K1, b=BM25_B):
    toks = {d: _tok(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d in toks:
        s, hit = 0.0, False
        for t in terms:
            tf = toks[d].count(t)
            dfq = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
            s += (
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl))
            )
            hit = hit or tf > 0
        if hit:
            out[d] = round(s, 4)
    return sorted(out.items(), key=lambda x: (-x[1], x[0]))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_topk_matches_reference(docs_df):
    q = ["spark", "window", "merge"]
    got = [(r["id"], r["score"]) for r in bm25_topk(docs_df, q, k=10).collect()]
    assert got == _ref(DOCS, q)


def test_topk_k_truncates_in_rank_order(docs_df):
    q = ["spark", "window", "merge"]
    got = [(r["id"], r["score"]) for r in bm25_topk(docs_df, q, k=2).collect()]
    assert got == _ref(DOCS, q)[:2]


def test_join_matches_topk_and_reference(spark, docs_df):
    q1, q2 = ["spark", "window", "merge"], ["scan", "data"]
    qdf = spark.createDataFrame(
        [(100, q1), (200, q2)], "query_id long, terms array<string>"
    )
    rows = sorted(
        bm25_join(docs_df, qdf, k=3).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    )
    by_q = {
        qid: [(r["id"], r["score"]) for r in rows if r["query_id"] == qid]
        for qid in (100, 200)
    }
    assert by_q[100] == _ref(DOCS, q1)[:3]
    assert by_q[200] == _ref(DOCS, q2)[:3]
    assert [r["rank"] for r in rows if r["query_id"] == 100] == [1, 2, 3]


def test_rare_term_outranks_common_on_equal_tf(spark):
    # idf check: one doc matching a rare term beats one matching a common
    # term at identical tf/dl
    docs = [(i, "common filler words here") for i in range(1, 9)]
    docs += [(9, "rare filler words here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, ["rare", "common"], k=1).collect()
    assert got[0]["id"] == 9


def test_validations(docs_df):
    with pytest.raises(ValueError):
        bm25_topk(docs_df, [])
    with pytest.raises(ValueError):
        bm25_topk(docs_df, ["spark", "spark"])
    with pytest.raises(ValueError):
        bm25_topk(docs_df, ["spark"], k=0)
    with pytest.raises(ValueError):
        bm25_topk(docs_df, ["spark"], b=1.5)


def test_join_rejects_duplicate_terms_in_query(spark, docs_df):
    bad = spark.createDataFrame(
        [(1, ["scan", "scan"])], "query_id long, terms array<string>"
    )
    with pytest.raises(Exception, match="duplicate terms in query 1"):
        bm25_join(docs_df, bad).collect()


def test_join_null_terms_query_yields_nothing(spark, docs_df):
    qdf = spark.createDataFrame(
        [(1, None), (2, ["spark"])], "query_id long, terms array<string>"
    )
    rows = bm25_join(docs_df, qdf, k=3).collect()
    assert {r["query_id"] for r in rows} == {2}


def test_topk_plan_never_shuffles_corpus(docs_df):
    plan = (
        bm25_topk(docs_df, ["spark", "merge"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    assert "Python" not in plan
    # the only exchange is the one-row stats aggregate (SinglePartition);
    # the scored corpus itself never hash-shuffles (the BNLJ cross in the
    # plan is the 1-row broadcast stats frame — the unigram_nll idiom)
    assert "Exchange hashpartitioning" not in plan
    # the tokenizer must run ONCE per row per side (corpus pass + stats
    # pass): a match-filter pushed under the projection used to inline it
    assert plan.count("regexp_extract_all") == 2


def test_join_plan_partial_agg_no_cartesian(spark, docs_df):
    qdf = spark.createDataFrame(
        [(1, ["spark", "merge"])], "query_id long, terms array<string>"
    )
    plan = (
        bm25_join(docs_df, qdf, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert "partial_count" in plan  # map-side combine on the tf aggregate


# ---------------------------------------------------------------- RRF ----

RANKED_A = [  # (query_id, id, rank) — e.g. BM25
    (1, 10, 1), (1, 11, 2), (1, 12, 3),
    (2, 20, 1), (2, 21, 2),
]
RANKED_B = [  # e.g. cosine / quality prior
    (1, 11, 1), (1, 13, 2),
    (2, 21, 1), (2, 20, 2), (2, 22, 3),
]


def _rrf_ref(lists, k_rrf=60, k=10):
    """Fixed-order Python reference: per (query, doc), sum the per-list
    reciprocal ranks in LIST ORDER — the same IEEE op sequence the
    operator's pivot-then-fixed-expression emits."""
    keys = sorted({(q, d) for lst in lists for q, d, _ in lst})
    out = {}
    for q, d in keys:
        s = 0.0
        for lst in lists:
            r = next((r for qq, dd, r in lst if (qq, dd) == (q, d)), None)
            s = s + (1.0 / (float(k_rrf) + r) if r is not None else 0.0)
        out.setdefault(q, []).append((d, s))
    res = {}
    for q, items in out.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        res[q] = [(d, s, i + 1) for i, (d, s) in enumerate(items[:k])]
    return res


def _mk_ranked(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, id long, rank int"
    )


def test_rrf_matches_reference_bit_exact(spark):
    from ocr_spark.operators.retrieval import rrf_fuse

    got = rrf_fuse(
        [_mk_ranked(spark, RANKED_A), _mk_ranked(spark, RANKED_B)], k=10
    ).collect()
    want = _rrf_ref([RANKED_A, RANKED_B])
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r["query_id"], []).append(
            (r["id"], r["score"], r["rank"])
        )
    for q in got_by_q:
        got_by_q[q].sort(key=lambda t: t[2])
    # == on floats: the contract is BIT equality (fixed-order IEEE sum,
    # no transcendental), not approx-equality
    assert got_by_q == want


def test_rrf_absent_doc_contributes_zero(spark):
    from ocr_spark.operators.retrieval import rrf_fuse

    rows = {
        (r["query_id"], r["id"]): r["score"]
        for r in rrf_fuse(
            [_mk_ranked(spark, RANKED_A), _mk_ranked(spark, RANKED_B)]
        ).collect()
    }
    assert rows[(1, 10)] == 1.0 / 61.0          # list A only
    assert rows[(1, 13)] == 1.0 / 62.0          # list B only
    assert rows[(1, 11)] == 1.0 / 62.0 + 1.0 / 61.0


def test_rrf_consensus_beats_single_list_winner(spark):
    from ocr_spark.operators.retrieval import rrf_fuse

    top = {
        r["query_id"]: r["id"]
        for r in rrf_fuse(
            [_mk_ranked(spark, RANKED_A), _mk_ranked(spark, RANKED_B)]
        )
        .filter(F.col("rank") == 1)
        .collect()
    }
    # doc 11 (ranks 2+1) outscores doc 10 (rank 1, one list):
    # 1/62+1/61 > 1/61
    assert top[1] == 11
    # doc 21 (2nd+1st) vs doc 20 (1st+2nd): equal score — id tie-break
    assert top[2] == 20


def test_rrf_three_lists_and_k_cut(spark):
    from ocr_spark.operators.retrieval import rrf_fuse

    c = [(1, 12, 1), (1, 10, 2)]
    lists = [RANKED_A, RANKED_B, c]
    got = rrf_fuse([_mk_ranked(spark, r) for r in lists], k=2).collect()
    want = _rrf_ref(lists, k=2)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["id"], r["score"], r["rank"])
        )
    for q in by_q:
        by_q[q].sort(key=lambda t: t[2])
        assert len(by_q[q]) <= 2
    assert by_q == want


def test_rrf_validations(spark):
    from ocr_spark.operators.retrieval import rrf_fuse

    one = _mk_ranked(spark, RANKED_A)
    with pytest.raises(ValueError, match="2 rankings"):
        rrf_fuse([one])
    with pytest.raises(ValueError, match="k_rrf"):
        rrf_fuse([one, one], k_rrf=0)
    with pytest.raises(ValueError, match="k must be positive"):
        rrf_fuse([one, one], k=0)


def test_rrf_plan_has_no_corpus_shuffle(spark):
    """Fusion is union → one hash aggregate → one window: no join node
    at all (the pivot replaces a self-join)."""
    from ocr_spark.operators.retrieval import rrf_fuse

    plan = (
        rrf_fuse([_mk_ranked(spark, RANKED_A), _mk_ranked(spark, RANKED_B)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Union" in plan and "Window" in plan


def test_tfidf_topk_matches_python_reference(spark):
    """tf·idf with smooth idf vs a driver-side reference; ranked on the
    ROUNDED score, ties (score desc, term asc)."""
    import math
    import re
    from collections import Counter

    from ocr_spark.operators.retrieval import tfidf_topk_terms

    texts = {
        0: "spark spark spark query engine",
        1: "query engine for the lake",
        2: "the the the lake lake spark",
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {}
    for r in tfidf_topk_terms(df, k=2).collect():
        got.setdefault(r["id"], []).append((r["rank"], r["term"], r["tf"], r["score"]))

    def toks(s):
        return re.findall(r"[a-z]{3,}", s.lower())

    n_docs = len(texts)
    dfreq = Counter()
    tfs = {}
    for did, s in texts.items():
        tfs[did] = Counter(toks(s))
        for t in tfs[did]:
            dfreq[t] += 1
    for did in texts:
        scored = sorted(
            (
                (-round(tf * (math.log((n_docs + 1.0) / (dfreq[t] + 1.0)) + 1.0), 4), t, tf)
                for t, tf in tfs[did].items()
            )
        )[:2]
        want = [
            (rank + 1, t, tf, -s) for rank, (s, t, tf) in enumerate(scored)
        ]
        assert sorted(got[did]) == [
            (rk, t, tf, pytest.approx(sc)) for rk, t, tf, sc in want
        ], did


def test_tfidf_rank_cut_and_tie_break(spark):
    """All terms tie on tf and df -> alphabetical rank, k cuts."""
    from ocr_spark.operators.retrieval import tfidf_topk_terms

    df = spark.createDataFrame(
        [(0, "zebra apple mango")], "doc_id long, text string"
    )
    rows = sorted(
        (r["rank"], r["term"]) for r in tfidf_topk_terms(df, k=2).collect()
    )
    assert rows == [(1, "apple"), (2, "mango")]


def test_tfidf_validation_and_plan(spark):
    import pytest as _pytest

    from ocr_spark.operators.retrieval import tfidf_topk_terms

    with _pytest.raises(ValueError):
        tfidf_topk_terms(None, k=0)
    df = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    plan = (
        tfidf_topk_terms(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan  # df table broadcasts by default
