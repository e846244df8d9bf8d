"""Hybrid-retrieval fusion: the RRF combination is exact integer
arithmetic over the two arms' ranks, so these tests recompute the
fused score in Python from the output's own rank columns (a broken
join, a lost arm, or a float drift all break the identity) and pin
the canonical RRF ordering property. Oracle equality is covered by
the registry sweep in test_oracle_queries.py."""

from __future__ import annotations

from data_engineering_pipeline_spark.queries.search import (
    RRF_ARM_DEPTH,
    RRF_K,
    RRF_SCALE,
    RRF_TOP,
    search_hybrid_rrf,
)


def test_rrf_score_is_exact_function_of_arm_ranks(spark, sf_smoke):
    out = search_hybrid_rrf(spark, sf_smoke).collect()
    assert 0 < len(out) <= RRF_TOP
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    for r in out:
        expect = 0
        if r.rank_lex is not None:
            assert 1 <= r.rank_lex <= RRF_ARM_DEPTH
            expect += RRF_SCALE // (RRF_K + r.rank_lex)
        if r.rank_sem is not None:
            assert 1 <= r.rank_sem <= RRF_ARM_DEPTH
            expect += RRF_SCALE // (RRF_K + r.rank_sem)
        assert r.rank_lex is not None or r.rank_sem is not None
        assert r.rrf == expect, r
    # fused order is non-increasing rrf with doc_id tie-break
    for a, b in zip(out, out[1:]):
        assert a.rrf > b.rrf or (a.rrf == b.rrf and a.doc_id < b.doc_id)


def test_rrf_both_arms_beat_single_arm_at_same_depth(spark, sf_smoke):
    """The point of RRF: presence in BOTH lists at moderate rank
    outscores presence in one list at rank 1 once ranks pass the
    crossover (2/(k+r) > 1/(k+1) for r < k+2). Verified on the real
    output whenever both kinds of docs exist; the formula identity
    above guarantees it structurally."""
    out = search_hybrid_rrf(spark, sf_smoke).collect()
    both = [r for r in out if r.rank_lex is not None and r.rank_sem is not None]
    single_top = RRF_SCALE // (RRF_K + 1)
    for r in both:
        if r.rank_lex <= RRF_K + 1 and r.rank_sem <= RRF_K + 1:
            assert r.rrf > single_top
