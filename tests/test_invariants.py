"""Semantic invariants for the new pipeline operators — properties the
oracle comparison can't express (it only proves both engines agree)."""

from __future__ import annotations


def test_mixture_weights_invariants(spark, sf_oracle):
    """Weights form a distribution and the repeat factors conserve the
    token budget: sum_s(repeat_s * tokens_s) == total corpus tokens."""
    from iceberg_query_engine_spark.queries import operators_suite

    rows = operators_suite.op_mixture_weights(spark, sf_oracle).collect()
    assert rows, "at least one source"
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    tok_total = sum(r.n_tokens for r in rows)
    budget = sum(r.repeat_factor * r.n_tokens for r in rows)
    assert abs(budget / tok_total - 1.0) < 1e-4
    # temperature < 1 flattens: smallest source is upsampled (repeat>1),
    # largest downsampled (repeat<1)
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    assert by_tokens[0].repeat_factor >= by_tokens[-1].repeat_factor


def test_text_repetition_invariants(spark, sf_oracle):
    """Fractions are true fractions, and a maximally repetitive doc
    would be rejected while the synthetic corpus largely passes."""
    from iceberg_query_engine_spark.queries import text_suite

    rows = text_suite.text_repetition(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.top2_frac <= 1.0
        assert 0.0 <= r.dup3_frac <= 1.0
        assert r.keep == (r.top2_frac <= 0.2 and r.dup3_frac <= 0.3)


def test_recall_eval_invariants(spark, sf_oracle):
    """Recall is in [0,1] per (k, query), and every evaluated k level
    reports every query."""
    from iceberg_query_engine_spark.queries import similarity_suite as s

    rows = s.sim_recall_eval(spark, sf_oracle).collect()
    ks = {r.k for r in rows}
    assert ks == set(s.RECALL_KS)
    for k in ks:
        qids = [r.q_id for r in rows if r.k == k]
        assert len(qids) == s.RECALL_N_QUERIES
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)


def test_zorder_bounds_both_dimensions(spark, sf_oracle):
    """The data-skipping guarantee: EVERY layout bucket bounds BOTH
    interleaved dimensions to a fraction of their full range (16
    buckets = 2 z bits per dim -> ideal 1/4 span; allow curve-crossing
    slack). A single-column sort bounds one dim and leaves the other
    at ~100% — the property rank-interleaved z-ordering exists to fix."""
    import datetime as dt

    from iceberg_query_engine_spark.queries import operators_suite

    rows = operators_suite.op_zorder(spark, sf_oracle).collect()
    assert len(rows) == 16
    lo_c = min(r.min_cust for r in rows)
    hi_c = max(r.max_cust for r in rows)
    parse = lambda s: dt.datetime.fromisoformat(s)
    lo_d = min(parse(r.min_date) for r in rows)
    hi_d = max(parse(r.max_date) for r in rows)
    span_c = hi_c - lo_c
    span_d = (hi_d - lo_d).days
    # buckets that straddle a z-quadrant boundary can span a full dim
    # (ntile splits by count, not by z value), so the guarantee is
    # statistical: the typical bucket bounds both dims tightly
    fr_c = sorted((r.max_cust - r.min_cust) / span_c for r in rows)
    fr_d = sorted(
        (parse(r.max_date) - parse(r.min_date)).days / span_d for r in rows
    )
    assert sum(1 for x in fr_c if x <= 0.6) >= 12, fr_c
    assert sum(1 for x in fr_d if x <= 0.6) >= 12, fr_d
    # and the MEDIAN bucket is near the ideal 1/4-span (2 z bits/dim)
    assert fr_c[len(fr_c) // 2] <= 0.5, fr_c
    assert fr_d[len(fr_d) // 2] <= 0.5, fr_d
    # rank-tiling balances rows across buckets (ntile property)
    ns = [r.n for r in rows]
    assert max(ns) - min(ns) <= 1
