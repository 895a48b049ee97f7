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
