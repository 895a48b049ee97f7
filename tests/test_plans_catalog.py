"""Catalog-wide plan audit: every registered query's plan is swept for
the scale-killer patterns that individual plan pins can miss.

The r5 round shipped three ops with single-partition global windows
through 622 green tests because no gate watched for the CLASS; this
sweep closes that hole for every query in `catalog.all_queries()`:

  (a) unpartitioned Window nodes over unbounded input (one task does
      ALL the work no matter the cluster size),
  (b) CartesianProduct (quadratic blowup),
  (c) BroadcastNestedLoopJoin over anything but a provably tiny side
      (the non-equi-join quadratic trap),
  (d) row-at-a-time Python evaluation (BatchEvalPython) — 10-100x
      slower than Arrow-vectorized; every Python node must be
      ArrowEvalPython / *InPandas unless deliberately allowlisted.

Bounded exceptions are allowlisted WITH justification — a new entry
must argue its input is bounded, not just silence the gate.
"""

from __future__ import annotations

import pytest

from iceberg_query_engine_spark.plans import introspect as pi
from iceberg_query_engine_spark.queries import catalog

# Unpartitioned windows allowed ONLY over provably bounded input.
WINDOW_ALLOWLIST: dict[str, str] = {
    "ev_path_transitions": (
        "global-share denominator runs over the event-type bigram grid "
        "(|event_types|^2 rows — dozens), never over raw events"
    ),
    "op_weighted_sample": (
        "rank attach AFTER orderBy().limit(20) — post-limit window over "
        "<=20 rows; the selection itself is TakeOrderedAndProject "
        "(plan-pinned in test_plans.py)"
    ),
    "ev_survival": (
        "Kaplan-Meier cumulative windows run over the per-lifetime-day "
        "grid (≤ corpus day-span rows, CALENDAR-bounded — independent "
        "of user count), after two full aggregates"
    ),
    "op_benford": (
        "share/chi2 windows run over the 9-row first-digit grid "
        "(bounded by construction) after the full aggregate"
    ),
}

# BroadcastNestedLoopJoin allowed ONLY when the broadcast side is a
# scalar/one-row aggregate or a deliberately tiny relation.
BNLJ_ALLOWLIST: dict[str, str] = {
    "ev_ab_test": "1-row pivoted arm totals crossed into the z-test projection",
    "ev_gapfill": "1-row min/max time-bounds aggregate seeds the hour grid",
    "ev_survival": "1-row corpus-end aggregate broadcast into the per-user censoring flag",
    "op_group_split": "1-row leakage-audit aggregate (straddler count) crossed into 2 split rows",
    "op_freshness": "1-row corpus-watermark aggregate broadcast into the per-source stats",
    "text_kl_divergence": "1-row corpus-total aggregate crossed into the q denominator",
    "join_cross": "deliberate CROSS JOIN demo over nation x region (25 x 5)",
    "op_ks_test": "1-row per-sample totals crossed into the ECDF grid",
    "op_mixture_weights": "1-row global aggregate normalizes component weights",
    "q11": "scalar total-value subquery (1 row) applied as HAVING threshold",
    "q20": "scalar 0.5*sum(l_quantity) subquery is correlated-grouped; the BNLJ side is the 1-row fallback branch",
    "q22": "scalar avg(c_acctbal) subquery (1 row) crossed into the filter",
    "op_psi_drift": "1-row global min/max and totals aggregates crossed into the bin grid",
    "op_pagerank": "1-row dangling-mass aggregate crossed into each iteration's node grid",
    "sim_pair_histogram": "1-row corpus-size aggregate crossed into bucket shares",
    "text_tfidf": "1-row document-count aggregate crossed into the idf term",
    "op_freq_itemsets": "1-row distinct-order-count aggregate crossed into the lift denominator",
}

# Row-at-a-time Python nodes allowed ONLY on bounded input.
ROW_PYTHON_ALLOWLIST: dict[str, str] = {
    "op_udtf_installments": (
        "deliberate Spark-4 Python-UDTF API demo, input bounded to "
        "o_orderkey < 300 (operators_suite docstring); bulk row "
        "expansion uses explode/inline (f_generator)"
    ),
}

_ALL = sorted(catalog.all_queries())


@pytest.fixture(scope="module")
def sf(sf_oracle):
    return sf_oracle


@pytest.mark.parametrize("name", _ALL)
def test_no_scale_killer_plan_shapes(spark, sf, name):
    df = catalog.all_queries()[name](spark, sf)
    plan = pi.formatted_plan(df)

    uw = pi.unpartitioned_windows(df)
    if name not in WINDOW_ALLOWLIST:
        assert uw == [], (
            f"{name}: unpartitioned Window (single-task at scale). Either "
            f"rewrite via operators.rank.* or allowlist with a boundedness "
            f"argument. Offending: {uw[:2]}"
        )

    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct in plan"

    if name not in BNLJ_ALLOWLIST:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: BroadcastNestedLoopJoin over a non-allowlisted side "
            f"(quadratic unless the broadcast side is provably tiny)"
        )

    if name not in ROW_PYTHON_ALLOWLIST:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python UDF in the plan — use built-in "
            f"functions or an Arrow-vectorized pandas UDF"
        )


def test_allowlists_reference_live_queries():
    # a renamed/deleted query must not leave a stale allowlist entry
    for k in list(WINDOW_ALLOWLIST) + list(BNLJ_ALLOWLIST) + list(ROW_PYTHON_ALLOWLIST):
        assert k in catalog.all_queries(), f"stale allowlist entry: {k}"
