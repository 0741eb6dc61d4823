"""Plan lint: a mechanical scale-killer gate over the ENTIRE driver
contract (every `queries()` entry — 68 at round 6; oracle-less entries
are linted like any other).

For every entry, build the physical plan at sf0.001 and assert the
patterns that do not survive a 100-TB corpus are absent:

* ``CartesianProduct`` — an unbounded all-pairs join. Banned everywhere:
  every discovery path in this engine is bucketed (LSH bands, simhash
  blocks, IVF lists, winnow fingerprints), so no contract query may plan
  a cartesian.
* ``BatchEvalPython`` — a row-at-a-time Python UDF. Banned everywhere:
  the only Python-edge work is Arrow-batched (``ArrowEvalPython``), and
  only where the JVM genuinely lacks the primitive.
* ``BroadcastNestedLoopJoin`` — allowed only where one side is a bounded
  scalar/sample by construction (the allowlist documents each case).

The lint runs the query FUNCTIONS (some materialize lake tables as a
side effect — that is the product surface), but only inspects the
returned DataFrame's executed plan; nothing here asserts timing.

KNOWN BLIND SPOT: stages an operator materializes internally (e.g. via
``localCheckpoint`` — `ivf_recall_sweep`'s documented bounded
query-sample ground truth, `bpe_train`'s per-round rewrites) are
executed before the returned plan exists, so this sweep cannot see
them. Those interiors are covered by the per-operator plan-gate tests
(`test_ops.py` / `test_dedup_clusters.py` assert no-cartesian /
JVM-only on the operator's building blocks), not by this file.
"""

from __future__ import annotations

import pytest

from cdc_tools_spark import queries as Q

# BroadcastNestedLoopJoin is a scale-killer UNLESS the broadcast side is
# bounded by construction. Each entry documents its bound.
BNLJ_ALLOWED = {
    # crossJoin(broadcast(<1-row aggregate>)): the scalar row-count total
    "key_profile_events",
}

# Arrow-batched Python (vectorized, 10-100x over row-at-a-time): allowed
# only at the documented Python edges.
ARROW_ALLOWED = {
    # sha256 content parity rides a pandas_udf twin of the JVM sha2
    "cdc_sha256_parity",
    "cdc_replay_final_state",
    # multimodal codec plumbing is mapInPandas by design
    "mm_feature_extract",
    "mm_frame_sample",
}


@pytest.fixture(scope="module")
def plans(spark):
    sf = "/root/testdata/sf0.001"
    out = {}
    for name, fn in Q.queries().items():
        df = fn(spark, sf)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"cartesian product planned by: {offenders}"


def test_no_row_at_a_time_python_udf_anywhere(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == [], f"row-at-a-time Python UDF planned by: {offenders}"


def test_broadcast_nested_loop_only_where_bounded(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == [], (
        f"unbounded nested-loop join planned by: {offenders} — either fix "
        "the plan or add to BNLJ_ALLOWED with a documented bound"
    )


def test_arrow_python_only_at_documented_edges(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "ArrowEvalPython" in p and n not in ARROW_ALLOWED
    ]
    assert offenders == [], (
        f"Python edge appeared in: {offenders} — JVM expressions are the "
        "hot path; add to ARROW_ALLOWED only with a reason the JVM lacks "
        "the primitive"
    )
