"""Physical-plan audit over every contract query.

PLANS.md documents the plans we want at 100x scale; this test makes
those claims regression-checked instead of aspirational. For each
``queries()`` entry the EXECUTED plan (what Catalyst actually chose,
post-AQE planning) must be free of shapes that are correct at sf0.001
but melt down on a 1000-executor cluster:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: all-pairs work.
  Candidate generation must come from banding/bucketing joins
  (VERDICT r01 flagged the ngram-Jaccard crossJoin; this pins the fix).
- A pandas group-apply fed by a single-partition exchange: the whole
  input lands in ONE task (VERDICT r01 flagged cosine_pairs_ge's
  ``groupBy(lit(0))``). Single-partition exchanges feeding ordinary
  aggregations (1-row bound results) are fine and are not flagged.
"""

import re

import pytest

import __spark_entry__ as entry_mod

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# a FlatMapGroupsInPandas/FlatMapCoGroupsInPandas whose input exchange
# is SinglePartition == all rows in one python task
_SINGLE_GROUP = re.compile(
    r"FlatMapGroups?(?:Co)?(?:Groups)?InPandas[^\n]*\n"
    r"(?:[^\n]*\n){0,3}?[^\n]*Exchange SinglePartition"
)


def _plan_string(df) -> str:
    qe = df._jdf.queryExecution()
    return qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("extended")
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_plan_has_no_scale_killers(spark, sf_dir, name):
    df = entry_mod.queries()[name](spark, sf_dir)
    plan = _plan_string(df)
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: plan contains {bad}"
    m = _SINGLE_GROUP.search(plan)
    assert m is None, (
        f"{name}: pandas group-apply fed by a single-partition "
        f"exchange (whole input in one task):\n{m.group(0)}"
    )
