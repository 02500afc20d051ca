"""Regression guard for the r11 fleet de-sort (SCALING.md round-11).

Registered queries return BAGS: the correctness gate hashes rows
order-insensitively, and a final global orderBy costs the range
partitioner's sampling pass re-executing the post-exchange stage plus
the sort exchange itself — 8.6 s of the headline loop when the audit
ran. This test pins the invariant: no headline query's OPTIMIZED plan
may end in a cosmetic global Sort.

Allowed exceptions:
- the three ANCHOR queries (their plans — sorts included — are frozen
  for the box-drift calibration, see bench._ANCHOR_OFFICIAL);
- Sort under a Limit (top-k semantics, executed as TakeOrdered);
- interior sorts (joins, windows, sortWithinPartitions).
"""

import pytest

from bench import HEADLINE, _ANCHOR_OFFICIAL

ANCHORS = set(_ANCHOR_OFFICIAL) | {"q3_top_orders"}

SF = "/root/testdata/sf0.001"


def _root_chain(plan, depth=6):
    """Class names of the root spine (first child at each level);
    non-global Sort (sortWithinPartitions) reported as SortLocal."""
    names = []
    node = plan
    for _ in range(depth):
        cls = node.getClass().getSimpleName()
        if cls == "Sort" and not getattr(node, "global")():
            cls = "SortLocal"
        names.append(cls)
        ch = node.children()
        if ch.size() == 0:
            break
        node = ch.head()
    return names


@pytest.mark.parametrize("name", [q for q in HEADLINE if q not in ANCHORS])
def test_headline_query_has_no_cosmetic_root_sort(spark, name):
    from xxt_cdc_spark.queries import QUERIES

    df = QUERIES[name](spark, SF)
    chain = _root_chain(df._jdf.queryExecution().optimizedPlan())
    for i, cls in enumerate(chain):
        if cls == "Sort":
            above = chain[:i]
            assert any("Limit" in c for c in above), (
                f"{name}: optimized plan has a global Sort at the root spine "
                f"({' -> '.join(chain)}) with no Limit above it — registered "
                "queries return bags (r11 fleet de-sort, SCALING.md); drop "
                "the trailing orderBy"
            )
        # only the spine ABOVE the first non-trivial operator matters;
        # stop once we hit an aggregate/join (interior sorts are fine)
        if cls in ("Aggregate", "Join", "Window", "Generate"):
            break
