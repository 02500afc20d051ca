"""Standing SortAggregate-count gate (r14 VERDICT item 6).

Struct/string/array min/max/first agg buffers are not UnsafeRow-
mutable, so aggregations over them silently plan as SortAggregate —
a per-task sort on BOTH the partial and final passes. Rounds 14-15
removed that shape from six query paths (OHLC packed-order min_by,
quality.profile explode-unpivot, the lsh_multi first-match-wins
dedup, date_function_family native-date min/max, cdc_dedup_transport
grouping-keys-only distinct); this gate pins the per-query
SortAggregate NODE counts so none of those wins can silently regress.

Counts are upper bounds: the surviving SortAggregates (ann ivf/pq
argmax-with-payload, dq min/max over genuinely-string columns) are
the documented result-pinned residue (OPTIMIZATION_r14.md R3/R4).
"""

from __future__ import annotations

import re

from xxt_cdc_spark.queries import QUERIES

# query -> max allowed SortAggregate physical nodes (partial+final
# pairs both count; measured at the r15 close, see plans/r15/)
SORTAGG_MAX = {
    "ts_downsample_family": 0,
    "ts_ohlc_hierarchy": 0,
    "ts_incremental_ohlc": 0,
    "dq_orders_report": 4,
    "ann_flat_family": 4,
    "ann_recall_report": 4,
    "date_function_family": 0,
    "cdc_dedup_transport": 0,
    "text_tfidf_topk": 0,
    "text_bm25_search": 0,
}

# the r15 duplicated-subtree fixes: tokenize (Generate/explode) must
# run ONCE per corpus pass in the tf-derived statistics queries
GENERATE_MAX = {
    "text_tfidf_topk": 1,
    "text_bm25_search": 1,
}

_NODE = re.compile(r"^\(\d+\) (\w+)", re.MULTILINE)


def _node_counts(df) -> dict[str, int]:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    counts: dict[str, int] = {}
    for m in _NODE.finditer(plan):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


class TestSortAggGate:
    def test_sortagg_counts_pinned(self, spark, sf_dir):
        offenders: dict[str, str] = {}
        for name, cap in SORTAGG_MAX.items():
            counts = _node_counts(QUERIES[name](spark, sf_dir))
            n = counts.get("SortAggregate", 0)
            if n > cap:
                offenders[name] = f"SortAggregate {n} > {cap}"
            gcap = GENERATE_MAX.get(name)
            if gcap is not None and counts.get("Generate", 0) > gcap:
                offenders[name] = (
                    f"Generate {counts.get('Generate', 0)} > {gcap} "
                    "(duplicated tokenize subtree is back)"
                )
        assert not offenders, offenders
