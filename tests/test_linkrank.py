"""Integer-exact PageRank (functions/linkrank.py): Spark result ==
pure-python reference on arbitrary small graphs, deterministic across
partition counts, and sane on canonical shapes.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ccbot_spark.functions import linkrank


def _spark_ranks(spark, edges, iterations=3, parts=4):
    df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    out = linkrank.pagerank_int(df, iterations=iterations)
    return {r.node: r.rank_micro for r in out.collect()}


edge_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(edge_st)
def test_matches_python_reference(spark, edges):
    assert _spark_ranks(spark, edges) == linkrank.pagerank_int_py(edges)


def test_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7 + 3) % 50) for i in range(200)] + [
        (i, (i * 13 + 1) % 50) for i in range(0, 200, 2)
    ]
    a = _spark_ranks(spark, edges, parts=2)
    b = _spark_ranks(spark, edges, parts=16)
    assert a == b


def test_cycle_is_uniform_and_sink_gets_more():
    # 3-cycle: perfect symmetry, every node keeps exactly SCALE
    ranks = linkrank.pagerank_int_py([(0, 1), (1, 2), (2, 0)])
    assert set(ranks.values()) == {linkrank.SCALE}
    # star into a sink: the sink must outrank the sources
    ranks = linkrank.pagerank_int_py([(1, 0), (2, 0), (3, 0)])
    assert ranks[0] > ranks[1] == ranks[2] == ranks[3]


def test_repeated_edges_count_once(spark):
    once = _spark_ranks(spark, [(0, 1), (1, 0)])
    dup = _spark_ranks(spark, [(0, 1), (0, 1), (1, 0)])
    assert once == dup
