"""History vacuum (graph/vacuum.py): post-horizon frames identical,
pre-horizon frames refused, reclaim stats."""

import pytest

from zef_spark import ET
from zef_spark.graph.delta import Assign, E, SetField, Terminate, \
    empty_graph, transact
from zef_spark.graph.vacuum import vacuum, vacuum_stats


def _history(spark):
    g = empty_graph(spark)
    g, rc = transact(g, [E(ET.Thing, "a", fields={"v": 1.0}),
                         E(ET.Thing, "b", fields={"v": 2.0})])
    g, _ = transact(g, [Assign(rc["a"], "v", 10.0)])  # closes a.v=1
    g, _ = transact(g, [Terminate(rc["b"])])          # closes b
    g, _ = transact(g, [E(ET.Thing, "c", fields={"v": 3.0})])
    return g, rc


def test_post_horizon_reads_identical(spark):
    g, _ = _history(spark)
    now_before = sorted(
        (r[0], r[1]) for r in
        g.now().all(ET.Thing).field("v").collect())
    v = vacuum(g, before_tx=3)
    now_after = sorted(
        (r[0], r[1]) for r in
        v.now().all(ET.Thing).field("v").collect())
    assert now_before == now_after
    # frames at/above the horizon still work
    assert v.at(3).all(ET.Thing).df.count() == 1  # a alive, b dead
    assert v.now().all(ET.Thing).df.count() == 2  # a and c


def test_pre_horizon_frame_refused(spark):
    g, _ = _history(spark)
    v = vacuum(g, before_tx=3)
    with pytest.raises(ValueError, match="vacuum horizon"):
        v.at(1)
    g.at(1)  # un-vacuumed graph still time-travels


def test_stats_count_reclaimable_rows(spark):
    g, _ = _history(spark)
    st = vacuum_stats(g, before_tx=3)
    # b's node row closed at tx3; a's v=1 attr row closed at tx2
    assert st["nodes"] == 1
    assert st["attr_values"] == 1
    # vacuum actually removes them
    v = vacuum(g, before_tx=3)
    assert v.nodes.count() == g.nodes.count() - 1
    assert v.attr_values.count() == g.attr_values.count() - 1
