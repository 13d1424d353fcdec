"""Graph-stored versioned @func (reference zef_functions.py:100-268):
functions persist on the graph as entities with source-code
attributes; re-storing a label creates a new version in a new tx, and
old frames compile+run the old version."""

from zef_spark import ops as z
from zef_spark.graph.delta import empty_graph
from zef_spark.ops import (GraphBox, func_versions, load_func,
                           store_func, zef_fn)


def _v1(x):
    return x + 1


def _v2(x):
    return x * 10


def test_store_two_versions_and_call_each(spark):
    g0 = empty_graph(spark)
    g1, fid = store_func(g0, _v1, label="bump")
    tx_v1 = g1.max_tx()
    g2, fid2 = store_func(g1, _v2, label="bump")
    assert fid2 == fid            # same entity, new assignment
    # current version is v2
    assert load_func(g2, "bump")(4) == 40
    # the old frame still compiles + runs v1 (time-travel versioning)
    assert load_func(g2, "bump", at=tx_v1)(4) == 5
    # full history, oldest first
    hist = func_versions(g2, "bump").collect()
    assert len(hist) == 2
    assert "x + 1" in hist[0].source and "x * 10" in hist[1].source


def test_stored_source_compiles_in_op_context(spark):
    """Stored functions compile against the op layer, not caller
    globals (reference compile_in_zef_context)."""
    g0 = empty_graph(spark)
    src = ("def shout(v):\n"
           "    return v | z.map[lambda s: s.upper()] | z.collect\n")
    g1, _ = store_func(g0, source=src, label="shout")
    fn = load_func(g1, "shout")
    assert fn(["a", "b"]) == ["A", "B"]


def test_decorator_form_runs_what_is_stored(spark):
    box = GraphBox(empty_graph(spark))

    @zef_fn(box, label="triple")
    def triple(x):
        return 3 * x

    assert (7 | triple | z.collect) == 21
    # history exists on the boxed graph
    assert func_versions(box.graph, "triple").count() == 1
    # restore under the same label → chain now runs the NEW version
    def triple(x):  # noqa: F811
        return 300 * x
    box.graph, _ = store_func(box.graph, triple, label="triple")
    trip_op = z.triple
    assert (7 | trip_op | z.collect) == 2100
