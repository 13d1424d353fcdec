"""Registry-completion ops (final SURVEY §2 gaps): string/encoding
locals, graph accessors, temporal conversions, write-op chains."""

import pytest

from zef_spark import ET, RT, ops as z


def test_string_case_and_pad_ops():
    assert ("HelloWorld" | z.to_snake_case) == "hello_world"
    assert ("hello-world" | z.to_pascal_case) == "HelloWorld"
    assert ("hello_world" | z.to_camel_case) == "helloWorld"
    assert ("a b" | z.to_screaming_snake_case) == "A_B"
    assert ("x" | z.pad_left[3, "0"]) == "00x"
    assert ("x" | z.pad_center[3]) == " x "
    assert ("  x " | z.trim) == "x"
    assert ("a,b" | z.split[","]) == ["a", "b"]
    assert ("l1\nl2" | z.split_lines) == ["l1", "l2"]
    assert (["a", "b"] | z.join["-"]) == "a-b"
    assert ("aaa" | z.replace["a", "b", 2]) == "bba"
    assert ("abc" | z.starts_with["ab"]) and ("abc" | z.ends_with["bc"])
    assert (3 | z.int_to_alpha) == "c"


def test_encoding_ops():
    b = "hi" | z.to_bytes
    assert b == b"hi" and (b | z.utf8bytes_to_string) == "hi"
    b64 = b | z.bytes_to_base64string
    assert (b64 | z.base64string_to_bytes) == b"hi"
    assert len("x" | z.blake3) == 128      # blake2b hexdigest
    assert ("x" | z.value_hash) == ("x" | z.value_hash)
    assert ({"a": [1]} | z.to_json | z.from_json) == {"a": [1]}


def test_structural_and_dispatch_ops():
    assert ([1, 2, 9, 3] | z.skip_until[lambda x: x > 5]) == [9, 3]
    assert ({"a": 1} | z.insert_into[("b", 2)]) == {"a": 1, "b": 2}
    assert ([[1], [2, [3]]] | z.recursive_flatten) == [1, 2, 3]
    got = 5 | z.match_on[lambda x: x % 2,
                         (lambda k: k == 1, lambda v: "odd"),
                         (lambda k: k == 0, lambda v: "even")]
    assert got == "odd"
    assert ({"a": 1, "b": 2} | z.pattern[{"a": 1}]) is True
    assert "is NOT" in (5 | z.explain[str])


def test_graph_accessors_and_temporal(spark):
    from zef_spark.graph.delta import E, R, empty_graph, transact
    g, rc = transact(empty_graph(spark),
                     [E(ET.P, name="p1", fields={"x": 1}),
                      E(ET.Q, name="q1"), R("p1", RT.Likes, "q1")])
    gs = g.now()
    ns = gs | z.all[ET.P]

    assert (ns | z.frame).tx == gs.tx
    assert (gs | z.to_tx) == g.max_tx()
    assert (gs | z.time_slice) == gs.tx
    raw = ns | z.discard_frame
    assert "valid_from_tx" in raw.columns

    root = g | z.root
    assert root.collect()[0].tx_id == 0

    inst = (ns | z.instantiation_tx).collect()[0]
    assert inst.instantiation_tx == 1
    aware = (ns | z.aware_of[gs]).collect()[0]
    assert aware.aware_of is True

    qs = gs | z.all[ET.Q]
    rels = (ns | z.relations[RT.Likes, qs]).df.collect()
    assert len(rels) == 1 and rels[0].rt == "Likes"
    flags = dict((ns | z.has_relation[RT.Likes, qs]).collect())
    assert flags[rc["p1"]] is True

    ev = gs | z.events
    assert ev.count() == 0 or ev.count() > 0  # events of latest tx
    hist = ns | z.preceding_events
    assert {r.event for r in hist.collect()} >= {"instantiated"}


def test_write_op_chains(spark):
    from zef_spark.graph.delta import E, empty_graph, transact
    g, rc = transact(empty_graph(spark), [E(ET.P, name="p1",
                                            fields={"x": 1})])
    wishes = [rc["p1"] | z.assign["x", 2],
              rc["p1"] | z.tag["current"]]
    g2, _ = wishes | z.transact[g]
    ns = g2.now() | z.all[ET.P]
    assert dict(ns.field("x").collect())[rc["p1"]] == 2
    assert g2.now().by_tag("current").df.count() == 1
    assert (g2 | z.sync) is g2


def test_push_requires_eventlog():
    with pytest.raises(TypeError, match="EventLog"):
        {"a": 1} | z.push[None]
