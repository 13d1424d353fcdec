"""FlatGraph (§1.4), gather (ITF:9800), tag/untag (ITF:7361) tests."""

from zef_spark import ET, RT, ops as z
from zef_spark.flat_graph import FlatGraph, FlatRef, ref


def test_flatgraph_build_and_traverse():
    fg = (FlatGraph()
          .insert_entity(ET.Person, "ada", age=36, city="London")
          .insert_entity(ET.Person, "bob", age=40)
          .insert_entity(ET.Dog, "rex"))
    fg = fg.insert("ada", RT.Owns, "rex")

    people = fg | z.all[ET.Person]
    assert len(people) == 2 and all(isinstance(p, FlatRef) for p in people)
    assert fg.field("ada", "age") == 36
    assert (ref(fg, "ada") | z.field["age"]) == 36

    owned = ref(fg, "ada") | z.Outs[RT.Owns]
    assert [o.node.raet for o in owned] == ["ET.Dog"]
    owners = ref(fg, "rex") | z.Ins[RT.Owns]
    assert owners[0].idx == fg._resolve("ada")


def test_flatgraph_immutability():
    fg = FlatGraph().insert_entity(ET.A, "x")
    fg2 = fg.insert_entity(ET.A, "y")
    assert len(fg.all(ET.A)) == 1 and len(fg2.all(ET.A)) == 2


def test_flatgraph_to_spark_graph(spark):
    fg = (FlatGraph()
          .insert_entity(ET.Person, "ada", age=36)
          .insert_entity(ET.Dog, "rex")
          .insert("ada", RT.Owns, "rex"))
    g, receipt = fg.to_spark_graph(spark)
    ns = g.now() | z.all[ET.Person]
    assert ns.df.count() == 1
    vals = dict(ns.field("age").collect())
    assert vals[receipt["ada"]] == 36
    dogs = (g.now() | z.all[ET.Person] | z.Outs[RT.Owns]).df.collect()
    assert len(dogs) == 1 and dogs[0].et == "Dog"  # et column is bare


def test_gather_transitive_closure(spark):
    from zef_spark.graph.delta import E, R, empty_graph, transact
    # chain a -> b -> c -> d plus offshoot b -> e; f disconnected
    wishes = [E(ET.N, name=n) for n in "abcdef"]
    wishes += [R(s, RT.To, d) for s, d in
               [("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")]]
    g, rc = transact(empty_graph(spark), wishes)
    start = g.now().all(ET.N)
    start = type(start)(start.frame,
                        start.df.where(f"id = {rc['a']}"))
    reached = {r.id for r in start.gather([RT.To]).df.collect()}
    assert reached == {rc[n] for n in "abcde"}
    # bounded depth
    one_hop = {r.id for r in
               start.gather([RT.To], max_steps=1).df.collect()}
    assert one_hop == {rc["a"], rc["b"]}
    # reverse direction from d
    startd = type(start)(start.frame,
                         (g.now().all(ET.N)).df.where(f"id = {rc['d']}"))
    back = {r.id for r in startd.gather([RT.To], "in").df.collect()}
    assert back == {rc[n] for n in "abcd"}


def test_tag_untag_temporal(spark):
    from zef_spark.graph.delta import (E, Tag, Untag, empty_graph,
                                       transact)
    g, rc = transact(empty_graph(spark), [E(ET.Doc, name="v1"),
                                          E(ET.Doc, name="v2")])
    g, _ = transact(g, [Tag("latest", rc["v1"])])
    tx_tag1 = g.max_tx()
    g, _ = transact(g, [Tag("latest", rc["v2"])])   # re-assign
    assert [r.id for r in g.now().by_tag("latest").df.collect()] \
        == [rc["v2"]]
    # frame-relative: old frame still sees v1
    assert [r.id for r in g.at(tx_tag1).by_tag("latest").df.collect()] \
        == [rc["v1"]]
    g, _ = transact(g, [Untag("latest")])
    assert g.now().by_tag("latest").df.count() == 0
