"""Reflection/docs ops (reference ITF:7085 docstring, ITF:7119
source_code, ITF:9485 examples, yo, graphviz/text_art; parse is
lark-gated)."""

import pytest

from zef_spark import ET, RT, ops as z


def test_docstring_and_source(spark):
    d = z.docstring(z.filter)
    assert "zefop: filter" in d
    s = z.source_code(z.sliding)
    assert "def " in s and "sliding" in s


def test_examples_extracted():
    ex = z.examples(z.docstring)
    assert isinstance(ex, list)


def test_yo_and_renderers(spark):
    from zef_spark.graph.delta import E, R, empty_graph, transact
    g, r = transact(empty_graph(spark), [
        E(ET.Person, name="a", fields={"Name": "A"}),
        E(ET.Pet, name="p"),
        R("a", RT.HasPet, "p")])
    info = z.yo(g)
    assert "Person" in info and "HasPet" in info
    dot = z.graphviz(g)
    assert dot.startswith("digraph") and '"Person" -> "Pet"' in dot
    art = z.text_art(g)
    assert "--HasPet-->" in art


def test_parse_is_gated():
    with pytest.raises(NotImplementedError, match="lark"):
        "1 + 2" | z.parse["start: NUMBER"]


def test_stream_merge_batch_form(spark):
    a = spark.range(3).withColumnRenamed("id", "x")
    b = spark.range(3, 6).withColumnRenamed("id", "x")
    out = (a | z.merge[b]).orderBy("x").collect()
    assert [r[0] for r in out] == [0, 1, 2, 3, 4, 5]
