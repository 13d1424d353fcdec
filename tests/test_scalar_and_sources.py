"""Scalar-op completions (§2.H) and sources/sinks (§2.A) tests."""

import math

import pytest

from zef_spark import ops as z


def test_math_ops_chain():
    assert (10 | z.add[5] | z.multiply[2] | z.subtract[6]) == 24
    assert (9 | z.divide) == 4.5          # 1-arg divide = halve
    assert (7 | z.modulo[3]) == 1
    assert (2 | z.power[10]) == 1024
    assert (1 | z.exponential) == pytest.approx(math.e)
    assert (8 | z.logarithm[2]) == pytest.approx(3)
    assert (3.7 | z.floor) == 3 and (3.2 | z.ceil) == 4
    assert (3.14159 | z.round_to[2]) == 3.14
    assert (-5 | z.sign) == -1 and (0 | z.sign) == 0
    assert (99 | z.clamp[0, 10]) == 10


def test_string_structural_ops():
    assert ("hello world" | z.split_at[5]) == ("hello", " world")
    assert ("a,b,c,d" | z.split_left[","]) == ["a", "b,c,d"]
    assert ("a,b,c,d" | z.split_right[","]) == ["a,b,c", "d"]
    assert ("hello" | z.replace_at[1, "a"]) == "hallo"
    assert ("abcdef" | z.splice[2, 2, "XY"]) == "abXYef"
    assert ([1, 2, 3] | z.splice[1, 1, 9, 9]) == [1, 9, 9, 3]
    assert ([3, 1, 3, 2] | z.indexes_of[3]) == [0, 2]
    assert ([1, 5, 2, 8] | z.indexes_of[lambda x: x > 4]) == [1, 3]
    assert ("abc" | z.is_alpha) and not ("a1" | z.is_alpha)
    assert ("42" | z.is_numeric) and ("a1" | z.is_alpha_numeric)


def test_pairwise_and_segmentation():
    # ascending prefix via consecutive-pair predicate
    assert ([1, 2, 3, 2, 5] | z.take_while_pair[lambda a, b: b > a]) \
        == [1, 2, 3]
    assert ([1, 0, 2, 3, 0, 4] | z.split_on_next[0]) \
        == [[1], [2, 3], [4]]


def test_csv_roundtrip(spark, tmp_path):
    from zef_spark.sources import from_csv, load_file, to_csv
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    path = str(tmp_path / "out.csv")
    to_csv(df, path)
    back = from_csv(spark, path)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]
    sniffed = load_file(spark, path)
    assert sniffed.count() == 2


def test_json_codec_roundtrip(spark):
    from zef_spark import ET
    from zef_spark.flat_graph import FlatGraph
    from zef_spark.sources import from_json, to_json
    assert from_json(to_json({"a": [1, 2], "b": "x"})) \
        == {"a": [1, 2], "b": "x"}
    tok = to_json(ET.Person)
    assert from_json(tok) == ET.Person  # typed revival
    fg = FlatGraph().insert_entity(ET.A, "k", x=1)
    d = from_json(to_json(fg))
    assert d == fg  # typed revival


def test_pandas_to_gd(spark):
    import pandas as pd
    from zef_spark import ET
    from zef_spark.graph.delta import empty_graph, transact
    from zef_spark.sources import pandas_to_gd
    pdf = pd.DataFrame({"name": ["ada", "bob"], "age": [36, 40]})
    wishes = pandas_to_gd(pdf, ET.Person, "name")
    g, rc = transact(empty_graph(spark), wishes)
    assert set(rc) == {"ada", "bob"}
    ns = g.now().all(ET.Person)
    assert dict(ns.field("age").collect())[rc["ada"]] == 36


def test_save_file_sniffing_errors(spark, tmp_path):
    from zef_spark.sources import load_file
    with pytest.raises(ValueError, match="sniff"):
        load_file(spark, "data.unknownext")


def test_serialization_round_trip(spark):
    """Reference test_serialization.py analogue:
    deserialize(serialize(x)) == x for tokens, nested values, and
    FlatGraphs (DataFrames revive by schema+rows)."""
    from zef_spark import ET, RT, ops as z
    tok = ET.Machine
    assert (tok | z.serialize | z.deserialize) == tok
    nested = {"a": [1, {"t": RT.UsedBy}], "b": "x"}
    assert (nested | z.serialize | z.deserialize) == nested
    from zef_spark.flat_graph import FlatGraph
    fg = (FlatGraph().insert_entity(ET.Person, "ada", age=36)
          .insert_entity(ET.Person, "bob"))
    fg = fg.insert_relation("ada", RT.Knows, "bob")
    fg2 = fg | z.serialize | z.deserialize
    assert fg2 == fg
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    df2 = df | z.serialize | z.deserialize
    assert df2.schema == df.schema and df2.collect() == df.collect()


def test_networkx_import_end_to_end(spark):
    """NetworkX graph → wishes → transact → queryable graph
    (importers/general.py:67-137 analogue; nx IS available here)."""
    import networkx as nx
    from zef_spark import ET, RT, ops as z
    from zef_spark.graph.delta import empty_graph, transact
    from zef_spark.sources import networkx_to_wishes

    nxg = nx.DiGraph()
    nxg.add_node("a", et="City", Name="Aa", Population=10)
    nxg.add_node("b", et="City", Name="Bb", Population=20)
    nxg.add_edge("a", "b", rt="ConnectedTo")
    g, _ = transact(empty_graph(spark), networkx_to_wishes(nxg))
    cities = g.now() | z.all[ET.City]
    assert (cities | z.count | z.collect) == 2
    hops = (cities | z.out_rels[RT.ConnectedTo]).df.count()
    assert hops == 1
    pops = dict(cities.field("Population").collect())
    assert sorted(pops.values()) == [10, 20]


def test_toml_writer_roundtrip():
    """to_toml (dependency-free writer) round-trips through stdlib
    tomllib: scalars, arrays, nested tables, skipped Nones, quoted
    keys/strings with special characters."""
    import tomllib
    from zef_spark.sources import to_toml
    doc = {
        "name": "zef spark", "port": 8080, "ratio": 0.25,
        "debug": True, "tags": ["a", "b c", "d\"e"],
        "skip_me": None,
        "db": {"host": "localhost", "retries": 3,
               "weights": [1.5, 2.5]},
        "weird key!": "v",
    }
    out = to_toml(doc)
    back = tomllib.loads(out)
    assert back["name"] == "zef spark" and back["port"] == 8080
    assert back["ratio"] == 0.25 and back["debug"] is True
    assert back["tags"] == ["a", "b c", 'd"e']
    assert "skip_me" not in back
    assert back["db"] == {"host": "localhost", "retries": 3,
                          "weights": [1.5, 2.5]}
    assert back["weird key!"] == "v"
    import pytest
    with pytest.raises(NotImplementedError, match="top level"):
        to_toml([1, 2])
    with pytest.raises(NotImplementedError, match="one level"):
        to_toml({"a": {"b": {"c": 1}}})
