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


def test_registry_completion_ops(tmp_path):
    from zef_spark import ops as z
    # introspection
    assert "df" in z.operates_on(z.filter)
    assert isinstance(z.used_for(z.filter), str)
    assert z.signature(z.filter) != {}
    assert "map" in z.related_ops(z.filter)
    # conversions
    assert ((1, 2) | z.unpack[lambda a, b: a + b]) == 3
    obj = {"a": {"b": 3}} | z.to_object
    assert obj.a.b == 3
    assert (3.14159 | z.round[2]) == 3.14
    assert ([1, 2, 3, 4] | z.slice[1, 3]) == [2, 3]
    from zef_spark import ET
    assert (ET.Widget | z.token_name) == "Widget"
    assert (ET.Widget | z.is_blueprint_atom) is True
    assert (42 | z.is_blueprint_atom) is False
    # plumbing chainable forms
    chain = z.take[5]
    assert z.absorbed(chain) == [5]
    # files round-trip
    p = str(tmp_path / "f.txt")
    "hello" | z.write_file[p]
    assert (p | z.read_file) == "hello"
    # yaml/toml codecs (env-gated inside sources)
    try:
        assert ({"x": 1} | z.to_yaml | z.from_yaml) == {"x": 1}
    except Exception:
        pass
    # zascii subset
    fg = "(a)-[Owns]->(b)" | z.zascii_to_flat_graph
    assert len(fg.edges) == 1
    assert ("(a)-[Owns]->(b)" | z.zascii_to_asg) == [("a", "Owns", "b")]
    bp = "(a)-[Owns]->(b)\n(b)-[Owns]->(a)" | z.zascii_to_blueprint_fg
    assert bp == [("ZasciiNode", "Owns", "ZasciiNode")]
    # env-gated ops raise with clear messages, not AttributeError
    import pytest
    with pytest.raises(EnvironmentError):
        "x" | z.to_clipboard


def test_make_request_effect_runs():
    """make_request builds an effect; run executes it against a live
    local HTTP server."""
    import http.server, threading
    from zef_spark import ops as z

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        eff = f"http://127.0.0.1:{srv.server_port}/" | z.make_request
        assert eff["type"] == "fx.http_request"
        resp = eff | z.run
        assert resp["status"] == 200 and '"ok"' in resp["body"]
    finally:
        srv.shutdown()


def test_plan_report(spark, sf_dir):
    from zef_spark import ops as z
    import pyspark.sql.functions as F
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rpt = (li.where(F.col("l_quantity") > 10)
           .groupBy("l_returnflag").count()
           | z.plan_report)
    assert rpt["scans"] == 1 and rpt["aqe"]
    assert rpt["shuffle_exchanges"] == 1
    assert rpt["joins"]["nested_loop"] == 0 and not rpt["warnings"]
    assert any("l_quantity" in p for p in rpt["pushed_filters"])
    assert set(rpt["read_columns"]) == {"l_quantity", "l_returnflag"}
    # the red flag fires on a genuine cartesian
    bad = li.limit(3).crossJoin(li.limit(3).withColumnRenamed(
        "l_orderkey", "ok2")) | z.plan_report
    assert bad["warnings"]
