"""Quantity value types + duration time-travel (reference:
core/include/scalars.h:133,164; python/zef/core/units.py;
time_travel dispatch ITF:5518-5527)."""

import pytest

from zef_spark.units import (QuantityFloat, QuantityInt, is_duration,
                             units)


def test_units_arithmetic():
    d = -3.5 * units.seconds
    assert isinstance(d, QuantityFloat)
    assert d.value == -3.5 and d.unit == "seconds"
    assert isinstance(2 * units.seconds, QuantityInt)
    assert (5 * units.minutes).value == 300
    assert (2 * units.days + 12 * units.hours).value == 2.5 * 86400
    assert -(3 * units.seconds) == QuantityInt(-3, "seconds")
    assert (6 * units.seconds / 4).value == 1.5


def test_unit_mismatch_raises():
    with pytest.raises(ValueError):
        _ = 1 * units.seconds + 1 * units.grams
    with pytest.raises(ValueError):
        _ = 1 * units.kilograms < 1 * units.grams


def test_comparisons_same_unit():
    assert 1 * units.minutes < 2 * units.minutes
    assert 90 * units.seconds > 1 * units.minutes  # same base unit


def test_is_duration():
    assert is_duration(3 * units.seconds)
    assert is_duration(-0.5 * units.hours * 1)
    assert not is_duration(3 * units.grams)
    assert not is_duration(3)


def test_unit_conversion():
    q = (2 * units.kilometers).to("meters")
    assert q.value == 2000.0 and q.unit == "meters"
    assert (1 * units.kilograms).to("grams").value == 1000.0
    assert (120 * units.seconds).to("minutes").value == 2.0
    with pytest.raises(ValueError):
        (1 * units.meters).to("grams")


def test_time_travel_duration(spark):
    import datetime
    from zef_spark import ET, ops as z
    from zef_spark.graph.delta import E, empty_graph, transact
    g0 = empty_graph(spark)
    t0 = datetime.datetime(2020, 1, 1)
    g1, _ = transact(g0, [E(ET.Person, name="a")], time=t0)
    g2, _ = transact(g1, [E(ET.Person, name="b")],
                     time=t0 + datetime.timedelta(days=10))
    gs = g2.now()
    past = gs | z.time_travel[-5 * units.days]
    assert (past | z.all[ET.Person] | z.count | z.collect) == 1
    same = gs | z.time_travel[-1 * units.seconds * 0]
    assert (same | z.all[ET.Person] | z.count | z.collect) == 2
    with pytest.raises(ValueError):
        gs | z.time_travel[5 * units.grams]


def test_quantity_enum_assign_read_roundtrip(spark):
    """Assign/read round-trip of Quantity + Enum values (reference
    scalars.h:133,164 QuantityFloat/QuantityInt; tokens.h:302-318
    ZefEnumValue; test shape: python/tests/test_enum.py)."""
    from zef_spark import ET, ops as z, units
    from zef_spark.tokens import EN
    from zef_spark.graph.delta import E, empty_graph, transact
    from zef_spark.functions import unit_convert

    g0 = empty_graph(spark)
    g1, r = transact(g0, [
        E(ET.Parcel, name="p1", fields={
            "Weight": 2.5 * units.kilograms,
            "Distance": 3 * units.kilometers,
            "Color": EN.Color.red}),
        E(ET.Parcel, name="p2", fields={
            "Weight": 750 * units.grams,
            "Distance": 1 * units.meters,
            "Color": EN.Color.blue}),
    ])
    ns = g1.now() | z.all[ET.Parcel]
    w = {r["id"]: r["Weight"] for r in ns.field("Weight").collect()}
    assert w[r["p1"]]["value"] == 2.5 and w[r["p1"]]["unit"] == "kilograms"
    assert w[r["p2"]]["value"] == 750.0 and w[r["p2"]]["unit"] == "grams"
    colors = {r["id"]: r["Color"] for r in ns.field("Color").collect()}
    assert colors[r["p1"]] == "Color.red"

    # vrt records int-ness even though storage is one double;
    # units.kilometers is itself QuantityInt(1000, "meters") so both
    # Distance rows land in meters
    rows = (g1.attr_values.where("attr_rt = 'Distance'")
            .select("value_quantity.value", "value_quantity.unit", "vrt")
            .collect())
    assert sorted((x["value"], x["unit"], x["vrt"]) for x in rows) == \
        [(1.0, "meters", "QuantityInt"), (3000.0, "meters", "QuantityInt")]

    # unit conversion op: everything to grams
    wdf = ns.field("Weight")
    conv = wdf.select("id", unit_convert("Weight", "grams").alias("g"))
    got = {r["id"]: r["g"]["value"] for r in conv.collect()}
    assert got[r["p1"]] == 2500.0 and got[r["p2"]] == 750.0


def test_select_by_field_quantity_enum(spark):
    from zef_spark import ET, ops as z, units
    from zef_spark.tokens import EN
    from zef_spark.graph.delta import E, empty_graph, transact
    g0 = empty_graph(spark)
    g1, r = transact(g0, [
        E(ET.Thing, name="a", fields={"W": 5 * units.grams,
                                      "C": EN.State.on}),
        E(ET.Thing, name="b", fields={"W": 7 * units.grams,
                                      "C": EN.State.off}),
    ])
    ns = g1.now() | z.all[ET.Thing]
    hit = ns.select_by_field("W", 5 * units.grams)
    assert [x["id"] for x in hit.df.collect()] == [r["a"]]
    hit2 = ns.select_by_field("C", EN.State.off)
    assert [x["id"] for x in hit2.df.collect()] == [r["b"]]


def test_user_value_type_roundtrip(spark):
    """UserValueType (reference user_value_type.py): validated
    construction, Serialized storage, read-back reconstruction."""
    from zef_spark.user_value_type import (UserValueType,
                                           deserialize_value)
    from zef_spark import ET, ops as z
    from zef_spark.graph.delta import E, empty_graph, transact

    Email = UserValueType("EmailT", str, lambda s: "@" in s)
    e = Email("a@b.c")
    assert Email.is_a(e) and e.value == "a@b.c"
    with pytest.raises(ValueError, match="constraint"):
        Email("not-an-email")

    g, r = transact(empty_graph(spark), [
        E(ET.Person, name="p", fields={"Contact": Email("x@y.z")})])
    ns = g.now() | z.all[ET.Person]
    raw = ns.field("Contact").collect()[0]["Contact"]
    back = deserialize_value(raw)
    assert back == Email("x@y.z")
    row = g.attr_values.where("attr_rt = 'Contact'") \
        .select("vrt").collect()[0]
    assert row["vrt"] == "Serialized"
