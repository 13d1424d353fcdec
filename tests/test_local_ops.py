"""Local (python collection) op semantics — mirrors the reference's
docstring examples (SURVEY §5: ITF `---- Examples ----` blocks)."""

from zef_spark import ops as z
from zef_spark.vt import Int, Is, String, SetOf


def test_filter_map_chain():
    assert ([1, 2, 3, 4, 5] | z.filter[lambda x: x % 2 == 1]
            | z.map[lambda x: x * 10] | z.collect) == [10, 30, 50]


def test_vt_filter():
    assert ([1, "a", 2.5, 3, None] | z.filter[Int] | z.collect) == [1, 3]
    assert (["x", 1, "y"] | z.filter[String] | z.collect) == ["x", "y"]
    assert ([1, 2, 3] | z.filter[Is[lambda x: x > 1]] | z.collect) == [2, 3]
    assert ([1, 2, 3] | z.filter[SetOf[1, 3]] | z.collect) == [1, 3]


def test_vt_algebra():
    assert ([1, "a", 2.5] | z.filter[Int | String] | z.collect) == [1, "a"]
    assert ([1, 2, 3] | z.filter[~SetOf[2]] | z.collect) == [1, 3]


def test_group_and_chunks():
    assert ([1, 1, 2, 2, 2, 1] | z.group | z.collect) == [[1, 1], [2, 2, 2], [1]]
    assert ([1, 2, 3, 4, 5] | z.chunk[2] | z.collect) == [[1, 2], [3, 4], [5]]
    assert ([1, 2, 3, 4] | z.sliding[2] | z.collect) == [[1, 2], [2, 3], [3, 4]]
    assert ([1, 2, 3, 4] | z.sliding[2, 2] | z.collect) == [[1, 2], [3, 4]]
    assert ([1, 2, 3, 4, 5] | z.stride[2] | z.collect) == [1, 3, 5]


def test_aggregates():
    assert ([1, 2, 3] | z.sum | z.collect) == 6
    assert ([2, 3, 4] | z.product | z.collect) == 24
    assert ([1, 2, 3, 4] | z.mean | z.collect) == 2.5
    assert ([1, 2, 3] | z.max | z.collect) == 3
    assert ([3, 1, 2] | z.arg_max | z.collect) == 0
    assert (["a", "b", "a"] | z.frequencies | z.collect) == {"a": 2, "b": 1}
    assert ([1, 2, 3] | z.reduce[lambda a, b: a + b, 10] | z.collect) == 16
    assert ([1, 2, 3] | z.scan[lambda a, b: a + b, 0] | z.collect) == [0, 1, 3, 6]


def test_take_skip_nth():
    xs = list(range(10))
    assert (xs | z.take[3] | z.collect) == [0, 1, 2]
    assert (xs | z.take[-2] | z.collect) == [8, 9]
    assert (xs | z.skip[8] | z.collect) == [8, 9]
    assert (xs | z.nth[-1] | z.collect) == 9
    assert (xs | z.take_while[lambda x: x < 4] | z.collect) == [0, 1, 2, 3]
    assert ([1] | z.single | z.collect) == 1
    assert ([1, 2] | z.single_or[99] | z.collect) == 99


def test_sort_distinct_set_ops():
    assert ([3, 1, 2] | z.sort | z.collect) == [1, 2, 3]
    assert ([3, 1, 2] | z.sort[True] | z.collect) == [3, 2, 1]
    assert ([1, 2, 1, 3] | z.distinct | z.collect) == [1, 2, 3]
    assert ([1, 2, 3, 4] | z.without[[2, 4]] | z.collect) == [1, 3]
    assert ([[1, 2], [3]] | z.concat | z.collect) == [1, 2, 3]
    assert ([1, 2] | z.concat[[3]] | z.collect) == [1, 2, 3]
    assert ([1, 2] | z.interleave[[10, 20]] | z.collect) == [1, 10, 2, 20]
    assert ([[1, 2], [3, 4]] | z.transpose | z.collect) == [[1, 3], [2, 4]]
    assert ([1, 2] | z.cartesian_product[[3, 4]] | z.collect) == [
        (1, 3), (1, 4), (2, 3), (2, 4)]


def test_dict_ops():
    d = {"a": 1, "b": {"c": 2}}
    assert (d | z.get["a"] | z.collect) == 1
    assert (d | z.get_in[["b", "c"]] | z.collect) == 2
    assert (d | z.insert["x", 9] | z.collect)["x"] == 9
    assert (d | z.update["a", lambda v: v + 1] | z.collect)["a"] == 2
    assert ({"a": 1} | z.merge[{"b": 2}] | z.collect) == {"a": 1, "b": 2}
    assert ({"a": 1} | z.merge_with[lambda x, y: x + y, {"a": 2}]
            | z.collect) == {"a": 3}
    assert (d | z.flatten_dict | z.collect) == {"a": 1, "b.c": 2}
    assert ({"a.b": 1} | z.unflatten_dict | z.collect) == {"a": {"b": 1}}


def test_predicates_and_combinators():
    assert (5 | z.is_between[1, 10] | z.collect) is True
    assert (5 | z.equals[5] | z.collect) is True
    assert (5 | z.And[lambda x: x > 1, lambda x: x < 10] | z.collect) is True
    assert (5 | z.Or[lambda x: x > 100, lambda x: x < 10] | z.collect) is True
    assert (5 | z.Not[lambda x: x > 100] | z.collect) is True
    assert ("abc" | z.contains["b"] | z.collect) is True
    assert (2 | z.contained_in[[1, 2]] | z.collect) is True
    assert (5 | z.If[lambda x: x > 3, lambda x: "big", lambda x: "small"]
            | z.collect) == "big"


def test_match_and_pattern():
    from zef_spark.vt import Pattern
    classify = z.match[(Int, lambda x: "int"), (String, lambda x: "str")]
    assert (1 | classify | z.collect) == "int"
    assert ("x" | classify | z.collect) == "str"
    p = Pattern[{"a": Int}]
    assert p.is_a({"a": 1, "b": 2})
    assert not p.is_a({"a": "x"})


def test_plumbing():
    assert (5 | z.identity | z.collect) == 5
    assert (5 | z.always[7] | z.collect) == 7
    assert (5 | z.attempt[lambda x: 1 / 0, -1] | z.collect) == -1
    assert ([3, 1] | z.shuffle[1] | z.sort | z.collect) == [1, 3]
    composed = z.filter[lambda x: x > 1] | z.map[lambda x: x * 2]
    assert ([1, 2, 3] | composed | z.collect) == [4, 6]
