"""Driver-local (plain Python collection) implementations of the op
inventory — mirrors the reference's list semantics so every op works on
both collections and DataFrames (dual dispatch, SURVEY §7.3).

Reference parity: each op cites its ITF line (ITF =
python/zef/core/op_implementations/implementation_typing_functions.py).
"""

from __future__ import annotations

import itertools
import random as _random
from typing import Any

from .core import register_op, to_local_predicate

_SENTINEL = object()


def _as_list(v):
    if isinstance(v, (list, tuple, range)):
        return list(v)
    if isinstance(v, dict):
        return list(v.items())
    if isinstance(v, (set, frozenset)):
        return list(v)
    if hasattr(v, "__iter__") and not isinstance(v, str):
        return list(v)
    raise TypeError(f"expected an iterable, got {type(v)}")


# -- terminals --------------------------------------------------------
@register_op("collect", "local")
def _collect(v):
    return v


@register_op("run", "local")
def _run(v, *a):
    from ..fx import run_effect
    return run_effect(v, *a)


@register_op("for_each", "local")
def _for_each(v, fn):
    for x in _as_list(v):
        fn(x)
    return None


# -- projection / filter (ITF:6105 filter, ITF:9186 without, ...) -----
@register_op("filter", "local")
def _filter(v, pred):
    p = to_local_predicate(pred)
    if isinstance(v, dict):
        return {k: val for k, val in v.items() if p((k, val))}
    return [x for x in _as_list(v) if p(x)]


@register_op("without", "local")
def _without(v, items):
    items = set(items) if not isinstance(items, (set, frozenset)) else items
    return [x for x in _as_list(v) if x not in items]


@register_op("map", "local")
def _map(v, fn):
    if isinstance(fn, dict):  # dict-of-fns per key (ITF:5780)
        return {k: (fn[k](val) if k in fn else val) for k, val in v.items()}
    return [fn(x) for x in _as_list(v)]


@register_op("map_cat", "local")
def _map_cat(v, fn):
    out = []
    for x in _as_list(v):
        out.extend(fn(x))
    return out


@register_op("filter_map", "local")
def _filter_map(v, fn):  # map then drop None (ITF:10275)
    out = []
    for x in _as_list(v):
        try:
            y = fn(x)
        except Exception:
            continue
        if y is not None:
            out.append(y)
    return out


@register_op("apply", "local")
def _apply(v, fn):
    return fn(v)


@register_op("apply_functions", "local")
def _apply_functions(v, *fns):  # tuple of fns → tuple (ITF:5741)
    return tuple(f(v) for f in fns)


@register_op("select_keys", "local")
def _select_keys(d, *keys):
    return {k: d[k] for k in keys if k in d}


@register_op("get", "local")
def _get(v, key, default=None):
    if isinstance(v, dict):
        return v.get(key, default)
    try:
        return v[key]
    except (IndexError, KeyError):
        return default


@register_op("get_in", "local")
def _get_in(v, path, default=None):
    cur = v
    for k in path:
        try:
            cur = cur[k]
        except (KeyError, IndexError, TypeError):
            return default
    return cur


# -- comparison predicates (curried; ITF:3183-3295) -------------------
def _cmp_factory(name, fn):
    @register_op(name, "local")
    def _op(v, other):
        return fn(v, other)
    return _op


_cmp_factory("equals", lambda a, b: a == b)
_cmp_factory("greater_than", lambda a, b: a > b)
_cmp_factory("less_than", lambda a, b: a < b)
_cmp_factory("greater_than_or_equal", lambda a, b: a >= b)
_cmp_factory("less_than_or_equal", lambda a, b: a <= b)


@register_op("is_between", "local")
def _is_between(v, lo, hi):  # inclusive both ends (ITF:9143)
    return lo <= v <= hi


@register_op("Not", "local")
def _not(v, pred=None):
    if pred is None:
        return not v
    return not to_local_predicate(pred)(v)


@register_op("And", "local")
def _and(v, *preds):
    return all(to_local_predicate(p)(v) for p in preds)


@register_op("Or", "local")
def _or(v, *preds):
    return any(to_local_predicate(p)(v) for p in preds)


@register_op("xor", "local")
def _xor(v, *preds):
    return sum(bool(to_local_predicate(p)(v)) for p in preds) == 1


@register_op("contains", "local")
def _contains(v, item):
    return item in v


@register_op("contained_in", "local")
def _contained_in(v, container):
    return v in container


@register_op("is_a", "local")
def _is_a(v, vt):
    from ..vt import _coerce
    return _coerce(vt).is_a(v)


@register_op("If", "local")
def _if(v, pred, then_fn, else_fn=lambda x: x):
    return then_fn(v) if to_local_predicate(pred)(v) else else_fn(v)


@register_op("match", "local")
def _match(v, *pairs):  # first matching (VT|pred, fn) wins (ITF:403)
    for pred, fn in pairs:
        if to_local_predicate(pred)(v):
            return fn(v)
    raise ValueError(f"match: no case matched {v!r}")


@register_op("distinct", "local")
def _distinct(v):  # stable (ITF:4368)
    seen, out = set(), []
    for x in _as_list(v):
        k = x if isinstance(x, (int, float, str, bool, tuple, type(None))) else repr(x)
        if k not in seen:
            seen.add(k)
            out.append(x)
    return out


@register_op("distinct_by", "local")
def _distinct_by(v, key_fn):
    seen, out = set(), []
    for x in _as_list(v):
        k = key_fn(x)
        if k not in seen:
            seen.add(k)
            out.append(x)
    return out


@register_op("is_distinct", "local")
def _is_distinct(v):
    lst = _as_list(v)
    return len(lst) == len(_distinct(lst))


@register_op("is_distinct_by", "local")
def _is_distinct_by(v, key_fn):
    lst = _as_list(v)
    return len(lst) == len(_distinct_by(lst, key_fn))


# -- aggregations (ITF 2.D) ------------------------------------------
@register_op("length", "local")
def _length(v):
    return len(_as_list(v)) if not hasattr(v, "__len__") else len(v)


@register_op("count", "local")
def _count(v, vt=None):
    lst = _as_list(v)
    if vt is None:
        return len(lst)
    p = to_local_predicate(vt)
    return sum(1 for x in lst if p(x))


@register_op("sum", "local")
def _sum(v):
    return sum(_as_list(v))


@register_op("product", "local")
def _product(v):
    out = 1
    for x in _as_list(v):
        out *= x
    return out


@register_op("mean", "local")
def _mean(v):
    lst = _as_list(v)
    return sum(lst) / len(lst)


@register_op("variance", "local")
def _variance(v):  # sample variance (ITF:2926 uses n-1)
    lst = _as_list(v)
    m = sum(lst) / len(lst)
    return sum((x - m) ** 2 for x in lst) / (len(lst) - 1)


@register_op("max", "local")
def _max(v):
    return max(_as_list(v))


@register_op("min", "local")
def _min(v):
    return min(_as_list(v))


@register_op("max_by", "local")
def _max_by(v, key_fn):
    return max(_as_list(v), key=key_fn)


@register_op("min_by", "local")
def _min_by(v, key_fn):
    return min(_as_list(v), key=key_fn)


@register_op("arg_max", "local")
def _arg_max(v):
    lst = _as_list(v)
    return max(range(len(lst)), key=lambda i: lst[i])


@register_op("arg_min", "local")
def _arg_min(v):
    lst = _as_list(v)
    return min(range(len(lst)), key=lambda i: lst[i])


@register_op("frequencies", "local")
def _frequencies(v):
    out: dict = {}
    for x in _as_list(v):
        out[x] = out.get(x, 0) + 1
    return out


@register_op("group_by", "local")
def _group_by(v, key_fn, categories=None):  # ITF:5857
    groups: dict = {}
    for x in _as_list(v):
        groups.setdefault(key_fn(x), []).append(x)
    if categories is not None:
        return [(c, groups.get(c, [])) for c in categories]
    return list(groups.items())


@register_op("group", "local")
def _group(v, key_fn=lambda x: x):  # run-length grouping (ITF:5890)
    out, cur_key = [], _SENTINEL
    for x in _as_list(v):
        k = key_fn(x)
        if k != cur_key:
            out.append([])
            cur_key = k
        out[-1].append(x)
    return out


@register_op("reduce", "local")
def _reduce(v, fn, init=_SENTINEL):
    lst = _as_list(v)
    if init is _SENTINEL:
        acc, rest = lst[0], lst[1:]
    else:
        acc, rest = init, lst
    for x in rest:
        acc = fn(acc, x)
    return acc


@register_op("scan", "local")
def _scan(v, fn, init=_SENTINEL):  # emits intermediates incl. init (ITF:3568)
    lst = _as_list(v)
    if init is _SENTINEL:
        if not lst:
            return []
        acc, rest = lst[0], lst[1:]
    else:
        acc, rest = init, lst
    out = [acc]
    for x in rest:
        acc = fn(acc, x)
        out.append(acc)
    return out


@register_op("all", "local")
def _all(v, vt=None):
    lst = _as_list(v)
    if vt is None:
        return all(lst)
    p = to_local_predicate(vt)
    return [x for x in lst if p(x)]


@register_op("any", "local")
def _any(v, vt=None):
    lst = _as_list(v)
    if vt is None:
        return any(lst)
    p = to_local_predicate(vt)
    return any(p(x) for x in lst)


# -- sequence / window (ITF 2.E) --------------------------------------
@register_op("sliding", "local")
def _sliding(v, n, step=1):  # ITF:1427
    lst = _as_list(v)
    return [lst[i:i + n] for i in range(0, len(lst) - n + 1, step)]


@register_op("chunk", "local")
def _chunk(v, n):
    lst = _as_list(v)
    return [lst[i:i + n] for i in range(0, len(lst), n)]


@register_op("chunk_by", "local")
def _chunk_by(v, key_fn):
    return _group(v, key_fn)


@register_op("stride", "local")
def _stride(v, n):
    return _as_list(v)[::n]


@register_op("enumerate", "local")
def _enumerate(v):
    return list(enumerate(_as_list(v)))


@register_op("nth", "local")
def _nth(v, n):
    return _as_list(v)[n]


@register_op("first", "local")
def _first(v, vt=None):
    lst = _as_list(v)
    if vt is not None:
        p = to_local_predicate(vt)
        lst = [x for x in lst if p(x)]
    return lst[0]


@register_op("second", "local")
def _second(v):
    return _as_list(v)[1]


@register_op("last", "local")
def _last(v):
    return _as_list(v)[-1]


@register_op("single", "local")
def _single(v):
    lst = _as_list(v)
    if len(lst) != 1:
        raise ValueError(f"single: expected exactly 1 element, got {len(lst)}")
    return lst[0]


@register_op("single_or", "local")
def _single_or(v, default):
    lst = _as_list(v)
    return lst[0] if len(lst) == 1 else default


@register_op("take", "local")
def _take(v, n):  # negative n = from end (ITF:3711)
    lst = _as_list(v)
    return lst[n:] if n < 0 else lst[:n]


@register_op("take_while", "local")
def _take_while(v, pred):
    return list(itertools.takewhile(to_local_predicate(pred), _as_list(v)))


@register_op("take_until", "local")
def _take_until(v, pred):  # inclusive of first failing element (ITF:3807)
    p = to_local_predicate(pred)
    out = []
    for x in _as_list(v):
        out.append(x)
        if p(x):
            break
    return out


@register_op("skip", "local")
def _skip(v, n):
    lst = _as_list(v)
    return lst[:n] if n < 0 else lst[n:]


@register_op("skip_while", "local")
def _skip_while(v, pred):
    return list(itertools.dropwhile(to_local_predicate(pred), _as_list(v)))


@register_op("iterate", "local")
def _iterate(v, fn, n=None):
    """Orbit x, f(x), ... — bounded by n (lazy-infinite in the
    reference, ITF:3619; bounded here, deviation documented)."""
    if n is None:
        def gen():
            cur = v
            while True:
                yield cur
                cur = fn(cur)
        return gen()
    out, cur = [], v
    for _ in range(n):
        out.append(cur)
        cur = fn(cur)
    return out


@register_op("repeat", "local")
def _repeat(v, n):
    return [v] * n


@register_op("cycle", "local")
def _cycle(v, n=None):
    lst = _as_list(v)
    if n is None:
        return itertools.cycle(lst)
    return (lst * ((n // max(len(lst), 1)) + 1))[:n]


# -- sort / order (ITF 2.F) -------------------------------------------
@register_op("sort", "local")
def _sort(v, key=None, reverse=False):
    if isinstance(key, bool):  # sort[True] = reverse flag form
        key, reverse = None, key
    return sorted(_as_list(v), key=key, reverse=reverse)


@register_op("reverse", "local")
def _reverse(v):
    return _as_list(v)[::-1]


@register_op("shuffle", "local")
def _shuffle(v, seed=42):
    lst = _as_list(v)
    _random.Random(seed).shuffle(lst)
    return lst


@register_op("random_pick", "local")
def _random_pick(v, seed=None):
    lst = _as_list(v)
    rng = _random.Random(seed) if seed is not None else _random
    return rng.choice(lst)


# -- set ops (ITF 2.G) ------------------------------------------------
@register_op("concat", "local")
def _concat(v, *others):
    if others:
        out = _as_list(v)
        for o in others:
            out = out + _as_list(o)
        return out
    return [x for sub in _as_list(v) for x in _as_list(sub)]


@register_op("prepend", "local")
def _prepend(v, item):
    if isinstance(v, str):
        return str(item) + v
    return [item] + _as_list(v)


@register_op("append", "local")
def _append(v, item):
    if isinstance(v, str):
        return v + str(item)
    return _as_list(v) + [item]


@register_op("interleave", "local")
def _interleave(v, *others):  # stop at shortest (ITF:1183)
    seqs = [_as_list(v)] + [_as_list(o) for o in others]
    out = []
    for tup in zip(*seqs):
        out.extend(tup)
    return out


@register_op("interleave_longest", "local")
def _interleave_longest(v, *others):
    seqs = [_as_list(v)] + [_as_list(o) for o in others]
    out = []
    for tup in itertools.zip_longest(*seqs, fillvalue=_SENTINEL):
        out.extend(x for x in tup if x is not _SENTINEL)
    return out


@register_op("transpose", "local")
def _transpose(v):
    return [list(t) for t in zip(*[_as_list(x) for x in _as_list(v)])]


@register_op("permutations", "local")
def _permutations(v, r=None):
    return [list(t) for t in itertools.permutations(_as_list(v), r)]


@register_op("combinations", "local")
def _combinations(v, r):
    return [list(t) for t in itertools.combinations(_as_list(v), r)]


@register_op("cartesian_product", "local")
def _cartesian_product(v, *others):
    if others:
        seqs = [_as_list(v)] + [_as_list(o) for o in others]
    else:
        seqs = [_as_list(x) for x in _as_list(v)]
    return [tuple(t) for t in itertools.product(*seqs)]


@register_op("zip", "local")
def _zip(v, *others):
    if others:
        return [tuple(t) for t in zip(_as_list(v), *[_as_list(o) for o in others])]
    return [tuple(t) for t in zip(*[_as_list(x) for x in _as_list(v)])]


# -- dict / nested structure (ITF 2.I) --------------------------------
@register_op("insert", "local")
def _insert(v, k, val=_SENTINEL):
    if val is _SENTINEL and isinstance(k, tuple):
        k, val = k
    out = dict(v)
    out[k] = val
    return out


@register_op("insert_in", "local")
def _insert_in(v, path, val):
    if len(path) == 1:
        return _insert(v, path[0], val)
    out = dict(v)
    child = out.get(path[0], {})
    out[path[0]] = _insert_in(child, path[1:], val)
    return out


@register_op("update", "local")
def _update(v, k, fn):
    out = dict(v)
    out[k] = fn(out[k])
    return out


@register_op("update_in", "local")
def _update_in(v, path, fn):
    if len(path) == 1:
        return _update(v, path[0], fn)
    out = dict(v)
    out[path[0]] = _update_in(out[path[0]], path[1:], fn)
    return out


@register_op("update_at", "local")
def _update_at(v, i, fn):
    out = _as_list(v)
    out[i] = fn(out[i])
    return out


@register_op("insert_at", "local")
def _insert_at(v, i, val):
    out = _as_list(v)
    out.insert(i, val)
    return out


@register_op("remove_at", "local")
def _remove_at(v, *idxs):
    lst = _as_list(v)
    drop = {i % len(lst) for i in idxs}
    return [x for i, x in enumerate(lst) if i not in drop]


@register_op("remove", "local")
def _remove(v, k):
    out = dict(v)
    out.pop(k, None)
    return out


@register_op("remove_in", "local")
def _remove_in(v, path):
    if len(path) == 1:
        return _remove(v, path[0])
    out = dict(v)
    out[path[0]] = _remove_in(out[path[0]], path[1:])
    return out


@register_op("items", "local")
def _items(v):
    return list(v.items())


@register_op("values", "local")
def _values(v):
    return list(v.values())


@register_op("keys", "local")
def _keys(v):
    return list(v.keys())


@register_op("merge", "local")
def _merge(v, *dicts):  # right wins (ITF:7463)
    if not dicts and isinstance(v, (list, tuple)):
        v, dicts = v[0], tuple(v[1:])
    out = dict(v)
    for d in dicts:
        out.update(d)
    return out


@register_op("merge_with", "local")
def _merge_with(v, fn, *dicts):
    if not dicts and isinstance(v, (list, tuple)):
        dicts = tuple(v[1:])
        v = v[0]
    out = dict(v)
    for d in dicts:
        for k, val in d.items():
            out[k] = fn(out[k], val) if k in out else val
    return out


def _flatten_dict(d, prefix=(), sep="."):
    out = {}
    for k, v in d.items():
        path = prefix + (str(k),)
        if isinstance(v, dict):
            out.update(_flatten_dict(v, path, sep))
        else:
            out[sep.join(path)] = v
    return out


@register_op("flatten_dict", "local")
def _flatten_dict_op(v, sep="."):
    return _flatten_dict(v, (), sep)


@register_op("unflatten_dict", "local")
def _unflatten_dict(v, sep="."):
    out: dict = {}
    for k, val in v.items():
        parts = k.split(sep)
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = val
    return out


# -- plumbing (ITF 2.M) ----------------------------------------------
@register_op("identity", "local")
def _identity(v):
    return v


@register_op("always", "local")
def _always(v, const):
    return const


@register_op("attempt", "local")
def _attempt(v, fn, fallback):
    try:
        return fn(v)
    except Exception:
        return fallback(v) if callable(fallback) else fallback


@register_op("tap", "local")
def _tap(v, fn=print):
    fn(v)
    return v


@register_op("Assert", "local")
def _assert(v, pred, msg=None):
    if not to_local_predicate(pred)(v):
        raise AssertionError(
            msg(v) if callable(msg) else (msg or f"Assert failed on {v!r}"))
    return v


@register_op("Range", "local")
def _range(v=None, *args):
    if v is None or v is _SENTINEL:
        return list(range(*args))
    if args:
        return list(range(v, *args))
    return list(range(v))
