"""GraphQL document execution over DataFrame plans.

Reference parity: the SimpleGQL server resolves ``query<T>``,
``get<T>``, ``aggregate<T>`` per type via ariadne resolvers that walk
objects one by one (python/zef/graphql/simplegql/server2.py,
generate_api2.py:295-480). Here the document (parsed with
graphql-core) compiles to ONE DataFrame plan per top-level field:
nested selections become joins + collect_list(struct(...)) — the
set-oriented plan SURVEY §3.3 calls for, avoiding N+1 resolution.

Results are returned as plain Python dicts (the server-boundary
shape); the DataFrame-returning entry points live in compiler.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compiler import FilterCompiler, apply_order, apply_pagination, \
    run_aggregate
from .schema import GqlSchema


def _ast_value(node, variables):
    from graphql.language import ast as A
    if isinstance(node, A.VariableNode):
        return variables[node.name.value]
    if isinstance(node, A.IntValueNode):
        return int(node.value)
    if isinstance(node, A.FloatValueNode):
        return float(node.value)
    if isinstance(node, (A.StringValueNode, A.EnumValueNode)):
        return node.value
    if isinstance(node, A.BooleanValueNode):
        return node.value
    if isinstance(node, A.NullValueNode):
        return None
    if isinstance(node, A.ListValueNode):
        return [_ast_value(v, variables) for v in node.values]
    if isinstance(node, A.ObjectValueNode):
        return {f.name.value: _ast_value(f.value, variables)
                for f in node.fields}
    raise ValueError(f"unsupported value node {node!r}")


def _inline_fragments(doc, variables=None):
    """Flatten fragment spreads (`...F` + `fragment F on T {...}`)
    and inline fragments (`... on T {...}`) into plain field
    selections, and resolve the @skip/@include directives (dropping
    excluded selections), so every downstream selection walk sees
    only unconditional FieldNodes. The reference inherits both from
    graphql-core's executor (server2.py runs the standard `graphql()`
    entry); here documents compile to DataFrame plans, so they are
    resolved once, up front, on the parsed AST. Valid GraphQL forbids
    fragment cycles; unknown fragment names raise."""
    from graphql.language import ast as A
    variables = variables or {}
    frags = {d.name.value: d for d in doc.definitions
             if isinstance(d, A.FragmentDefinitionNode)}

    def included(node) -> bool:
        for d in (node.directives or ()):
            args = {a.name.value: _ast_value(a.value, variables)
                    for a in d.arguments}
            if d.name.value == "skip" and args.get("if"):
                return False
            if d.name.value == "include" and not args.get("if"):
                return False
        return True

    def expand(selection_set):
        if selection_set is None:
            return None
        sels = []
        for s in selection_set.selections:
            if not included(s):
                continue
            if isinstance(s, A.FragmentSpreadNode):
                if s.name.value not in frags:
                    raise ValueError(
                        f"unknown fragment {s.name.value!r}")
                sels.extend(
                    expand(frags[s.name.value].selection_set).selections)
            elif isinstance(s, A.InlineFragmentNode):
                sels.extend(expand(s.selection_set).selections)
            else:
                if s.selection_set is not None:
                    s = A.FieldNode(
                        alias=s.alias, name=s.name,
                        arguments=s.arguments, directives=s.directives,
                        selection_set=expand(s.selection_set))
                sels.append(s)
        return A.SelectionSetNode(selections=tuple(sels))

    for d in doc.definitions:
        if isinstance(d, A.OperationDefinitionNode):
            d.selection_set = expand(d.selection_set)
    return doc


class GraphQLEngine:
    """Executes GraphQL query documents against a table loader; when
    constructed with a mutable ``TableStore`` (mutations.py), mutation
    documents (add<T>/update<T>/delete<T>) work too."""

    #: default driver-materialization cap for unpaginated query<T> —
    #: execute() collects results onto the driver, so an unbounded
    #: query over a large table would OOM it (VERDICT r1). Explicit
    #: ``first`` wins; pass max_rows=None to opt out entirely.
    DEFAULT_MAX_ROWS = 10_000

    def __init__(self, schema: GqlSchema, load=None, store=None,
                 max_rows: int | None = DEFAULT_MAX_ROWS,
                 subscriptions=None, hooks: dict | None = None,
                 field_hooks: dict | None = None):
        self.schema = schema
        self.store = store
        self.max_rows = max_rows
        #: optional SubscriptionManager; mutations publish into it
        self.subscriptions = subscriptions
        #: per-type OnCreate/OnUpdate/OnRemove mutation hooks
        #: ({type: {"create"|"update"|"remove": fn}}, mutations.py)
        self.hooks = hooks
        #: @dynamic(hook:) computed-field resolvers: {name: fn(df) ->
        #: Column} — the Spark-first analogue of the reference's
        #: per-object zef-function resolution (dynamic fields resolve
        #: INSIDE the one projection plan, no per-row calls)
        self.field_hooks = field_hooks or {}
        if load is None:
            if store is None:
                raise ValueError("need a loader or a TableStore")
            # type name -> current table version
            load = lambda tname: store.load(schema[tname].table)  # noqa: E731
        self.load = load

    # -- public -------------------------------------------------------

    def df(self, tname: str, args: dict, selection) -> DataFrame:
        """One top-level query<T> as a DataFrame with (possibly
        nested) gql-named columns."""
        t = self.schema[tname]
        base = self.load(tname)
        df = FilterCompiler(self.schema, self.load).apply(
            tname, base, args.get("filter"))
        df = apply_order(t, df, args.get("order"))
        first = args.get("first")
        if first is None and self.max_rows is not None:
            import warnings
            warnings.warn(
                f"query{tname} without 'first': capping at "
                f"{self.max_rows} rows (pass first explicitly, or "
                f"max_rows=None to opt out)", stacklevel=3)
            first = self.max_rows
        df = apply_pagination(df, first, args.get("offset"))
        return self._project(tname, df, selection)

    def materialize(self, tname: str, path: str) -> list[str]:
        """Checkpoint the type's table with its ``@search`` layout
        (r06 verdict order #6): searched fields map to physical
        columns and the write goes through
        pipeline/layout.py write_search_clustered, so per-file
        min/max stats prune point/range probes on every searched
        field — the Spark-first analogue of the reference's indexed
        per-type query fields (generate_api2.py:785-837). Returns
        the physical columns the layout clustered on (empty = plain
        checkpoint, no @search fields declared)."""
        if self.store is None:
            raise ValueError("materialize needs a TableStore")
        t = self.schema[tname]
        cols = [t.fields[f] for f in sorted(t.search)
                if f in t.fields]
        self.store.checkpoint(t.table, path,
                              search_cols=cols or None)
        return cols

    def execute(self, query: str, variables: dict | None = None) -> dict:
        from graphql import parse
        from graphql.language import ast as A

        variables = variables or {}
        doc = _inline_fragments(parse(query), variables)
        ops = [d for d in doc.definitions
               if isinstance(d, A.OperationDefinitionNode)]
        if len(ops) != 1 or ops[0].operation.value not in (
                "query", "mutation", "subscription"):
            raise ValueError(
                "exactly one query/mutation/subscription op supported")
        if ops[0].operation.value == "mutation":
            return self._execute_mutation(ops[0], variables)
        if ops[0].operation.value == "subscription":
            raise ValueError("subscription documents need a callback: "
                             "use execute_subscription(query, callback)")

        out = {}
        for sel in ops[0].selection_set.selections:
            fname = sel.name.value
            alias = sel.alias.value if sel.alias else fname
            args = {a.name.value: _ast_value(a.value, variables)
                    for a in sel.arguments}
            if fname.startswith("query"):
                tname = fname[len("query"):]
                df = self.df(tname, args, sel.selection_set)
                out[alias] = [json.loads(r) for r in df.toJSON().collect()]
            elif fname.startswith("aggregate"):
                tname = fname[len("aggregate"):]
                df = run_aggregate(self.schema, self.load, tname,
                                   args.get("filter"))
                wanted = [s.name.value
                          for s in sel.selection_set.selections]
                row = df.select(*wanted).collect()[0]
                out[alias] = row.asDict()
            elif fname.startswith("get"):
                tname = fname[len("get"):]
                t = self.schema[tname]
                df = self.load(tname).where(
                    F.col(t.id_col) == F.lit(args["id"]))
                df = self._project(tname, df, sel.selection_set)
                rows = [json.loads(r) for r in df.limit(1).toJSON().collect()]
                out[alias] = rows[0] if rows else None
            else:
                raise ValueError(f"unknown top-level field {fname}")
        return out

    def execute_subscription(self, query: str, callback,
                             variables: dict | None = None) -> dict:
        """Subscription documents (reference exposes a Subscription
        root via ariadne SubscriptionType, resolvers_generator.py:
        60-61): ``subscription { onCustomer(kinds: ["added"]) {
        custkey } }`` registers `callback` for Customer change events;
        the selection set projects each event's payload rows to the
        requested gql fields. Returns {alias: Subscription handle}
        (cancel() to detach)."""
        from graphql import parse
        from graphql.language import ast as A

        if self.subscriptions is None:
            raise ValueError("engine has no SubscriptionManager "
                             "(pass subscriptions=)")
        variables = variables or {}
        doc = _inline_fragments(parse(query), variables)
        ops = [d for d in doc.definitions
               if isinstance(d, A.OperationDefinitionNode)]
        if len(ops) != 1 or ops[0].operation.value != "subscription":
            raise ValueError("exactly one subscription op expected")
        out = {}
        for sel in ops[0].selection_set.selections:
            fname = sel.name.value
            alias = sel.alias.value if sel.alias else fname
            if not fname.startswith("on"):
                raise ValueError(
                    f"subscription fields are on<Type>, got {fname}")
            tname = fname[len("on"):]
            t = self.schema[tname]
            args = {a.name.value: _ast_value(a.value, variables)
                    for a in sel.arguments}
            kinds = tuple(args.get("kinds",
                                   ("added", "updated", "deleted")))
            cols = None
            if sel.selection_set is not None:
                cols = {s.name.value: t.fields[s.name.value]
                        for s in sel.selection_set.selections}

            def cb(event, _cols=cols, _callback=callback):
                if _cols is not None:
                    event = {**event, "rows": [
                        {g: r.get(raw) for g, raw in _cols.items()}
                        for r in event["rows"]]}
                _callback(event)

            out[alias] = self.subscriptions.subscribe(tname, cb, kinds)
        return out

    # -- internals ----------------------------------------------------

    def _execute_mutation(self, op, variables) -> dict:
        """add<T>(input, upsert) / update<T>(input: {filter, set,
        remove}) / delete<T>(filter) — generate_api2.py:525-700. The
        payload selection set projects the affected rows (field named
        after the lowercased type, Dgraph-style) plus ``count``."""
        from .mutations import MutationExecutor
        if self.store is None:
            raise ValueError("mutations need a TableStore-backed engine")
        mx = MutationExecutor(self.schema, self.store, self.hooks)
        out = {}
        for sel in op.selection_set.selections:
            fname = sel.name.value
            alias = sel.alias.value if sel.alias else fname
            args = {a.name.value: _ast_value(a.value, variables)
                    for a in sel.arguments}
            if fname.startswith("upfetch"):
                tname = fname[len("upfetch"):]
                affected = mx.upfetch(tname, args["input"])
                kind = "updated"
            elif fname.startswith("add"):
                tname = fname[len("add"):]
                affected = mx.add(tname, args["input"],
                                  args.get("upsert", False))
                kind = "added"
            elif fname.startswith("update"):
                tname = fname[len("update"):]
                inp = args["input"]
                affected = mx.update(tname, inp.get("filter"),
                                     inp.get("set"), inp.get("remove"))
                kind = "updated"
            elif fname.startswith("delete"):
                tname = fname[len("delete"):]
                affected = mx.delete(tname, args.get("filter"))
                kind = "deleted"
            else:
                raise ValueError(f"unknown mutation field {fname}")
            if self.subscriptions is not None:
                self.subscriptions.publish(tname, kind, affected)
            payload = {}
            if sel.selection_set is None:
                payload["count"] = affected.count()
            else:
                for psel in sel.selection_set.selections:
                    pname = psel.name.value
                    palias = psel.alias.value if psel.alias else pname
                    if pname == "count":
                        payload[palias] = affected.count()
                    elif pname.lower() == tname.lower():
                        rows_df = self._project(tname, affected,
                                                psel.selection_set)
                        # same driver-OOM guard as query<T>: an
                        # update/delete can affect the whole table, and
                        # the payload projection collects to the driver
                        if self.max_rows is not None:
                            rows_df = rows_df.limit(self.max_rows)
                        payload[palias] = [json.loads(r) for r in
                                           rows_df.toJSON().collect()]
                    else:
                        raise ValueError(
                            f"unknown payload field {pname}")
            out[alias] = payload
        return out

    def _project(self, tname: str, df: DataFrame, selection,
                 keep: str | None = None) -> DataFrame:
        """Selection set → columns; relation fields become one join +
        collect_list(struct) (list) or a struct column (object).
        ``keep`` preserves an extra raw column (the parent join key)
        through the projection."""
        t = self.schema[tname]
        cols = []
        rk_ids = 0
        for sel in selection.selections:
            fname = sel.name.value
            alias = sel.alias.value if sel.alias else fname
            if fname == "__typename":
                cols.append(F.lit(tname).alias(alias))
            elif fname in t.fields:
                cols.append(F.col(t.fields[fname]).alias(alias))
            elif fname in t.dynamic_fields:
                hook_name = t.dynamic_fields[fname]
                hook = self.field_hooks.get(hook_name)
                if hook is None:
                    raise ValueError(
                        f"dynamic field {tname}.{fname}: hook "
                        f"{hook_name!r} not registered (pass "
                        "field_hooks= to GraphQLEngine)")
                cols.append(hook(df).alias(alias))
            elif fname in t.relations:
                rel = t.relations[fname]
                rk = f"__gql_rk_{tname}_{rk_ids}"
                rk_ids += 1
                child = self._project(
                    rel.target,
                    self.load(rel.target).withColumn(
                        rk, F.col(rel.remote_key)),
                    sel.selection_set, keep=rk)
                child_cols = [c for c in child.columns if c != rk]
                if rel.is_list:
                    packed = (child.groupBy(rk).agg(
                        F.collect_list(F.struct(*child_cols)).alias(alias)))
                else:
                    packed = child.select(
                        rk, F.struct(*child_cols).alias(alias))
                df = df.join(packed, df[rel.local_key] == packed[rk],
                             "left").drop(rk)
                if rel.is_list:
                    df = df.withColumn(
                        alias, F.coalesce(F.col(alias), F.array()))
                cols.append(F.col(alias))
            else:
                raise ValueError(f"unknown field {tname}.{fname}")
        head = [F.col(keep)] if keep else []
        return df.select(*head, *cols)
