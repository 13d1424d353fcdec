"""Schema/constraint validation on transact.

Reference parity: ``FinishTransaction(..., check_schema)`` passes the
open tx to a registered schema validator and ABORTS the transaction on
failure (core/src/transaction.cpp:158-183,
core/include/transaction.h:40); the SimpleGQL layer generates such a
validator from its type schema. Here the validator runs over the wish
list BEFORE anything is applied — the transact is atomic by
construction (nothing is built on raise), which is the same observable
semantics as abort-on-failure.

Two forms:
- ``GraphConstraints``: declarative — allowed relation triples,
  per-ET field typing (closed per type once declared), required
  fields at instantiation.
- any callable ``validator(wishes, graph)`` attached as
  ``g.schema_validator`` (the pass_to_schema_validator analogue).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import functions as F


class SchemaViolation(ValueError):
    pass


@dataclass
class GraphConstraints:
    #: allowed (src ET, RT, dst ET) triples; None = any relation ok
    triples: set | None = None
    #: ET name -> {field name: VRT name}; a listed ET accepts ONLY
    #: these fields, each with the given value type
    fields: dict = dc_field(default_factory=dict)
    #: ET name -> field names that must be present when instantiated
    required: dict = dc_field(default_factory=dict)

    def __call__(self, wishes: list, g) -> None:
        from .delta import E, R, _name, _vrt_of
        # receipt-name -> ET for wishes in this tx
        local_et: dict[str, str] = {}
        int_endpoints: set[int] = set()
        for w in wishes:
            if isinstance(w, E) and w.name:
                local_et[w.name] = w.et.name
            elif isinstance(w, R):
                for ep in (w.src, w.dst):
                    if isinstance(ep, int):
                        int_endpoints.add(ep)
        # one batched lookup for pre-existing endpoint types
        ext_et: dict[int, str] = {}
        if int_endpoints and self.triples is not None:
            rows = (g.nodes.where(F.col("id").isin(int_endpoints) &
                                  F.col("valid_to_tx").isNull())
                    .select("id", "et").collect())
            ext_et = {r[0]: r[1] for r in rows}

        for w in wishes:
            if isinstance(w, E):
                et = w.et.name
                spec = self.fields.get(et)
                for fname, val in w.fields.items():
                    fn = _name(fname)
                    if spec is not None:
                        if fn not in spec:
                            raise SchemaViolation(
                                f"ET.{et} has no field {fn!r} "
                                f"(allowed: {sorted(spec)})")
                        want, got = spec[fn], _vrt_of(val)
                        if want != got:
                            raise SchemaViolation(
                                f"ET.{et}.{fn} must be {want}, "
                                f"got {got}")
                missing = (self.required.get(et, set())
                           - {_name(f) for f in w.fields})
                if missing:
                    raise SchemaViolation(
                        f"ET.{et} missing required fields "
                        f"{sorted(missing)}")
            elif isinstance(w, R) and self.triples is not None:
                def et_of(ep):
                    if isinstance(ep, str):
                        return local_et.get(ep)
                    return ext_et.get(ep)
                s, d = et_of(w.src), et_of(w.dst)
                if s is None or d is None:
                    continue  # edge endpoint / unknown: not a triple
                if (s, w.rt.name, d) not in self.triples:
                    raise SchemaViolation(
                        f"({s}, {w.rt.name}, {d}) is not an allowed "
                        f"relation triple")
