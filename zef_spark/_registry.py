"""Op-registry storage — deliberately a LIGHT top-level module.

``OP_REGISTRY`` and ``register_op`` live here (re-exported unchanged
through ``zef_spark.ops.core``) so that pipeline/streaming modules can
register their ops without importing the ``zef_spark.ops`` package,
whose ``__init__`` eagerly loads the ENTIRE engine to populate the
public op namespace. That matters on executors: a Python worker
unpickling a ``mapInPandas``/Arrow UDF imports the module that defines
the function by reference (guide §4.5), and with the heavy import
chain every fresh worker paid ~1s+ of serial engine import before its
first batch — multiplied by 32 workers × N executors at scale. With
this split, worker-side imports of ``zef_spark.pipeline.<mod>`` touch
only that module's own dependencies.

The dict here is THE registry object; ``zef_spark.ops`` mutates and
reads the same instance, so registration order and visibility are
unchanged from when these definitions lived in ``ops/core.py``.
"""

from __future__ import annotations

from typing import Callable

# name -> {kind -> impl}; kinds: "df", "local", "graph", "any"
OP_REGISTRY: dict[str, dict[str, Callable]] = {}


def register_op(name: str, kind: str):
    def deco(fn):
        OP_REGISTRY.setdefault(name, {})[kind] = fn
        return fn
    return deco
