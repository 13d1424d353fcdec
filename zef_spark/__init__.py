"""zef_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the zefhub/zef reference (see
SURVEY.md), re-expressed Spark-first: lazy op chains compile to single
Catalyst-optimized DataFrame plans; the versioned graph is bitemporal
columnar tables; streams are Structured Streaming.

The public names below resolve LAZILY (PEP 562): importing the bare
package is ~free, so executor-side Python workers that unpickle a
pipeline UDF (which imports ``zef_spark.pipeline.<mod>`` by reference)
no longer pay the full engine import chain — formerly ~1s+ of serial
import per fresh worker process (guide §4.5). Driver code is
unaffected: ``from zef_spark import ET, ops as z`` behaves exactly as
before, resolving on first access.
"""

from __future__ import annotations

__version__ = "0.1.0"

# public name -> (module, attribute or None for the module itself)
_LAZY = {
    "get_spark": ("zef_spark.session", "get_spark"),
    "AET": ("zef_spark.tokens", "AET"),
    "ET": ("zef_spark.tokens", "ET"),
    "RT": ("zef_spark.tokens", "RT"),
    "vt": ("zef_spark.vt", None),
    "Graph": ("zef_spark.graph", "Graph"),
    "GraphSlice": ("zef_spark.graph", "GraphSlice"),
    "NodeSet": ("zef_spark.graph", "NodeSet"),
    "build_graph": ("zef_spark.graph", "build_graph"),
    "graph_for": ("zef_spark.graph", "graph_for"),
    "transact": ("zef_spark.graph", "transact"),
    "ops": ("zef_spark.ops", None),
    "units": ("zef_spark.units", "units"),
    "QuantityFloat": ("zef_spark.units", "QuantityFloat"),
    "QuantityInt": ("zef_spark.units", "QuantityInt"),
}


def __getattr__(name: str):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module 'zef_spark' has no attribute {name!r}") from None
    import importlib
    mod = importlib.import_module(mod_name)
    val = mod if attr is None else getattr(mod, attr)
    globals()[name] = val  # cache: subsequent lookups skip __getattr__
    return val


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
