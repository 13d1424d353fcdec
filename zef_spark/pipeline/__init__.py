"""Pipeline operator modules. Submodules resolve LAZILY (PEP 562) so
an executor-side import of one pipeline module (a Python worker
unpickling a UDF defined there) does not drag in the other 22 and
their dependencies. ``zef_spark.ops`` calls :func:`load_all` when the
public op namespace is built, so every ``@register_op`` in this
package still registers before any op lookup — the registry guarantee
is unchanged."""

from __future__ import annotations

_SUBMODULES = (
    "abtest", "classifier", "clustering", "codecs", "corpus", "dedup",
    "distkit", "embeddings", "encoding", "evaluation", "funnel",
    "intervals", "joins", "layout", "market", "multimodal", "privacy",
    "rollup", "similarity", "sketches", "skew", "text", "tokenizer",
    "web", "wrangling",
)


def load_all() -> None:
    """Import every pipeline submodule (op registration side effect)."""
    import importlib
    for m in _SUBMODULES:
        importlib.import_module(f"{__name__}.{m}")


def __getattr__(name: str):
    if name in _SUBMODULES:
        import importlib
        return importlib.import_module(f"{__name__}.{name}")
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_SUBMODULES))
