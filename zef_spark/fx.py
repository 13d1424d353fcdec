"""Effect runner — the `run` terminal for impure actions.

Reference parity: effects are quarantined behind ``x | run``
(``python/zef/core/fx/fx_runtime.py``); here an Effect is a plain dict
``{"type": "...", ...}`` dispatched to a handler. Graph writes
(transact) are the main effect; file IO effects wrap Spark writers.
"""

from __future__ import annotations

from typing import Any, Callable

HANDLERS: dict[str, Callable] = {}


def register_effect(name: str):
    def deco(fn):
        HANDLERS[name] = fn
        return fn
    return deco


def run_effect(effect: Any, *args):
    if isinstance(effect, dict) and "type" in effect:
        h = HANDLERS.get(effect["type"])
        if h is None:
            raise NotImplementedError(f"no effect handler: {effect['type']}")
        return h(effect, *args)
    if callable(effect):
        return effect(*args)
    return effect


@register_effect("fx.write_parquet")
def _write_parquet(eff, *a):
    df = eff["df"]
    (df.write.mode(eff.get("mode", "overwrite"))
       .partitionBy(*eff.get("partition_by", []))
       .parquet(eff["path"]))
    return {"path": eff["path"]}


@register_effect("fx.read_parquet")
def _read_parquet(eff, *a):
    return eff["spark"].read.parquet(eff["path"])


@register_effect("fx.http_request")
def _http_request(eff, *a):
    """HTTPRequest effect (reference FX.HTTP.Request): stdlib urllib,
    driver-side — responses are {status, headers, body}."""
    import urllib.request
    data = eff.get("data")
    if isinstance(data, str):
        data = data.encode()
    req = urllib.request.Request(
        eff["url"], data=data, method=eff.get("method", "GET"),
        headers=eff.get("headers") or {})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return {"status": resp.status,
                "headers": dict(resp.headers),
                "body": resp.read().decode(errors="replace")}
