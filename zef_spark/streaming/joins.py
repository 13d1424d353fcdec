"""Stream-stream joins with bounded state.

An unconstrained stream-stream join must buffer BOTH sides forever;
Structured Streaming only bounds the state when (a) both sides carry
watermarks and (b) the join condition constrains event time across
sides. ``stream_interval_join`` packages the correct shape: key
equality + a time band ``right.ts in [left.ts, left.ts + within]`` —
state for a row is dropped as soon as the watermark passes its band.

Reference parity: zef's Rx-style streams (`on[...]` chains) have no
two-stream temporal join; this is the Spark-native capability exposed
in the same module family as sessionization/tumbling windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         left_ts: str = "ts", right_ts: str = "ts",
                         watermark: str = "1 hour",
                         within: str = "30 minutes",
                         how: str = "inner") -> DataFrame:
    """Join two (streaming or batch) event frames on ``key`` where the
    right event lands within ``[left_ts, left_ts + within]``. For
    streaming inputs both sides are watermarked (state eviction);
    batch inputs run the identical plan, so the join can be verified
    against a batch oracle. Column names on the right are suffixed
    ``_r`` to avoid collisions."""
    rcols = [c for c in right.columns]
    r = right.select(*[F.col(c).alias(f"{c}_r") for c in rcols])
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(f"{right_ts}_r", watermark)
    cond = ((F.col(key) == F.col(f"{key}_r"))
            & (F.col(f"{right_ts}_r") >= F.col(left_ts))
            & (F.col(f"{right_ts}_r")
               <= F.col(left_ts) + F.expr(f"INTERVAL {within}")))
    return left.join(r, cond, how)


from .._registry import register_op  # noqa: E402


@register_op("stream_interval_join", "df")
def _stream_interval_join(df, other, key, **kw):
    return stream_interval_join(df, other, key, **kw)
