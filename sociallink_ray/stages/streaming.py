"""Stream-shaped operators over the ordered, partitioned event log.

Ray Data has no event-time machinery (SURVEY.md §2.8 — the reference
has none either: its one streaming job is semantically a batch
groupby-aggregate). Windows/sessions are expressed as key-bucket
shuffles + vectorized pandas over each key's ts-sorted rows; the
ordering assumption (rows sorted by ts within key at apply time) is
established inside the operator itself.

* ``sessionize``         — session windows per key with a max-gap rule
  (gaps-and-islands; the conversation-threading analogue of the
  reference's reply-chain completion, ExtractCompleteConversations.java)
* ``profile_aggregate``  — the reference's streaming per-user profile
  accumulation (profiling/extractors/Features.java:79-99 merge
  semantics: associative SUM/COUNT + latest-timestamp-wins — T7/A13)
  as one combiner + grouped-final pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data import Dataset

from . import ops


def sessionize(
    ds: Dataset,
    key: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    value_col: str | None = None,
    id_col: str | None = None,
) -> Dataset:
    """Per-key session aggregation: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. Returns one row per
    session: (key, session_id [0-based per key], n_events,
    session_start, session_end[, total_value])."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def apply(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        sort_cols = [key, ts_col] + ([id_col] if id_col else [])
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        new_key = df[key] != df[key].shift(1)
        gap_break = (df[ts_col] - df[ts_col].shift(1)) > gap
        session_break = new_key | gap_break
        sid_global = session_break.cumsum()
        df = df.assign(__sid=sid_global)
        aggs = {
            "n_events": (ts_col, "size"),
            "session_start": (ts_col, "min"),
            "session_end": (ts_col, "max"),
        }
        if value_col:
            aggs["total_value"] = (value_col, "sum")
        out = df.groupby([key, "__sid"], as_index=False, sort=False).agg(**aggs)
        out["session_id"] = out.groupby(key, sort=False).cumcount()
        return out[[key, "session_id", "n_events", "session_start",
                    "session_end"] + (["total_value"] if value_col else [])]

    return ops.bucketed_group_apply(ds, [key], apply)


def profile_aggregate(
    ds: Dataset,
    key: str,
    ts_col: str,
    sum_cols: dict[str, str],
    latest_cols: list[str],
    id_col: str | None = None,
) -> Dataset:
    """Per-key profile: associative sums/counts plus latest-wins fields
    (the Extractor.merge contract: AVG features merge by SUM, MAX
    features by latest timestamp — Features.java:79-99). One partial
    combiner pass per batch, then one grouped final pass; both use the
    same vectorized kernel because the merge is associative."""
    order = [ts_col] + ([id_col] if id_col else [])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, kind="mergesort")
        g = df.groupby(key, as_index=False, sort=False)
        aggs = {out: (c, "sum") for c, out in sum_cols.items()}
        aggs["n_events"] = (ts_col, "size")
        aggs["first_ts"] = (ts_col, "min")
        aggs["last_ts"] = (ts_col, "max")
        base = g.agg(**aggs)
        last_cols = [key] + latest_cols + ([id_col] if id_col else [])
        last = g.tail(1)[last_cols].rename(
            columns={c: f"last_{c}" for c in latest_cols}
        )
        if id_col:
            last = last.rename(columns={id_col: "__last_id"})
        return base.merge(last, on=key)

    partial = ds.map_batches(combine, batch_format="pandas")

    def final(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        # deterministic latest-wins across partials: (last_ts, __last_id)
        df = df.sort_values(
            ["last_ts"] + (["__last_id"] if id_col else []), kind="mergesort"
        )
        g = df.groupby(keys, as_index=False, sort=False)
        aggs = {out: (out, "sum") for out in sum_cols.values()}
        aggs["n_events"] = ("n_events", "sum")
        aggs["first_ts"] = ("first_ts", "min")
        aggs["last_ts"] = ("last_ts", "max")
        base = g.agg(**aggs)
        last = g.tail(1)[keys + [f"last_{c}" for c in latest_cols]]
        return base.merge(last, on=keys)

    return ops.bucketed_group_apply(partial, [key], final)
