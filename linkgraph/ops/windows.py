"""Stream-shaped operators over the ``events`` table.

Ray Data is a batch engine with no event-time watermarks (like the
reference, which has no watermarks either — its "streaming" is batched
incremental inserts, SURVEY.md §2.7 streaming-only semantics row).
Windows are expressed as vectorized floor-to-window map_batches +
combiner groupby; sessions as per-key sorted gap detection inside
map_groups. Ordering assumption: none for tumbling windows (commutative
aggregates); per-user sort inside the group for sessions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def tumbling_window(events: Dataset, minutes: int = 60) -> Dataset:
    """Tumbling event-time window per event_type:
    (window_start: int64 epoch seconds, event_type, n_events, total_value).

    window_start is epoch seconds (not a timestamp) — int64 groupby keys
    shuffle an order of magnitude faster than timestamp keys here."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = df["ts"].astype("datetime64[s]").astype("int64")  # epoch seconds
        w = (sec // (minutes * 60)) * (minutes * 60)
        g = df.groupby([w, "event_type"], sort=False).agg(
            _n=("event_id", "size"), _v=("value", "sum")
        )
        g.index.names = ["window_start", "event_type"]
        return g.reset_index()

    p = events.map_batches(partial, batch_format="pandas", batch_size=131072)
    return p.groupby(["window_start", "event_type"]).aggregate(
        Sum("_n", alias_name="n_events"), Sum("_v", alias_name="total_value")
    )


def sessionize(events: Dataset, gap_minutes: int = 30) -> Dataset:
    """Session windows per user (new session when gap > gap_minutes):
    (user_id, n_sessions, n_events)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        new_session = ts.diff() > gap
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_session.sum()) + 1],
                "n_events": [len(g)],
            }
        )

    return events.groupby("user_id").map_groups(per_user, batch_format="pandas")
