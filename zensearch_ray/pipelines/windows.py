"""Windowed / ordered operators the Dataset API lacks as primitives:
sessionization, as-of join, per-group top-1. SURVEY.md §2.7 records
that the reference has no windowing at all; these are the
training-pipeline operators built per the §4.2 partitioning patterns.

Common shape: ONE hash-partitioning of each input by its entity key
into coarse buckets (`functions/agg.py` rationale: per-BUCKET
vectorized pandas, never per-GROUP Python), ordered logic inside the
bucket via vectorized kernels (shift/cumsum/merge_asof). The
partitioning assumption is explicit: all rows of one entity fit one
bucket's group — true by construction for hash bucketing, and the
skew guard is the bucket count, not a per-entity limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.functions.ids import hash64

_N_BUCKETS = 64


def _with_bucket(key_col: str):
    def add(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((vals * np.uint64(2654435761)) % np.uint64(_N_BUCKETS)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    return add


def _epoch_seconds(series: pd.Series) -> np.ndarray:
    return series.to_numpy().astype("datetime64[s]").astype(np.int64)


def events_sessionize(sf_dir: str, gap_sec: int = 1800):
    """Session windows per user: a new session starts when the gap to
    the previous event exceeds ``gap_sec``. Output one row per session:
    (user_id, session_start, n_events, duration_sec).

    Boundaries depend only on the sorted multiset of timestamps, so the
    result is deterministic even with duplicate timestamps.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(ts_s=_epoch_seconds(group["ts"]))[["user_id", "ts_s"]]
        g = g.sort_values(["user_id", "ts_s"], kind="mergesort")
        prev = g.groupby("user_id")["ts_s"].shift()
        new_session = (g["ts_s"] - prev > gap_sec) | prev.isna()
        g = g.assign(sid=new_session.cumsum())
        out = g.groupby(["user_id", "sid"], as_index=False).agg(
            session_start=("ts_s", "min"),
            session_end=("ts_s", "max"),
            n_events=("ts_s", "size"),
        )
        out["duration_sec"] = out["session_end"] - out["session_start"]
        return out[["user_id", "session_start", "n_events", "duration_sec"]].astype(
            {"n_events": np.int64}
        )

    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(sessions, batch_format="pandas")
    )


def events_asof_orders(sf_dir: str):
    """As-of join (inner): each event matched to the user's most recent
    order placed at-or-before the event (by floored epoch seconds).
    Right side is pre-deduplicated to one row per (custkey, orderdate)
    — max o_orderkey — so the match is deterministic; unmatched events
    are dropped (inner as-of, matching SQL ``ASOF JOIN``).

    Shape: dedup the (small) order side, bucket BOTH sides by the
    entity key hash, co-group via tagged union, vectorized
    ``pandas.merge_asof`` per bucket. The only shuffle is the bucket
    groupby; no sort spans buckets.
    """
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def order_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(order_ts=_epoch_seconds(batch["o_orderdate"]))
        return b.groupby(["o_custkey", "order_ts"], as_index=False).agg(
            o_orderkey=("o_orderkey", "max")
        )

    # (custkey, date) partials per batch, tagged side=1
    right = orders.map_batches(order_partial, batch_format="pandas").map_batches(
        lambda t: pa.table(
            {
                "key": t["o_custkey"].cast(pa.int64()),
                "ts_s": t["order_ts"].cast(pa.int64()),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "side": pa.array([1] * t.num_rows, pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    left = events.map_batches(
        lambda t: pa.table(
            {
                "key": t["user_id"].cast(pa.int64()),
                "ts_s": pa.array(
                    _epoch_seconds(t["ts"].to_pandas()), type=pa.int64()
                ),
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "side": pa.array([0] * t.num_rows, pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )

    def asof(group: pd.DataFrame) -> pd.DataFrame:
        ev = group[group["side"] == 0]
        od = group[group["side"] == 1]
        # batch partials may leave duplicate (key, ts) order rows — final
        # dedup inside the bucket
        od = od.groupby(["key", "ts_s"], as_index=False).agg(
            o_orderkey=("o_orderkey", "max")
        )
        ev = ev.sort_values("ts_s", kind="mergesort")
        od = od.sort_values("ts_s", kind="mergesort")
        merged = pd.merge_asof(
            ev[["event_id", "key", "ts_s"]],
            od[["key", "ts_s", "o_orderkey"]],
            on="ts_s",
            by="key",
            direction="backward",
            suffixes=("", "_o"),
        )
        merged = merged.dropna(subset=["o_orderkey"])
        # event_id inherits float64 from the union with null-event_id order
        # rows; cast back so the output matches the oracle's BIGINT.
        out = merged.rename(columns={"key": "user_id"}).astype(
            {"o_orderkey": np.int64, "event_id": np.int64, "user_id": np.int64}
        )
        return out[["event_id", "user_id", "ts_s", "o_orderkey"]]

    from zensearch_ray.functions.agg import union_ready

    return (
        union_ready(left, right)  # feeds a shuffle — see union_ready
        .map_batches(_with_bucket("key"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(asof, batch_format="pandas")
    )


def top_event_per_user(sf_dir: str):
    """Per-group top-1: each user's highest-value event, ties broken by
    smallest event_id. All reduction is map-side partial (one candidate
    row per user per batch) → tiny final combine per user.
    """
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        # order: value DESC, event_id ASC → first row per user
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("user_id", as_index=False).head(1)

    partials = ds.map_batches(best, batch_format="pandas")
    out = (
        partials.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
    )
    from zensearch_ray.functions.rounding import round6

    out = out[["user_id", "event_id", "value"]].sort_values("user_id").reset_index(drop=True)
    out["value"] = round6(out["value"].to_numpy())
    return out


def events_props_agg(sf_dir: str):
    """JSON payload parse + aggregate (the reference's JSON corpus
    parser E6, ``search-engine/utilities/webpage_paser.go:8-16``,
    recast as a batch operator): parse ``props`` (a JSON object with an
    integer ``k``), aggregate per event_type → (n_events, sum_k).
    Parse happens map-side per batch; the shuffle carries only
    |event_type| partial rows per batch."""
    import json

    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ks = np.fromiter(
            (json.loads(p)["k"] for p in batch["props"]),
            dtype=np.int64,
            count=len(batch),
        )
        b = batch.assign(k=ks, n_events=1)
        return b.groupby("event_type", as_index=False)[["n_events", "k"]].sum()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
        )
    )


def events_hopping(sf_dir: str, window_sec: int = 3600, hop_sec: int = 900):
    """Hopping (sliding) window aggregate: count and value-cents sum
    per [window_start, window_start + window_sec) window sliding every
    ``hop_sec``. Each event lands in exactly ``window_sec // hop_sec``
    windows — a map-only explode with PER-BATCH pre-aggregation, so the
    keyed exchange carries window-cardinality rows, not event×k rows.
    ``window_sec`` must be a multiple of ``hop_sec``."""
    import ray.data as rd

    from ray.data.aggregate import Sum

    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    k = window_sec // hop_sec

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_s = _epoch_seconds(batch["ts"])
        cents = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
        base = ts_s // hop_sec
        ws = ((np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64),
                                            len(base))) * hop_sec)
        b = pd.DataFrame({
            "window_start": ws,
            "n_events": 1,
            "sum_value_cents": np.repeat(cents, k),
        })
        return b.groupby("window_start", as_index=False).sum()

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("window_start")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
    )


def events_value_ranks(sf_dir: str):
    """Per-user ranking window functions over event value: row_number
    (value DESC, event_id tiebreak), rank and dense_rank (value DESC,
    ties share). Bucket-by-user-hash co-group + vectorized pandas rank
    kernels per bucket — the one exchange is the bucket groupby, no
    global sort."""
    import ray.data as rd

    def ranks(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True], kind="mergesort")
        by = g.groupby("user_id", sort=False)
        g = g.assign(
            rn=(by.cumcount() + 1).astype(np.int64),
            rnk=by["value"].rank(method="min", ascending=False).astype(np.int64),
            drnk=by["value"].rank(method="dense", ascending=False).astype(np.int64),
        )
        return g[["user_id", "event_id", "rn", "rnk", "drnk"]]

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(ranks, batch_format="pandas")
    )


def events_value_percentiles(sf_dir: str, n_tiles: int = 4):
    """Per-user distribution window functions over event value:
    percent_rank, cume_dist and ntile(4) — the rank family's
    (``events_value_ranks``) ratio-valued siblings. Same plan: ONE
    bucket-by-user-hash exchange, vectorized pandas kernels per
    bucket, no global sort. Doubles derive from integer rank/count
    ratios with the SQL expression shape, so the oracle matches
    exactly (no round-off source)."""
    import ray.data as rd

    def percentiles(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True], kind="mergesort")
        by = g.groupby("user_id", sort=False)
        n = by["value"].transform("size").to_numpy(np.int64)
        rn = (by.cumcount() + 1).to_numpy(np.int64)
        rnk = by["value"].rank(method="min", ascending=False).to_numpy(np.int64)
        rnk_max = by["value"].rank(method="max", ascending=False).to_numpy(np.int64)
        pr = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1), 0.0)
        cd = rnk_max / n
        # SQL NTILE: the first (n mod t) tiles take ceil(n/t) rows
        q, r = n // n_tiles, n % n_tiles
        cut = r * (q + 1)
        tile = (
            np.where(rn <= cut, (rn - 1) // (q + 1),
                     r + (rn - 1 - cut) // np.maximum(q, 1)) + 1
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "event_id": g["event_id"].to_numpy(np.int64),
                "pct_rank": pr.astype(np.float64),
                "cume_dist": cd.astype(np.float64),
                "tile": tile,
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(percentiles, batch_format="pandas")
    )
