"""Large-scale analytics operators beyond the reference's surface:
exact distinct counting, range joins, running-window aggregates,
grouped top-N, deterministic sampling, and exact distributed quantile
selection. (The reference has no analytics at all — its only aggregate
is the per-query BM25 loop, ``search-engine/main.go:127-143``; these
are the training-pipeline operators the brief adds as first-class.)

Shared scale shapes (same rationale as ``pipelines/windows.py`` /
``functions/agg.py``):

  * map-side PARTIALS before any shuffle — raw fact rows never move;
  * ONE coarse hash-bucket shuffle co-locating each entity's rows,
    vectorized pandas/numpy inside the bucket, never per-group Python;
  * driver only ever sees output-sized or sample-sized data.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.functions.rounding import round6

_N_BUCKETS = 64


def _with_bucket(key_col: str):
    def add(batch: pa.Table) -> pa.Table:
        vals = batch[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((vals * np.uint64(2654435761)) % np.uint64(_N_BUCKETS)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    return add


def _epoch_seconds(series: pd.Series) -> np.ndarray:
    return series.to_numpy().astype("datetime64[s]").astype(np.int64)


def events_user_running(sf_dir: str):
    """Running-window aggregate (cumulative count + cumulative exact-cents
    value sum) per user, ordered by (ts, event_id) — the batch form of a
    streaming per-key accumulator. One bucket shuffle; inside the bucket
    everything is sort + groupby-cumsum, no per-group Python.

    Output: one row per event — (event_id, user_id, ts_s, run_n,
    run_sum_cents)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )

    def running(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(
            ts_s=_epoch_seconds(group["ts"]),
            cents=np.floor(group["value"].to_numpy() * 100.0 + 0.5).astype(np.int64),
        )
        g = g.sort_values(["user_id", "ts_s", "event_id"], kind="mergesort")
        by_user = g.groupby("user_id")
        g["run_n"] = by_user.cumcount() + 1
        g["run_sum_cents"] = by_user["cents"].cumsum()
        return g[["event_id", "user_id", "ts_s", "run_n", "run_sum_cents"]].astype(
            {"run_n": np.int64, "run_sum_cents": np.int64}
        )

    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(running, batch_format="pandas")
    )


def events_lag(sf_dir: str):
    """LAG/LEAD window family: for every event, the gap in seconds to
    the SAME user's previous event in (ts, event_id) order, and the
    previous event's id — −1 / NULL-free sentinel for a user's first
    event so the column stays int64. Same one-bucket-shuffle shape as
    ``events_user_running``; inside the bucket lag is a vectorized
    ``groupby(...).shift`` over the sorted frame.

    Output: one row per event — (event_id, user_id, ts_s, gap_s,
    prev_event_id)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def lagged(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(ts_s=_epoch_seconds(group["ts"]))
        g = g.sort_values(["user_id", "ts_s", "event_id"], kind="mergesort")
        by_user = g.groupby("user_id")
        prev_ts = by_user["ts_s"].shift()
        g["gap_s"] = (g["ts_s"] - prev_ts).fillna(-1).astype(np.int64)
        g["prev_event_id"] = by_user["event_id"].shift().fillna(-1).astype(np.int64)
        return g[["event_id", "user_id", "ts_s", "gap_s", "prev_event_id"]]

    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lagged, batch_format="pandas")
    )


def events_range_join(sf_dir: str, window_sec: int = 3600):
    """Range (interval) join: for every event, count the SAME user's
    events with ``ts <= other_ts < ts + window_sec`` — the probe side
    and build side of a band join, self-joined here because the test
    tables' only overlapping time domain is events×events. The count
    includes the probe event itself (SQL inner-join semantics with the
    closed lower bound), so every event emits a row.

    Shape: ONE bucket shuffle on the entity key (same partitioning
    assumption as the as-of join: one entity's rows fit one bucket
    group). Inside the bucket the band probe is fully vectorized: key
    factorization → composite ``(key_code << 32) | ts`` sorted array →
    two ``searchsorted`` calls yield every probe's in-window count.
    The joined PAIRS are never materialized — output is the aggregate,
    so the cost is O(rows log rows) per bucket, not O(pairs)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    window = np.int64(window_sec)

    def count_in_window(group: pd.DataFrame) -> pd.DataFrame:
        keys = group["user_id"].to_numpy().astype(np.int64)
        codes, _ = pd.factorize(keys)
        codes = codes.astype(np.int64)
        ts = _epoch_seconds(group["ts"])
        # epoch seconds fit 32 bits through 2106; guard anyway
        if len(ts) and (ts.min() < 0 or ts.max() >= (1 << 32) - window):
            raise ValueError("timestamps outside composite range")
        comp = np.sort((codes << np.int64(32)) | ts)
        lo = np.searchsorted(comp, (codes << np.int64(32)) | ts, side="left")
        hi = np.searchsorted(comp, (codes << np.int64(32)) | (ts + window), side="left")
        return pd.DataFrame(
            {
                "event_id": group["event_id"].to_numpy().astype(np.int64),
                "n_window": (hi - lo).astype(np.int64),
            }
        )

    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(count_in_window, batch_format="pandas")
    )


def events_daily_active(sf_dir: str):
    """Exact count-distinct users per day, the canonical two-level
    distinct shape: per-batch partial dedup of (day, user) pairs (the
    shuffle carries distinct pairs, not events), bucket shuffle on
    user (every copy of a pair lands in one bucket → bucket-local
    dedup is globally exact), per-bucket per-day partial counts, and a
    |days|-sized final groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def distinct_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        secs = _epoch_seconds(batch["ts"])
        day = (secs // 86400) * 86400
        out = pd.DataFrame({"user_id": batch["user_id"], "day_epoch": day})
        return out.drop_duplicates(ignore_index=True)

    def bucket_counts(group: pd.DataFrame) -> pd.DataFrame:
        pairs = group.drop_duplicates(["user_id", "day_epoch"])
        out = pairs.groupby("day_epoch", as_index=False).agg(n_active=("user_id", "size"))
        return out.astype({"n_active": np.int64})

    partials = (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_counts, batch_format="pandas")
    )
    return partials.groupby("day_epoch").aggregate(Sum("n_active", alias_name="n_active"))


def topn_events_per_user(sf_dir: str, n: int = 3):
    """Grouped top-N (N>1 generalization of ``windows.top_event_per_user``):
    each user's N highest-value events, ties by smallest event_id, with
    an explicit 1..N rank. Map-side head(N) partials bound the shuffle
    to N rows per user per batch."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def headn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("user_id", as_index=False).head(n)

    def ranked(df: pd.DataFrame) -> pd.DataFrame:
        df = headn(df)
        df = df.assign(rank=(df.groupby("user_id").cumcount() + 1).astype(np.int64))
        df["value"] = round6(df["value"].to_numpy())
        return df[["user_id", "rank", "event_id", "value"]]

    partials = ds.map_batches(headn, batch_format="pandas")
    return (
        partials.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(ranked, batch_format="pandas")
    )


SAMPLE_MOD = 65536
SAMPLE_MUL = 48271  # MINSTD multiplier — small enough that id*mul fits int64


def events_sample(sf_dir: str, keep_per_65536: int = 6553):
    """Deterministic hash sampling (~``keep_per_65536``/65536 of rows):
    keep rows where ``(event_id * 48271) mod 65536`` falls under the
    threshold. Map-only, no shuffle, reproducible across runs and
    cluster sizes — the scalable alternative to ``random_sample`` when
    a pipeline must be re-runnable (and SQL-checkable) bit-for-bit."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "value"],
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        mask = (ids * SAMPLE_MUL) % SAMPLE_MOD < keep_per_65536
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def exact_quantiles(
    ds,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
    sample_per_block: int = 256,
):
    """EXACT distributed quantiles — thin wrapper over the canonical
    implementation in ``zensearch_ray.stages.quantiles`` (r2s12), which
    superseded this module's original two-scan bracketed selection:
    same disc rank convention and (q, value) output, plus grouped
    quantiles, exact resolution of ranks inside a duplicated value's
    mass (skew immunity), and a pre-bounded sliver fetch instead of an
    unbounded margin-widening rescan. ``sample_per_block`` maps onto
    the pivot budget for signature compatibility."""
    from zensearch_ray.stages.quantiles import exact_quantiles as _eq

    out = _eq(ds, col, list(qs), pivot_target=max(8, int(sample_per_block) * 16))
    if len(out) == 0:
        return pd.DataFrame({"q": list(qs), "value": [np.nan] * len(qs)})
    return out


def lineitem_quantiles(sf_dir: str):
    """Exact l_extendedprice quantiles over lineitem (the widest fact
    table) via ``exact_quantiles`` — column-pruned read, two streaming
    scans, output-sized result."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    return exact_quantiles(ds, "l_extendedprice")


def event_transitions(sf_dir: str) -> pd.DataFrame:
    """Markov transition edges of the per-user event stream: for every
    user in (ts, event_id) order, count consecutive (prev_type →
    type) pairs corpus-wide — the click-graph/edge-extraction step a
    web-analytics pipeline runs before PageRank-style ranking.

    Shape: ONE bucket shuffle on the entity key (same partitioning
    assumption as the as-of/lag family), per-bucket vectorized
    ``groupby(...).shift`` + pandas (src, dst) count — each bucket
    emits at most |types|² partial rows, so the driver-side final
    combine is bounded by n_buckets·|types|², never event-scale.

    Output: (src, dst, n) sorted by (src, dst)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def edge_partials(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id")["event_type"].shift()
        mask = prev.notna()
        pairs = pd.DataFrame({"src": prev[mask], "dst": g["event_type"][mask]})
        return pairs.groupby(["src", "dst"], sort=False).size().reset_index(name="n")

    partials = (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(edge_partials, batch_format="pandas")
        .to_pandas()
    )
    out = (
        partials.groupby(["src", "dst"], as_index=False)["n"].sum()
        .sort_values(["src", "dst"], kind="mergesort")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype(np.int64)
    return out


def event_pagerank(sf_dir: str, damping: float = 0.85, iters: int = 20) -> pd.DataFrame:
    """PageRank over the event-transition graph (nodes = event types,
    edges = ``event_transitions`` counts): which state the per-user
    event Markov chain concentrates on. The tiny node set here stands
    in for the host/domain graph of the 100-TB corpus — same operator,
    auto-routed (``stages/graph.py:pagerank_auto``) between the
    broadcast layout and the co-partitioned shard exchange.

    Output: (rank, event_type, pagerank) ordered by
    (round6(pagerank) DESC, event_type) — ordering on the ROUNDED
    value so float summation order can never flip a rank across
    engines."""
    import ray.data as rd

    from zensearch_ray.stages.graph import pagerank_auto

    edges = event_transitions(sf_dir).rename(columns={"n": "w"})
    pr = pagerank_auto(rd.from_pandas(edges), damping=damping, iters=iters)
    pr["pagerank"] = round6(pr["pagerank"])
    pr = pr.sort_values(
        ["pagerank", "node"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    pr.insert(0, "rank", np.arange(1, len(pr) + 1, dtype=np.int64))
    return pr.rename(columns={"node": "event_type"})


FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, steps: tuple = FUNNEL_STEPS) -> pd.DataFrame:
    """Ordered funnel: how many users performed step 1, then step 2
    STRICTLY AFTER their earliest step 1, then step 3 strictly after
    that reach, and so on — the product-analytics sequence-match
    operator (each step anchors at the user's EARLIEST qualifying
    event, the standard first-touch funnel).

    Distributed shape: one bucket shuffle on user_id (users never span
    buckets, so funnels complete inside a bucket), then vectorized
    pandas per bucket — per step one filter + merge + groupby-min, no
    per-user Python. The combine is a |steps|-row sum.

    Output: (step, event_type, n_users), step 1-based."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def funnel(group: pd.DataFrame) -> pd.DataFrame:
        g = group.assign(ts_s=_epoch_seconds(group["ts"]))
        cur = (
            g[g["event_type"] == steps[0]].groupby("user_id")["ts_s"].min()
        )
        counts = [len(cur)]
        for s in steps[1:]:
            ev = g.loc[g["event_type"] == s, ["user_id", "ts_s"]]
            # prev-step reach per event row (NaN → user never reached)
            prev_t = ev["user_id"].map(cur)
            cur = (
                ev[ev["ts_s"] > prev_t].groupby("user_id")["ts_s"].min()
            )
            counts.append(len(cur))
        return pd.DataFrame(
            {
                "step": np.arange(1, len(steps) + 1, dtype=np.int64),
                "event_type": list(steps),
                "n_users": np.array(counts, dtype=np.int64),
            }
        )

    partials = (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(funnel, batch_format="pandas")
        .to_pandas()
    )
    out = (
        partials.groupby(["step", "event_type"], as_index=False)["n_users"]
        .sum()
        .sort_values("step", kind="mergesort")
        .reset_index(drop=True)
    )
    out["step"] = out["step"].astype(np.int64)
    out["n_users"] = out["n_users"].astype(np.int64)
    return out


RETENTION_OFFSETS = (0, 1, 3, 7, 14)


def events_retention(
    sf_dir: str, offsets: tuple = RETENTION_OFFSETS
) -> pd.DataFrame:
    """Cohort retention: users are cohorted by the DAY of their first
    event; a cohort's retention at day-offset o is how many of its
    users were active on cohort_day + o (offset 0 = cohort size) — the
    product-analytics retention matrix.

    Distributed shape: the same user_id bucket shuffle as the funnel
    (users never span buckets, so per-bucket counts are exact
    partials), vectorized per bucket (groupby-min first day, offset
    arithmetic, (user, cohort, offset) dedup), then a tiny
    (cohorts × offsets)-sized combine sum.

    Output: (cohort_day, day_offset, n_users) — cohort_day in days
    since epoch."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    offs = np.array(sorted(set(offsets)), dtype=np.int64)

    def retain(group: pd.DataFrame) -> pd.DataFrame:
        day = _epoch_seconds(group["ts"]) // 86400
        g = pd.DataFrame({"user_id": group["user_id"].to_numpy(), "day": day})
        first = g.groupby("user_id")["day"].min()
        g["cohort"] = g["user_id"].map(first)
        g["off"] = g["day"] - g["cohort"]
        g = g[np.isin(g["off"].to_numpy(), offs)]
        act = g.drop_duplicates(["user_id", "off"])
        out = (
            act.groupby(["cohort", "off"], as_index=False)
            .size()
            .rename(columns={"size": "n_users", "cohort": "cohort_day",
                             "off": "day_offset"})
        )
        return out.astype(
            {"cohort_day": np.int64, "day_offset": np.int64, "n_users": np.int64}
        )

    partials = (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(retain, batch_format="pandas")
        .to_pandas()
    )
    out = (
        partials.groupby(["cohort_day", "day_offset"], as_index=False)["n_users"]
        .sum()
        .sort_values(["cohort_day", "day_offset"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype(
        {"cohort_day": np.int64, "day_offset": np.int64, "n_users": np.int64}
    )


def events_value_histogram(sf_dir: str, width: float = 25.0):
    """Equi-width histogram of event value (bin = floor(value/width)):
    the analytics primitive behind every distribution dashboard. One
    map-only pass emitting per-block bin-count partials, combined
    driver-side — the histogram is bin-cardinality, nothing shuffles.
    Bin edges computed on integer cents (value×100 vs width×100) so
    float division can't move an edge case between Ray and SQL.
    Output: (bin, lo, n) — lo is the bin's inclusive lower edge."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    w_cents = int(round(width * 100))

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        bins = cents // w_cents
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(uniq.astype(np.int64)),
             "n": pa.array(counts.astype(np.int64))}
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .groupby("bin", as_index=False)["n"].sum()
        .sort_values("bin", ignore_index=True)
    )
    parts["lo"] = parts["bin"].to_numpy(np.int64) * w_cents / 100.0
    return parts[["bin", "lo", "n"]].astype(
        {"bin": np.int64, "lo": np.float64, "n": np.int64}
    )


ANOMALY_Z = 3.0


def events_anomaly(sf_dir: str, z_cut: float = ANOMALY_Z):
    """Per-user z-score outliers over event value: events whose value
    sits ≥ ``z_cut`` sample standard deviations from THEIR USER's mean
    — the per-entity anomaly primitive of metrics pipelines (a global
    cut would just find the rich users).

    Exactness: values convert to integer cents, per-user (n, Σc, Σc²)
    are exact int64 sums, and mean/var/z derive from those sums with
    one pinned expression tree — the SQL oracle spells out the same
    formula from the same integer sums (never ``stddev_samp``), so the
    doubles agree bit-for-bit and the |z| ≥ cut verdict can't straddle.
    Users with < 2 events or zero variance emit nothing.

    Distributed plan: ONE bucket-by-user-hash exchange (users never
    split); per bucket the sums, z and the filter are vectorized
    pandas/numpy. Output: (event_id, user_id, value_cents, z)."""
    import ray.data as rd

    def flag(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        c = np.floor(g["value"].to_numpy(np.float64) * 100.0 + 0.5).astype(
            np.int64
        )
        g = g.assign(c=c)
        by = g.groupby("user_id", sort=False)["c"]
        n = by.transform("size").to_numpy(np.float64)
        s1 = by.transform("sum").to_numpy(np.float64)
        s2 = (
            g.assign(c2=g["c"].to_numpy(np.int64) ** 2)
            .groupby("user_id", sort=False)["c2"]
            .transform("sum")
            .to_numpy(np.float64)
        )
        ok = n >= 2
        mean = np.where(ok, s1 / n, 0.0)
        var = np.where(ok, (s2 - s1 * s1 / n) / (n - 1), 0.0)
        ok &= var > 0
        z = np.zeros(len(g))
        z[ok] = (g["c"].to_numpy(np.float64)[ok] - mean[ok]) / np.sqrt(var[ok])
        keep = ok & (np.abs(z) >= z_cut)
        out = g[keep]
        return pd.DataFrame(
            {
                "event_id": out["event_id"].to_numpy(np.int64),
                "user_id": out["user_id"].to_numpy(np.int64),
                "value_cents": out["c"].to_numpy(np.int64),
                "z": np.round(z[keep], 6),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return (
        ds.map_batches(_with_bucket("user_id"), batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(flag, batch_format="pandas")
    )
