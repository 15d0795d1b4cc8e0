"""Relational operator pipelines over the TPC-H-ish test tables.

These exercise the engine's generic operator surface (SURVEY.md §2.4
joins J1-J4, §2.5 aggregations A1/A8, §2.6 sort/limit O1) in their
idiomatic Ray Data shapes:

  * partial aggregation inside ``map_batches`` before the (tiny)
    global ``groupby`` — never shuffle raw fact rows;
  * broadcast hash/anti joins for small dimension sides (``ray.put``
    once, resolve per task from the local object store) — no shuffle;
  * global sort + limit only for top-k-sized outputs.

Money/doubles are aggregated as exact integer cents
(``floor(x*100 + 0.5)``, half-away-from-zero like SQL ROUND) so Ray and
the DuckDB oracle agree bit-for-bit regardless of float summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ray.data.aggregate import Count, Sum

from zensearch_ray.functions.agg import union_ready
from zensearch_ray.functions.rounding import round6


def _cents(x: np.ndarray) -> np.ndarray:
    """Exact integer cents with SQL-ROUND semantics (half away from
    zero for the non-negative money values here)."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing summary (A5/A8-class aggregation)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(
            sum_qty=batch["l_quantity"].astype(np.int64),
            revenue_cents=_cents(
                (batch["l_extendedprice"] * (1.0 - batch["l_discount"])).to_numpy()
            ),
            n_rows=1,
        )
        return (
            batch.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
                ["sum_qty", "revenue_cents", "n_rows"]
            ].sum()
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
    ).to_pandas()
    agg["avg_qty"] = round6((agg["sum_qty"] / agg["n_rows"]).to_numpy())
    return agg


def top_orders(sf_dir: str, k: int = 10):
    """Global top-k by (o_totalprice DESC, o_orderkey ASC) — O1 made
    deterministic, served by sort+limit (per-partition top-k + merge
    under the hood)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def customers_without_urgent_orders(sf_dir: str):
    """Left-anti join (J2, the reference's crawl-list vs indexed_sites
    check at database/src/database.ts:107-133): customers with no
    URGENT-priority order — predicate-pushdown read of the order side,
    distinct keys broadcast once, anti-filter map-side. No shuffle."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )
    with_orders = orders.unique("o_custkey")
    ref = ray.put(pa.array(with_orders, type=pa.int64()))

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pc.is_in(batch["c_custkey"], value_set=keys.cast(batch["c_custkey"].type))
        return batch.filter(pc.invert(mask))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    return cust.map_batches(anti, batch_format="pyarrow")


def orders_per_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation rollup (J1/J4): both dim sides are
    small → broadcast custkey→nation-name map; facts stream through a
    map-side lookup + partial agg; global groupby is |nations|-sized."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nk_to_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    cust_to_nation = {
        c: nk_to_name[nk]
        for c, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cust_to_nation)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        batch = batch.assign(
            n_name=batch["o_custkey"].map(lookup),
            total_cents=_cents(batch["o_totalprice"].to_numpy()),
            n_orders=1,
        )
        return batch.groupby("n_name", as_index=False)[["n_orders", "total_cents"]].sum()

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("n_name")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate (the streaming-shaped operator the
    reference lacks, SURVEY.md §2.7): events → per (user_id, hour)
    counts + exact-cents value sums. Window = epoch-hour bucket; batch
    partials first, so the shuffle carries one row per (user, hour,
    batch)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # datetime64 at any resolution → epoch seconds → hour bucket
        secs = batch["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        hour = (secs // 3600) * 3600
        batch = batch.assign(
            hour_epoch=hour,
            n_events=1,
            sum_value_cents=_cents(batch["value"].to_numpy()),
        )
        return batch.groupby(["user_id", "hour_epoch"], as_index=False)[
            ["n_events", "sum_value_cents"]
        ].sum()

    from zensearch_ray.functions.agg import bucketed_groupby_sum, union_ready

    # (user, hour) cardinality ~ rows: bucketed aggregation, not the
    # per-group native aggregate (see functions/agg.py)
    return bucketed_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["user_id", "hour_epoch"],
        sum_cols=["n_events", "sum_value_cents"],
    )


def events_hourly_derivative(sf_dir: str) -> pd.DataFrame:
    """Pipeline aggregations over the hourly date histogram (the ES
    ``derivative`` / ``cumulative_sum`` / ``moving_avg`` pipeline-agg
    trio): corpus-wide per-hour event counts, each bucket's delta vs
    the previous EXISTING bucket (first bucket delta 0), the running
    total, and the trailing 3-bucket moving average (window shrinks at
    the head, the SQL ``ROWS 2 PRECEDING`` shape; round6).

    Distributed shape: per-batch hour-count partials → ONE bucketed
    exchange over hour keys; the ordered diff/cumsum/rolling kernels
    run on the AGGREGATED timeline, which is metadata-scale (hours of
    history — ~10⁵ rows for a decade), never event-scale. Columns
    (hour_epoch, n_events, delta, cum, ma3), hour ASC."""
    import ray.data as rd

    from zensearch_ray.functions.agg import bucketed_groupby_sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        secs = batch["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        hour = (secs // 3600) * 3600
        out = pd.DataFrame({"hour_epoch": hour, "n_events": 1})
        return out.groupby("hour_epoch", as_index=False)["n_events"].sum()

    agg = bucketed_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["hour_epoch"],
        sum_cols=["n_events"],
    ).to_pandas()
    if agg.empty:  # all-empty to_pandas() loses columns
        agg = pd.DataFrame({"hour_epoch": pd.Series(dtype=np.int64),
                            "n_events": pd.Series(dtype=np.int64)})
    agg = agg.sort_values("hour_epoch", ignore_index=True)
    n = agg["n_events"].to_numpy(np.int64)
    agg["hour_epoch"] = agg["hour_epoch"].astype(np.int64)
    agg["n_events"] = n
    agg["delta"] = np.diff(n, prepend=n[:1]) if len(n) else n
    agg["cum"] = np.cumsum(n)
    c = np.cumsum(np.r_[0, n]).astype(np.float64)
    w = np.minimum(np.arange(1, len(n) + 1), 3)
    agg["ma3"] = (
        np.round((c[1:] - c[np.maximum(np.arange(len(n)) - 2, 0)]) / w, 6)
        if len(n)
        else np.array([], dtype=np.float64)
    )
    return agg


Q3_SEGMENT = "BUILDING"
Q3_DATE = np.datetime64("1998-06-15")  # mid-corpus cut (events span 95-01)


def shipping_priority(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q3 (shipping priority): revenue of not-yet-shipped
    lineitems of orders placed before the cut by customers in one
    market segment — the canonical 3-table join + aggregate + top-N.

    Distributed plan (each side reduced BEFORE anything moves):
      1. customer: segment filter → the qualifying custkey set is a
         broadcast small side (``ray.put`` once; the bloom-pruned
         semi-join in ``stages/bloom.py`` is the drop-in when a 100-TB
         segment no longer broadcasts exactly);
      2. orders: date predicate + map-side membership probe against
         the broadcast custkeys — only qualifying (orderkey, date,
         priority) rows survive;
      3. lineitem: date predicate + per-batch pre-aggregation to
         (orderkey, revenue_cents) partials — the exchange carries at
         most one row per (batch, orderkey), never raw lineitems;
      4. ONE co-partitioning exchange: ``joins.hash_join`` on
         orderkey, then a final orderkey-level sum + global top-k.

    Output: (l_orderkey, revenue_cents, o_orderdate_s, o_orderpriority)
    ordered by (revenue DESC, orderkey)."""
    import ray
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filters=[("c_mktsegment", "==", Q3_SEGMENT)],
    )["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cust_ref = ray.put(np.sort(cust))
    cut = Q3_DATE.astype("datetime64[s]").astype(np.int64)

    def orders_filter(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(cust_ref)
        ts = batch["o_orderdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        ck = batch["o_custkey"].to_numpy(np.int64)
        j = np.searchsorted(keys, ck)
        hit = (j < len(keys)) & (keys[np.minimum(j, len(keys) - 1)] == ck)
        keep = hit & (ts < cut)
        out = batch.loc[keep, ["o_orderkey", "o_orderpriority"]].copy()
        out["o_orderdate_s"] = ts[keep]
        return out

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_filter, batch_format="pandas")

    def line_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["l_shipdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        b = batch[ts > cut]
        if not len(b):
            return pd.DataFrame(
                {"l_orderkey": pd.Series(dtype=np.int64),
                 "revenue_cents": pd.Series(dtype=np.int64)}
            )
        rev = _cents((b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy())
        out = (
            pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                          "revenue_cents": rev})
            .groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        )
        return out.astype({"revenue_cents": np.int64})

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(line_partial, batch_format="pandas")

    joined = hash_join(
        lines, orders, on="l_orderkey", right_on="o_orderkey", how="inner"
    ).to_pandas()
    if joined.empty:
        return pd.DataFrame(
            {
                "l_orderkey": pd.Series(dtype=np.int64),
                "revenue_cents": pd.Series(dtype=np.int64),
                "o_orderdate_s": pd.Series(dtype=np.int64),
                "o_orderpriority": pd.Series(dtype=str),
            }
        )
    out = (
        joined.groupby(
            ["l_orderkey", "o_orderdate_s", "o_orderpriority"], as_index=False
        )["revenue_cents"].sum()
        .sort_values(["revenue_cents", "l_orderkey"], ascending=[False, True],
                     kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return out[["l_orderkey", "revenue_cents", "o_orderdate_s", "o_orderpriority"]].astype(
        {"l_orderkey": np.int64, "revenue_cents": np.int64, "o_orderdate_s": np.int64}
    )


Q5_REGION = "ASIA"
Q5_FROM = np.datetime64("1996-01-01")
Q5_TO = np.datetime64("1998-01-01")  # [FROM, TO)


def local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation for
    lineitems where the CUSTOMER and the SUPPLIER share a nation
    inside one region, over an order-date window — the canonical
    6-table star join.

    Distributed plan — three broadcast dims, one co-partition exchange:
      * region→nation (tiny) and supplier (small) broadcast as
        suppkey→nationkey / nationkey→name maps;
      * customer broadcasts as a custkey→nationkey array restricted to
        the region's nations (at 100 TB this is the side to bloom-prune
        or co-partition — documented trade, same as Q3's custkeys);
      * orders: date window + map-side custkey lookup → surviving
        (orderkey, c_nationkey) rows;
      * lineitem: map-side suppkey lookup → surviving rows pre-reduced
        per batch to (orderkey, s_nationkey, revenue_cents) partials;
      * ONE ``hash_join`` on orderkey, then the same-nation filter
        (c_nationkey == s_nationkey) and a |nations|-sized final sum.

    Output: (n_name, revenue_cents) ordered by revenue DESC."""
    import ray
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    region = pq.read_table(
        f"{sf_dir}/region.parquet", filters=[("r_name", "==", Q5_REGION)]
    )
    rkeys = set(region["r_regionkey"].to_pylist())
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    nat_name = {
        int(k): n
        for k, n, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
        if rk in rkeys
    }
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp_nat = {
        int(s): int(n)
        for s, n in zip(supp["s_suppkey"].to_pylist(),
                        supp["s_nationkey"].to_pylist())
        if int(n) in nat_name
    }
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_nat = {
        int(c): int(n)
        for c, n in zip(cust["c_custkey"].to_pylist(),
                        cust["c_nationkey"].to_pylist())
        if int(n) in nat_name
    }
    supp_ref, cust_ref = ray.put(supp_nat), ray.put(cust_nat)
    lo = Q5_FROM.astype("datetime64[s]").astype(np.int64)
    hi = Q5_TO.astype("datetime64[s]").astype(np.int64)

    def orders_side(batch: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cust_ref)
        ts = batch["o_orderdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        nat = batch["o_custkey"].map(cmap)
        keep = (ts >= lo) & (ts < hi) & nat.notna().to_numpy()
        return pd.DataFrame(
            {
                "o_orderkey": batch["o_orderkey"].to_numpy(np.int64)[keep],
                "c_nat": nat.to_numpy()[keep].astype(np.int64),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_side, batch_format="pandas")

    def line_side(batch: pd.DataFrame) -> pd.DataFrame:
        smap = ray.get(supp_ref)
        nat = batch["l_suppkey"].map(smap)
        keep = nat.notna().to_numpy()
        if not keep.any():
            return pd.DataFrame(
                {"l_orderkey": pd.Series(dtype=np.int64),
                 "s_nat": pd.Series(dtype=np.int64),
                 "revenue_cents": pd.Series(dtype=np.int64)}
            )
        b = batch[keep]
        out = pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                "s_nat": nat.to_numpy()[keep].astype(np.int64),
                "revenue_cents": _cents(
                    (b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy()
                ),
            }
        )
        return (
            out.groupby(["l_orderkey", "s_nat"], as_index=False)["revenue_cents"]
            .sum().astype({"revenue_cents": np.int64})
        )

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pandas")

    joined = hash_join(
        lines, orders, on="l_orderkey", right_on="o_orderkey", how="inner"
    ).to_pandas()
    joined = joined[joined["s_nat"] == joined["c_nat"]]
    if joined.empty:
        return pd.DataFrame(
            {"n_name": pd.Series(dtype=str),
             "revenue_cents": pd.Series(dtype=np.int64)}
        )
    agg = joined.groupby("s_nat", as_index=False)["revenue_cents"].sum()
    agg["n_name"] = agg["s_nat"].map(nat_name)
    agg = agg.sort_values(
        ["revenue_cents", "n_name"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    return agg[["n_name", "revenue_cents"]].astype({"revenue_cents": np.int64})


Q18_MIN_QTY = 300


def large_volume_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose TOTAL lineitem
    quantity exceeds a threshold, joined back to their customer — the
    group-HAVING-then-join shape (the aggregate's OUTPUT becomes the
    join's small side).

    Distributed plan: lineitem pre-reduces per batch to (orderkey,
    qty) partials → one ``groupby(orderkey)`` exchange finishes the
    sums → the HAVING filter leaves a heavy-order SLIVER that
    broadcasts (the whole point of the shape: the aggregate shrinks a
    fact table to a broadcastable set; same contract as the build's
    heavy-term detection) → orders stream once, map-side probing the
    broadcast for (custkey, totalprice) — no second wide exchange.

    Output: (c_custkey, o_orderkey, totalprice_cents, sum_qty) ordered
    (totalprice DESC, orderkey), top-k."""
    import ray
    import ray.data as rd

    def qty_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(np.int64),
                "qty": batch["l_quantity"].to_numpy().astype(np.int64),
            }
        )
        return out.groupby("l_orderkey", as_index=False)["qty"].sum()

    # coarse bucket shuffle instead of Ray's keyed groupby-aggregate:
    # at high key cardinality the sort-based aggregate is ~20x slower
    # (measured 128 s vs 5.8 s over sf0.1 lineitem) — 64 buckets keep
    # the exchange coarse and the per-bucket sum is one vectorized
    # pandas groupby (the repo-standard bucket shape)
    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((v * np.uint64(2654435761)) % np.uint64(64)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("l_orderkey", as_index=False)["qty"].sum()
        return s[s["qty"] > Q18_MIN_QTY].rename(columns={"qty": "sum_qty"})

    sums = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
        )
        .map_batches(qty_partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()  # the heavy-order sliver — output-sized by design
    )
    if sums.empty:
        return pd.DataFrame(
            {
                "c_custkey": pd.Series(dtype=np.int64),
                "o_orderkey": pd.Series(dtype=np.int64),
                "totalprice_cents": pd.Series(dtype=np.int64),
                "sum_qty": pd.Series(dtype=np.int64),
            }
        )
    qty_of = dict(
        zip(sums["l_orderkey"].astype(np.int64), sums["sum_qty"].astype(np.int64))
    )
    ref = ray.put(qty_of)

    def orders_probe(batch: pd.DataFrame) -> pd.DataFrame:
        heavy = ray.get(ref)
        qty = batch["o_orderkey"].map(heavy)
        keep = qty.notna().to_numpy()
        b = batch[keep]
        return pd.DataFrame(
            {
                "c_custkey": b["o_custkey"].to_numpy(np.int64),
                "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
                "totalprice_cents": _cents(b["o_totalprice"].to_numpy()),
                "sum_qty": qty.to_numpy()[keep].astype(np.int64),
            }
        )

    hits = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        .map_batches(orders_probe, batch_format="pandas")
        .to_pandas()
    )
    return (
        hits.sort_values(
            ["totalprice_cents", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        )
        .head(k)
        .reset_index(drop=True)
        .astype(
            {
                "c_custkey": np.int64, "o_orderkey": np.int64,
                "totalprice_cents": np.int64, "sum_qty": np.int64,
            }
        )
    )


def pricing_rollup(sf_dir: str):
    """ROLLUP over the Q1 pricing aggregate: (flag, status) detail rows
    plus per-flag subtotals plus a grand total, NULL-marked like SQL
    ``GROUP BY ROLLUP``.

    Scale shape: the corpus is aggregated ONCE at the finest grain (the
    existing map-side-partial + tiny keyed groupby); every coarser
    level is re-aggregated from that group-cardinality table on the
    driver — rollup costs zero extra passes and zero extra exchange."""
    fine = lineitem_pricing(sf_dir)[
        ["l_returnflag", "l_linestatus", "sum_qty", "revenue_cents", "n_rows"]
    ]
    metrics = ["sum_qty", "revenue_cents", "n_rows"]
    lvl1 = fine.groupby("l_returnflag", as_index=False)[metrics].sum()
    lvl1.insert(1, "l_linestatus", None)
    lvl0 = fine[metrics].sum().to_frame().T
    lvl0.insert(0, "l_returnflag", None)
    lvl0.insert(1, "l_linestatus", None)
    out = pd.concat([fine, lvl1, lvl0], ignore_index=True)
    return out.astype({m: np.int64 for m in metrics})


def customer_order_histogram(sf_dir: str):
    """TPC-H Q13-shaped count-of-counts: how many customers placed
    exactly k orders, INCLUDING the zero-order customers.

    Scale shape: orders aggregate to per-customer counts (map-side
    partials, one keyed exchange); the histogram re-aggregates that
    customer-cardinality table with ``np.bincount`` partials into a
    count-cardinality table (tiny). The zero bucket needs NO join at
    all — it is |customer| minus the number of distinct ordering
    customers, both already known (parquet metadata + the histogram's
    own mass)."""
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def per_cust_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(n=1)
        return b.groupby("o_custkey", as_index=False)["n"].sum()

    per_cust = (
        orders.map_batches(per_cust_partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )

    def hist_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["c_count"].to_numpy(np.int64)
        bc = np.bincount(c)
        nz = np.flatnonzero(bc)
        return pd.DataFrame({"c_count": nz.astype(np.int64),
                             "custdist": bc[nz].astype(np.int64)})

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pandas")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()
    )
    n_customers = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    n_zero = n_customers - int(hist["custdist"].sum())
    if n_zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    return hist.astype({"c_count": np.int64, "custdist": np.int64})


def late_shipment_priority(sf_dir: str):
    """TPC-H Q4-shaped order-priority check: per priority class, how
    many orders have at least one lineitem shipped AFTER the order
    date (``EXISTS`` semi-join with a cross-table predicate).

    Distributed plan: the EXISTS collapses to ``max(l_shipdate) >
    o_orderdate``, so lineitem pre-reduces per batch to (orderkey,
    max_ship) partials — but the probe side (orders) is itself
    fact-sized, so neither side broadcasts. Both sides ride ONE
    co-partitioning exchange: tagged rows bucket by the same orderkey
    hash, each bucket resolves max-vs-date with two vectorized pandas
    ops, and the output is a |priorities|-sized partial per bucket.
    Timestamps travel as int64 epoch-us (exact comparison, no float)."""
    import ray.data as rd

    B = np.uint64(64)

    def li_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "ship": batch["l_shipdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        m = df.groupby("key", as_index=False)["ship"].max()
        return pa.table(
            {
                "key": pa.array(m["key"].to_numpy(np.int64)),
                "ship": pa.array(m["ship"].to_numpy(np.int64)),
                "odate": pa.nulls(len(m), pa.int64()),
                "prio": pa.nulls(len(m), pa.string()),
            }
        )

    def orders_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["o_orderkey"].cast(pa.int64()),
                "ship": pa.nulls(batch.num_rows, pa.int64()),
                "odate": batch["o_orderdate"].cast(pa.int64()),
                "prio": batch["o_orderpriority"].cast(pa.string()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((v * np.uint64(2654435761)) % B).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def resolve(df: pd.DataFrame) -> pa.Table:
        li = df[df["odate"].isna()]
        od = df[df["odate"].notna()]
        if od.empty:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n_late": pa.array([], pa.int64())})
        max_ship = li.groupby("key")["ship"].max()
        ship = od["key"].map(max_ship)
        late = od[ship.notna().to_numpy() & (ship > od["odate"]).to_numpy()]
        out = late.groupby("prio", as_index=False).size()
        # Arrow output with explicit types: empty object-dtype pandas
        # frames trip Ray's block-size estimator (log spam per bucket).
        return pa.table(
            {
                "o_orderpriority": pa.array(out["prio"].tolist(), pa.string()),
                "n_late": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_rows, batch_format="pyarrow")

    partials = (
        union_ready(li, orders)  # feeds a shuffle — see union_ready
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()  # |buckets| × |priorities| rows — combine on the
    )  # driver; a keyed Dataset aggregate costs a 2nd exchange here
    out = partials.groupby("o_orderpriority", as_index=False)["n_late"].sum()
    return out.astype({"n_late": np.int64})


Q14_FROM = np.datetime64("1997-03-01")
Q14_TO = np.datetime64("1997-04-01")  # [FROM, TO)


def promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 (promotion effect): the fraction of one month's
    lineitem revenue attributable to PROMO-type parts — a fact-to-fact
    join whose output is a single scalar ratio.

    Distributed plan: lineitem pre-reduces per batch to (partkey,
    revenue_cents) partials — the month filter happens at the read, so
    at most one row per (batch, partkey) moves. The part side ships
    only (p_partkey, is_promo). Both ride ``joins.hash_join``'s ONE
    co-partitioning exchange; each joined block reduces to a 1-row
    (promo_cents, total_cents) partial, and the driver sums a
    block-count-sized frame. The percentage divides two exact integer
    cent sums, so Ray and SQL agree bit-for-bit."""
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    lo = Q14_FROM.astype("datetime64[s]").astype(np.int64)
    hi = Q14_TO.astype("datetime64[s]").astype(np.int64)

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["l_shipdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        b = batch[(ts >= lo) & (ts < hi)]
        if not len(b):
            return pd.DataFrame({"l_partkey": pd.Series(dtype=np.int64),
                                 "revenue_cents": pd.Series(dtype=np.int64)})
        rev = _cents((b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy())
        out = (
            pd.DataFrame({"l_partkey": b["l_partkey"].to_numpy(np.int64),
                          "revenue_cents": rev})
            .groupby("l_partkey", as_index=False)["revenue_cents"].sum()
        )
        return out.astype({"revenue_cents": np.int64})

    def part_flag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": batch["p_partkey"].to_numpy(np.int64),
                "is_promo": (batch["p_type"].to_numpy(object) == "PROMO"),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pandas")
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(part_flag, batch_format="pandas")

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = batch["revenue_cents"].to_numpy(np.int64)
        promo = rev[batch["is_promo"].to_numpy(bool)]
        return pd.DataFrame(
            {"promo_cents": [int(promo.sum())], "total_cents": [int(rev.sum())]}
        )

    parts_sums = (
        hash_join(li, parts, on="l_partkey", right_on="p_partkey", how="inner")
        .map_batches(block_partial, batch_format="pandas")
        .to_pandas()
    )
    promo = np.int64(parts_sums["promo_cents"].sum())
    total = np.int64(parts_sums["total_cents"].sum())
    pct = 100.0 * float(promo) / float(total) if total else 0.0
    return pd.DataFrame(
        {"promo_cents": [promo], "total_cents": [total], "promo_pct": [pct]}
    ).astype({"promo_cents": np.int64, "total_cents": np.int64,
              "promo_pct": np.float64})


# (brand, size_lo, size_hi, qty_lo, qty_hi) — all bounds inclusive,
# mirroring Q19's OR-of-ANDs bracket structure with this schema's cols.
Q19_BRANCHES = (
    ("Brand#4", 1, 15, 1, 20),
    ("Brand#19", 10, 30, 10, 30),
    ("Brand#17", 20, 50, 25, 45),
)


def discounted_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 (discounted revenue): revenue of lineitems whose part
    satisfies any of three (brand, size-range, quantity-range)
    conjunctions — the canonical OR-of-ANDs cross-table predicate.

    Distributed plan: the predicate couples l_quantity with part
    attributes, so lineitem pre-reduces per batch to (partkey,
    quantity, revenue_cents) partials — quantity is integral 1..50, so
    the partial key space stays tiny per partkey and the exchange
    still carries far fewer rows than raw lineitems. One
    ``hash_join`` exchange joins part's (partkey, brand, size); each
    joined block evaluates all three branches as vectorized masks and
    reduces to a 1-row cents partial."""
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = _cents((batch["l_extendedprice"] * (1.0 - batch["l_discount"])).to_numpy())
        out = (
            pd.DataFrame({"l_partkey": batch["l_partkey"].to_numpy(np.int64),
                          "qty": batch["l_quantity"].to_numpy().astype(np.int64),
                          "revenue_cents": rev})
            .groupby(["l_partkey", "qty"], as_index=False)["revenue_cents"].sum()
        )
        return out.astype({"revenue_cents": np.int64})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pandas")
    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        brand = batch["p_brand"].to_numpy(object)
        size = batch["p_size"].to_numpy(np.int64)
        qty = batch["qty"].to_numpy(np.int64)
        keep = np.zeros(len(batch), dtype=bool)
        for b, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES:
            keep |= (
                (brand == b)
                & (size >= s_lo) & (size <= s_hi)
                & (qty >= q_lo) & (qty <= q_hi)
            )
        rev = batch["revenue_cents"].to_numpy(np.int64)[keep]
        return pd.DataFrame({"revenue_cents": [int(rev.sum())]})

    sums = (
        hash_join(li, parts, on="l_partkey", right_on="p_partkey", how="inner")
        .map_batches(block_partial, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {"revenue_cents": [np.int64(sums["revenue_cents"].sum())]}
    ).astype({"revenue_cents": np.int64})


Q10_FROM = np.datetime64("1997-01-01")
Q10_TO = np.datetime64("1997-04-01")  # [FROM, TO)


def returned_item_revenue(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q10 (returned item reporting): the k customers who lost
    the most revenue to returned items in one quarter, with name,
    balance and nation attached.

    Distributed plan — join first, DECORATE AFTER THE TOP-K:
      * lineitem: returnflag filter at the read + per-batch
        pre-aggregation to (orderkey, revenue_cents);
      * orders: date window at the read → (orderkey, custkey);
      * ONE ``hash_join`` exchange on orderkey, per-block reduce to
        (custkey, cents) partials, then a customer-cardinality keyed
        sum and a global top-k — all before any customer column moves;
      * only the k winners' custkeys hit customer.parquet (row-group
        predicate pushdown) and the tiny nation table — at 100 TB the
        name/balance/nation columns never ride an exchange at all.

    Output: (c_custkey, c_name, revenue_cents, acctbal_cents, n_name)
    ordered by (revenue DESC, custkey)."""
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    lo = Q10_FROM.astype("datetime64[s]").astype(np.int64)
    hi = Q10_TO.astype("datetime64[s]").astype(np.int64)

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rev = _cents((batch["l_extendedprice"] * (1.0 - batch["l_discount"])).to_numpy())
        out = (
            pd.DataFrame({"l_orderkey": batch["l_orderkey"].to_numpy(np.int64),
                          "revenue_cents": rev})
            .groupby("l_orderkey", as_index=False)["revenue_cents"].sum()
        )
        return out.astype({"revenue_cents": np.int64})

    def orders_window(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["o_orderdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        b = batch[(ts >= lo) & (ts < hi)]
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(np.int64),
                             "o_custkey": b["o_custkey"].to_numpy(np.int64)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_returnflag") == "R"),
    ).map_batches(li_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_window, batch_format="pandas")

    def cust_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("o_custkey", as_index=False)["revenue_cents"].sum()
        return out.astype({"revenue_cents": np.int64})

    per_cust = (
        hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", how="inner")
        .map_batches(cust_partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    # global top-k: per-block partial top-k partials, final cut on driver
    def block_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["revenue_cents", "o_custkey"], ascending=[False, True]
        ).head(k)

    top = (
        per_cust.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["revenue_cents", "o_custkey"], ascending=[False, True],
                     kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    if top.empty:
        return pd.DataFrame(
            {"c_custkey": pd.Series(dtype=np.int64),
             "c_name": pd.Series(dtype=object),
             "revenue_cents": pd.Series(dtype=np.int64),
             "acctbal_cents": pd.Series(dtype=np.int64),
             "n_name": pd.Series(dtype=object)}
        )

    winners = [int(x) for x in top["o_custkey"]]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", winners)],
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = top.rename(columns={"o_custkey": "c_custkey"}).merge(cust, on="c_custkey")
    out["acctbal_cents"] = _cents(out["c_acctbal"].to_numpy())
    return out[["c_custkey", "c_name", "revenue_cents", "acctbal_cents", "n_name"]].astype(
        {"c_custkey": np.int64, "revenue_cents": np.int64, "acctbal_cents": np.int64}
    )


Q22_SEGMENTS = ("AUTOMOBILE", "HOUSEHOLD", "FURNITURE")
Q22_SINCE = np.datetime64("2000-01-01")  # "no orders since" window


def sales_opportunity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to this schema:
    per market segment, how many customers hold an above-average
    positive balance yet placed NO order inside the recency window
    (Q22's "no orders in N years") — an aggregate-derived scalar
    predicate plus an anti-semi-join where BOTH sides are fact-sized.

    Distributed plan:
      1. one aggregate pass over customer computes (sum_cents, n) of
         positive balances in the chosen segments → two driver scalars
         (the avg threshold is compared as ``cents * n > sum`` — exact
         integers, no float division anywhere);
      2. the anti-join broadcasts NOTHING: customer survivor rows and
         per-batch-deduped order custkeys are tagged and ride ONE
         co-partitioning exchange on custkey hash; each bucket drops
         customers seen on the orders side with a vectorized ``isin``
         and emits |segments|-sized partials.
    Output: (c_mktsegment, numcust, totacctbal_cents)."""
    import ray.data as rd

    segs = list(Q22_SEGMENTS)
    B = np.uint64(64)

    def cust_stats(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["c_mktsegment"].isin(segs)]
        cents = _cents(b["c_acctbal"].to_numpy())
        pos = cents[cents > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    cust_cols = ["c_custkey", "c_acctbal", "c_mktsegment"]
    stats = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=cust_cols)
        .map_batches(cust_stats, batch_format="pandas")
        .to_pandas()
    )
    s_total, n_total = int(stats["s"].sum()), int(stats["n"].sum())

    def cust_rows(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["c_mktsegment"].isin(segs)]
        cents = _cents(df["c_acctbal"].to_numpy())
        keep = cents * np.int64(n_total) > np.int64(s_total)
        df, cents = df[keep], cents[keep]
        return pa.table(
            {
                "key": pa.array(df["c_custkey"].to_numpy(np.int64)),
                "seg": pa.array(df["c_mktsegment"].to_numpy(object), pa.string()),
                "bal": pa.array(cents),
            }
        )

    def order_keys(batch: pa.Table) -> pa.Table:
        keys = np.unique(batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "key": pa.array(keys.astype(np.int64)),
                "seg": pa.nulls(len(keys), pa.string()),
                "bal": pa.nulls(len(keys), pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((v * np.uint64(2654435761)) % B).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def resolve(df: pd.DataFrame) -> pa.Table:
        cust = df[df["seg"].notna()]
        ordered = df.loc[df["seg"].isna(), "key"].unique()
        hit = cust[~cust["key"].isin(ordered)]
        out = hit.groupby("seg", as_index=False).agg(
            numcust=("key", "size"), totacctbal_cents=("bal", "sum")
        )
        # Arrow output with explicit types: empty object-dtype pandas
        # frames trip Ray's block-size estimator (log spam per bucket).
        return pa.table(
            {
                "c_mktsegment": pa.array(out["seg"].tolist(), pa.string()),
                "numcust": pa.array(out["numcust"].to_numpy(np.int64)),
                "totacctbal_cents": pa.array(
                    out["totacctbal_cents"].to_numpy(np.int64)
                ),
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=cust_cols
    ).map_batches(cust_rows, batch_format="pyarrow")
    since = pd.Timestamp(str(Q22_SINCE))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=(pc.field("o_orderdate") >= since),
    ).map_batches(order_keys, batch_format="pyarrow")

    partials = (
        union_ready(cust, orders)  # feeds a shuffle — see union_ready
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()  # |buckets| × |segments| rows — combine on the
    )  # driver; a keyed Dataset aggregate costs a 2nd exchange here
    out = partials.groupby("c_mktsegment", as_index=False).agg(
        numcust=("numcust", "sum"),
        totacctbal_cents=("totacctbal_cents", "sum"),
    )
    return out.astype({"numcust": np.int64, "totacctbal_cents": np.int64})


Q6_FROM = np.datetime64("1997-01-01")
Q6_TO = np.datetime64("1998-01-01")  # [FROM, TO)


def forecast_revenue_change(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 (forecasting revenue change): revenue gained if
    discounts in a band were eliminated over one year — the pure
    filter+scalar-aggregate baseline (no join, no exchange at all:
    per-block 1-row partials, driver sum).

    Output: (revenue_cents,) single row."""
    import ray.data as rd

    lo = Q6_FROM.astype("datetime64[s]").astype(np.int64)
    hi = Q6_TO.astype("datetime64[s]").astype(np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["l_shipdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        disc = batch["l_discount"].to_numpy()
        qty = batch["l_quantity"].to_numpy()
        keep = (
            (ts >= lo) & (ts < hi)
            & (disc >= 0.05) & (disc <= 0.07)
            & (qty < 24)
        )
        b = batch[keep]
        rev = _cents((b["l_extendedprice"] * b["l_discount"]).to_numpy())
        return pd.DataFrame({"revenue_cents": [int(rev.sum())]})

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    return pd.DataFrame(
        {"revenue_cents": [np.int64(parts["revenue_cents"].sum())]}
    ).astype({"revenue_cents": np.int64})


Q7_NATIONS = ("NATION_3", "NATION_7")


def volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 (volume shipping): revenue shipped between two nations
    per year, split by direction — supplier nation on the lineitem
    side, customer nation on the orders side, so the cross-table
    predicate (supp_nation ≠ cust_nation, both in the pair) resolves
    only after a fact×fact join.

    Distributed plan: nation and supplier broadcast as tiny lookup
    maps; customer broadcasts as a custkey→nation map restricted to
    the pair (bloom-prune or co-partition at 100 TB — Q5's documented
    trade); lineitem pre-reduces per batch to (orderkey, supp_nation,
    year, cents) partials; ONE ``hash_join`` exchange on orderkey
    against the filtered orders side; the direction filter and the
    |2×2×years| final sum happen on join blocks, combined driver-side.
    Output: (supp_nation, cust_nation, l_year, revenue_cents)."""
    import ray
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    pair_keys = {k for k, v in name_of.items() if v in Q7_NATIONS}

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    sup = sup[sup["s_nationkey"].isin(pair_keys)]
    supp_nat_ref = ray.put(
        dict(zip(sup["s_suppkey"].astype(np.int64),
                 (name_of[k] for k in sup["s_nationkey"])))
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(pair_keys)]
    cust_nat_ref = ray.put(
        dict(zip(cust["c_custkey"].astype(np.int64),
                 (name_of[k] for k in cust["c_nationkey"])))
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        snat = ray.get(supp_nat_ref)
        s = batch["l_suppkey"].map(snat)
        b = batch[s.notna()]
        if not len(b):
            return pd.DataFrame({"l_orderkey": pd.Series(dtype=np.int64),
                                 "supp_nation": pd.Series(dtype=object),
                                 "l_year": pd.Series(dtype=np.int64),
                                 "revenue_cents": pd.Series(dtype=np.int64)})
        yr = (
            b["l_shipdate"].to_numpy().astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        rev = _cents((b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy())
        out = (
            pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                          "supp_nation": s[s.notna()].to_numpy(object),
                          "l_year": yr, "revenue_cents": rev})
            .groupby(["l_orderkey", "supp_nation", "l_year"], as_index=False)[
                "revenue_cents"].sum()
        )
        return out.astype({"revenue_cents": np.int64})

    def orders_rows(batch: pd.DataFrame) -> pd.DataFrame:
        cnat = ray.get(cust_nat_ref)
        c = batch["o_custkey"].map(cnat)
        b = batch[c.notna()]
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(np.int64),
                             "cust_nation": c[c.notna()].to_numpy(object)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(orders_rows, batch_format="pandas")

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["supp_nation"] != batch["cust_nation"]]
        out = b.groupby(["supp_nation", "cust_nation", "l_year"],
                        as_index=False)["revenue_cents"].sum()
        return out.astype({"revenue_cents": np.int64})

    partials = (
        hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", how="inner")
        .map_batches(block_partial, batch_format="pandas")
        .to_pandas()
    )
    out = partials.groupby(["supp_nation", "cust_nation", "l_year"],
                           as_index=False)["revenue_cents"].sum()
    return out.astype({"l_year": np.int64, "revenue_cents": np.int64})


Q15_FROM = np.datetime64("1997-07-01")
Q15_TO = np.datetime64("1997-10-01")  # [FROM, TO)


def top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue
    over one quarter — a keyed aggregate whose answer is an argmax WITH
    TIES (the view+subquery construction of the spec).

    Distributed plan: lineitem pre-reduces per batch to (suppkey,
    cents); one supplier-cardinality keyed sum; the max + tie filter
    run on that dimension-sized aggregate (supplier is the small table
    of the schema — at larger scale take per-block maxima first); the
    winners' names come from a predicate-pushdown read of supplier.
    Output: (s_suppkey, s_name, total_revenue_cents)."""
    import ray.data as rd

    lo = Q15_FROM.astype("datetime64[s]").astype(np.int64)
    hi = Q15_TO.astype("datetime64[s]").astype(np.int64)

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["l_shipdate"].to_numpy().astype("datetime64[s]").astype(np.int64)
        b = batch[(ts >= lo) & (ts < hi)]
        if not len(b):
            return pd.DataFrame({"l_suppkey": pd.Series(dtype=np.int64),
                                 "total_revenue_cents": pd.Series(dtype=np.int64)})
        rev = _cents((b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy())
        out = (
            pd.DataFrame({"l_suppkey": b["l_suppkey"].to_numpy(np.int64),
                          "total_revenue_cents": rev})
            .groupby("l_suppkey", as_index=False)["total_revenue_cents"].sum()
        )
        return out.astype({"total_revenue_cents": np.int64})

    per_supp = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partial, batch_format="pandas")
        .groupby("l_suppkey")
        .aggregate(Sum("total_revenue_cents", alias_name="total_revenue_cents"))
        .to_pandas()
    )
    if per_supp.empty:
        return pd.DataFrame({"s_suppkey": pd.Series(dtype=np.int64),
                             "s_name": pd.Series(dtype=object),
                             "total_revenue_cents": pd.Series(dtype=np.int64)})
    best = int(per_supp["total_revenue_cents"].max())
    win = per_supp[per_supp["total_revenue_cents"] == best]
    keys = [int(x) for x in win["l_suppkey"]]
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys)],
    ).to_pandas()
    out = win.rename(columns={"l_suppkey": "s_suppkey"}).merge(names, on="s_suppkey")
    return (
        out[["s_suppkey", "s_name", "total_revenue_cents"]]
        .sort_values("s_suppkey", ignore_index=True)
        .astype({"s_suppkey": np.int64, "total_revenue_cents": np.int64})
    )


Q17_BRAND = "Brand#4"
Q17_MAX_SIZE = 10


def small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17-shaped (small-quantity-order revenue): yearly revenue
    lost if orders of less than 20% of a part's average quantity were
    no longer taken, over one brand's small parts — a per-group-average
    threshold applied back to the group's own rows (container column
    absent from this schema; the size bound stands in).

    Distributed plan: the brand's partkeys broadcast as a sorted array
    (map-side semi join); pass 1 reduces the surviving lineitems to
    per-partkey (sum_qty, cnt) — part-cardinality, combined
    driver-side; pass 2 re-filters map-side with the broadcast
    thresholds using the EXACT integer form ``5·qty·cnt < sum_qty``
    (no float division, so SQL reproduces it bit-for-bit).
    Output: (revenue_cents, avg_yearly) single row."""
    import ray
    import ray.data as rd

    parts = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_brand", "==", Q17_BRAND), ("p_size", "<=", Q17_MAX_SIZE)],
    )["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk_ref = ray.put(np.sort(parts))

    def member_mask(keys_sorted: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if len(keys_sorted) == 0:  # empty selection: minimum(j, -1)
            return np.zeros(len(vals), dtype=bool)  # would index with -1
        j = np.searchsorted(keys_sorted, vals)
        return (j < len(keys_sorted)) & (
            keys_sorted[np.minimum(j, len(keys_sorted) - 1)] == vals
        )

    def qty_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(pk_ref)
        pk = batch["l_partkey"].to_numpy(np.int64)
        b = batch[member_mask(keys, pk)]
        if not len(b):
            return pd.DataFrame({"l_partkey": pd.Series(dtype=np.int64),
                                 "sum_qty": pd.Series(dtype=np.int64),
                                 "cnt": pd.Series(dtype=np.int64)})
        out = (
            pd.DataFrame({"l_partkey": b["l_partkey"].to_numpy(np.int64),
                          "sum_qty": b["l_quantity"].to_numpy().astype(np.int64),
                          "cnt": 1})
            .groupby("l_partkey", as_index=False)[["sum_qty", "cnt"]].sum()
        )
        return out.astype({"sum_qty": np.int64, "cnt": np.int64})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    agg = li.map_batches(
        qty_partial, batch_format="pandas", batch_size=None
    ).to_pandas()
    if len(agg) == 0:  # all-empty to_pandas() loses columns
        agg = pd.DataFrame({"l_partkey": pd.Series(dtype=np.int64),
                            "sum_qty": pd.Series(dtype=np.int64),
                            "cnt": pd.Series(dtype=np.int64)})
    else:
        agg = agg.groupby("l_partkey", as_index=False)[
            ["sum_qty", "cnt"]].sum()
    thr_ref = ray.put(
        (
            agg["l_partkey"].to_numpy(np.int64),
            agg["sum_qty"].to_numpy(np.int64),
            agg["cnt"].to_numpy(np.int64),
        )
    )

    def rev_partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys, sums, cnts = ray.get(thr_ref)
        if len(keys) == 0:
            return pd.DataFrame({"revenue_cents": [0]})
        pk = batch["l_partkey"].to_numpy(np.int64)
        j = np.searchsorted(keys, pk)
        hit = (j < len(keys)) & (keys[np.minimum(j, len(keys) - 1)] == pk)
        qty = batch["l_quantity"].to_numpy().astype(np.int64)
        jj = np.minimum(j, len(keys) - 1)
        keep = hit & (5 * qty * cnts[jj] < sums[jj])
        rev = _cents(batch["l_extendedprice"].to_numpy()[keep])
        return pd.DataFrame({"revenue_cents": [int(rev.sum())]})

    parts_sums = (
        li.map_batches(rev_partial, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    total = np.int64(parts_sums["revenue_cents"].sum())
    return pd.DataFrame(
        {"revenue_cents": [total],
         "avg_yearly": [float(total) / 700.0]}
    ).astype({"revenue_cents": np.int64, "avg_yearly": np.float64})


def lineitem_moments(sf_dir: str) -> pd.DataFrame:
    """Grouped second-moment statistics: per return flag, sample
    variance of quantity and the quantity↔discount correlation —
    the moments family (var_samp / stddev / corr) done as ONE pass of
    exact integer sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy).

    Exactness contract: quantity ∈ [1,50] and discount-cents ∈ [0,10]
    keep every Σ inside int64 even at 10¹⁵ rows, and BOTH sides (Ray
    and the SQL oracle) derive the float results from the same integer
    sums with the same expression shape — no streaming-variance
    algorithm whose round-off depends on row order. Partials combine
    driver-side (|flags| × blocks rows).
    Output: (l_returnflag, n_rows, var_qty, corr_qty_disc), round6."""
    import ray.data as rd

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qty = batch["l_quantity"].to_numpy().astype(np.int64)
        dc = np.floor(batch["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(object),
                "n_rows": 1,
                "sx": qty,
                "sy": dc,
                "sxx": qty * qty,
                "syy": dc * dc,
                "sxy": qty * dc,
            }
        )
        out = df.groupby("l_returnflag", as_index=False).sum()
        return out.astype({c: np.int64 for c in ["n_rows", "sx", "sy", "sxx", "syy", "sxy"]})

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_discount"],
        )
        .map_batches(partial, batch_format="pandas", batch_size=None)
        .to_pandas()
        .groupby("l_returnflag", as_index=False)[
            ["n_rows", "sx", "sy", "sxx", "syy", "sxy"]
        ].sum()
    )
    n = parts["n_rows"].to_numpy(np.float64)
    sx = parts["sx"].to_numpy(np.float64)
    sy = parts["sy"].to_numpy(np.float64)
    sxx = parts["sxx"].to_numpy(np.float64)
    syy = parts["syy"].to_numpy(np.float64)
    sxy = parts["sxy"].to_numpy(np.float64)
    var_qty = (sxx - sx * sx / n) / (n - 1.0)
    corr = (sxy - sx * sy / n) / np.sqrt(
        (sxx - sx * sx / n) * (syy - sy * sy / n)
    )
    return pd.DataFrame(
        {
            "l_returnflag": parts["l_returnflag"].astype(object),
            "n_rows": parts["n_rows"].to_numpy(np.int64),
            "var_qty": round6(var_qty),
            "corr_qty_disc": round6(corr),
        }
    )


def pricing_cube(sf_dir: str):
    """CUBE over the Q1 pricing aggregate: all four grouping sets —
    (flag, status), (flag), (status), () — NULL-marked like SQL
    ``GROUP BY CUBE``. Same scale shape as ``pricing_rollup``: the
    corpus is aggregated once at the finest grain; every other level
    re-aggregates the group-cardinality table on the driver (zero
    extra passes, zero extra exchange — 2^k levels cost 2^k tiny
    pandas groupbys, never another corpus scan)."""
    fine = lineitem_pricing(sf_dir)[
        ["l_returnflag", "l_linestatus", "sum_qty", "revenue_cents", "n_rows"]
    ]
    metrics = ["sum_qty", "revenue_cents", "n_rows"]
    by_flag = fine.groupby("l_returnflag", as_index=False)[metrics].sum()
    by_flag.insert(1, "l_linestatus", None)
    by_status = fine.groupby("l_linestatus", as_index=False)[metrics].sum()
    by_status.insert(0, "l_returnflag", None)
    total = fine[metrics].sum().to_frame().T
    total.insert(0, "l_returnflag", None)
    total.insert(1, "l_linestatus", None)
    out = pd.concat([fine, by_flag, by_status, total], ignore_index=True)
    return out.astype({m: np.int64 for m in metrics})


Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_TYPE = "MEDIUM"


def market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 (national market share): for one part type sold into
    one region's customer market, the share of yearly revenue supplied
    by one nation — a 6-table star whose only fact×fact edge is
    lineitem×orders.

    Distributed plan: every dimension collapses to a broadcast —
    part→{MEDIUM partkeys} (set), supplier→suppkey∈nation (set),
    customer×nation×region→{region custkeys} (set). Lineitem
    pre-reduces per batch to (orderkey, from_nation, cents) partials
    after the partkey-set filter; orders filters by the custkey set
    and ships (orderkey, year). ONE ``hash_join`` exchange on
    orderkey; joined blocks reduce to |years|×2 partials summed on the
    driver. Revenue travels as exact integer cents so Ray and the SQL
    oracle agree bit-for-bit; the share is the caller's division.
    At 100 TB the three sets become bloom filters or co-partitioned
    sides (Q5's documented trade); the plan shape is unchanged.
    Output: (o_year, nation_cents, total_cents)."""
    import ray
    import ray.data as rd

    from zensearch_ray.pipelines.joins import hash_join

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    part_ref = ray.put(
        frozenset(part.loc[part["p_type"] == Q8_TYPE, "p_partkey"].astype(np.int64))
    )

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    region_nkeys = set(
        nat.loc[
            nat["n_regionkey"].isin(
                reg.loc[reg["r_name"] == Q8_REGION, "r_regionkey"]
            ),
            "n_nationkey",
        ]
    )
    nation_nkeys = set(nat.loc[nat["n_name"] == Q8_NATION, "n_nationkey"])

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    from_nation_ref = ray.put(
        frozenset(
            sup.loc[sup["s_nationkey"].isin(nation_nkeys), "s_suppkey"].astype(
                np.int64
            )
        )
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust_ref = ray.put(
        frozenset(
            cust.loc[cust["c_nationkey"].isin(region_nkeys), "c_custkey"].astype(
                np.int64
            )
        )
    )

    def li_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(part_ref)
        b = batch[batch["l_partkey"].isin(pk)]
        if not len(b):
            return pd.DataFrame(
                {"l_orderkey": pd.Series(dtype=np.int64),
                 "from_nation": pd.Series(dtype=bool),
                 "revenue_cents": pd.Series(dtype=np.int64)}
            )
        sk = ray.get(from_nation_ref)
        rev = _cents((b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy())
        out = (
            pd.DataFrame(
                {"l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                 "from_nation": b["l_suppkey"].isin(sk).to_numpy(),
                 "revenue_cents": rev}
            )
            .groupby(["l_orderkey", "from_nation"], as_index=False)[
                "revenue_cents"].sum()
        )
        return out.astype({"revenue_cents": np.int64})

    def orders_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ck = ray.get(cust_ref)
        b = batch[batch["o_custkey"].isin(ck)]
        yr = (
            b["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(np.int64),
                             "o_year": yr})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_rows, batch_format="pandas")

    def block_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("o_year")
        out = pd.DataFrame(
            {
                "o_year": np.fromiter(g.groups, dtype=np.int64),
                "nation_cents": g.apply(
                    lambda d: int(
                        d.loc[d["from_nation"], "revenue_cents"].sum()
                    ),
                    include_groups=False,
                ).to_numpy(np.int64),
                "total_cents": g["revenue_cents"].sum().to_numpy(np.int64),
            }
        )
        return out

    partials = (
        hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                  how="inner")
        .map_batches(block_partial, batch_format="pandas")
        .to_pandas()
    )
    out = partials.groupby("o_year", as_index=False)[
        ["nation_cents", "total_cents"]].sum()
    return out.astype({"o_year": np.int64, "nation_cents": np.int64,
                       "total_cents": np.int64}).sort_values(
        "o_year", ignore_index=True)


Q21_LATE_DAYS = 365  # the schema has no commit/receipt dates; "kept the
# order waiting" = shipped >365 days after the order date (same
# adaptation family as Q4's shipdate-vs-orderdate lateness)


def sole_late_suppliers(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): suppliers whose
    lineitems were the ONLY late ones on a finished multi-supplier
    order — the spec's EXISTS (another supplier on the order) +
    NOT EXISTS (another LATE supplier) double correlated subquery.

    Distributed plan: both subqueries are per-orderkey group
    predicates, so the whole query rides ONE co-partitioning exchange
    (Q4's tagged-union shape). Lineitem pre-reduces per batch to
    (orderkey, suppkey, max_ship) partials — the EXISTS collapses to
    distinct-supplier counting and the lateness test to one max per
    (orderkey, suppkey). Orders ships (orderkey, odate) for 'F' rows
    only. Each bucket resolves: late := max_ship > odate + 365 d;
    qualifying orders have ≥2 suppliers and exactly 1 late; emit that
    supplier. Bucket partials are (suppkey, n)-sized; the driver sums
    |suppliers| rows, attaches names from the dimension read, and
    takes the global top-k with the spec's (numwait DESC, s_name)
    tie order. Timestamps travel as int64 epoch — exact comparisons.
    Output: (s_name, numwait)."""
    import ray.data as rd

    B = np.uint64(64)
    late_us = np.int64(Q21_LATE_DAYS) * 86_400_000_000

    def li_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": batch["l_orderkey"].to_numpy(zero_copy_only=False),
                "supp": batch["l_suppkey"].to_numpy(zero_copy_only=False),
                "ship": batch["l_shipdate"].cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        m = df.groupby(["key", "supp"], as_index=False)["ship"].max()
        return pa.table(
            {
                "key": pa.array(m["key"].to_numpy(np.int64)),
                "supp": pa.array(m["supp"].to_numpy(np.int64)),
                "ship": pa.array(m["ship"].to_numpy(np.int64)),
                "odate": pa.nulls(len(m), pa.int64()),
            }
        )

    def orders_rows(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch["o_orderstatus"], "F")
        b = batch.filter(mask)
        return pa.table(
            {
                "key": b["o_orderkey"].cast(pa.int64()),
                "supp": pa.nulls(b.num_rows, pa.int64()),
                "ship": pa.nulls(b.num_rows, pa.int64()),
                "odate": b["o_orderdate"].cast(pa.int64()),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((v * np.uint64(2654435761)) % B).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b))

    def resolve(df: pd.DataFrame) -> pa.Table:
        li = df[df["odate"].isna()]
        od = df[df["odate"].notna()]
        empty = pa.table({"l_suppkey": pa.array([], pa.int64()),
                          "numwait": pa.array([], pa.int64())})
        if od.empty or li.empty:
            return empty
        # keep only orders present on the 'F' side, with their odate
        odate = dict(zip(od["key"].to_numpy(np.int64),
                         od["odate"].to_numpy(np.int64)))
        li = li[li["key"].isin(odate)]
        if li.empty:
            return empty
        # re-reduce: the same (orderkey, suppkey) emits one partial per
        # source batch — supplier counting below needs one row each
        li = li.groupby(["key", "supp"], as_index=False)["ship"].max()
        cut = li["key"].map(odate).to_numpy(np.int64) + late_us
        li = li.assign(late=(li["ship"].to_numpy(np.int64) > cut))
        g = li.groupby("key")["late"]
        ok = g.agg(["count", "sum"])
        hit_keys = ok.index[(ok["count"] >= 2) & (ok["sum"] == 1)]
        winners = li[li["late"] & li["key"].isin(hit_keys)]
        out = winners.groupby("supp", as_index=False).size()
        return pa.table(
            {
                "l_suppkey": pa.array(out["supp"].to_numpy(np.int64)),
                "numwait": pa.array(out["size"].to_numpy(np.int64)),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(orders_rows, batch_format="pyarrow")

    partials = (
        union_ready(li, orders)  # feeds a shuffle — see union_ready
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    counts = partials.groupby("l_suppkey", as_index=False)["numwait"].sum()

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    counts["s_name"] = counts["l_suppkey"].map(
        dict(zip(sup["s_suppkey"].astype(np.int64), sup["s_name"]))
    )
    out = counts.sort_values(
        ["numwait", "s_name"], ascending=[False, True], ignore_index=True
    ).head(k)[["s_name", "numwait"]]
    return out.astype({"numwait": np.int64}).reset_index(drop=True)
