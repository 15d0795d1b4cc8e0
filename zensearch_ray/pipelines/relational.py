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

    from zensearch_ray.functions.agg import bucketed_groupby_sum

    # (user, hour) cardinality ~ rows: bucketed aggregation, not the
    # per-group native aggregate (see functions/agg.py)
    return bucketed_groupby_sum(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["user_id", "hour_epoch"],
        sum_cols=["n_events", "sum_value_cents"],
    )


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

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        li = df[df["odate"].isna()]
        od = df[df["odate"].notna()]
        if od.empty:
            return pd.DataFrame({"o_orderpriority": pd.Series(dtype=object),
                                 "n_late": pd.Series(dtype=np.int64)})
        max_ship = li.groupby("key")["ship"].max()
        ship = od["key"].map(max_ship)
        late = od[ship.notna().to_numpy() & (ship > od["odate"]).to_numpy()]
        out = late.groupby("prio", as_index=False).size()
        return pd.DataFrame(
            {
                "o_orderpriority": out["prio"].astype(object),
                "n_late": out["size"].to_numpy(np.int64),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_rows, batch_format="pyarrow")

    return (
        li.union(orders)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(resolve, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
    )
