"""Edge-case coverage for pipelines/analytics.py beyond the oracle
parity suite: exact-quantile selection against a numpy referee
(including degenerate distributions and forced bracket retries),
multi-query ANN vs the single-probe path, and sampling determinism."""

import math

import numpy as np
import pyarrow as pa
import pytest

from zensearch_ray.pipelines.analytics import exact_quantiles, events_sample
from zensearch_ray.stages.ann import cosine_topk, cosine_topk_multi

SF_DIR = "/root/testdata/sf0.001"


def _disc_quantile(vals: np.ndarray, q: float) -> float:
    """DuckDB quantile_disc referee: 0-based rank max(ceil(q*n)-1, 0)."""
    s = np.sort(vals)
    return float(s[max(math.ceil(q * len(s)) - 1, 0)])


def _ds_of(vals: np.ndarray, n_blocks: int = 8):
    import ray.data as rd

    tables = [
        pa.table({"x": chunk.astype(np.float64)})
        for chunk in np.array_split(vals, n_blocks)
    ]
    return rd.from_arrow(tables)


@pytest.mark.parametrize(
    "dist",
    [
        "uniform",       # well-behaved
        "zipf-dups",     # heavy duplication (brackets full of one value)
        "constant",      # all equal
        "two-point",     # extreme bimodal — stride samples can miss a side
    ],
)
def test_exact_quantiles_matches_numpy(ray_session, dist):
    rng = np.random.default_rng(7)
    if dist == "uniform":
        vals = rng.uniform(0, 1e6, size=20000)
    elif dist == "zipf-dups":
        vals = np.floor(rng.zipf(1.3, size=20000).clip(max=50)).astype(float)
    elif dist == "constant":
        vals = np.full(5000, 42.5)
    else:
        vals = np.where(rng.random(20000) < 0.999, 1.0, 1e9)
    qs = (0.01, 0.25, 0.5, 0.9, 0.99)
    out = exact_quantiles(_ds_of(vals), "x", qs=qs)
    want = [_disc_quantile(vals, q) for q in qs]
    assert out["value"].tolist() == want


def test_exact_quantiles_tiny_sample_forces_retry(ray_session):
    # sample_per_block=1 over 64 blocks → 64-point sample for 20k rows;
    # the initial bracket around the 0.999 rank will often miss, so the
    # margin-widening rescan path must still land on the exact value
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 1, size=20000)
    out = exact_quantiles(_ds_of(vals, n_blocks=64), "x", qs=(0.001, 0.999),
                          sample_per_block=1)
    assert out["value"].tolist() == [
        _disc_quantile(vals, 0.001), _disc_quantile(vals, 0.999)
    ]


def test_exact_quantiles_single_row(ray_session):
    out = exact_quantiles(_ds_of(np.array([3.0]), n_blocks=1), "x", qs=(0.5,))
    assert out["value"].tolist() == [3.0]


def test_multi_topk_consistent_with_single(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    probes = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 3)],
    )
    order = np.argsort(probes["vec_id"].to_numpy())
    ids = probes["vec_id"].to_numpy()[order]
    mat = np.array(probes["embedding"].to_pylist(), dtype=np.float64)[order]

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    multi = cosine_topk_multi(ds, mat, ids, k=5)
    for qi, vec in zip(ids, mat):
        single = cosine_topk(ds, vec, k=5)
        got = multi[multi["query_id"] == qi]
        assert got["vec_id"].tolist() == single["vec_id"].tolist()
        assert got["sim"].tolist() == single["sim"].tolist()


def test_events_sample_deterministic_subset(ray_session):
    a = events_sample(SF_DIR).to_pandas().sort_values("event_id", ignore_index=True)
    b = events_sample(SF_DIR).to_pandas().sort_values("event_id", ignore_index=True)
    assert a.equals(b)  # reproducible across runs
    n_total = 1000  # sf0.001 events rows
    # ~10% nominal rate; multiplicative hash is uniform enough for 3x bounds
    assert 0.03 * n_total < len(a) < 0.3 * n_total
    ids = a["event_id"].to_numpy()
    assert ((ids * 48271) % 65536 < 6553).all()


def test_events_funnel_strict_ordering(ray_session, tmp_path):
    """Crafted sequences: step N counts only events STRICTLY after the
    user's step-(N-1) reach (ties and out-of-order steps don't count)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.analytics import events_funnel

    rows = [
        # u1: full ordered funnel
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: click BEFORE view → never reaches step 2
        (2, 10, "click"), (2, 20, "view"),
        # u3: view only
        (3, 10, "view"),
        # u4: click at the SAME ts as view → strict > excludes it,
        # but a later second click still qualifies
        (4, 10, "view"), (4, 10, "click"), (4, 15, "click"),
        # u5: no view at all → not even step 1
        (5, 10, "purchase"),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
            "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = events_funnel(str(tmp_path))
    assert list(got["step"]) == [1, 2, 3]
    assert list(got["event_type"]) == ["view", "click", "purchase"]
    assert list(got["n_users"]) == [4, 2, 1]  # views: u1-u4; clicks: u1,u4; purchase: u1


def test_events_retention_crafted(ray_session, tmp_path):
    """Crafted cohorts: offset 0 equals cohort size; only listed
    offsets appear; multi-event days dedup to one active mark."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.analytics import events_retention

    DAY = 86400
    rows = [
        # cohort day 0: u1 active d0,d1,d1(dup),d7 ; u2 active d0 only
        (1, 0), (1, DAY), (1, DAY + 5), (1, 7 * DAY),
        (2, 10),
        # cohort day 3: u3 active d3, d4 (offset 1), d5 (offset 2 → not listed)
        (3, 3 * DAY), (3, 4 * DAY), (3, 5 * DAY),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[s]").astype(
                    "datetime64[us]"
                )
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = events_retention(str(tmp_path), offsets=(0, 1, 7))
    want = {
        (0, 0): 2,  # u1, u2
        (0, 1): 1,  # u1
        (0, 7): 1,  # u1
        (3, 0): 1,  # u3
        (3, 1): 1,  # u3 on day 4
    }
    got_map = {
        (c, o): n
        for c, o, n in zip(got["cohort_day"], got["day_offset"], got["n_users"])
    }
    assert got_map == want


def test_small_quantity_revenue_empty_selection(ray_session, tmp_path):
    # ADVICE r2: an empty brand/size part selection made member_mask
    # index an empty array with -1 (numpy & does not short-circuit)
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.relational import small_quantity_revenue

    d = str(tmp_path)
    pq.write_table(
        pa.table({
            "p_partkey": pa.array([1, 2], pa.int64()),
            "p_brand": pa.array(["Brand#9", "Brand#9"]),  # never Brand#4
            "p_size": pa.array([50, 50], pa.int32()),
        }),
        f"{d}/part.parquet",
    )
    pq.write_table(
        pa.table({
            "l_partkey": pa.array([1, 2, 1], pa.int64()),
            "l_quantity": pa.array([3.0, 10.0, 1.0]),
            "l_extendedprice": pa.array([100.0, 200.0, 50.0]),
        }),
        f"{d}/lineitem.parquet",
    )
    out = small_quantity_revenue(d)
    assert int(out["revenue_cents"].iloc[0]) == 0
    assert float(out["avg_yearly"].iloc[0]) == 0.0


def test_term_vectors_referee(ray_session):
    # brute-force referee over the raw text: term set, tf, positions,
    # and corpus df (distinct-doc count under the pinned tokenizer)
    from collections import Counter

    import pyarrow.parquet as pq

    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.pipelines.corpus import term_vectors

    got = term_vectors(SF_DIR, 3)
    texts = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    by_id = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(tokenize(by_id[3])):
        pos.setdefault(t, []).append(i)
    df_counter: Counter = Counter()
    for txt in by_id.values():
        df_counter.update(set(tokenize(txt)))
    assert got["term"].tolist() == sorted(pos)
    for _, row in got.iterrows():
        assert row["tf"] == len(pos[row["term"]])
        assert row["positions"] == ",".join(map(str, pos[row["term"]]))
        assert row["df"] == df_counter[row["term"]]
    with pytest.raises(ValueError, match="not found"):
        term_vectors(SF_DIR, 10**9)


def test_match_percentiles_rank_rule(ray_session):
    # percentile_disc rank rule incl. the q=0.0 / q=1.0 clamps, against
    # a referee built from the engine's own full match set
    import pyarrow.parquet as pq

    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.pipelines.corpus import index_dir_for, match_percentiles
    from zensearch_ray.pipelines.query import QueryEngine

    texts = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    dl_of = {
        d: len(tokenize(t))
        for d, t in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist())
    }
    engine = QueryEngine(index_dir_for(SF_DIR))
    qs = (0.0, 0.25, 0.5, 0.75, 1.0)
    for query in ("stream table", "vector dup"):
        vals = np.sort([dl_of[d] for d, _ in engine.topk(query, k=10**9)])
        got = match_percentiles(SF_DIR, query, qs=qs)
        for q, v in zip(got["q"], got["value"]):
            want = vals[min(max(math.ceil(q * len(vals)) - 1, 0), len(vals) - 1)]
            assert v == float(want), (query, q)
    # vocabulary miss: qs preserved, values all NaN
    miss = match_percentiles(SF_DIR, "zzzznotaword", qs=qs)
    assert miss["q"].tolist() == list(qs)
    assert miss["value"].isna().all()
