"""Token-balanced contiguous training shards (`corpus.balanced_shards`):
contiguity in doc order, per-shard token mass within one document of
ideal, empty-doc stream positions, and determinism."""

import numpy as np

from zensearch_ray.pipelines import corpus

SF = "/root/testdata/sf0.001"


def test_balanced_shards_contiguous_and_balanced(ray_session):
    df = (
        corpus.balanced_shards(SF, n_shards=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # contiguous: shard is monotone in doc_id order
    assert (np.diff(df["shard"].to_numpy()) >= 0).all()
    assert df["shard"].min() == 0
    # balance: every shard's token mass within one max-doc of ideal
    total = int(df["dl"].sum())
    ideal = total / 4
    per = df.groupby("shard")["dl"].sum()
    assert (np.abs(per.to_numpy() - ideal) <= int(df["dl"].max()) + 1).all()
    # every doc labeled exactly once
    assert len(df) == df["doc_id"].nunique()


def test_balanced_shards_deterministic_and_prefix_exact(ray_session):
    a = corpus.balanced_shards(SF, n_shards=8).to_pandas().sort_values("doc_id")
    b = corpus.balanced_shards(SF, n_shards=8).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # the labeling rule is floor(prefix * S / total) on the exact stream
    dl = a["dl"].to_numpy(np.int64)
    cum = np.concatenate(([0], np.cumsum(dl[:-1])))
    total = max(int(dl.sum()), 1)
    want = np.minimum(cum * 8 // total, 7)
    assert (a["shard"].to_numpy(np.int64) == want).all()
