"""CLI surface driven in-process (main(argv)): stats introspection,
suggest, and query mode dispatch — the commands whose logic lives in
__main__ itself rather than a pipeline module."""

import json

import pytest

from zensearch_ray.__main__ import main
from zensearch_ray.pipelines.build_index import BuildConfig, build_index


@pytest.fixture(scope="module")
def cli_index(ray_session, pages_small, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cli_idx"))
    manifest = build_index(
        pages_small, d,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en"),
    )
    return d, manifest


def _run(capsys, argv) -> list[dict]:
    assert main(argv) == 0
    return [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]


def test_cli_stats_reports_partition_metrics(cli_index, capsys):
    d, manifest = cli_index
    (out,) = _run(capsys, ["stats", "--index", d])
    assert out["manifest"]["n_docs"] == manifest["n_docs"]
    p = out["partitions"]
    assert p["n"] == manifest["n_partitions"]
    assert p["posting_bytes"]["total"] == manifest["total_posting_bytes"]
    assert p["n_postings_total"] == manifest["total_postings"]
    assert p["posting_bytes"]["min"] <= p["posting_bytes"]["p50"] <= p["posting_bytes"]["max"]
    assert p["posting_bytes"]["skew_max_over_p50"] >= 1
    # --partitions adds one raw lineage row per committed partition
    (full,) = _run(capsys, ["stats", "--index", d, "--partitions"])
    assert len(full["per_partition"]) == p["n"]
    assert all("posting_bytes" in row for row in full["per_partition"])


def test_cli_suggest_and_query_modes(cli_index, capsys):
    d, _ = cli_index
    (sug,) = _run(capsys, ["suggest", "--index", d, "serch engin"])
    got = {r["token"]: r["suggestion"] for r in sug["suggestions"]}
    assert got == {"serch": "search", "engin": "engine"}

    (fz,) = _run(capsys, ["query", "--index", d, "--mode", "fuzzy", "serch"])
    (ex,) = _run(capsys, ["query", "--index", d, "--mode", "exhaustive", "search"])
    assert fz["results"] and ex["results"]

    (nt,) = _run(capsys, ["query", "--index", d, "--mode", "not", "search -the"])
    excluded = {r["doc_id"] for r in nt["results"]}
    (the,) = _run(capsys, ["query", "--index", d, "--mode", "exhaustive", "the", "-k", "100000"])
    assert excluded.isdisjoint({r["doc_id"] for r in the["results"]})


def test_cli_significant(cli_index, capsys):
    d, _ = cli_index
    (out,) = _run(
        capsys,
        ["significant", "--index", d, "-k", "5", "--min-fg-df", "2",
         "search", "engine"],
    )
    assert out["query"] == "search engine"
    rows = out["significant"]
    assert 0 < len(rows) <= 5
    # the query's own terms never appear; lift ordering is monotone
    assert not {"search", "engine"} & {r["term"] for r in rows}
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["df_fg"] >= 2 and r["df_fg"] <= r["df_bg"] for r in rows)


def test_cli_percolate(ray_session, tmp_path, capsys):
    import json as _json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from zensearch_ray.__main__ import main

    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(
                    ["spark window merge", "hash join", "merge stream"]
                ),
            }
        ),
        docs,
    )
    qfile = str(tmp_path / "q.json")
    with open(qfile, "w") as f:
        _json.dump({"a": "spark AND window", "b": "merge -spark"}, f)
    out = str(tmp_path / "matches")
    rc = main(["percolate", "--input", docs, "--queries", qfile, "--output", out])
    assert rc == 0
    got = pq.ParquetDataset(out).read().to_pandas()
    assert set(zip(got["doc_id"], got["query_id"])) == {(0, "a"), (2, "b")}


def test_cli_diff(ray_session, tmp_path, capsys):
    import json as _json

    import pyarrow.parquet as pq

    from zensearch_ray.__main__ import main
    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.sources.pages import generate_pages_table

    t = generate_pages_table(80, seed=3)
    a_src, b_src = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(t.slice(0, 50), a_src)
    pq.write_table(t, b_src)
    cfg = BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    da, db = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(a_src, da, cfg)
    build_index(b_src, db, cfg)
    rc = main(["diff", "--a", da, "--b", db])
    assert rc == 0
    d = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert d["docs_only_a"] == 0 and d["docs_common"] > 0
    # b holds a superset of a's docs (plus a's non-en rows are absent in both)
    assert d["docs_only_b"] > 0
    assert d["terms_only_a"] == 0
    assert d["config_fp_match"] is True
