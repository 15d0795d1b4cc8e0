"""Index export (``pipelines/export.py``): the decoded (term, doc_id,
tf, dl) rows must equal the facts recomputed from the raw texts by the
pinned tokenizer — across the full index lifecycle (cold build, append
generations, tombstones) and through the CLI."""

import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.text import term_frequencies
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.export import dump_postings
from zensearch_ray.sources.pages import generate_pages_table


def _cfg():
    return BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")


def _expected(table, doc_ids=None) -> pd.DataFrame:
    """Brute-force (term, doc_id, tf, dl) facts under the pinned
    tokenizer; dense doc_id = row position, lang='en' rows only."""
    rows = []
    for i, (tx, lg) in enumerate(
        zip(table["text"].to_pylist(), table["lang"].to_pylist())
    ):
        if lg != "en" or (doc_ids is not None and i not in doc_ids):
            continue
        tfs = term_frequencies(tx)
        dl = sum(tfs.values())
        rows.extend((t, i, c, dl) for t, c in tfs.items())
    return (
        pd.DataFrame(rows, columns=["term", "doc_id", "tf", "dl"])
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )


def _got(index_dir) -> pd.DataFrame:
    return (
        dump_postings(index_dir)
        .to_pandas()
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("exp")
    t = generate_pages_table(120, seed=7)
    a = str(root / "a.parquet")
    b = str(root / "b.parquet")
    pq.write_table(t.slice(0, 70), a, row_group_size=32)
    pq.write_table(t.slice(70, 50), b, row_group_size=32)
    return t, a, b


def test_export_matches_bruteforce(ray_session, corpus, tmp_path):
    t, a, _ = corpus
    idx = str(tmp_path / "idx")
    build_index(a, idx, _cfg())
    pd.testing.assert_frame_equal(_got(idx), _expected(t.slice(0, 70)))


def test_export_spans_append_generations(ray_session, corpus, tmp_path):
    t, a, b = corpus
    idx = str(tmp_path / "idx")
    build_index(a, idx, _cfg())
    build_index(b, idx, _cfg(), append=True)
    pd.testing.assert_frame_equal(_got(idx), _expected(t))


def test_export_drops_tombstones(ray_session, corpus, tmp_path):
    from zensearch_ray.pipelines.delete import delete_docs

    t, a, _ = corpus
    idx = str(tmp_path / "idx")
    build_index(a, idx, _cfg())
    dead = [0, 3, 5]
    delete_docs(idx, doc_ids=dead)
    live = set(range(70)) - set(dead)
    pd.testing.assert_frame_equal(
        _got(idx), _expected(t.slice(0, 70), doc_ids=live)
    )


def test_export_cli_roundtrip(ray_session, corpus, tmp_path):
    _, a, _ = corpus
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "dump")
    build_index(a, idx, _cfg())
    r = subprocess.run(
        [sys.executable, "-m", "zensearch_ray", "export",
         "--index", idx, "--output", out],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    dumped = (
        pq.ParquetDataset(out).read().to_pandas()
        .sort_values(["term", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(dumped, _got(idx))
