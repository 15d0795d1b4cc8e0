"""Index fsck: a healthy index (cold, appended, positional, with
sigstore) reports ok with zero errors; each planted corruption class —
tampered df, lowered block-max bound, missing segment, missing
termdict sidecar, tampered global stats — is detected and named."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.fsck import fsck_index
from zensearch_ray.state.manifest import IndexLayout


def _cfg(**kw):
    return BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60,
                       lang="en", **kw)


@pytest.fixture()
def healthy_index(ray_session, pages_small, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(pages_small, idx, _cfg(sig_store=True))
    return idx


def test_healthy_index_is_ok(healthy_index):
    r = fsck_index(healthy_index, deep=True)
    assert r["ok"], r["errors"]
    assert r["errors"] == []
    assert r["n_terms"] > 0 and r["total_postings"] > 0
    assert r["sigstore"] is not None and r["sigstore"]["n_docs"] == r["n_docs"]
    assert r["max_doc_id"] >= 0


def test_fast_mode_skips_decode(healthy_index):
    r = fsck_index(healthy_index, deep=False)
    assert r["ok"], r["errors"]
    assert "n_terms" not in r


def test_positional_and_appended_index_ok(ray_session, pages_small, tmp_path):
    import pyarrow.parquet as pq_

    from zensearch_ray.sources.pages import generate_pages_table

    t = generate_pages_table(120, seed=5)
    a, b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq_.write_table(t.slice(0, 60), a)
    pq_.write_table(t.slice(60, 60), b)
    idx = str(tmp_path / "pidx")
    build_index(a, idx, _cfg(positions=True))
    build_index(b, idx, _cfg(positions=True), append=True)
    r = fsck_index(idx, deep=True)
    assert r["ok"], r["errors"]
    assert r["n_generations"] == 2


def _tamper_first_row(path: str, col: str, fn):
    t = pq.read_table(path)
    vals = t[col].to_pylist()
    vals[0] = fn(vals[0])
    i = t.column_names.index(col)
    t = t.set_column(i, col, pa.array(vals, type=t.schema.field(col).type))
    pq.write_table(t, path)


def _first_segment(idx: str) -> str:
    layout = IndexLayout(idx)
    m = layout.committed_parts_all_gens()[0]
    return layout.posting_path(int(m["part"]), int(m.get("gen", 0)))


def test_detects_tampered_df(healthy_index):
    _tamper_first_row(_first_segment(healthy_index), "df", lambda v: v + 1)
    r = fsck_index(healthy_index, deep=True)
    assert not r["ok"]
    assert any("stored df" in e for e in r["errors"])


def test_detects_unsafe_block_max(healthy_index):
    _tamper_first_row(
        _first_segment(healthy_index), "block_max",
        lambda bm: [v / 2 for v in bm],
    )
    r = fsck_index(healthy_index, deep=True)
    assert not r["ok"]
    assert any("pruning unsafe" in e for e in r["errors"])


def test_detects_missing_segment_and_sidecar(healthy_index):
    layout = IndexLayout(healthy_index)
    seg = _first_segment(healthy_index)
    os.remove(layout.dict_path_for(seg))
    r = fsck_index(healthy_index, deep=True)
    assert any("sidecar missing" in e for e in r["errors"])
    os.remove(seg)
    r2 = fsck_index(healthy_index, deep=False)
    assert any("segment file missing" in e for e in r2["errors"])


def test_detects_tampered_manifest(healthy_index):
    layout = IndexLayout(healthy_index)
    m = layout.read_manifest()
    m["n_docs"] += 1
    layout.write_manifest(m)
    r = fsck_index(healthy_index, deep=False)
    assert not r["ok"]
    assert any("n_docs" in e for e in r["errors"])


def test_cli_fsck(healthy_index):
    import subprocess
    import sys

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "zensearch_ray", "fsck", "--index",
         healthy_index, "--fast"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["ok"] and rep["n_errors"] == 0
