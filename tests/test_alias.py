"""Index aliases: atomic cutover of warm serving to a new index —
the operational half of ``reindex`` (build behind the alias, swap,
traffic moves; swap back to roll back)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.alias import (
    resolve_alias,
    resolve_if_alias,
    set_alias,
)
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.pipelines.reindex import reindex_analyzer
from zensearch_ray.pipelines.service import _EngineReplica
from zensearch_ray.sources.pages import generate_pages_table


def _cfg(**kw):
    base = dict(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    base.update(kw)
    return BuildConfig(**base)


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("alias")
    corpus = str(root / "pages.parquet")
    pq.write_table(generate_pages_table(200, seed=5), corpus,
                   row_group_size=64)
    a = str(root / "idx_plain")
    build_index(corpus, a, _cfg())
    b = str(root / "idx_stem")
    reindex_analyzer(a, b, _cfg(stem=True))
    return a, b


def test_alias_roundtrip_and_guards(two_indexes, tmp_path):
    a, _ = two_indexes
    alias = str(tmp_path / "current.alias")
    set_alias(alias, a)
    assert resolve_alias(alias) == os.path.realpath(a)
    assert resolve_if_alias(alias) == os.path.realpath(a)
    assert resolve_if_alias(a) == a  # a real index passes through
    with pytest.raises(ValueError, match="not a committed index"):
        set_alias(alias, str(tmp_path / "nonexistent"))
    # the failed set must NOT have clobbered the alias
    assert resolve_alias(alias) == os.path.realpath(a)


def test_warm_replica_cutover(two_indexes, tmp_path):
    """A warm replica serving through an alias follows an atomic swap
    on its reload tick — no restart, and answers flip exactly to the
    new index's (here: the stem-reindexed twin's)."""
    a, b = two_indexes
    alias = str(tmp_path / "current.alias")
    set_alias(alias, a)
    rep = _EngineReplica(alias, reload_secs=0.0)  # check every call
    q = "search engines ranking"  # plural: stem index answers differ
    want_a = QueryEngine(a).topk(q, 10)
    want_b = QueryEngine(b).topk(q, 10)
    assert rep.search(q, 10, "exhaustive", False) == want_a
    set_alias(alias, b)  # the cutover
    assert rep.search(q, 10, "exhaustive", False) == want_b
    set_alias(alias, a)  # rollback is the same operation
    assert rep.search(q, 10, "exhaustive", False) == want_a


def test_alias_cli(two_indexes, tmp_path):
    a, _ = two_indexes
    alias = str(tmp_path / "cli.alias")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-m", "zensearch_ray", "alias",
         "--path", alias, "--set", a],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "zensearch_ray", "alias", "--path", alias],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert json.loads(r.stdout)["index_dir"] == os.path.realpath(a)
    # query THROUGH the alias
    r = subprocess.run(
        [sys.executable, "-m", "zensearch_ray", "query",
         "--index", alias, "search engine"],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr
    assert len(json.loads(r.stdout.splitlines()[-1])["results"]) > 0
