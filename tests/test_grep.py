"""Distributed content grep / regex extraction vs a Python-re referee.

RE2 (Arrow + DuckDB) and Python ``re`` agree on these alternation
patterns, so the stdlib referee is valid here; the DuckDB oracle in
``test_oracle_parity.py`` pins the RE2-to-RE2 identity."""

import re

import pyarrow.parquet as pq

from zensearch_ray.pipelines.corpus import extract_pattern, grep_docs

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_grep_docs_referee(ray_session):
    pat = r"hash (join|scan)"
    want = [
        (did, len(re.findall(pat, text)))
        for did, text in _docs()
        if re.search(pat, text)
    ]
    got = grep_docs(SF, pat)
    assert list(zip(got["doc_id"], got["n_matches"])) == want


def test_grep_docs_no_match_is_empty_with_schema(ray_session):
    got = grep_docs(SF, r"zzz_nosuchtoken_zzz")
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "n_matches"]


def test_extract_pattern_referee(ray_session):
    pat = r"(?P<verb>merge|sort) (?P<obj>join|scan|table)"
    want = []
    for did, text in _docs():
        m = re.search(pat, text)
        if m:
            want.append((did, m.group("verb"), m.group("obj")))
    got = extract_pattern(SF, pat)
    assert list(zip(got["doc_id"], got["verb"], got["obj"])) == want


def test_extract_pattern_no_match_is_empty_with_schema(ray_session):
    got = extract_pattern(SF, r"(?P<x>zzz_nosuchtoken_zzz)")
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "x"]
