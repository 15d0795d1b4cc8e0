"""JSONL ingestion: a crawl dump read through sources/jsonl.py must
build an index identical to the same records read from parquet (both
via the Dataset-source path → hash64(url) doc ids)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.jsonl import read_pages_jsonl
from zensearch_ray.sources.pages import generate_pages_table


def _cfg():
    return BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    root = tmp_path_factory.mktemp("jsonl")
    t = generate_pages_table(200, seed=31).select(
        ["url", "warc_ts", "html", "text", "lang"]
    )
    jl = str(root / "crawl.jsonl")
    with open(jl, "w") as f:
        for row in t.to_pylist():
            row["extra_field"] = "dropped"  # heterogeneous crawl extras
            row["html"] = row["html"].decode("utf-8")
            row["warc_ts"] = row["warc_ts"].isoformat()
            f.write(json.dumps(row) + "\n")
    pqf = str(root / "crawl.parquet")
    pq.write_table(t, pqf, row_group_size=64)
    return jl, pqf


def test_jsonl_matches_parquet_build(ray_session, dump, tmp_path):
    import ray.data as rd

    jl, pqf = dump
    idx_j = str(tmp_path / "idx_jsonl")
    idx_p = str(tmp_path / "idx_parquet")
    m_j = build_index(read_pages_jsonl(jl), idx_j, _cfg())
    m_p = build_index(rd.read_parquet(pqf), idx_p, _cfg())

    assert m_j["n_docs"] == m_p["n_docs"] > 0
    assert m_j["total_postings"] == m_p["total_postings"]
    assert m_j["avgdl"] == m_p["avgdl"]
    e_j, e_p = QueryEngine(idx_j), QueryEngine(idx_p)
    for q in ["search engine ranking", "the of and"]:
        assert e_j.topk(q, 10) == e_p.topk(q, 10), q


def test_gzipped_jsonl_resolves_and_matches(ray_session, dump, tmp_path):
    """A .jsonl.gz crawl dump goes through resolve_pages_source and
    builds the same index as the plain dump (Arrow decompresses by
    extension)."""
    import gzip
    import shutil

    from zensearch_ray.sources import resolve_pages_source

    jl, _ = dump
    gz = str(tmp_path / "crawl.jsonl.gz")
    with open(jl, "rb") as f_in, gzip.open(gz, "wb") as f_out:
        shutil.copyfileobj(f_in, f_out)
    idx_g = str(tmp_path / "idx_gz")
    idx_j = str(tmp_path / "idx_plain")
    m_g = build_index(resolve_pages_source(gz), idx_g, _cfg())
    m_j = build_index(resolve_pages_source(jl), idx_j, _cfg())
    assert m_g["n_docs"] == m_j["n_docs"] > 0
    assert m_g["total_postings"] == m_j["total_postings"]
    e_g, e_j = QueryEngine(idx_g), QueryEngine(idx_j)
    assert e_g.topk("search engine ranking", 10) == e_j.topk(
        "search engine ranking", 10
    )


def test_coerce_fills_missing_columns(ray_session):
    from zensearch_ray.sources.jsonl import coerce_pages_batch

    batch = pa.table({"url": ["http://a"], "text": ["hello"], "junk": [1]})
    out = coerce_pages_batch(batch)
    assert out.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert out["warc_ts"].null_count == 1
    assert "junk" not in out.column_names


@pytest.fixture(scope="module")
def csv_dump(tmp_path_factory):
    import csv

    root = tmp_path_factory.mktemp("csv_src")
    t = generate_pages_table(150, seed=33).select(
        ["url", "warc_ts", "html", "text", "lang"]
    )
    cf = str(root / "crawl.csv")
    with open(cf, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["url", "warc_ts", "html", "text", "lang", "extra"])
        for row in t.to_pylist():
            w.writerow([
                row["url"], row["warc_ts"].isoformat(),
                row["html"].decode("utf-8"), row["text"], row["lang"],
                "dropped",
            ])
    pqf = str(root / "crawl.parquet")
    pq.write_table(t, pqf, row_group_size=64)
    return cf, pqf


def test_csv_matches_parquet_build(ray_session, csv_dump, tmp_path):
    import ray.data as rd

    from zensearch_ray.sources import resolve_pages_source

    cf, pqf = csv_dump
    idx_c = str(tmp_path / "idx_csv")
    idx_p = str(tmp_path / "idx_parquet")
    m_c = build_index(resolve_pages_source(cf), idx_c, _cfg())
    m_p = build_index(rd.read_parquet(pqf), idx_p, _cfg())

    assert m_c["n_docs"] == m_p["n_docs"] > 0
    assert m_c["total_postings"] == m_p["total_postings"]
    assert m_c["avgdl"] == m_p["avgdl"]
    qc = QueryEngine(idx_c).topk("spark window merge", k=10)
    qp = QueryEngine(idx_p).topk("spark window merge", k=10)
    assert qc == qp


def test_csv_coercion_schema(ray_session, csv_dump):
    from zensearch_ray.sources.jsonl import PAGES_SCHEMA, read_pages_csv

    cf, _ = csv_dump
    got = read_pages_csv(cf).take_batch(5, batch_format="pyarrow")
    assert set(got.column_names) == set(PAGES_SCHEMA)
    for name, typ in PAGES_SCHEMA.items():
        assert got.schema.field(name).type == typ, name
    assert isinstance(got["html"][0].as_py(), bytes)
