"""End-to-end prep pipeline: filtering/dedup/chunk semantics vs a
pure-Python referee over the fixture pages; crash-resume convergence."""

import glob
import os

import duckdb
import pytest

from zensearch_ray.functions.ids import url_doc_id
from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.prep import prep_corpus
from zensearch_ray.stages.textstats import STOPWORDS


def _referee_chunks(pages_path, lang, min_tokens, max_stop_ratio, chunk_tokens):
    import pyarrow.parquet as pq

    t = pq.read_table(pages_path, columns=["url", "warc_ts", "text", "lang"])
    rows = sorted(
        zip(
            t["url"].to_pylist(),
            t["warc_ts"].to_pylist(),
            t["text"].to_pylist(),
            t["lang"].to_pylist(),
        ),
        key=lambda r: (r[0], r[1]),
    )
    seen = set()
    out = []
    for url, _, text, lg in rows:
        if lg != lang or url in seen:
            if lg == lang:
                seen.add(url)
            continue
        seen.add(url)
        toks = tokenize(text)
        if len(toks) < min_tokens:
            continue
        stop = sum(1 for x in toks if x in STOPWORDS) / len(toks)
        if round(stop, 6) > max_stop_ratio:
            continue
        did = url_doc_id(url)
        for ci in range(0, (len(toks) + chunk_tokens - 1) // chunk_tokens):
            part = toks[ci * chunk_tokens : (ci + 1) * chunk_tokens]
            out.append((did, url, ci, " ".join(part), len(part)))
    return sorted(out)


def test_prep_matches_referee(ray_session, pages_small, tmp_path):
    out_dir = str(tmp_path / "prep_out")
    stats = prep_corpus(
        pages_small, out_dir,
        lang="en", min_tokens=40, max_stop_ratio=0.5,
        chunk_tokens=64, n_partitions=16,
    )
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    got = duckdb.sql(
        f"SELECT doc_id, url, chunk_id, chunk_text, n_tokens "
        f"FROM read_parquet({files!r}) ORDER BY doc_id, url, chunk_id"
    ).fetchall()
    want = _referee_chunks(pages_small, "en", 40, 0.5, 64)
    assert sorted(got) == want
    assert stats["rows"] == len(want)
    assert stats["written"] > 0 and stats["skipped"] == 0


def test_prep_resume_converges(ray_session, pages_small, tmp_path):
    out_dir = str(tmp_path / "prep_resume")
    prep_corpus(pages_small, out_dir, chunk_tokens=64, n_partitions=16)
    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    full = duckdb.sql(
        f"SELECT * FROM read_parquet({files!r}) ORDER BY doc_id, chunk_id"
    ).df()
    # simulate a crash: remove some committed partitions + markers
    from zensearch_ray.state.sink import completed_partitions

    done = sorted(completed_partitions(out_dir))
    victims = done[::3]
    for pno in victims:
        os.remove(os.path.join(out_dir, f"part-{pno:05d}.parquet"))
        os.remove(os.path.join(out_dir, "_partitions", f"part-{pno:05d}.json"))
    stats = prep_corpus(pages_small, out_dir, chunk_tokens=64, n_partitions=16)
    after = duckdb.sql(
        f"SELECT * FROM read_parquet({sorted(glob.glob(os.path.join(out_dir, 'part-*.parquet')))!r}) "
        f"ORDER BY doc_id, chunk_id"
    ).df()
    assert after.equals(full)
    assert stats["written"] == len(victims)
    assert stats["skipped"] == len(done) - len(victims)


def test_canonical_dedup_collapses_mirrors(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    text = " ".join(f"tok{i % 97} filler word content" for i in range(60))
    rows = [
        # three mirrors of one page (earliest ts must survive) ...
        ("https://Site.COM/page/?utm_source=ad#x", 100, text, "en"),
        ("https://site.com/page", 50, text + " earliest", "en"),
        ("https://site.com:443/page/", 200, text, "en"),
        # ... and one genuinely different page
        ("https://site.com/other", 10, text, "en"),
    ]
    src = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
                "text": pa.array([r[2] for r in rows]),
                "lang": pa.array([r[3] for r in rows]),
            }
        ),
        src,
    )
    out = str(tmp_path / "prep_canon")
    stats = prep_corpus(src, out, lang="en", min_tokens=10,
                        chunk_tokens=512, n_partitions=4,
                        canonical_dedup=True)
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    got = duckdb.sql(
        f"SELECT url, chunk_text FROM read_parquet({files!r}) ORDER BY url"
    ).df()
    # mirrors collapsed to ONE survivor: the earliest (ts=50, bare url)
    assert list(got["url"]) == ["https://site.com/other", "https://site.com/page"]
    assert got["chunk_text"][1].endswith("earliest")


def test_gopher_and_repetition_gates(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # good: 40 distinct words incl. stopwords, no repetition
    good = "the of and to in " + " ".join(f"word{i:02d}x" for i in range(35))
    # repetitive: PASSES every Gopher rule (each word occurs at most
    # twice in 72 tokens, 2 stopwords, mwl in range) but a 20-token
    # run repeated twice makes dup5 coverage 200/415 > 0.15
    run = " ".join(f"rtk{i:02d}" for i in range(20))
    rep = ("the of "
           + " ".join(f"word{i:02d}x" for i in range(30))
           + f" {run} {run}")
    # gopher-fail: no stopwords at all (repetition rules don't fire)
    nostop = " ".join(f"zq{i:02d}xy" for i in range(40))
    rows = [
        ("https://a.example/good", 1, good, "en"),
        ("https://a.example/rep", 2, rep, "en"),
        ("https://a.example/nostop", 3, nostop, "en"),
    ]
    src = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
                "text": pa.array([r[2] for r in rows]),
                "lang": pa.array([r[3] for r in rows]),
            }
        ),
        src,
    )

    def urls_of(out):
        files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
        if not files:
            return []
        return sorted(
            duckdb.sql(
                f"SELECT DISTINCT url FROM read_parquet({files!r})"
            ).df()["url"]
        )

    base = str(tmp_path / "base")
    prep_corpus(src, base, lang="en", min_tokens=10, max_stop_ratio=0.9,
                chunk_tokens=512, n_partitions=2)
    assert urls_of(base) == sorted(r[0] for r in rows)  # no gates: all pass

    g = str(tmp_path / "gopher")
    prep_corpus(src, g, lang="en", min_tokens=10, max_stop_ratio=0.9,
                chunk_tokens=512, n_partitions=2, gopher=True)
    assert urls_of(g) == ["https://a.example/good", "https://a.example/rep"]

    r = str(tmp_path / "rep")
    prep_corpus(src, r, lang="en", min_tokens=10, max_stop_ratio=0.9,
                chunk_tokens=512, n_partitions=2, repetition=True)
    assert urls_of(r) == ["https://a.example/good", "https://a.example/nostop"]

    both = str(tmp_path / "both")
    prep_corpus(src, both, lang="en", min_tokens=10, max_stop_ratio=0.9,
                chunk_tokens=512, n_partitions=2, gopher=True,
                repetition=True)
    assert urls_of(both) == ["https://a.example/good"]


def test_exact_substr_stage_cuts_cross_doc_passage(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    passage = " ".join(f"boiler{i:02d}" for i in range(12))
    a = " ".join(f"aw{i:02d}" for i in range(20)) + " " + passage
    b = " ".join(f"bw{i:02d}" for i in range(20)) + " " + passage
    src = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(
                    ["https://x.example/a", "https://x.example/b"]
                ),
                "warc_ts": pa.array([1, 2], pa.int64()),
                "text": pa.array([a, b]),
                "lang": pa.array(["en", "en"]),
            }
        ),
        src,
    )
    out = str(tmp_path / "es")
    prep_corpus(src, out, lang="en", min_tokens=10, max_stop_ratio=0.9,
                chunk_tokens=512, n_partitions=2, exact_substr=10)
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    df = duckdb.sql(
        f"SELECT url, chunk_text FROM read_parquet({files!r})"
    ).df()
    texts = dict(zip(df["url"], df["chunk_text"]))
    # exactly one of the two docs keeps the passage (global first by
    # doc_id = hash64(url), which varies) — the other is cut to its
    # own 20 tokens
    kept = [u for u, t in texts.items() if passage in t]
    assert len(kept) == 1
    cut = ({"https://x.example/a", "https://x.example/b"} - set(kept)).pop()
    assert passage not in texts[cut]
    assert len(texts[cut].split()) == 20
