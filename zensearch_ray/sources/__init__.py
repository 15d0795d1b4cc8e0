"""Source resolution shared by the CLI (`build`/`prep`) and the watch
loop: one suffix-sniffing entry point so every ingestion surface
accepts parquet, JSONL crawl dumps, and WARC crawl archives
uniformly."""

from __future__ import annotations


def resolve_pages_source(path):
    """Path (or list/Dataset, passed through) → a pages-schema source
    ``build_index``/``prep_pipeline`` can consume. WARC archives get
    HTML→text extraction applied here (their ``text`` column is null
    by construction); parquet paths pass through untouched so the
    dense-row-offset id fast path keeps applying."""
    if not isinstance(path, str):
        return path
    if path.endswith((".warc", ".warc.gz")):
        import pyarrow as pa

        from zensearch_ray.sources.warc import read_warc_pages
        from zensearch_ray.stages.extract import extract_batch
        from zensearch_ray.stages.textstats import LangIdStage

        def extract_and_langid(batch: pa.Table) -> pa.Table:
            # a crawl archive carries neither text nor lang: extract
            # html→text, then fill `lang` with the repo's deterministic
            # language-ID so the default lang="en" build filter keeps
            # working on WARC input instead of silently dropping rows
            t = extract_batch(batch)
            langs = pa.array(
                [LangIdStage._classify(x) for x in t["text"].to_pylist()],
                type=pa.string(),
            )
            return t.set_column(t.column_names.index("lang"), "lang", langs)

        return read_warc_pages(path).map_batches(
            extract_and_langid, batch_format="pyarrow", zero_copy_batch=True)
    if path.endswith((".csv", ".csv.gz")):
        from zensearch_ray.sources.jsonl import read_pages_csv

        return read_pages_csv(path)
    if path.endswith((".jsonl", ".jsonl.gz")):
        # Arrow's JSON reader decompresses gzip transparently by
        # extension, so compressed crawl dumps take the same path
        from zensearch_ray.sources.jsonl import read_pages_jsonl

        return read_pages_jsonl(path)
    return path
