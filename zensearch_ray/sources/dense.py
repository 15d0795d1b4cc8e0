"""Parquet reader that assigns DENSE row-offset doc_ids.

``doc_id = (cumulative row count of all preceding files/row-groups)
+ (row position within the row group)`` — computed purely from parquet
FOOTER metadata, so id assignment needs no shuffle, no global counter
actor, and no data pass: it is a metadata-only planning step on the
driver (parallelized over files with plain Ray tasks when the file list
is large, so a 100 TB / 100k-file corpus plans in seconds).

Why dense ids: the inverted-index codec delta-encodes doc_ids within a
posting list. With ``hash64(url)`` ids the gaps are uniform 63-bit
values (~9 varint bytes each); with dense ids the average gap for a
term of df = N/f is ~f (1-3 varint bytes) — measured ~4x smaller
postings and proportionally less encode CPU (SURVEY.md §7, the round-2
optimization). Ids are deterministic for a fixed file list (sorted by
path), so resumed builds reproduce identical ids.

Replaces the reference's ``id CHAR(60)`` uuid per page
(``database/db.init.sql:6-13``) the same way ``url_doc_id`` did, but
with ids that compress.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# fan footer reads out to Ray tasks above this many files
_PARALLEL_FOOTER_THRESHOLD = 64


def resolve_parquet_files(paths) -> list[str]:
    """str file / str dir / list of either → sorted flat file list.

    Sorting by path is the id-stability contract: the same file set
    always yields the same doc_ids regardless of listing order.
    """
    import os

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, n)
                for n in os.listdir(p)
                if n.endswith(".parquet")
            )
        else:
            files.append(p)
    return sorted(files)


def _footer_rowgroup_rows(path: str) -> list[int]:
    md = pq.ParquetFile(path).metadata
    return [md.row_group(i).num_rows for i in range(md.num_row_groups)]


def plan_fragments(paths) -> list[dict]:
    """One fragment per row group: {path, row_group, offset, num_rows}.

    Offsets are cumulative over the sorted file list. Footer reads fan
    out to Ray tasks for large file lists (metadata-only; each task
    reads a few KB of footer, not data).
    """
    files = resolve_parquet_files(paths)
    if len(files) > _PARALLEL_FOOTER_THRESHOLD:
        import ray

        footer = ray.remote(num_cpus=0.25)(_footer_rowgroup_rows)
        per_file = ray.get([footer.remote(f) for f in files])
    else:
        per_file = [_footer_rowgroup_rows(f) for f in files]

    frags: list[dict] = []
    offset = 0
    for path, rg_rows in zip(files, per_file):
        for rg, n in enumerate(rg_rows):
            frags.append(
                {"path": path, "row_group": rg, "offset": offset, "num_rows": n}
            )
            offset += n
    return frags


from ray.data.datasource import Datasource


class DenseParquetDatasource(Datasource):
    """Ray Datasource: one ReadTask per row-group fragment, each
    appending the dense id column. A real read operator (not a
    ``from_items`` + ``map_batches`` chain) so task granularity comes
    from the fragment plan — fused downstream transforms inherit one
    fragment per task instead of being input-bundled into one giant
    batch by their own ``batch_size``."""

    def __init__(self, frags: list[dict], columns: list[str], id_name: str):
        self.frags = frags
        self.columns = columns
        self.id_name = id_name

    def get_name(self) -> str:
        return "DenseParquet"

    def estimate_inmemory_data_size(self):
        return None

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        columns, id_name = self.columns, self.id_name

        def make_read(frag: dict):
            def read():
                t = pq.ParquetFile(frag["path"]).read_row_group(
                    frag["row_group"], columns=columns
                )
                ids = pa.array(
                    frag["offset"] + np.arange(t.num_rows, dtype=np.int64)
                )
                return [t.append_column(id_name, ids)]

            return read

        return [
            ReadTask(
                make_read(frag),
                BlockMetadata(
                    num_rows=frag["num_rows"],
                    size_bytes=None,
                    exec_stats=None,
                    input_files=[frag["path"]],
                ),
            )
            for frag in self.frags
        ]


def planned_rows(frags: list[dict]) -> int:
    """Total rows a fragment plan covers (id ceiling of the read)."""
    return frags[-1]["offset"] + frags[-1]["num_rows"] if frags else 0


def read_parquet_dense(paths, columns: list[str], id_name: str = "doc_id",
                       base_offset: int = 0, frags: list[dict] | None = None):
    """Dataset over the parquet files with an appended dense ``id_name``
    int64 column (``base_offset`` + file/row-group offset + row
    position; a non-zero base is how index APPENDS keep new ids above
    every existing id). One read task per row group (the write side
    already targets bounded row groups, so a fragment is a bounded unit
    of work and memory at any corpus size)."""
    import ray.data as rd

    if frags is None:
        frags = plan_fragments(paths)
    if base_offset:
        frags = [{**f, "offset": f["offset"] + base_offset} for f in frags]
    if not frags:
        schema = pa.schema(
            [pa.field(c, pa.string()) for c in columns]
            + [pa.field(id_name, pa.int64())]
        )
        return rd.from_arrow(schema.empty_table())

    src = DenseParquetDatasource(frags, columns, id_name)
    return rd.read_datasource(src, override_num_blocks=len(frags))


def read_parquet_dense_with_ceiling(paths, columns, id_name="doc_id", base_offset=0):
    """(Dataset, id ceiling) — ceiling = base_offset + planned rows,
    i.e. the first id a FUTURE append may use."""
    frags = plan_fragments(paths)
    ds = read_parquet_dense(paths, columns, id_name, base_offset, frags)
    return ds, base_offset + planned_rows(frags)
