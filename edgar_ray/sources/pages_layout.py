"""Class-partitioned layout for the Common-Crawl-style pages table.

The crawl is BFS by page class: wave 0 fetches only query pages, wave 1
only filing-index pages, wave 2 only report documents. A flat pages table
forces every wave to scan ALL rows and filter against the admitted set —
correct (the filter is a vectorized hash probe that never touches the html
bytes of misses) but at a 100 TB table the wave-0 fetch of a few thousand
seed URLs would still open every file. Partitioning the table ON DISK by
page class turns that scan into a partition prune: wave N reads only the
``page_class=N`` directory, so scan bytes are proportional to that class's
share of the corpus (~2% / ~18% / ~80% here) instead of 100% per wave.

This is the standard one-time layout job a production crawl runs over a
WARC-derived table before the first wave (classification is a pure function
of the url, so the job is a single streaming ``map_batches`` +
partitioned write — no shuffle). ``class_factory`` then plugs into
``crawl(pages_ds_factory=...)`` (edgar_ray/pipelines/crawl.py, the
``_call_pages_source`` wave hook).

Reference provenance: the class split mirrors the reference's three fetch
sites — query pages (/root/reference/page.go:13), filing-index pages
(/root/reference/folder.go:68-97), report documents
(/root/reference/parser.go:373-388); the URL shapes are the reference's own
(query: browse-edgar?action=getcompany; index: viewer?action=view; report:
/Archives/edgar/data/<cik>/<acc>/R<n>.htm).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# class ids: waves 0-2; 3 = out-of-band pages (robots.txt, anything a wave
# never fetches). Kept in the layout so the partitioned table remains a
# lossless re-layout of the input (row-count invariant is asserted).
CLASS_QUERY, CLASS_INDEX, CLASS_REPORT, CLASS_OTHER = 0, 1, 2, 3


def classify_url_batch(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized page-class classifier (pyarrow.compute substring kernels;
    no per-row Python)."""
    is_query = pc.match_substring(urls, "action=getcompany")
    is_index = pc.match_substring(urls, "action=view")
    is_report = pc.match_like(urls, "%/Archives/edgar/data/%/R%.htm")
    cls = np.full(len(urls), CLASS_OTHER, dtype=np.int32)
    cls[np.asarray(is_report.combine_chunks()
                   if isinstance(is_report, pa.ChunkedArray) else is_report)
        .astype(bool)] = CLASS_REPORT
    cls[np.asarray(is_index.combine_chunks()
                   if isinstance(is_index, pa.ChunkedArray) else is_index)
        .astype(bool)] = CLASS_INDEX
    cls[np.asarray(is_query.combine_chunks()
                   if isinstance(is_query, pa.ChunkedArray) else is_query)
        .astype(bool)] = CLASS_QUERY
    return pa.array(cls, pa.int32())


def partition_pages_by_class(pages_path: str, out_dir: str,
                             override_num_blocks: int | None = None) -> dict:
    """One-time layout job: pages.parquet -> out_dir/page_class=N/*.parquet.

    Streaming: read -> classify (map_batches, no shuffle) -> partitioned
    write. Returns {"rows": n, "classes": {class_id: rows}}. Idempotent via
    a _DONE marker (the layout is derived data; a partial dir from a killed
    run is rebuilt from scratch — the source table is the durable input).
    """
    import shutil

    import ray.data as rd

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        counts = {}
        for name in os.listdir(out_dir):
            if name.startswith("page_class="):
                counts[int(name.split("=")[1])] = None
        return {"rows": None, "classes": counts, "cached": True}
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def add_class(t: pa.Table) -> pa.Table:
        return t.append_column("page_class", classify_url_batch(t["url"]))

    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = rd.read_parquet(pages_path, **kwargs).map_batches(
        add_class, batch_format="pyarrow")
    ds.write_parquet(out_dir, partition_cols=["page_class"])
    import pyarrow.dataset as pads

    n = pads.dataset(out_dir, partitioning="hive").count_rows()
    with open(done, "w") as fh:
        fh.write(str(n))
    classes = {}
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("page_class="):
            cid = int(name.split("=")[1])
            classes[cid] = pads.dataset(
                os.path.join(out_dir, name)).count_rows()
    return {"rows": n, "classes": classes}


def class_factory(layout_dir: str, columns=("url", "html"),
                  materialize: bool = False):
    """A ``pages_ds_factory(wave)`` for ``crawl()``: wave N reads ONLY the
    ``page_class=N`` partition directory (prune at the read). Waves with no
    matching partition (nothing of that class in the corpus) get an empty
    Dataset of the right schema via the class-0 dir's schema.

    ``materialize=True`` additionally pins each class's blocks in the object
    store on first use (useful when a wave's partition is re-read — the
    crawl reads each wave's partition exactly once, so the default streams).
    """
    import ray.data as rd

    cache: dict[int, object] = {}

    def factory(wave: int):
        if wave in cache:
            return cache[wave]
        part = os.path.join(layout_dir, f"page_class={int(wave)}")
        if not os.path.isdir(part):
            # empty wave: schema from any existing partition
            for name in sorted(os.listdir(layout_dir)):
                if name.startswith("page_class="):
                    src = rd.read_parquet(
                        os.path.join(layout_dir, name), columns=list(columns))
                    ds = src.filter(lambda row: False)
                    cache[wave] = ds
                    return ds
            raise FileNotFoundError(f"no partitions under {layout_dir}")
        ds = rd.read_parquet(part, columns=list(columns))
        if materialize:
            ds = ds.materialize()
        cache[wave] = ds
        return ds

    return factory
