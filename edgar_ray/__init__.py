"""edgar_ray — a Ray-Data-native crawl + extract + query engine.

A brand-new engine (NOT a port) with the data-processing capabilities of the
reference Go library `palafrank/edgar` (see /root/reference), re-expressed
Ray-Data-first:

- ``pages`` Parquet tables (url, warc_ts, html, text, lang) are the source
  (Common-Crawl-style; the html column stands in for live HTTP fetch).
- Stateless parsing/extraction runs as ``map_batches`` over zero-copy Arrow.
- The URL frontier (seen-set cuckoo filter, per-host politeness, priority
  queue, BFS ordering) is a sharded actor pool.
- Per-filing merge is a ``groupby("accession").map_groups`` shuffle.
- Checkpoint/resume is partitioned Parquet with per-partition lineage.

Subpackages:
  functions/  pure parse + text/scalar functions (tokenizer-faithful to the
              reference's golang.org/x/net/html walk; golden-tested)
  sources/    pages readers + deterministic synthetic corpus generator
  stages/     map_batches stage UDFs (classify, parse, extract, merge)
  state/      frontier actors, cuckoo filter, canonicalization, checkpoint
  pipelines/  end-to-end pipelines (crawl, extract, dedup, similarity, text,
              relational, multimodal)
"""

__version__ = "0.1.0"
