"""Resumable partitioned-Parquet sink (S7/S8, /root/reference/folder.go:152-159
+ fetcher.go:35-60, re-expressed for object storage).

Output layout: one Hive-style directory per partition key value
(``out_dir/<col>=<value>/``) so (a) a failed run resumes by SKIPPING finished
partitions — the anti-join of the reference's CreateFolder resume path — and
(b) downstream reads prune by partition. Never one giant file.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray


def finished_partitions(out_dir: str, partition_col: str) -> set[str]:
    """Partition values with a completed marker file."""
    done: set[str] = set()
    if not os.path.isdir(out_dir):
        return done
    prefix = f"{partition_col}="
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and os.path.exists(
            os.path.join(out_dir, name, "_DONE")
        ):
            done.add(name[len(prefix):])
    return done


def write_partitioned(ds, out_dir: str, partition_col: str,
                      resume: bool = True) -> dict:
    """Write ``ds`` partitioned by ``partition_col``; with ``resume`` skip
    rows whose partition already has a ``_DONE`` marker (the anti-join
    against completed work). Returns {written_partitions, skipped_partitions}.

    The skip is a vectorized filter against a broadcast frozen key set —
    rows stream, nothing materializes on the driver.

    Partition dirs WITHOUT a ``_DONE`` marker are partial output from a
    crashed previous run: their files are deleted before rewriting, so the
    partition's rows are never duplicated (write_parquet appends new uuid
    files; it does not truncate).

    ``resume=False`` is EXPLICITLY "overwrite all": every existing
    ``<partition_col>=...`` directory under ``out_dir`` (done or not) is
    deleted before the write — truncate-then-load semantics for callers that
    want a from-scratch rebuild. Callers that share an output directory
    across runs must keep the ``resume=True`` default."""
    import shutil

    done = finished_partitions(out_dir, partition_col) if resume else set()
    prefix_ = f"{partition_col}="
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            part_dir = os.path.join(out_dir, name)
            if (name.startswith(prefix_) and os.path.isdir(part_dir)
                    and name[len(prefix_):] not in done):
                shutil.rmtree(part_dir)
    done_ref = ray.put(sorted(done))

    def drop_done(t: pa.Table) -> pa.Table:
        import numpy as np

        dl = ray.get(done_ref) if isinstance(done_ref, ray.ObjectRef) else done_ref
        if not dl:
            return t
        keys = np.asarray([str(v) for v in t[partition_col].to_pylist()],
                          dtype=object)
        mask = ~np.isin(keys, np.asarray(dl, dtype=object))
        return t.filter(pa.array(mask))

    remaining = ds.map_batches(drop_done, batch_format="pyarrow")
    remaining.write_parquet(out_dir, partition_cols=[partition_col])

    written: set[str] = set()
    prefix = f"{partition_col}="
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            part_dir = os.path.join(out_dir, name)
            if not name.startswith(prefix) or not os.path.isdir(part_dir):
                continue
            val = name[len(prefix):]
            if val in done:
                continue
            with open(os.path.join(part_dir, "_DONE"), "w") as f:
                f.write("")
            written.add(val)
    return {"written_partitions": sorted(written),
            "skipped_partitions": sorted(done)}
