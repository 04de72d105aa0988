"""Resumable partitioned sink: Hive layout, _DONE markers, resume skips
finished partitions and completes only the missing ones."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from edgar_ray.stages.sink import finished_partitions, write_partitioned


def _ds():
    return rd.from_arrow(pa.table({
        "ticker": pa.array(["A", "A", "B", "B", "C"]),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    }))


def test_write_and_resume(tmp_path, ray_session):
    out = str(tmp_path / "facts")
    r1 = write_partitioned(_ds(), out, "ticker")
    assert r1["written_partitions"] == ["A", "B", "C"]
    assert finished_partitions(out, "ticker") == {"A", "B", "C"}

    # simulate a partial failure: one partition lost
    shutil.rmtree(os.path.join(out, "ticker=B"))
    assert finished_partitions(out, "ticker") == {"A", "C"}

    r2 = write_partitioned(_ds(), out, "ticker")
    assert r2["written_partitions"] == ["B"]
    assert r2["skipped_partitions"] == ["A", "C"]

    got = pq.read_table(out).to_pandas().sort_values("v")
    assert got["v"].tolist() == [1, 2, 3, 4, 5]


def test_resume_after_partial_write_no_duplicates(tmp_path, ray_session):
    """A partition dir WITH parquet files but WITHOUT _DONE (crash mid-write)
    must be cleaned and rewritten, not appended to."""
    out = str(tmp_path / "facts")
    write_partitioned(_ds(), out, "ticker")

    # simulate a crash mid-write of partition B: files exist, marker doesn't
    os.remove(os.path.join(out, "ticker=B", "_DONE"))
    assert finished_partitions(out, "ticker") == {"A", "C"}

    r2 = write_partitioned(_ds(), out, "ticker")
    assert r2["written_partitions"] == ["B"]

    got = pq.read_table(out).to_pandas().sort_values("v")
    assert got["v"].tolist() == [1, 2, 3, 4, 5]  # no duplicated B rows
