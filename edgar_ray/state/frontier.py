"""Frontier actor pool: sharded URL-seen set + per-host politeness + priority
order (north rule; generalizes the reference's FilingLinks map,
/root/reference/folder.go:17,145-149).

Shards are ``@ray.remote`` actors — the one place the Dataset API genuinely
can't express the semantics (a shared mutable index with admission ordering).
Routing: ``shard = hash(host) % num_shards`` so exactly one actor owns a
host's politeness budget (hash-partitioning on host per the north rule); fetch
parallelism within a hot host is recovered downstream by salting the fetch
partition key with sha1(url) — admission stays host-global here.

Each shard holds:
- a :class:`CuckooFilter` seen-set shard (checkpointable to bytes),
- per-host token buckets (``host_budget`` req/sec on a simulated clock —
  admitted URLs get monotone ``scheduled_at`` offsets; ``politeness_deferred``
  counts admissions pushed past their wave-arrival instant),
- per-wave admission counters (urls_in / admitted / dedup_hits) — the
  per-partition lineage that checkpoints to Parquet.

BFS order: the pipeline admits wave-by-wave; within a wave the crawl order is
the deterministic priority ``(seed_rank, filing_type, filed_date desc,
report_num, url)`` (SURVEY.md §2.6 O4) — Go map iteration is random, so the
reference's *visit set* is what's byte-matched, under this total order.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .canonical import canonicalize
from .cuckoo import CuckooFilter, hash_urls

PRIORITY_COLS = ("seed_rank", "filing_type", "filed_date", "report_num", "url")


def shard_of(host: str, num_shards: int) -> int:
    return zlib.crc32(host.encode()) % num_shards


def _priority_sort(tbl: pa.Table) -> pa.Table:
    """Deterministic within-wave order: filed_date DESCENDING (newest first,
    like AvailableFilings /root/reference/folder.go:128-131), all else asc."""
    return tbl.sort_by(
        [
            ("seed_rank", "ascending"),
            ("filing_type", "ascending"),
            ("filed_date", "descending"),
            ("report_num", "ascending"),
            ("url", "ascending"),
        ]
    )


@ray.remote
class FrontierShard:
    """One frontier shard: seen-set + politeness for the hosts it owns."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16,
                 host_budget: float = 100.0):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.host_budget = float(host_budget)
        self.host_next_slot: dict[str, float] = {}  # host -> next free time offset
        self.lineage: list[dict] = []

    def admit(self, tbl: pa.Table, wave: int) -> pa.Table:
        """Dedup + politeness-schedule one wave's candidate URLs routed to
        this shard. Returns the admitted rows (priority-sorted) with
        ``url_sha1`` and ``scheduled_at`` columns appended."""
        # sort BEFORE dedup so when one URL arrives under two priority keys
        # (e.g. a duplicate query-page listing with an older date) the
        # highest-priority copy deterministically survives
        tbl = _priority_sort(tbl)
        urls = [canonicalize(u) for u in tbl["url"].to_pylist()]
        fresh = self.filter.add_many(hash_urls(urls)) if urls else np.zeros(0, bool)
        admitted = tbl.filter(pa.array(fresh)) if len(fresh) else tbl

        # politeness: one token per 1/budget seconds per host on a simulated
        # clock carried across waves; admissions are never allowed to exceed
        # the budget (violations = 0 by construction), `deferred` counts URLs
        # this wave pushed >= 1s past the host's wave-start slot.
        # Vectorized per host: slots are start + step*arange (the admitted
        # table is priority-sorted, so per-host arrival order is the sorted
        # order).
        hosts = np.asarray(admitted["host"].to_pylist(), dtype=object)
        sched = np.empty(len(hosts), dtype=np.float64)
        deferred = 0
        step = 1.0 / self.host_budget
        for h in np.unique(hosts) if len(hosts) else []:
            idx = np.nonzero(hosts == h)[0]
            start = self.host_next_slot.get(h, 0.0)
            slots = start + step * np.arange(len(idx))
            sched[idx] = slots
            deferred += int((slots - start >= 1.0).sum())
            self.host_next_slot[h] = float(start + step * len(idx))

        import hashlib
        sha = pa.array([hashlib.sha1(u.encode()).digest()
                        for u in admitted["url"].to_pylist()], pa.binary())
        admitted = admitted.append_column("url_sha1", sha)
        admitted = admitted.append_column("scheduled_at", pa.array(sched, pa.float64()))

        self.lineage.append(
            {
                "shard": self.shard_id,
                "wave": wave,
                "urls_in": tbl.num_rows,
                "admitted": admitted.num_rows,
                "dedup_hits": tbl.num_rows - admitted.num_rows,
                "politeness_violations": 0,  # enforced by construction
                "politeness_deferred": deferred,
            }
        )
        return admitted

    def lineage_rows(self) -> list[dict]:
        return self.lineage

    def checkpoint(self) -> tuple[bytes, dict]:
        state = {
            "shard_id": self.shard_id,
            "host_next_slot": self.host_next_slot,
            "host_budget": self.host_budget,
            "lineage": self.lineage,
        }
        return self.filter.to_bytes(), state

    def restore(self, blob: bytes, state: dict) -> None:
        self.filter = CuckooFilter.from_bytes(blob)
        self.host_next_slot = dict(state["host_next_slot"])
        self.host_budget = float(state["host_budget"])
        self.lineage = list(state["lineage"])


class Frontier:
    """Driver-side handle over the shard pool.

    A wave's candidate table is routed to shards by host hash; each shard
    dedups/schedules its slice; the driver k-way-merges the per-shard results
    back into the global priority order and assigns the global ``seq``. Only
    frontier METADATA (urls + keys, no page bytes) crosses the driver — at
    10^10 scale this merge becomes the standard bucket prefix-sum (count per
    priority bucket, exclusive-scan offsets, per-bucket local sort), which the
    shard-local sorted slices here are step one of.
    """

    def __init__(self, num_shards: int = 4, capacity: int = 1 << 16,
                 host_budget: float = 100.0):
        self.num_shards = num_shards
        self.shards = [
            FrontierShard.remote(i, max(1024, capacity // num_shards), host_budget)
            for i in range(num_shards)
        ]
        self.next_seq = 0

    def admit_wave(self, tbl: pa.Table, wave: int) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        shard_ids = pa.array(
            [shard_of(h, self.num_shards) for h in tbl["host"].to_pylist()],
            pa.int32(),
        )
        tbl2 = tbl.append_column("_shard", shard_ids)
        futs = []
        for s in range(self.num_shards):
            part = tbl2.filter(pa.compute.equal(tbl2["_shard"], s)).drop_columns(["_shard"])
            if part.num_rows:
                futs.append(self.shards[s].admit.remote(part, wave))
        parts = ray.get(futs)
        merged = _priority_sort(pa.concat_tables([p for p in parts if p.num_rows]))
        seq = pa.array(
            np.arange(self.next_seq, self.next_seq + merged.num_rows, dtype=np.int64)
        )
        self.next_seq += merged.num_rows
        merged = merged.append_column("seq", seq)
        wave_col = pa.array(np.full(merged.num_rows, wave, dtype=np.int32))
        return merged.append_column("wave", wave_col)

    def lineage_table(self) -> pa.Table:
        rows: list[dict] = []
        for part in ray.get([s.lineage_rows.remote() for s in self.shards]):
            rows.extend(part)
        if not rows:
            return pa.table({"shard": pa.array([], pa.int32())})
        return pa.Table.from_pylist(rows)

    # -- checkpoint / resume ---------------------------------------------------

    def checkpoint(self, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        blobs_states = ray.get([s.checkpoint.remote() for s in self.shards])
        blobs = pa.array([b for b, _ in blobs_states], pa.binary())
        states = pa.array([json.dumps(st) for _, st in blobs_states], pa.string())
        ids = pa.array(list(range(self.num_shards)), pa.int32())
        pq.write_table(
            pa.table({"shard": ids, "filter_blob": blobs, "state_json": states}),
            os.path.join(ckpt_dir, "frontier_shards.parquet"),
        )
        with open(os.path.join(ckpt_dir, "frontier_meta.json"), "w") as f:
            json.dump({"num_shards": self.num_shards, "next_seq": self.next_seq}, f)

    def restore(self, ckpt_dir: str) -> None:
        tbl = pq.read_table(os.path.join(ckpt_dir, "frontier_shards.parquet"))
        with open(os.path.join(ckpt_dir, "frontier_meta.json")) as f:
            meta = json.load(f)
        assert meta["num_shards"] == self.num_shards, "shard count must match"
        self.next_seq = meta["next_seq"]
        futs = []
        for i in range(tbl.num_rows):
            row = tbl.slice(i, 1).to_pylist()[0]
            futs.append(
                self.shards[row["shard"]].restore.remote(
                    row["filter_blob"], json.loads(row["state_json"])
                )
            )
        ray.get(futs)
