"""Frontier actor pool: sharded URL-seen set + per-host politeness + priority
order (north rule; generalizes the reference's FilingLinks map,
/root/reference/folder.go:17,145-149).

Shards are ``@ray.remote`` actors — the one place the Dataset API genuinely
can't express the semantics (a shared mutable index with admission ordering).

Two independent partitionings, per the north rule's skew clause:

- **Dedup shards by url hash** (``url_canon_hash % num_shards``, SURVEY.md
  §2.7 D5): the cuckoo seen-set is keyed on sha1(canonicalize(url)), which is
  uniform, so admission parallelizes even when EVERY candidate lives on one
  hot host (sec.gov — the exact skew the north star names). All copies of a
  canonical URL route to the same shard, so first-wins stays exact.
- **Politeness by host, host-global**: one token per ``1/host_budget`` seconds
  per host on a simulated clock carried across waves. The ``host ->
  next_slot`` state is SHARDED across :class:`HostScheduler` actors by host
  hash; each wave reserves its per-host slot ranges with one
  (host, count)-map RPC per shard, and slot assignment within the wave is a
  vectorized metadata pass (driver fast path) or block-parallel stamping
  tasks (distributed path).

Each dedup shard holds a :class:`CuckooFilter` shard (checkpointable to
bytes) and per-wave admission counters (urls_in / admitted / dedup_hits) —
the per-partition lineage that checkpoints to Parquet.

BFS order: the pipeline admits wave-by-wave; within a wave the crawl order is
the deterministic priority ``(seed_rank, filing_type, filed_date desc,
report_num, url)`` (SURVEY.md §2.6 O4) — Go map iteration is random, so the
reference's *visit set* is what's byte-matched, under this total order.
"""

from __future__ import annotations

import json
import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from .canonical import canonicalize
from .cuckoo import CuckooFilter, GrowableCuckoo, hash_urls

PRIORITY_COLS = ("seed_rank", "filing_type", "filed_date", "report_num", "url")

# Distributed admission would otherwise stack two all-to-alls in one
# streaming plan (the dedup groupby's sort-shuffle, then the global priority
# sort) — a pattern that measurably thrashes executor resource reservations
# at low parallelism (NOTES.md round-1 learning #4). Materializing the
# REDUCED admitted metadata between them (metadata-sized — the candidate
# html never enters this plan) cut wave-2 admit ~11% at 8 pinned CPUs and
# never lost at 32 in a same-process A/B on the 1.77M-page corpus
# (NOTES.md round-3 experiments). Flag kept for A/B reproducibility.
ADMIT_MATERIALIZE_BETWEEN = True


def shard_of(host: str, num_shards: int) -> int:
    """Legacy host-hash routing (kept for host-owner components like robots
    caches; dedup routing uses url_canon_hash % num_shards)."""
    return zlib.crc32(host.encode()) % num_shards


def _lex_ranks(col) -> np.ndarray:
    """Lexicographic ranks of a string column (== ``np.unique(...,
    return_inverse=True)`` inverse) without per-row Python compares:
    dictionary-encode in C, sort only the small dictionary, remap."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
        enc = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
    if enc.null_count:
        # nulls would cast to platform-dependent garbage indices; the old
        # np.unique path raised on None too — keep the failure explicit
        raise ValueError("_lex_ranks: ranking column contains nulls")
    dict_vals = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    dict_rank = np.empty(len(dict_vals), dtype=np.int64)
    dict_rank[np.argsort(dict_vals)] = np.arange(len(dict_vals))
    return dict_rank[enc.indices.to_numpy(zero_copy_only=False).astype(
        np.int64)]


def _priority_keys(tbl: pa.Table) -> list[np.ndarray]:
    """Numeric lexsort keys for the within-wave priority ``(seed_rank,
    filing_type, -filed_date, report_num)``: filing_type dictionary-encodes
    with sorted-dictionary ranks, filed_date parses to an int (empty -> -1,
    which lands LAST under descending like the empty string does)."""
    import pyarrow.compute as pc

    rank = tbl["seed_rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    ft_key = _lex_ranks(tbl["filing_type"])

    date_digits = pc.replace_substring(tbl["filed_date"], "-", "")
    date_int = pc.cast(
        pc.if_else(pc.equal(date_digits, pa.scalar("")), pa.scalar("-1"),
                   date_digits),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    repnum = tbl["report_num"].to_numpy(zero_copy_only=False).astype(np.int64)
    return [rank, ft_key, -date_int, repnum]


def _priority_sort(tbl: pa.Table) -> pa.Table:
    """Deterministic within-wave order: filed_date DESCENDING (newest first,
    like AvailableFilings /root/reference/folder.go:128-131), all else asc.

    Implemented as a NUMERIC lexsort (multi-key string sorts are the driver
    bottleneck at millions of candidates; see ``_priority_keys``); the final
    url-ascending tiebreak is replaced by url_canon_hash — exact because
    distinct URLs never tie on all four priority components (only duplicate
    URLs do, and any stable deterministic tiebreak picks the same winner for
    identical URLs)."""
    n = tbl.num_rows
    if n <= 1:
        return tbl
    rank, ft_key, neg_date, repnum = _priority_keys(tbl)
    if "url_canon_hash" in tbl.column_names:
        tie = tbl["url_canon_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        tie = _lex_ranks(tbl["url"])
    order = np.lexsort((tie, repnum, neg_date, ft_key, rank))
    return tbl.take(pa.array(order, pa.int64()))


def _ensure_keys(tbl: pa.Table) -> pa.Table:
    """Append url_sha1/url_canon_hash if the candidate table lacks them
    (candidates produced by the parse stages already carry both)."""
    import hashlib

    if "url_canon_hash" in tbl.column_names:
        return tbl
    urls = tbl["url"].to_pylist()
    sha = [hashlib.sha1(u.encode()).digest() for u in urls]
    ch = hash_urls([canonicalize(u) for u in urls])
    if "url_sha1" not in tbl.column_names:
        tbl = tbl.append_column("url_sha1", pa.array(sha, pa.binary()))
    return tbl.append_column("url_canon_hash", pa.array(ch, pa.uint64()))


def robots_block_mask(urls: np.ndarray, rules_by_len: dict[int, np.ndarray]
                      ) -> np.ndarray:
    """Exact vectorized robots prefix match, independent of rule count:
    prefixes grouped by LENGTH; urls truncate to each length (numpy U-dtype
    astype truncates) and set-match with np.isin — a handful of passes even
    for thousands of rules, nested prefixes handled exactly."""
    blocked = np.zeros(len(urls), dtype=bool)
    for length, pre in sorted(rules_by_len.items()):
        blocked |= np.isin(urls.astype(f"U{length}"), pre)
    return blocked


def _rules_by_len(robots_rules: dict[str, list[str]]) -> dict[int, np.ndarray]:
    by_len: dict[int, list[str]] = {}
    for prefixes in robots_rules.values():
        for p in prefixes:
            by_len.setdefault(len(p), []).append(p)
    return {ln: np.unique(np.asarray(ps, dtype=str))
            for ln, ps in by_len.items()}


@ray.remote
class HostScheduler:
    """One politeness-scheduler shard: the ``host -> next free slot`` map for
    its host-hash range. Reserving a wave's slots per host is one message of
    (host, count) pairs each way — the per-host-range actor form the
    single-node driver dict scales into at 10^8+ hosts; state checkpoints
    with the frontier (merged back into the legacy meta format)."""

    def __init__(self):
        self.next_slot: dict[str, float] = {}

    def reserve(self, counts: dict, step: float) -> dict:
        """Atomically reserve ``counts[h]`` consecutive slots per host;
        returns each host's wave-start slot."""
        out = {}
        for h, c in counts.items():
            s = self.next_slot.get(h, 0.0)
            out[h] = s
            self.next_slot[h] = float(s + step * c)
        return out

    def state(self) -> dict:
        return self.next_slot

    def restore(self, state: dict) -> None:
        self.next_slot = dict(state)


@ray.remote
class FrontierShard:
    """One dedup shard: the cuckoo seen-set slice for its url-hash range."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        # growable: auto-appends a double-size cuckoo layer at 0.9 load,
        # so a mis-sized initial capacity reshards instead of dropping
        # admissions (each growth is recorded in the wave lineage)
        self.filter = GrowableCuckoo(capacity)
        self.lineage: list[dict] = []
        self._overflow_seen = 0
        self._reshards_seen = 0

    def _new_overflow(self, update: bool = False) -> int:
        """Insert failures since the last wave — surfaced per-wave in
        lineage so a saturated shard is observable data loss, never
        miscounted as dedup hits."""
        delta = self.filter.overflow - self._overflow_seen
        if update:
            self._overflow_seen = self.filter.overflow
        return delta

    def _new_reshards(self) -> int:
        """Growth (auto-reshard) events since the last wave row."""
        delta = len(self.filter.growth_events) - self._reshards_seen
        self._reshards_seen = len(self.filter.growth_events)
        return delta

    def add_keys(self, h: np.ndarray, wave: int, inwave_dups: int = 0,
                 robots_blocked: int = 0) -> np.ndarray:
        """Dedup one key slice (uint64 canonical-url hashes). Callers are
        either the driver (legacy admit_wave: keys pre-sorted in global
        priority order) or distributed bucket-admission tasks (admit_wave_ds:
        keys already DISTINCT within the wave, so arrival order across
        concurrent calls cannot change the outcome). Only 8 bytes/url cross
        the wire each way; the fresh-mask reply is 1 byte/url.

        ``inwave_dups`` / ``robots_blocked`` carry the counts a distributed
        bucket task resolved locally (within-wave duplicate copies, robots
        drops) so wave totals stay exact in the lineage."""
        fresh = self.filter.add_many(h) if len(h) else np.zeros(0, bool)
        n_fresh = int(fresh.sum())
        self.lineage.append(
            {
                "shard": self.shard_id,
                "wave": wave,
                "urls_in": int(len(h)) + inwave_dups,
                "admitted": n_fresh,
                "dedup_hits": (int(len(h)) - n_fresh - self._new_overflow()
                               + inwave_dups),
                "seen_set_overflow": self._new_overflow(update=True),
                "seen_set_reshards": self._new_reshards(),
                "politeness_violations": 0,  # enforced by construction
                "politeness_deferred": 0,  # accounted on the scheduler row
                "robots_blocked": robots_blocked,
            }
        )
        return fresh

    def lineage_rows(self) -> list[dict]:
        return self.lineage

    def checkpoint(self) -> tuple[bytes, dict]:
        state = {"shard_id": self.shard_id, "lineage": self.lineage}
        return self.filter.to_bytes(), state

    def restore(self, blob: bytes, state: dict) -> None:
        self.filter = GrowableCuckoo.from_bytes(blob)
        self.lineage = list(state["lineage"])
        self._overflow_seen = 0
        self._reshards_seen = len(self.filter.growth_events)


class Frontier:
    """Driver-side handle over the shard pool + the host-global scheduler.

    A wave's candidates are priority-sorted ONCE (numeric lexsort), routed
    to dedup shards by url hash as bare uint64 key slices (8 bytes/url each
    way; shards reply with fresh-masks), then filtered, politeness-scheduled
    per host and stamped with the global ``seq``. Only frontier METADATA
    (urls + keys, no page bytes) crosses the driver — at 10^10 scale the
    sort/seq step becomes the standard distributed bucket prefix-sum (count
    per priority bucket, exclusive-scan offsets, per-bucket local sort).
    """

    def __init__(self, num_shards: int = 4, capacity: int = 1 << 16,
                 host_budget: float = 100.0,
                 robots_rules: dict[str, list[str]] | None = None):
        self.num_shards = num_shards
        # actors start spinning up immediately; robots rules can be attached
        # later with set_robots so actor warmup overlaps the robots fetch
        self.shards = [
            FrontierShard.remote(i, max(1024, capacity // num_shards))
            for i in range(num_shards)
        ]
        self.host_budget = float(host_budget)
        # politeness state is SHARDED by host hash across scheduler actors
        # (the driver never holds the host map; at web scale it is the
        # dominant mutable state after the seen-set)
        self.sched = [HostScheduler.remote() for _ in range(num_shards)]
        self.driver_lineage: list[dict] = []  # scheduler rows (shard = -1)
        self.next_seq = 0
        self.rules_by_len: dict = {}
        if robots_rules:
            self.set_robots(robots_rules)

    def set_robots(self, robots_rules: dict[str, list[str]]) -> None:
        """Attach the (tiny) robots rule set — re-fetched by the crawl each
        run, not checkpointed state. Used as the admission fallback for
        driver-built candidate tables; bulk candidates are gated in the
        distributed robots_gate map stage (pipelines/crawl.py)."""
        self.rules_by_len = _rules_by_len(robots_rules or {})

    def admit_wave(self, tbl: pa.Table, wave: int) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        tbl = _ensure_keys(tbl)

        # robots gate: candidates from the parse stages carry a robots_ok
        # column (computed distributed, see crawl.robots_gate); small
        # driver-built tables (wave-0 seeds) fall back to an inline check
        robots_blocked = 0
        if "robots_ok" in tbl.column_names:
            ok = tbl["robots_ok"]
            robots_blocked = tbl.num_rows - int(pa.compute.sum(ok).as_py() or 0)
            if robots_blocked:
                tbl = tbl.filter(ok)
            tbl = tbl.drop_columns(["robots_ok"])
        elif self.rules_by_len:
            urls = np.asarray(tbl["url"].to_pylist(), dtype=str)
            blocked = robots_block_mask(urls, self.rules_by_len)
            robots_blocked = int(blocked.sum())
            if robots_blocked:
                tbl = tbl.filter(pa.array(~blocked))
        if tbl.num_rows == 0:
            self._scheduler_lineage(wave, 0, robots_blocked)
            return tbl

        # ONE global priority sort on frontier metadata; shards then see only
        # uint64 key slices in that order and reply with fresh-masks
        tbl = _priority_sort(tbl)
        hashes = tbl["url_canon_hash"].to_numpy().astype(np.uint64, copy=False)
        # in-wave first-wins dedup under the SAME comparator the distributed
        # bucket path uses (_inwave_winners: priority keys then _TIE_COLS),
        # so both paths provably admit identical rows even for duplicate
        # copies that carry different metadata. Dropped copies are counted
        # as dedup hits via the inwave_dups channel, exactly like the
        # distributed path.
        inwave_dups = 0
        if len(hashes) != len(np.unique(hashes)):
            winners, inwave_dups = _inwave_winners(
                tbl, hashes, _priority_keys(tbl))
            keep_sorted = np.sort(winners)  # preserve global priority order
            tbl = tbl.take(pa.array(keep_sorted, pa.int64()))
            hashes = hashes[keep_sorted]
        shard_ids = (hashes % np.uint64(self.num_shards)).astype(np.int64)
        futs, slices = [], []
        attached = False
        for s in range(self.num_shards):
            idx = np.nonzero(shard_ids == s)[0]
            if len(idx):
                extra = (inwave_dups,) if not attached else (0,)
                attached = True
                futs.append(self.shards[s].add_keys.remote(
                    hashes[idx], wave, *extra))
                slices.append(idx)
        fresh = np.zeros(tbl.num_rows, dtype=bool)
        for idx, mask in zip(slices, ray.get(futs)):
            fresh[idx] = mask
        if not fresh.any():
            self._scheduler_lineage(wave, 0, robots_blocked)
            return tbl.slice(0, 0)
        merged = tbl.filter(pa.array(fresh))  # already globally sorted

        # politeness: slot assignment in global priority order, host-global
        # (admissions never exceed the budget -> violations = 0 by
        # construction; `deferred` counts URLs pushed >= 1s past the host's
        # wave-start slot). Fully vectorized: hosts dictionary-encode in C,
        # per-host arrival ranks come from one stable argsort + reduceat.
        n = merged.num_rows
        enc = pa.compute.dictionary_encode(merged["host"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
            enc = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
        host_names = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        cs = codes[order]
        starts_i = np.nonzero(np.r_[True, cs[1:] != cs[:-1]])[0]
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(n) - starts_i[np.cumsum(
            np.r_[True, cs[1:] != cs[:-1]]) - 1]
        step = 1.0 / self.host_budget
        counts = np.bincount(codes, minlength=len(host_names))
        slots = self._reserve_slots(
            {h: int(c) for h, c in zip(host_names, counts)})
        host_start = np.array([slots[h] for h in host_names])
        sched = host_start[codes] + step * rank
        deferred = int((step * rank >= 1.0).sum())
        merged = merged.append_column("scheduled_at", pa.array(sched, pa.float64()))
        self._scheduler_lineage(wave, deferred, robots_blocked)

        seq = pa.array(
            np.arange(self.next_seq, self.next_seq + merged.num_rows, dtype=np.int64)
        )
        self.next_seq += merged.num_rows
        merged = merged.append_column("seq", seq)
        wave_col = pa.array(np.full(merged.num_rows, wave, dtype=np.int32))
        return merged.append_column("wave", wave_col)

    def _reserve_slots(self, counts: dict) -> dict:
        """Reserve a wave's politeness slots: counts shard by host hash to
        the scheduler actors (one (host, count)-map RPC per shard, in
        parallel); returns host -> wave-start slot."""
        if not counts:
            return {}
        by_shard: list[dict] = [{} for _ in range(self.num_shards)]
        for h, c in counts.items():
            by_shard[shard_of(h, self.num_shards)][h] = c
        step = 1.0 / self.host_budget
        futs = [self.sched[i].reserve.remote(m, step)
                for i, m in enumerate(by_shard) if m]
        out: dict = {}
        for part in ray.get(futs):
            out.update(part)
        return out

    def admit_wave_ds(self, cand_ds, wave: int, num_buckets: int = 64):
        """Distributed admission (see module-tail comment block): candidates
        arrive as a Dataset and stay distributed; the driver touches only
        per-block (row-count, host-count) metadata. Returns
        ``(stamped_block_refs, total_admitted)`` — block refs hold the
        admitted metadata in global priority order with seq / scheduled_at /
        wave stamped, ready to assemble (broadcast fetch) or wrap back into
        a Dataset (hash-join fetch) without re-sorting.

        Returns ``(stamped_refs, total_admitted, sorted_refs)``:
        ``sorted_refs`` are the same blocks BEFORE seq/politeness stamping —
        the fetch join only needs url keys + metadata, so the caller can
        launch the fetch from these immediately while the stamping tasks
        (which only add the crawl-order columns) run concurrently off the
        critical path."""
        # Coalesce fragmented candidate blocks first: parse stages emit one
        # (mostly tiny) block per page block, and both all-to-alls pay a
        # per-block constant that dwarfs the data at metadata sizes. 32
        # blocks feeds 32 cores; at cluster scale this becomes ~2x total
        # cores via the same call.
        try:
            nb = cand_ds.num_blocks()
        except Exception:
            nb = None
        if nb is not None and nb > 32:
            cand_ds = cand_ds.repartition(32)
        rules_ref = ray.put(self.rules_by_len) if self.rules_by_len else None

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if "robots_ok" not in t.column_names:
                if rules_ref is not None:
                    r = ray.get(rules_ref) if isinstance(
                        rules_ref, ray.ObjectRef) else rules_ref
                    urls = np.asarray(t["url"].to_pylist(), dtype=str)
                    ok = (~robots_block_mask(urls, r) if len(urls)
                          else np.zeros(0, dtype=bool))
                else:
                    ok = np.ones(t.num_rows, dtype=bool)
                t = t.append_column("robots_ok", pa.array(ok))
            t = _ensure_keys(t)
            dd = pc.replace_substring(t["filed_date"], "-", "")
            di = pc.cast(
                pc.if_else(pc.equal(dd, pa.scalar("")), pa.scalar("-1"), dd),
                pa.int64())
            return t.append_column("_date_int", di)

        from ..stages.bucketing import with_bucket

        bucket_admit = _make_bucket_admit(self.shards, self.num_shards, wave)
        t0 = time.monotonic()
        admitted = (
            cand_ds.map_batches(prep, batch_format="pyarrow")
            .map_batches(
                lambda t: with_bucket(t, ["url_canon_hash"], num_buckets),
                batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_admit, batch_format="pyarrow")
        )
        if ADMIT_MATERIALIZE_BETWEEN:
            admitted = admitted.materialize()
        t_dedup = time.monotonic()
        admitted = (
            admitted
            .sort(["seed_rank", "filing_type", "_date_int", "report_num",
                   "url_canon_hash"],
                  descending=[False, False, True, False, False])
            .materialize()
        )
        # per-phase attribution for the scaling analysis: dedup = prep +
        # robots gate + bucketed first-wins groupby; sort = the global
        # priority sort (only meaningful when ADMIT_MATERIALIZE_BETWEEN
        # forces the barrier between them)
        self.last_admit_phases = {
            "admit_dedup_s": round(t_dedup - t0, 3),
            "admit_sort_s": round(time.monotonic() - t_dedup, 3),
        }
        refs = admitted.to_arrow_refs()
        summaries = ray.get([_block_summary.remote(r) for r in refs])
        total = int(sum(n for n, _ in summaries))
        if total == 0:
            self._scheduler_lineage(wave, 0, 0)
            return [], 0, []
        step = 1.0 / self.host_budget
        # reserve the whole wave's slots per host up front (one RPC per
        # scheduler shard), then stamp blocks against the reserved starts
        totals: dict[str, int] = {}
        for _, hc in summaries:
            for h, c in hc.items():
                totals[h] = totals.get(h, 0) + c
        slots = self._reserve_slots(totals)
        seq_off = self.next_seq
        host_rank_cum: dict[str, int] = {}
        stamped = []
        for ref, (n, hc) in zip(refs, summaries):
            if n == 0:
                continue
            hr0 = {h: host_rank_cum.get(h, 0) for h in hc}
            slot0 = {h: slots[h] for h in hc}
            stamped.append(
                _stamp_block.remote(ref, seq_off, wave, step, slot0, hr0))
            for h, c in hc.items():
                host_rank_cum[h] = host_rank_cum.get(h, 0) + c
            seq_off += n
        budget_ceil = int(np.ceil(self.host_budget))
        deferred = sum(max(0, c - budget_ceil) for c in totals.values())
        self.next_seq += total
        self._scheduler_lineage(wave, deferred, 0)
        return stamped, total, [r for r, (n, _) in zip(refs, summaries) if n]

    def _scheduler_lineage(self, wave: int, deferred: int,
                           robots_blocked: int) -> None:
        self.driver_lineage.append(
            {
                "shard": -1,  # the host-global scheduler partition
                "wave": wave,
                "urls_in": 0,
                "admitted": 0,
                "dedup_hits": 0,
                "politeness_violations": 0,
                "politeness_deferred": deferred,
                "robots_blocked": robots_blocked,
            }
        )

    def lineage_table(self) -> pa.Table:
        rows: list[dict] = list(self.driver_lineage)
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
            json.dump(
                {
                    "num_shards": self.num_shards,
                    "next_seq": self.next_seq,
                    "host_budget": self.host_budget,
                    # merged scheduler-shard state (legacy meta format)
                    "host_next_slot": {
                        h: s for part in ray.get(
                            [sc.state.remote() for sc in self.sched])
                        for h, s in part.items()},
                    "driver_lineage": self.driver_lineage,
                },
                f,
            )

    def restore(self, ckpt_dir: str) -> None:
        tbl = pq.read_table(os.path.join(ckpt_dir, "frontier_shards.parquet"))
        with open(os.path.join(ckpt_dir, "frontier_meta.json")) as f:
            meta = json.load(f)
        assert meta["num_shards"] == self.num_shards, "shard count must match"
        self.next_seq = meta["next_seq"]
        self.host_budget = float(meta.get("host_budget", self.host_budget))
        merged = dict(meta.get("host_next_slot", {}))
        by_shard: list[dict] = [{} for _ in range(self.num_shards)]
        for h, s in merged.items():
            by_shard[shard_of(h, self.num_shards)][h] = s
        ray.get([self.sched[i].restore.remote(m)
                 for i, m in enumerate(by_shard)])
        self.driver_lineage = list(meta.get("driver_lineage", []))
        futs = []
        for i in range(tbl.num_rows):
            row = tbl.slice(i, 1).to_pylist()[0]
            futs.append(
                self.shards[row["shard"]].restore.remote(
                    row["filter_blob"], json.loads(row["state_json"])
                )
            )
        ray.get(futs)


# ---------------------------------------------------------------------------
# Distributed admission: candidates stay a Dataset end to end; the driver
# touches only per-block metadata (row counts + per-host counts), never the
# candidate table itself. This replaces the driver-side collect + global
# lexsort + politeness pass of `Frontier.admit_wave` with:
#
#   prep (map_batches: robots mask + numeric date key)
#     -> hash-bucket shuffle on url_canon_hash
#     -> per-bucket: in-wave first-wins dedup (vectorized) + cuckoo-shard
#        RPCs issued FROM the bucket tasks (keys are distinct within the
#        wave, so concurrent shard calls cannot change the outcome)
#     -> distributed Dataset.sort on the priority columns
#     -> two block-parallel stamping passes (the distributed bucket
#        prefix-sum): pass 1 collects per-block host counts (tiny), the
#        driver exclusive-scans seq offsets + per-host start ranks, pass 2
#        stamps seq / scheduled_at / wave per block.
#
# The per-wave driver work is O(blocks x hosts-per-block) dict arithmetic —
# independent of candidate count. At 10^10-URL scale the host dict itself
# shards into per-host-range scheduler actors; the block prefix-sum is
# unchanged.
# ---------------------------------------------------------------------------

_TIE_COLS = ("doc_type", "accession", "cik", "ticker", "url")


def _inwave_winners(t: pa.Table, h: np.ndarray,
                    prio_keys: list[np.ndarray]) -> tuple[np.ndarray, int]:
    """In-wave first-wins dedup under the ONE shared comparator both
    admission paths use: per canonical-url hash, the winner is the min row by
    (priority keys, then _TIE_COLS metadata). Returns (winner_indices in
    comparator order, n_duplicate_copies). Duplicate copies of a canonical
    URL that carry DIFFERENT metadata therefore resolve identically on the
    driver fast path and the distributed bucket path. A tie column absent
    from the table (hand-built candidate tables in tests/tools) contributes
    a constant — both paths skip it identically.

    Cost note: _TIE_COLS ranks (object-array np.unique = Python string
    compares) are computed ONLY for rows inside duplicate-hash groups —
    the metadata can never change a singleton's winner — so the string
    work scales with the duplicate fraction (a few % of the wave), not the
    wave. Equivalence with the full-comparator sort is exact: the numeric
    pre-sort is stable, so restricting the (h, prio, ties) comparator to
    each duplicate group preserves both the winner and the residual
    original-order stability (property-tested against the full sort)."""
    rank, ft_key, neg_date, repnum = prio_keys
    order0 = np.lexsort((repnum, neg_date, ft_key, rank, h))
    hs = h[order0]
    gstart = np.r_[True, hs[1:] != hs[:-1]]
    gstarts = np.nonzero(gstart)[0]
    dups = int(len(h) - len(gstarts))
    winners = order0[gstarts]
    if dups == 0:
        return winners, 0
    gsize = np.diff(np.r_[gstarts, len(hs)])
    dupg = gsize > 1
    member = np.repeat(dupg, gsize)  # order0-space mask of dup-group rows
    sub_rows = order0[member]        # ordered by (h, prio, original index)
    sub_pa = pa.array(sub_rows, pa.int64())
    ties = [_lex_ranks(t[c].take(sub_pa))
            for c in _TIE_COLS if c in t.column_names]
    h_sub = hs[member]
    order1 = np.lexsort(tuple(reversed(ties))
                        + (repnum[sub_rows], neg_date[sub_rows],
                           ft_key[sub_rows], rank[sub_rows], h_sub))
    hss = h_sub[order1]
    first = np.r_[True, hss[1:] != hss[:-1]]
    # dup groups appear in ascending-hash order on both sides; winners is a
    # fresh fancy-indexed array, safe to patch in place
    winners[dupg] = sub_rows[order1][first]
    return winners, dups


def _local_priority_keys(t: pa.Table) -> list[np.ndarray]:
    """Numeric lexsort keys replicating ``_priority_sort`` bucket-locally.
    Strings factorize via np.unique — lexicographic ranks, so local
    comparisons order exactly as the global sort does."""
    rank = t["seed_rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    ft_key = _lex_ranks(t["filing_type"])
    date_int = t["_date_int"].to_numpy(zero_copy_only=False).astype(np.int64)
    repnum = t["report_num"].to_numpy(zero_copy_only=False).astype(np.int64)
    return [rank, ft_key, -date_int, repnum]


def _make_bucket_admit(shards, num_shards: int, wave: int):
    """Per-bucket admission task: robots drop -> in-wave first-wins dedup
    (min full priority key per canonical hash; extra metadata tie-breaks
    make the winner deterministic under any shuffle arrival order) ->
    cross-wave cuckoo filter via shard RPCs (bare uint64 keys)."""
    import pyarrow.compute as pc

    def bucket_admit(t: pa.Table) -> pa.Table:
        if "_bucket" in t.column_names:
            t = t.drop_columns(["_bucket"])
        ok = t["robots_ok"]
        n_blocked = t.num_rows - int(pc.sum(ok).as_py() or 0)
        t = t.filter(ok).drop_columns(["robots_ok"])
        h = t["url_canon_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(h) == 0:
            if n_blocked:
                ray.get(shards[0].add_keys.remote(
                    np.empty(0, np.uint64), wave, 0, n_blocked))
            return t
        # primary key (last in the lexsort tuple) = canonical hash, then the
        # four priority components, then the metadata tie-breaks — the
        # shared comparator (see _inwave_winners)
        winners, inwave_dups = _inwave_winners(t, h, _local_priority_keys(t))
        wh = h[winners]
        sid = (wh % np.uint64(num_shards)).astype(np.int64)
        fresh = np.zeros(len(winners), dtype=bool)
        futs, idxs = [], []
        attached = False
        for s in range(num_shards):
            ix = np.nonzero(sid == s)[0]
            if not len(ix):
                continue
            extra = (inwave_dups, n_blocked) if not attached else (0, 0)
            attached = True
            futs.append(shards[s].add_keys.remote(wh[ix], wave, *extra))
            idxs.append(ix)
        if not attached:
            if inwave_dups or n_blocked:
                ray.get(shards[0].add_keys.remote(
                    np.empty(0, np.uint64), wave, inwave_dups, n_blocked))
            return t.slice(0, 0)
        for ix, m in zip(idxs, ray.get(futs)):
            fresh[ix] = m
        kept = winners[fresh]
        return t.take(pa.array(np.sort(kept), pa.int64()))

    return bucket_admit


def _host_codes(tbl: pa.Table):
    enc = pa.compute.dictionary_encode(tbl["host"])
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
        enc = enc.chunk(0) if isinstance(enc, pa.ChunkedArray) else enc
    names = enc.dictionary.to_pylist()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return names, codes


@ray.remote
def _block_summary(tbl: pa.Table):
    """Pass 1 of the block prefix-sum: (num_rows, host -> count)."""
    if tbl.num_rows == 0:
        return 0, {}
    names, codes = _host_codes(tbl)
    counts = np.bincount(codes, minlength=len(names))
    return tbl.num_rows, {h: int(c) for h, c in zip(names, counts)}


@ray.remote
def _stamp_block(tbl: pa.Table, seq_start: int, wave: int, step: float,
                 host_slot0: dict, host_rank0: dict) -> pa.Table:
    """Pass 2: stamp seq (block offset + arange) and scheduled_at
    (host wave-start slot + step x global within-wave host rank)."""
    if "_date_int" in tbl.column_names:
        tbl = tbl.drop_columns(["_date_int"])
    n = tbl.num_rows
    if n == 0:
        return (tbl.append_column("scheduled_at", pa.array([], pa.float64()))
                   .append_column("seq", pa.array([], pa.int64()))
                   .append_column("wave", pa.array([], pa.int32())))
    names, codes = _host_codes(tbl)
    order = np.argsort(codes, kind="stable")
    cs = codes[order]
    newg = np.r_[True, cs[1:] != cs[:-1]]
    starts_i = np.nonzero(newg)[0]
    local_rank = np.empty(n, dtype=np.int64)
    local_rank[order] = np.arange(n) - starts_i[np.cumsum(newg) - 1]
    slot0 = np.array([host_slot0.get(h, 0.0) for h in names])
    rank0 = np.array([host_rank0.get(h, 0) for h in names], np.int64)
    sched = slot0[codes] + step * (rank0[codes] + local_rank)
    tbl = tbl.append_column("scheduled_at", pa.array(sched, pa.float64()))
    tbl = tbl.append_column(
        "seq", pa.array(np.arange(seq_start, seq_start + n, dtype=np.int64)))
    return tbl.append_column("wave", pa.array(np.full(n, wave, np.int32)))
