"""Pluggable live-HTTP fetch stage (reference ``getPage``,
/root/reference/page.go:21-28) — the escape hatch from the parquet
stand-in to a real crawler transport.

The sandbox has no network, so the TRANSPORT is injectable:
``transport(url) -> bytes`` (raise on failure). What this stage adds over
the parquet join, per the reference gap list:

- **Politeness enforced AT the fetcher**, not just computed upstream: each
  admitted row carries ``scheduled_at`` (the frontier's host-global slot,
  seconds from crawl start); the fetch actor sleeps until its slot on a
  clock whose ANCHOR IS SHARED ACROSS THE POOL (one wall-clock epoch
  captured on the driver at ``fetch_live`` time and passed to every actor),
  so no row ever fires BEFORE its host-global slot regardless of which
  actor it lands on. Guarantee boundary, stated honestly: a row delayed
  past a LATER row's slot (retry/backoff stall) can still land closer than
  ``1/host_budget`` to that later row when the two run on different
  actors — within one actor the ``host_min_gap`` floor re-spaces them. For
  strict per-host serialization against a live host, run with
  ``concurrency=1`` (single fetcher) or pre-partition the admitted rows by
  host so one actor owns each host's rows.
- **Retries with exponential backoff** where the reference ``log.Fatal``s:
  a transient error retries up to ``max_retries`` times; a permanent
  failure emits the row with ``fetch_status='error'`` instead of killing
  the run (fetch errors are first-class data, counted in pages_err).

Deployed as a callable-class actor pool
(``map_batches(HttpFetcher, concurrency=..., batch_size=...)``): transport
/ clock state is built once per actor; batches of admitted metadata stream
through. Per-stage ``concurrency x num_cpus`` bounds the host connection
count independently of cluster size.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

FETCH_META_COLS = ["ticker", "cik", "filing_type", "filed_date", "accession",
                   "doc_type", "report_num", "seed_rank", "page_class"]


class UrllibTransport:
    """Production default transport: stdlib ``urllib.request`` GET.

    Matches the reference's out-of-the-box behavior
    (/root/reference/page.go:21-28) minus its ``log.Fatal``: HTTP 404/410
    raise ``KeyError`` (permanent — the fetcher emits an error row without
    retrying the budget away is NOT done here; the fetcher's retry loop
    treats every exception alike, and a 404 exhausts retries quickly at
    ``backoff_s`` scale); any other failure raises and is retried upstream.

    ``rewrite=(prefix, replacement)`` maps canonical urls onto a mirror /
    proxy / test server (e.g. ``("https://www.sec.gov",
    "http://127.0.0.1:8081")``) without touching frontier semantics — the
    frontier keys politeness and dedup on the CANONICAL url either way."""

    def __init__(self, timeout: float = 30.0,
                 user_agent: str = "edgar-ray/0 (research; contact admin)",
                 rewrite: tuple[str, str] | None = None):
        self.timeout = timeout
        self.user_agent = user_agent
        self.rewrite = rewrite

    def __call__(self, url: str) -> bytes:
        import urllib.error
        import urllib.request

        target = url
        if self.rewrite and target.startswith(self.rewrite[0]):
            target = self.rewrite[1] + target[len(self.rewrite[0]):]
        req = urllib.request.Request(
            target, headers={"User-Agent": self.user_agent})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if e.code in (404, 410):
                raise KeyError(url) from e  # permanent: no such page
            raise


def default_transport():
    """Flag-gated production default: ``EDGAR_RAY_LIVE_HTTP=1`` enables the
    stdlib urllib transport so the crawler works against a live host out of
    the box (reference parity). The flag exists because THIS sandbox has no
    outbound network — an unconditional default would turn every
    misconfigured test into a 30s-timeout loop."""
    if os.environ.get("EDGAR_RAY_LIVE_HTTP") == "1":
        return UrllibTransport()
    return None


class SystemClock:
    """Real clock (live crawls). Tests inject a fake.

    ``t0_epoch`` is a ``time.time()`` wall-clock anchor captured ONCE on the
    driver and shared by every actor in the pool, so ``now()`` is comparable
    across actors (and, to NTP precision, across nodes) — per-actor
    construction-time anchors would skew each actor's origin and break the
    host-global slot semantics. Without ``t0_epoch`` the clock anchors at
    construction (single-process use).

    Clock-step boundary: a wall-clock STEP mid-crawl (NTP slew is fine, a
    hard step is not) moves ``time.time()`` for every actor. ``now()`` is
    clamped monotone non-decreasing per actor, so a backward step can only
    make fetchers MORE conservative (they wait until the wall clock catches
    back up to their high-water mark) — the 'never fires before its
    host-global slot' guarantee survives. A large FORWARD step still opens
    slots early on every actor simultaneously; that boundary is inherent to
    wall-clock-anchored cross-node budgets and is accepted here."""

    def __init__(self, t0_epoch: float | None = None):
        self._t0_epoch = t0_epoch
        self._mono0 = time.monotonic()
        self._high_water = float("-inf")

    def now(self) -> float:
        """Seconds since the crawl (shared anchor) or clock construction;
        monotone non-decreasing per actor even across wall-clock steps."""
        if self._t0_epoch is not None:
            v = time.time() - self._t0_epoch
        else:
            v = time.monotonic() - self._mono0
        if v > self._high_water:
            self._high_water = v
        return self._high_water

    def sleep(self, seconds: float) -> None:
        time.sleep(seconds)


class HttpFetcher:
    """Actor-pool fetch stage: admitted frontier rows -> page rows.

    Input rows: ``url``, ``scheduled_at`` + FETCH_META_COLS.
    Output rows: ``url``, ``html`` (binary), ``fetch_status`` ('ok'|'error'),
    ``fetch_attempts`` + FETCH_META_COLS — the same shape the parquet
    fetch join produces, so the wave parsers are transport-agnostic.
    """

    def __init__(self, transport=None, clock=None, max_retries: int = 3,
                 backoff_s: float = 0.5, enforce_politeness: bool = True,
                 clock_t0_epoch: float | None = None,
                 host_min_gap: float | None = None):
        if transport is None:
            transport = default_transport()
        if transport is None:
            raise NotImplementedError(
                "no network in this environment: inject transport(url)->bytes "
                "or set EDGAR_RAY_LIVE_HTTP=1 for the stdlib urllib default "
                "(UrllibTransport) on a networked deployment")
        self.transport = transport
        # clock_t0_epoch: the pool-shared wall-clock anchor (see SystemClock)
        self.clock = clock or SystemClock(t0_epoch=clock_t0_epoch)
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.enforce_politeness = enforce_politeness
        # per-host minimum inter-fetch gap enforced WITHIN this actor even
        # after a retry/backoff stall pushed a row past its slot
        self.host_min_gap = host_min_gap
        self._last_touch: dict[str, float] = {}

    def _fetch_one(self, url: str) -> tuple[bytes | None, int]:
        delay = self.backoff_s
        for attempt in range(1, self.max_retries + 2):
            try:
                return self.transport(url), attempt
            except Exception:
                if attempt > self.max_retries:
                    return None, attempt
                self.clock.sleep(delay)
                delay *= 2
        return None, self.max_retries + 1  # unreachable

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        sched = (t["scheduled_at"].to_pylist()
                 if "scheduled_at" in t.column_names else [0.0] * len(urls))
        htmls: list[bytes] = []
        status: list[str] = []
        attempts: list[int] = []
        for url, slot in zip(urls, sched):
            host = url.split("/", 3)[2] if "://" in url else url
            if self.enforce_politeness:
                wait = float(slot) - self.clock.now()
                if self.host_min_gap and host in self._last_touch:
                    wait = max(wait, self._last_touch[host]
                               + self.host_min_gap - self.clock.now())
                if wait > 0:
                    self.clock.sleep(wait)
            body, n = self._fetch_one(url)
            if self.host_min_gap:
                self._last_touch[host] = self.clock.now()
            htmls.append(body if body is not None else b"")
            status.append("ok" if body is not None else "error")
            attempts.append(n)
        out = {
            "url": t["url"],
            "html": pa.array(htmls, pa.binary()),
            "fetch_status": pa.array(status, pa.string()),
            "fetch_attempts": pa.array(attempts, pa.int32()),
        }
        for c in FETCH_META_COLS:
            if c in t.column_names:
                out[c] = t[c]
        return pa.table(out)


def strict_host_fetch_group(t: pa.Table, fetcher: HttpFetcher) -> pa.Table:
    """One group = all of one host's admitted rows: re-sort by the frontier's
    ``scheduled_at`` slots (the groupby shuffle scrambles row order) and
    fetch SERIALLY through one fetcher — the strict per-host politeness
    serialization the module docstring's guarantee boundary points at."""
    import pyarrow.compute as pc

    if "scheduled_at" in t.column_names:
        t = t.take(pc.sort_indices(
            t, sort_keys=[("scheduled_at", "ascending"),
                          ("url", "ascending")]))
    return fetcher(t)


def fetch_live(admitted_ds, transport, *, clock=None, max_retries: int = 3,
               backoff_s: float = 0.5, enforce_politeness: bool = True,
               concurrency=(1, 8), batch_size: int = 64,
               host_min_gap: float | None = None,
               strict_per_host: bool = False):
    """Admitted frontier Dataset -> fetched page Dataset over live HTTP.

    Failed rows survive with ``fetch_status='error'`` (filter downstream);
    ``concurrency`` bounds simultaneous connections per the host's terms.

    When no ``clock`` is injected, every actor in the pool anchors its
    SystemClock to ONE wall-clock epoch captured here on the driver —
    per-actor anchors would skew slot origins across the pool (see the
    module docstring for the exact guarantee boundary). An injected clock
    (tests) is copied per actor by Ray's constructor-arg serialization;
    callers that need cross-actor determinism with a fake clock should run
    ``concurrency=1``. ``host_min_gap`` (seconds) adds a per-host
    inter-fetch floor within each actor, covering retry-delayed rows.

    ``strict_per_host=True`` switches to ``groupby("host").map_groups``:
    ONE task owns each host's rows end to end (sorted by ``scheduled_at``),
    so inter-fetch spacing against a live host is strictly serialized —
    no cross-actor interleave is possible by construction. Parallelism
    then equals the number of distinct hosts, which is exactly the
    politeness-bounded ceiling anyway."""
    kwargs = {
        "transport": transport, "clock": clock,
        "max_retries": max_retries, "backoff_s": backoff_s,
        "enforce_politeness": enforce_politeness,
        "clock_t0_epoch": time.time() if clock is None else None,
        "host_min_gap": host_min_gap,
    }
    if strict_per_host:
        from .cache import cached_instance as _cached

        if "host" not in admitted_ds.schema().names:
            def add_host(t: pa.Table) -> pa.Table:
                hosts = [u.split("/", 3)[2] if "://" in u else u
                         for u in t["url"].to_pylist()]
                return t.append_column("host", pa.array(hosts, pa.string()))

            admitted_ds = admitted_ds.map_batches(
                add_host, batch_format="pyarrow")

        def fetch_group(t: pa.Table) -> pa.Table:
            return strict_host_fetch_group(
                t, _cached(HttpFetcher, **kwargs))

        return admitted_ds.groupby("host").map_groups(
            fetch_group, batch_format="pyarrow")
    return admitted_ds.map_batches(
        HttpFetcher,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", batch_size=batch_size,
        # IO-bound: fractional CPU so the fetch pool can never starve the
        # downstream parse tasks even when the autoscaler maxes it out
        concurrency=concurrency, num_cpus=0.25,
    )


# ---------------------------------------------------------------------------
# Simulation doubles (sandbox has no network): importable from workers so
# actor constructors can unpickle them anywhere. Each actor receives its OWN
# COPY — per-copy logs don't aggregate across actors; aggregate counts come
# from the output columns (fetch_status / fetch_attempts).
# ---------------------------------------------------------------------------


class FakeClock:
    """Deterministic clock: sleep() advances simulated time instantly while
    recording that the fetcher honored the wait."""

    def __init__(self):
        self.t = 0.0
        self.fetch_log: list = []  # (url, clock_time) appended by transports

    def now(self) -> float:
        return self.t

    def sleep(self, seconds: float) -> None:
        self.t += max(0.0, seconds)


class DictTransport:
    """Dict-backed transport: serves ``pages[url]``; fails the first
    ``fail_n[url]`` calls per url with ConnectionError (transient-failure
    simulation); unknown urls raise KeyError (permanent 404)."""

    def __init__(self, pages: dict, fail_n: dict | None = None,
                 clock: FakeClock | None = None):
        self.pages = pages
        self.fail_n = dict(fail_n or {})
        self.clock = clock

    def __call__(self, url: str) -> bytes:
        if self.clock is not None:
            self.clock.fetch_log.append((url, self.clock.now()))
        left = self.fail_n.get(url, 0)
        if left > 0:
            self.fail_n[url] = left - 1
            raise ConnectionError(f"transient: {url}")
        if url not in self.pages:
            raise KeyError(url)
        return self.pages[url]
