"""End-to-end crawl pipeline vs the independent golden tables: crawl order
byte-match (north rule), extracted facts equality, dedup hits, politeness
spacing, and checkpoint/resume identity."""

import collections

import numpy as np
import pyarrow.parquet as pq
import pytest

from edgar_ray.pipelines.crawl import crawl
from edgar_ray.sources.synth import write_corpus

N_TICKERS, N_FILINGS = 3, 2


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("corpus"))
    return write_corpus(out, N_TICKERS, N_FILINGS)


@pytest.fixture(scope="module")
def result(corpus, ray_session):
    seeds = pq.read_table(corpus["seed_tickers"])
    return crawl(corpus["pages"], seeds, num_shards=2, host_budget=10.0)


def test_crawl_order_byte_match(corpus, result):
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = result.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    assert got["url_sha1"].to_pylist() == golden["url_sha1"].to_pylist()
    assert got["wave"].to_pylist() == golden["wave"].to_pylist()
    assert got["seq"].to_pylist() == golden["seq"].to_pylist()


def test_facts_match_golden(corpus, result):
    facts = result.filings_facts.to_pandas().sort_values("accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in gold.columns:
        assert c in facts.columns, c
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c


def test_dedup_hits(result):
    # one duplicate-URL listing per (ticker, filing type) query page
    hits = sum(r["dedup_hits"] for r in result.lineage.to_pylist())
    assert hits == N_TICKERS * 2
    assert all(r["politeness_violations"] == 0 for r in result.lineage.to_pylist())


def test_robots_blocked(result):
    # seed_rank 2 is robots-disallowed at the /Archives/edgar/data/<cik>/
    # level: its R-report candidates are blocked at admission (counted in the
    # scheduler lineage), its facts never materialize, and no blocked URL
    # appears in the crawl order
    blocked = sum(r["robots_blocked"] for r in result.lineage.to_pylist())
    assert blocked > 0
    facts = result.filings_facts.to_pandas()
    tickers = set(facts["ticker"])
    assert "SYN0002" not in tickers and {"SYN0000", "SYN0001"} <= tickers
    from edgar_ray.sources.synth import make_universe, robots_blocked_rank
    blocked_r_candidates = sum(
        sum(1 for d in fs.docs if d.doc_type != "Ignore")
        for fs in make_universe(N_TICKERS, N_FILINGS)
        if robots_blocked_rank(fs.seed_rank)
    )
    assert blocked == blocked_r_candidates
    blocked_ciks = {fs.cik_int for fs in make_universe(N_TICKERS, N_FILINGS)
                    if robots_blocked_rank(fs.seed_rank)}
    assert blocked_ciks
    order_urls = result.crawl_order["url"].to_pylist()
    for cik in blocked_ciks:
        prefix = f"https://www.sec.gov/Archives/edgar/data/{cik}/"
        assert not any(u.startswith(prefix) for u in order_urls)


def test_politeness_spacing(result):
    # per host, scheduled_at strictly increases by >= 1/budget
    order = result.crawl_order.sort_by([("seq", "ascending")])
    by_host = collections.defaultdict(list)
    for host, t in zip(order["host"].to_pylist(), order["scheduled_at"].to_pylist()):
        by_host[host].append(t)
    for times in by_host.values():
        diffs = np.diff(np.sort(times))
        assert (diffs >= 1.0 / 10.0 - 1e-9).all()


def test_checkpoint_resume(corpus, tmp_path, ray_session):
    seeds = pq.read_table(corpus["seed_tickers"])
    ckpt = str(tmp_path / "ckpt")
    # simulate a killed run: stop after wave 1
    partial = crawl(corpus["pages"], seeds, num_shards=2, checkpoint_dir=ckpt,
                    stop_after_wave=1)
    assert partial.filings_facts is None
    resumed = crawl(corpus["pages"], seeds, num_shards=2, checkpoint_dir=ckpt,
                    resume=True)
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = resumed.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    facts = resumed.filings_facts.to_pandas().sort_values("accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c
    # lineage carries over from the partial run and the resumed run must not
    # re-admit wave 0/1 urls: per-wave admitted totals equal the golden counts
    per_wave = collections.Counter()
    for r in resumed.lineage.to_pylist():
        per_wave[r["wave"]] += r["admitted"]
    want = collections.Counter(golden["wave"].to_pylist())
    assert per_wave == want


def test_crawl_with_output_sink(corpus, tmp_path, ray_session):
    """crawl(output_dir=...) lands facts as resumable ticker-partitioned
    Parquet; a re-run skips every finished partition."""
    import pyarrow.parquet as pq_

    from edgar_ray.stages.sink import finished_partitions

    seeds = pq_.read_table(corpus["seed_tickers"])
    out = str(tmp_path / "warehouse")
    res = crawl(corpus["pages"], seeds, num_shards=2, output_dir=out)
    n = res.filings_facts.count()
    gold = pq_.read_table(corpus["filings_golden"])
    assert n == gold.num_rows
    parts = finished_partitions(out, "ticker")
    assert parts == set(gold["ticker"].to_pylist())
    res2 = crawl(corpus["pages"], seeds, num_shards=2, output_dir=out)
    assert res2.metrics["wave_timings"]["sink"]["written_partitions"] == []
    assert sorted(res2.metrics["wave_timings"]["sink"]["skipped_partitions"]) \
        == sorted(parts)


def test_large_wave_join_path(corpus, ray_session):
    """join_threshold=0 forces every wave through the hash-partitioned
    Dataset.join fallback; results must equal the broadcast path exactly."""
    seeds = pq.read_table(corpus["seed_tickers"])
    res = crawl(corpus["pages"], seeds, num_shards=2, join_threshold=0)
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = res.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    facts = res.filings_facts.to_pandas().sort_values("accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "collected_ops", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c


def test_resume_completed_run(corpus, tmp_path, ray_session):
    """Resuming a FULLY-completed checkpointed run rebuilds filings_facts
    from the wave-2 facts checkpoint without refetching (frontier admits
    nothing; facts still match golden)."""
    seeds = pq.read_table(corpus["seed_tickers"])
    ckpt = str(tmp_path / "ckpt_full")
    first = crawl(corpus["pages"], seeds, num_shards=2, checkpoint_dir=ckpt)
    n_first = first.filings_facts.count()
    resumed = crawl(corpus["pages"], seeds, num_shards=2, checkpoint_dir=ckpt,
                    resume=True)
    assert resumed.filings_facts is not None
    facts = resumed.filings_facts.to_pandas().sort_values("accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == n_first == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c
    # nothing was re-fetched on resume
    assert resumed.metrics["pages_fetched"] == 0
    # crawl order restored from the per-wave checkpoints
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = resumed.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()


def test_politeness_deferred_counted(result):
    # host_budget=10 rps and >10 same-host urls per wave => some admissions
    # land >=1s past the wave start and are counted as deferred
    deferred = sum(r["politeness_deferred"] or 0 for r in result.lineage.to_pylist())
    assert deferred > 0


def test_fetch_error_accounting(corpus, ray_session):
    """Admitted urls missing from the pages table count as fetch errors
    (pages_err) instead of silently vanishing."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    seeds = pq.read_table(corpus["seed_tickers"])
    full = pq.read_table(corpus["pages"])
    # drop one R-report page from the "web"
    victim = next(u for u in full["url"].to_pylist() if "/R2.htm" in u)
    holey = full.filter(pc.not_equal(full["url"], victim))
    res = crawl(None, seeds, pages_ds_factory=lambda: rd.from_arrow(holey),
                num_shards=2)
    res.filings_facts.count()
    w2 = res.metrics["wave_timings"][2]
    assert w2["pages_err"] >= 1
    assert w2["pages_ok"] + w2["pages_err"] == w2["pages"]


def test_actor_pool_extract_variant(corpus, ray_session):
    """ExtractFactsActor (actor-pool form) produces byte-identical facts_raw
    to the stateless task form."""
    import ray.data as rd

    from edgar_ray.stages.extract import ExtractFactsActor, extract_facts

    pages = pq.read_table(corpus["pages"])
    import pyarrow.compute as pc
    reports = pages.filter(
        pc.match_substring(pages["url"], "/Archives/edgar/data/"))
    # attach the frontier metadata a fetched batch would carry
    import pyarrow as pa
    n = reports.num_rows
    meta = {
        "ticker": ["T"] * n, "cik": ["1"] * n, "accession": ["A"] * n,
        "filing_type": ["10-K"] * n, "filed_date": ["2018-01-01"] * n,
        "doc_type": ["Operations"] * n, "report_num": list(range(n)),
    }
    batch = reports.select(["url", "html"])
    for k, v in meta.items():
        typ = pa.int32() if k == "report_num" else pa.string()
        batch = batch.append_column(k, pa.array(v, typ))
    task_out = extract_facts(batch)
    ds = rd.from_arrow(batch).map_batches(
        ExtractFactsActor, batch_format="pyarrow", concurrency=(1, 2))
    actor_out = ds.to_pandas().sort_values("report_num").reset_index(drop=True)
    want = task_out.to_pandas().sort_values("report_num").reset_index(drop=True)
    assert actor_out.equals(want)


def test_resume_mid_wave2_partition_granularity(corpus, tmp_path, ray_session):
    """A run killed MID-wave-2 (some ticker facts partitions written with
    _DONE, others missing, no wave-level _DONE / manifest entry) resumes by
    refetching ONLY the unfinished partitions — and the merged facts still
    match golden."""
    import json as _json
    import os as _os
    import shutil as _shutil

    seeds = pq.read_table(corpus["seed_tickers"])
    # state as a kill mid-wave-2 leaves it: checkpoints (manifest, frontier,
    # next-candidates) from the END OF WAVE 1, plus SOME completed ticker
    # facts partitions (with their per-partition _DONE) and no wave-level
    # _DONE. Build it from a stop-after-wave-1 run + partitions copied from
    # a separate completed run.
    ckpt = str(tmp_path / "ckpt_kill_w2")
    crawl(corpus["pages"], seeds, num_shards=2, checkpoint_dir=ckpt,
          stop_after_wave=1)
    ckpt_full = str(tmp_path / "ckpt_full_w2")
    first = crawl(corpus["pages"], seeds, num_shards=2,
                  checkpoint_dir=ckpt_full)
    total_w2 = first.metrics["wave_timings"][2]["pages"]
    src = _os.path.join(ckpt_full, "wave2_facts_raw")
    facts_dir = _os.path.join(ckpt, "wave2_facts_raw")
    _os.makedirs(facts_dir, exist_ok=True)
    parts = sorted(p for p in _os.listdir(src) if p.startswith("ticker="))
    done_half = parts[len(parts) // 2:]
    for p in done_half:
        _shutil.copytree(_os.path.join(src, p), _os.path.join(facts_dir, p))

    resumed = crawl(corpus["pages"], seeds, num_shards=2,
                    checkpoint_dir=ckpt, resume=True)
    w2 = resumed.metrics["wave_timings"][2]
    # only the killed partitions' pages were refetched
    assert w2["pages_skipped"] > 0
    assert resumed.metrics["pages_fetched"] == total_w2 - w2["pages_skipped"]
    assert w2["pages_ok"] == total_w2 - w2["pages_skipped"]
    facts = resumed.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c
    # the wave-2 checkpoint persists the UNFILTERED admitted table (the
    # skip-done filter applies to the FETCH only): a later resume of the
    # finished run rebuilds crawl_order with every wave-2 row, no seq gaps
    w2_adm = pq.read_table(_os.path.join(ckpt, "wave2_admitted.parquet"))
    assert w2_adm.num_rows == total_w2
    seqs = sorted(w2_adm["seq"].to_pylist())
    assert seqs == list(range(seqs[0], seqs[0] + len(seqs)))


def test_multi_host_politeness_e2e(corpus, ray_session):
    """End-to-end host-global politeness across MULTIPLE hosts: odd-rank
    tickers' filing pages live on a mirror host (their query pages link
    absolutely to it; relative links on mirror pages resolve to the mirror
    via page-host absolutize). Asserts the per-host budget bites on BOTH
    hosts and facts still match golden."""
    import re as _re

    import numpy as np
    import pyarrow as pa_
    import ray.data as rd

    MIRROR = "https://mirror.sec.gov"
    full = pq.read_table(corpus["pages"])
    seeds = pq.read_table(corpus["seed_tickers"])
    odd_ciks = {int(c) for c, r in zip(seeds["cik"].to_pylist(),
                                       seeds["seed_rank"].to_pylist())
                if r % 2 == 1}
    odd_tickers = {t for t, r in zip(seeds["ticker"].to_pylist(),
                                     seeds["seed_rank"].to_pylist())
                   if r % 2 == 1}
    urls, htmls = [], []
    for url, html in zip(full["url"].to_pylist(), full["html"].to_pylist()):
        h = html.decode() if isinstance(html, bytes) else html
        m = (_re.search(r"[?&]cik=(\d+)", url)
             or _re.search(r"/data/(\d+)/", url))
        if m and int(m.group(1)) in odd_ciks:
            url = url.replace("https://www.sec.gov", MIRROR)
        qm = _re.search(r"CIK=(SYN\d+)", url)
        if qm and qm.group(1) in odd_tickers:
            h = h.replace('href="/cgi-bin/viewer',
                          f'href="{MIRROR}/cgi-bin/viewer')
        urls.append(url)
        htmls.append(h.encode())
    pages = pa_.table({"url": pa_.array(urls), "html": pa_.array(htmls, pa_.binary())})

    budget = 10.0
    res = crawl(None, seeds, pages_ds_factory=lambda: rd.from_arrow(pages),
                num_shards=2, host_budget=budget)
    order = res.crawl_order
    hosts = set(order["host"].to_pylist())
    assert hosts == {"www.sec.gov", "mirror.sec.gov"}  # mirror really crawled
    # host-global spacing: each host's scheduled_at slots are >= 1/budget
    # apart across the WHOLE crawl (budget carried across waves)
    for host in hosts:
        sched = np.sort(np.asarray(
            [s for s, h in zip(order["scheduled_at"].to_pylist(),
                               order["host"].to_pylist()) if h == host]))
        assert len(sched) > int(budget)  # enough urls that the budget bites
        gaps = np.diff(sched)
        assert (gaps >= (1.0 / budget) - 1e-9).all()
    # facts unchanged by the host split
    facts = res.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c


def test_distributed_admission_byte_match(corpus, ray_session):
    """admit_driver_threshold=0 forces EVERY wave through the distributed
    admission path (bucketed dedup + shard RPCs from tasks + Dataset.sort +
    block stamping); crawl order and facts must equal the driver path's
    golden exactly."""
    seeds = pq.read_table(corpus["seed_tickers"])
    res = crawl(corpus["pages"], seeds, num_shards=2, host_budget=10.0,
                admit_driver_threshold=0)
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = res.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    assert got["seq"].to_pylist() == golden["seq"].to_pylist()
    assert got["wave"].to_pylist() == golden["wave"].to_pylist()
    facts = res.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    gold = pq.read_table(corpus["filings_golden"]).to_pandas() \
        .sort_values("accession").reset_index(drop=True)
    assert len(facts) == len(gold)
    for c in ("ops_Revenue", "bs_Assets", "validation_error"):
        assert (facts[c].fillna(0) == gold[c].fillna(0)).all(), c
    # lineage totals identical to the driver path (dedup hits, robots,
    # politeness spacing)
    hits = sum(r["dedup_hits"] for r in res.lineage.to_pylist())
    assert hits == N_TICKERS * 2
    blocked = sum(r["robots_blocked"] for r in res.lineage.to_pylist())
    assert blocked > 0
    order = res.crawl_order
    times = sorted(order["scheduled_at"].to_pylist())
    assert (np.diff(np.sort(times)) >= 1.0 / 10.0 - 1e-9).all()


def test_distributed_admission_resume(corpus, tmp_path, ray_session):
    """kill-after-wave-1 / resume with the distributed admission path on
    both legs reproduces the golden crawl order."""
    seeds = pq.read_table(corpus["seed_tickers"])
    ckpt = str(tmp_path / "ckpt_dist")
    crawl(corpus["pages"], seeds, num_shards=2, checkpoint_dir=ckpt,
          stop_after_wave=1, admit_driver_threshold=0)
    resumed = crawl(corpus["pages"], seeds, num_shards=2,
                    checkpoint_dir=ckpt, resume=True,
                    admit_driver_threshold=0)
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = resumed.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    facts = resumed.filings_facts.to_pandas()
    gold = pq.read_table(corpus["filings_golden"]).to_pandas()
    assert len(facts) == len(gold)


def test_partial_merge_equals_per_page_merge(ray_session):
    """The map-side partial combiner + final partial reduce produces output
    identical to the legacy one-row-per-page merge, INCLUDING an accession
    whose pages are split across input batches (the cross-batch partial
    case) and priority inversions / all-zero facts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from edgar_ray.schema import DOC_BS, DOC_CF, DOC_EN, DOC_OPS, FACT_FIELDS, fact_col
    from edgar_ray.stages.extract import FACTS_RAW_FIELDS
    from edgar_ray.stages.merge import (_add_bucket, merge_bucket_group,
                                        merge_facts)

    fact_cols = [fact_col(f) for f in FACT_FIELDS]
    rng = np.random.default_rng(42)

    def page_row(ticker, acc, doc_type, repnum, nonzero_frac=0.5):
        row = {"ticker": ticker, "cik": f"c{ticker}", "accession": acc,
               "filing_type": "10-K", "filed_date": "2020-01-02",
               "doc_type": doc_type, "report_num": repnum}
        for c in fact_cols:
            row[c] = float(rng.integers(1, 500)) if rng.random() < nonzero_frac else 0.0
        for s in ("entity", "ops", "bs", "cf"):
            row[f"collected_{s}"] = int(rng.integers(0, 64))
        return row

    rows = []
    for t in range(6):
        for a in range(3):
            acc = f"000{t}-{a}"
            for rn, dt in enumerate([DOC_EN, DOC_OPS, DOC_BS, DOC_CF]):
                rows.append(page_row(f"T{t}", acc, dt, rn))
    # an accession with every fact zero everywhere
    rows.append(page_row("T0", "0000-zero", DOC_BS, 0, nonzero_frac=0.0))
    schema = pa.schema([(n, typ) for n, typ in FACTS_RAW_FIELDS])

    def tbl(rs):
        return pa.Table.from_pylist(rs, schema=schema)

    # split so accession "0002-1" (and others) straddle the batch boundary
    cut = len(rows) // 2 + 1
    split_ds = rd.from_arrow([tbl(rows[:cut]), tbl(rows[cut:])])
    legacy = (rd.from_arrow(tbl(rows))
              .map_batches(_add_bucket(16), batch_format="pyarrow")
              .groupby("merge_bucket")
              .map_groups(merge_bucket_group, batch_format="pyarrow")
              .to_pandas().sort_values("accession").reset_index(drop=True))
    new = (merge_facts(split_ds, num_buckets=16)
           .to_pandas().sort_values("accession").reset_index(drop=True))
    legacy = legacy[sorted(legacy.columns)]
    new = new[sorted(new.columns)]
    assert list(legacy.columns) == list(new.columns)
    for c in legacy.columns:
        assert (legacy[c].to_numpy() == new[c].to_numpy()).all(), c


def test_class_partitioned_pages_source(corpus, result, tmp_path, ray_session):
    """The one-time class-partitioned layout + wave-pruned factory produce a
    crawl byte-identical to the flat-table path: same crawl order, same
    facts. The layout is lossless (row counts per class sum to the input)."""
    import os

    import pyarrow.dataset as pads

    from edgar_ray.sources.pages_layout import (class_factory,
                                                partition_pages_by_class)

    layout = str(tmp_path / "pages_by_class")
    stats = partition_pages_by_class(corpus["pages"], layout)
    n_in = pq.read_table(corpus["pages"], columns=["url"]).num_rows
    assert stats["rows"] == n_in
    assert sum(stats["classes"].values()) == n_in
    # classes 0/1/2 populated; robots.txt lands in class 3
    assert set(stats["classes"]) == {0, 1, 2, 3}
    assert stats["classes"][3] == 1

    seeds = pq.read_table(corpus["seed_tickers"])
    res2 = crawl(corpus["pages"], seeds,
                 pages_ds_factory=class_factory(layout),
                 num_shards=2, host_budget=10.0)
    golden = pq.read_table(corpus["crawl_order_golden"])
    got = res2.crawl_order.sort_by([("seq", "ascending")])
    assert got["url"].to_pylist() == golden["url"].to_pylist()
    assert got["seq"].to_pylist() == golden["seq"].to_pylist()
    facts = res2.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    base = result.filings_facts.to_pandas().sort_values(
        "accession").reset_index(drop=True)
    assert len(facts) == len(base)
    for c in base.columns:
        assert (facts[c].fillna(0) == base[c].fillna(0)).all(), c
    # idempotent re-run serves the cached layout
    assert partition_pages_by_class(corpus["pages"], layout)["cached"]


def test_merge_facts_accepts_precombined_partials(ray_session):
    """merge_facts on input already run through partial_merge_batch (the
    fused wave-2 extract plan: count_pages=True, partials straddling batch
    boundaries) equals merge_facts on the per-page rows, and the
    pages_in_partial column both sums to the page count and never reaches
    the output."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from edgar_ray.schema import DOC_BS, DOC_CF, DOC_EN, DOC_OPS, FACT_FIELDS, fact_col
    from edgar_ray.stages.extract import FACTS_RAW_FIELDS
    from edgar_ray.stages.merge import merge_facts, partial_merge_batch

    fact_cols = [fact_col(f) for f in FACT_FIELDS]
    rng = np.random.default_rng(7)
    rows = []
    for t in range(5):
        for a in range(3):
            acc = f"111{t}-{a}"
            for rn, dt in enumerate([DOC_EN, DOC_OPS, DOC_BS, DOC_CF]):
                row = {"ticker": f"T{t}", "cik": f"c{t}", "accession": acc,
                       "filing_type": "10-Q", "filed_date": "2021-03-31",
                       "doc_type": dt, "report_num": rn}
                for c in fact_cols:
                    row[c] = (float(rng.integers(1, 900))
                              if rng.random() < 0.5 else 0.0)
                for s in ("entity", "ops", "bs", "cf"):
                    row[f"collected_{s}"] = int(rng.integers(0, 64))
                rows.append(row)
    schema = pa.schema([(n, typ) for n, typ in FACTS_RAW_FIELDS])
    tbl = pa.Table.from_pylist(rows, schema=schema)
    cut = len(rows) // 2 + 3  # accessions straddle the batch boundary
    combine = partial_merge_batch(16, count_pages=True)
    p1, p2 = combine(tbl.slice(0, cut)), combine(tbl.slice(cut))
    assert (sum(p1["pages_in_partial"].to_pylist())
            + sum(p2["pages_in_partial"].to_pylist())) == len(rows)
    fused = (merge_facts(rd.from_arrow([p1, p2]), num_buckets=16)
             .to_pandas().sort_values("accession").reset_index(drop=True))
    assert "pages_in_partial" not in fused.columns
    per_page = (merge_facts(rd.from_arrow(tbl), num_buckets=16)
                .to_pandas().sort_values("accession").reset_index(drop=True))
    fused = fused[sorted(fused.columns)]
    per_page = per_page[sorted(per_page.columns)]
    assert list(fused.columns) == list(per_page.columns)
    for c in fused.columns:
        assert (fused[c].to_numpy() == per_page[c].to_numpy()).all(), c
