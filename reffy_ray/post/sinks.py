"""Sinks: extract writer, crawl index, crawl-results merger.

- Extract writer (S6): one parquet directory per module under the
  output root, empty extracts skipped (reference:
  src/lib/specs-crawler.js:190-337, isEmpty at :313-317). Partitioned
  layout → a failed run skips finished modules (resumable output).
- Crawl index (S7): stats {crawled, errors} + crawler version
  (specs-crawler.js:620-668).
- Crawl merger (S8): anti-join new results against a reference crawl
  on url, union, sort by url, restats
  (src/cli/merge-crawl-results.js:41-95).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd


def extract_and_write(
    docs: rd.Dataset,
    module_fns: dict[str, "callable"],
    out_dir: str,
    compression: str = "zstd",
) -> dict[str, int]:
    """ONE streamed pass over the documents: every module extracted per
    batch with a single spans decode (stages/extract.extract_all), each
    module's rows written directly to <out>/<module>/part-*.parquet from
    the task. This is the resumable partitioned layout AND avoids the
    per-module re-execution + re-decode of running 13 separate module
    Datasets (each all-module pass costs ~1/3 of 13 separate ones).

    Caveat: a retried task could leave a duplicate part file; Ray task
    retries are off by default for this stage's deterministic input, and
    part names are content-addressed by the batch's first doc_id so a
    straight re-run overwrites rather than duplicates."""
    import pyarrow.parquet as _pq

    from ..stages.extract import extract_all

    os.makedirs(out_dir, exist_ok=True)
    for name in module_fns:
        os.makedirs(os.path.join(out_dir, name), exist_ok=True)

    def task(batch: pa.Table) -> pa.Table:
        tables = extract_all(batch, module_fns)
        first = (
            batch.column("doc_id")[0].as_py() if batch.num_rows else "empty"
        )
        token = str(first).replace("/", "_")[:60]
        counts = {}
        for name, tbl in tables.items():
            counts[name] = [len(tbl)]
            if len(tbl):
                _pq.write_table(
                    tbl,
                    os.path.join(out_dir, name, f"part-{token}.parquet"),
                    compression=compression,
                )
        return pa.table({k: pa.array(v, pa.int64()) for k, v in counts.items()})

    totals = docs.map_batches(task, batch_format="pyarrow").sum(list(module_fns))
    if totals is None:
        counts = {name: 0 for name in module_fns}
    elif isinstance(totals, dict):
        counts = {name: int(totals.get(f"sum({name})", 0) or 0) for name in module_fns}
    else:  # single module → scalar
        counts = {next(iter(module_fns)): int(totals or 0)}
    # drop empty module dirs (isEmpty skip, specs-crawler.js:313-317)
    for name, n in counts.items():
        mod_dir = os.path.join(out_dir, name)
        if n == 0 and os.path.isdir(mod_dir) and not os.listdir(mod_dir):
            os.rmdir(mod_dir)
    with open(os.path.join(out_dir, "modules.json"), "w") as f:
        json.dump(counts, f, indent=2, sort_keys=True)
    return counts


def write_extracts(
    extracts: dict[str, rd.Dataset], out_dir: str, compression: str = "zstd"
) -> dict[str, int]:
    """Write each module's Dataset under <out>/<module>/; returns row
    counts. Empty modules are skipped (isEmpty analog)."""
    counts: dict[str, int] = {}
    os.makedirs(out_dir, exist_ok=True)
    for module, ds in extracts.items():
        n = ds.count()
        counts[module] = n
        if n == 0:
            continue  # skip empty extracts (specs-crawler.js:313-317)
        ds.write_parquet(os.path.join(out_dir, module), compression=compression)
    with open(os.path.join(out_dir, "modules.json"), "w") as f:
        json.dump(counts, f, indent=2, sort_keys=True)
    return counts


def build_index(documents: rd.Dataset, crawler_version: str, options: dict | None = None) -> dict:
    """index.json equivalent (specs-crawler.js:623-637); date is the
    caller's responsibility (driver-side stamp)."""
    n = documents.count()

    def _err_count(batch: pa.Table) -> pa.Table:
        col = batch.column("error")
        return pa.table({"n": pa.array([len(col) - col.null_count], pa.int64())})

    n_err = documents.map_batches(_err_count, batch_format="pyarrow").sum("n") or 0
    return {
        "type": "crawl",
        "title": "Reffy-Ray crawl",
        "options": options or {},
        "stats": {"crawled": n, "errors": n_err},
        "crawler": crawler_version,
    }


def merge_crawl_results(
    reference: rd.Dataset, new: rd.Dataset, key: str = "url"
) -> rd.Dataset:
    """reference ⟕anti⟕ new on url → union → sort(url)
    (merge-crawl-results.js:41-95): rows of `reference` whose key
    appears in `new` are replaced by the new rows.

    Fully distributed: tag each side, union, hash-partition on the key
    and keep the new side per group — no driver-side key-set
    materialization (the previous broadcast anti-join collected every
    new url on the driver, which caps out when the re-crawl is itself
    huge). One groupby shuffle + the reference-mandated url sort."""
    import pandas as pd

    def tag(is_new: bool):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "_src_new", pa.array([is_new] * len(batch), pa.bool_())
            )

        return fn

    both = reference.map_batches(tag(False), batch_format="pyarrow").union(
        new.map_batches(tag(True), batch_format="pyarrow")
    )

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        if group["_src_new"].any():
            group = group[group["_src_new"]]
        return group.drop(columns=["_src_new"])

    return both.groupby(key).map_groups(pick, batch_format="pandas").sort(key)
