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
    appears in `new` are replaced by the new rows."""
    import ray

    new_keys_ref = ray.put(set(
        r[key] for r in new.select_columns([key]).take_all()
    ))

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(new_keys_ref)
        mask = [k not in keys for k in batch.column(key).to_pylist()]
        return batch.filter(pa.array(mask))

    kept = reference.map_batches(anti, batch_format="pyarrow")
    return kept.union(new).sort(key)
