"""The full pipeline: crawl → extract → post-process → write.

Equivalent of `reffy [options]` (reference: src/lib/specs-crawler.js
crawlSpecs → crawlList → saveSpecResults → post modules; lifecycle
SURVEY.md §3.1). Also hosts the user-extension surface (§2.10):
custom extractor modules and post-processors register like Reffy's
`--module` / custom post-processors (reference: src/lib/util.js:104-180
expandBrowserModules; src/lib/post-processor.js:17-48).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import ray.data as rd

from ..functions.scalars import camel_case_module_name
from ..functions.webidl import parse_idl_batch
from ..post.annotate_links import annotate_links
from ..post.backrefs import backrefs
from ..post.csscomplete import complete_css
from ..post.cssmerge import merge_css
from ..post.events import consolidate_events
from ..post.idlnames import idlnames
from ..post.series import reduce_extracts_per_series
from ..post.sinks import build_index, extract_and_write, write_extracts
from ..stages.extract import EXTRACTORS, extract_all
from .crawl import CRAWLER_VERSION, CrawlConfig, crawl


@dataclass
class ExtractorModule:
    """A browser-module analog (reffy.json registry entry:
    src/browserlib/reffy.json:1-85). ``fn`` maps a documents batch (or
    pre-decoded docs list) to the module's extract table."""

    name: str
    fn: Callable
    extracts_per_series: bool = False  # reffy.json `extractsPerSeries`


@dataclass
class PostProcessor:
    """Custom post-processor plugin (post-processor.js:17-48):
    ``level`` ∈ {'doc', 'crawl'}; doc-level runs as a map stage over
    one module's Dataset, crawl-level receives the dict of extract
    Datasets and returns a table/Dataset."""

    name: str
    depends_on: list[str]
    level: str
    run: Callable


def default_modules() -> list[ExtractorModule]:
    return [
        ExtractorModule(name, fn, extracts_per_series=name in ("idl", "css"))
        for name, fn in EXTRACTORS.items()
    ]


def register_module(modules: list[ExtractorModule], path_or_name: str, fn,
                    **flags) -> list[ExtractorModule]:
    """`--module [folder:]path.mjs` analog (reffy.js:188-225): module
    name derived by camel-casing the file name (util.js:106-121)."""
    name = camel_case_module_name(path_or_name)
    return modules + [ExtractorModule(name, fn, **flags)]


@dataclass
class FullCrawlResult:
    out_dir: str
    counts: dict = field(default_factory=dict)
    index: dict = field(default_factory=dict)
    crawl_stats: dict = field(default_factory=dict)


def full_crawl(
    seeds: pa.Table,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    modules: list[ExtractorModule] | None = None,
    post_processors: list[PostProcessor] | None = None,
    run_post: bool = True,
    fallback_spans: dict | None = None,
    cache_info: dict | None = None,
    validate: bool = False,
) -> FullCrawlResult:
    """Crawl the seeds, extract every module, run post-processing,
    write everything under ``out_dir`` (documents/, extracts/<module>/,
    post/<name>/, index.json)."""
    from dataclasses import replace as _replace

    # private copy: this function tunes checkpoint/extract fields, and
    # mutating the caller's config would poison its reuse (a second
    # full_crawl with the same cfg would see extract_modules set and
    # extracts_dir pointing at the FIRST run's output)
    cfg = _replace(cfg) if cfg is not None else CrawlConfig()
    if cfg.checkpoint_dir is None:
        cfg.checkpoint_dir = os.path.join(out_dir, "crawl")
    modules = modules or default_modules()
    extracts_dir = os.path.join(out_dir, "extracts")
    if cfg.fused_drop_spans:
        raise ValueError(
            "full_crawl needs the spans column downstream (css "
            "consolidation, custom extract passes) — fused_drop_spans "
            "is for spans-free consumers driving crawl() directly"
        )
    # this pipeline owns out_dir/extracts: crawl()'s fresh-start wipe
    # clears it (stale part files from a previous run with a different
    # module set or batching would otherwise be read back alongside the
    # new ones); pointing the crawl at it covers the non-fused path too
    cfg.extracts_dir = extracts_dir

    # fused extraction (the reference's in-page-module shape): when
    # every module is a stock extractor, run them INSIDE the crawl's
    # fetch+parse tasks — the span table is already in each worker's
    # heap, so the separate extract pass (a full re-stream of the
    # corpus through the object store) disappears. Custom module fns
    # fall back to the streamed extract_and_write pass.
    stock = cfg.extract_modules is None and all(
        EXTRACTORS.get(m.name) is m.fn for m in modules
    )
    if stock:
        cfg.extract_modules = tuple(m.name for m in modules)

    res = crawl(seeds, cfg, fallback_spans=fallback_spans, cache_info=cache_info)
    # stream the crawl output: in-memory round blocks when fresh, the
    # checkpoint parquet otherwise — never force a second materialization
    # of the full corpus (at 100 TB the extract passes must stream)
    docs = res.documents()

    if stock:
        # totals from parquet footers only — the rows are already on disk
        import glob as _glob

        import pyarrow.parquet as _pq

        counts = {
            m.name: sum(
                _pq.read_metadata(f).num_rows
                for f in _glob.glob(
                    os.path.join(extracts_dir, m.name, "round=*", "*.parquet")
                )
            )
            for m in modules
        }
    else:
        # single streamed pass: all modules extracted per batch (one
        # spans decode) and written straight to the partitioned layout
        counts = extract_and_write(
            docs, {m.name: m.fn for m in modules}, extracts_dir
        )
    extracts: dict[str, rd.Dataset] = {
        # partitioning=None: the fused layout nests round=N dirs purely
        # for resume bookkeeping — hive inference would otherwise add a
        # spurious 'round' column to every extract schema
        name: rd.read_parquet(os.path.join(extracts_dir, name), partitioning=None)
        for name, n in counts.items()
        if n > 0
    }

    validation: dict[str, int] = {}
    if validate:
        # Ajv-analog structural validation of every extract table
        # (src/lib/util.js:1065-1140), run as a streamed stage
        from ..stages.validate import validate_extracts

        validation = validate_extracts(extracts)

    post_out: dict[str, object] = {}
    if run_post:
        post_dir = os.path.join(out_dir, "post")
        os.makedirs(post_dir, exist_ok=True)

        if "dfns" in extracts:
            # spec-level dfn patches (patch-dfns.js:13-51) run FIRST so
            # every downstream dfns consumer (idl_dfn_links, backrefs)
            # sees the patched view — lazy stage, near-free when no
            # patched spec is in the crawl
            from ..post.patch_dfns import patch_dfns

            extracts["dfns"] = patch_dfns(extracts["dfns"])

        if "links" in extracts:
            annotated = annotate_links(extracts["links"], seeds)
            annotated.write_parquet(os.path.join(post_dir, "annotated_links"))
            post_out["annotated_links"] = annotated

        if "idl" in extracts:
            parsed = extracts["idl"].map_batches(
                parse_idl_batch, batch_format="pyarrow"
            ).materialize()
            parsed.write_parquet(os.path.join(post_dir, "idlparsed"))
            post_out["idlparsed"] = parsed

            rank_by_doc = dict(
                zip(seeds.column("shortname").to_pylist(),
                    seeds.column("seed_rank").to_pylist())
            )

            def add_rank(batch: pa.Table) -> pa.Table:
                ranks = [rank_by_doc.get(d, 0)
                         for d in batch.column("doc_id").to_pylist()]
                return batch.append_column("seed_rank", pa.array(ranks, pa.int64()))

            names_tbl = idlnames(parsed.map_batches(add_rank, batch_format="pyarrow"))
            import pyarrow.parquet as pq

            pq.write_table(names_tbl, os.path.join(post_dir, "idlnames.parquet"))
            post_out["idlnames"] = names_tbl

        if "idl" in extracts and "dfns" in extracts and "idlparsed" in post_out:
            from ..post.idlparsed_link import link_idlparsed_to_dfns

            linked = link_idlparsed_to_dfns(
                post_out["idlparsed"],
                extracts["dfns"].select_columns(
                    ["doc_id", "id", "href", "linking_text", "type", "for", "access"]
                ),
            )
            linked.write_parquet(os.path.join(post_dir, "idl_dfn_links"))
            post_out["idl_dfn_links"] = linked

        if "links" in extracts and "dfns" in extracts:
            br = backrefs(
                extracts["links"],
                extracts["dfns"].select_columns(
                    ["doc_id", "id", "href", "type", "access"]
                ),
            )
            br.write_parquet(os.path.join(post_dir, "backrefs"))
            post_out["backrefs"] = br

        if "css" in extracts:
            # keep the csscomplete per-row view (styleDeclaration per
            # property) as its own extract completion
            post_out["css_completed"] = complete_css(extracts["css"])
            # the consolidation consumes whole per-spec css structs
            # (css-data span) + series metadata from the seeds
            import json as _json

            import pandas as _pd

            meta = {
                row["shortname"]: row
                for row in seeds.to_pylist()
            }

            def spec_rows(batch: _pd.DataFrame) -> _pd.DataFrame:
                out = {
                    "doc_id": [], "crawl_rank": [], "css_json": [],
                    "shortname": [], "series_shortname": [],
                    "series_version": [], "crawled": [], "url": [],
                }
                for _, row in batch.iterrows():
                    spans = row["spans"]
                    if spans is None or len(spans) == 0:
                        continue
                    css_json = next(
                        (
                            sp["text"]
                            for sp in spans
                            if sp["kind"] == "css-data"
                        ),
                        None,
                    )
                    if not css_json:
                        continue
                    m = meta.get(row["doc_id"], {})
                    out["doc_id"].append(row["doc_id"])
                    out["crawl_rank"].append(int(m.get("seed_rank", 0) or 0))
                    out["css_json"].append(css_json)
                    out["shortname"].append(row["doc_id"])
                    out["series_shortname"].append(
                        m.get("series_shortname") or row["doc_id"]
                    )
                    out["series_version"].append(
                        str(m.get("series_version") or "")
                    )
                    out["crawled"].append(row.get("url") or m.get("url"))
                    out["url"].append(m.get("url"))
                return _pd.DataFrame(out)

            spec_ds = docs.map_batches(spec_rows, batch_format="pandas")
            merged = merge_css(spec_ds)
            import pyarrow.parquet as pq

            pq.write_table(merged, os.path.join(post_dir, "css.parquet"))
            post_out["css_merged"] = merged

        if "events" in extracts:
            consolidated = consolidate_events(
                extracts["events"], post_out.get("idlparsed")
            )
            import pyarrow.parquet as pq

            pq.write_table(consolidated, os.path.join(post_dir, "events.parquet"))
            post_out["events_consolidated"] = consolidated

        # extractsPerSeries reduction (A2) for idl/css
        for m in modules:
            if not m.extracts_per_series or m.name not in extracts:
                continue
            # distributed distinct; only the (small) per-spec id list
            # reaches the driver
            with_extract = set(extracts[m.name].unique("doc_id"))
            reduced = reduce_extracts_per_series(
                extracts[m.name], seeds, with_extract
            )
            reduced.write_parquet(os.path.join(post_dir, f"{m.name}_per_series"))
            post_out[f"{m.name}_per_series"] = reduced

        for pp in post_processors or []:
            out = pp.run(extracts, post_out)
            post_out[pp.name] = out

    index = build_index(rd.read_parquet(res.documents_path), CRAWLER_VERSION)
    with open(os.path.join(out_dir, "index.json"), "w") as f:
        json.dump(index, f, indent=2)

    result = FullCrawlResult(
        out_dir=out_dir, counts=counts, index=index, crawl_stats=res.stats
    )
    if validate:
        result.index["validation"] = validation
    return result


def markdown_report(
    result: FullCrawlResult,
    documents: rd.Dataset,
    extracts_dir: str | None = None,
    idlparsed_by_doc: dict[str, dict] | None = None,
) -> str:
    """Human-readable crawl summary (S9, src/lib/markdown-report.js):
    crawl-level stats, then a full per-spec `generateSpecReport` block
    (metadata, "Spec defines:", missing modules, <details> sections)
    when ``extracts_dir`` is given."""
    lines = ["# Crawl report", ""]
    stats = result.index.get("stats", {})
    lines.append(
        f"Crawled {stats.get('crawled', 0)} documents, "
        f"{stats.get('errors', 0)} errors."
    )
    lines.append("")
    lines.append("## Extract counts")
    for mod, n in sorted(result.counts.items()):
        lines.append(f"- **{mod}**: {n} rows")
    lines.append("")
    lines.append("## Documents")
    doc_rows = list(
        documents.select_columns(["doc_id", "url", "error"]).sort("doc_id")
        .iter_rows()
    )
    for r in doc_rows:
        status = f"error: {r['error']}" if r["error"] else "ok"
        lines.append(f"- `{r['doc_id']}` <{r['url']}> — {status}")

    if extracts_dir is not None:
        from ..post.report import generate_spec_report

        # per-spec extract rows: one pandas pass per module (extract
        # tables are orders of magnitude smaller than the corpus)
        by_doc: dict[str, dict[str, list[dict]]] = {}
        for mod in sorted(result.counts):
            if result.counts[mod] == 0:
                continue
            path = os.path.join(extracts_dir, mod)
            if not os.path.isdir(path):
                continue
            # partitioning=None: fused layout nests round= bookkeeping
            # dirs — hive inference would inject a spurious column
            for row in rd.read_parquet(path, partitioning=None).iter_rows():
                by_doc.setdefault(row["doc_id"], {}).setdefault(mod, []).append(row)
        for r in doc_rows:
            lines.append("")
            lines.append(f"## {r['doc_id']}")
            lines.append(
                generate_spec_report(
                    {"url": r["url"]},
                    by_doc.get(r["doc_id"], {}),
                    (idlparsed_by_doc or {}).get(r["doc_id"]),
                )
            )
    return "\n".join(lines) + "\n"
