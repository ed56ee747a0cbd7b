"""Command-line interface — the `reffy [options]` analog.

Mirrors the reference CLI surface (reference: reffy.js:80-151 and
README.md:100-140): crawl with module selection, post-process-only
mode (`--use-crawl`, specs-crawler.js:100-102,606-612), serial debug
mode (`--debug`, reffy.js:85), markdown summary (`--markdown`),
terse/quiet output, fallback crawl reuse and cache reset.

Usage:
    python -m reffy_ray.cli crawl [--output /tmp/out | -o '{return}']
        [--mode fixture|synth|http] [--http-base URL]
        [--seeds N] [--module name ...] [--markdown] [--debug]
        [--use-crawl FOLDER] [--fallback FOLDER] [--reset-cache]
        [--post name ...] [--quiet] [--terse]

Omitting --output (or passing '-' / '{return}') crawls into a scratch
folder and dumps the index JSON to stdout — the reference's
output:'{return}' magic (specs-crawler.js:590-596) and its
console-output default (reffy.js:104-108).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args) -> int:
    _init_ray(args.num_cpus)
    import pyarrow as pa

    from .pipelines.crawl import CrawlConfig
    from .pipelines.full_crawl import default_modules, full_crawl, markdown_report
    from .sources.corpus import fixture_seeds, scaled_seeds

    seeds = fixture_seeds() if args.mode != "synth" else scaled_seeds(args.seeds)

    modules = default_modules()
    if args.module:
        keep = set(args.module)
        modules = [m for m in modules if m.name in keep]

    cfg = CrawlConfig(
        mode=args.mode,
        http_base=args.http_base,
        # --debug: serial crawl, one document at a time (reffy.js:85)
        fetch_concurrency=1 if args.debug else args.concurrency,
        parse_concurrency=1 if args.debug else args.concurrency,
        batch_size=1 if args.debug else 128,
        # fresh crawl is the default (the reference's default too);
        # --resume opts into checkpoint continuation explicitly
        resume=args.resume and not args.reset_cache,
        # --release: crawl release URLs, skip no-release seeds
        use_release=args.release,
    )

    fallback = None
    cache_info = None
    if args.fallback:
        fallback, cache_info = _load_fallback_spans(args.fallback)

    if args.use_crawl:
        return cmd_post_process(args)

    # output:'{return}' magic (specs-crawler.js:590-596) / no --output
    # (reffy.js:104-108 console path): crawl into a scratch folder and
    # dump the full index JSON — results included — to stdout
    to_stdout = args.output in (None, "-", "{return}")
    out_dir = args.output
    if to_stdout:
        import tempfile

        out_dir = tempfile.mkdtemp(prefix="reffy_ray_crawl_")

    res = full_crawl(seeds, out_dir, cfg, modules=modules,
                     fallback_spans=fallback, cache_info=cache_info)
    if to_stdout:
        # '{return}' / no --output: the full index on stdout IS the
        # requested output — --terse trims it to stats, --quiet only
        # suppresses commentary, never the payload (reffy.js:104-108);
        # the scratch folder is named on stderr so extracts stay
        # reachable
        out = res.index if not args.terse else res.index.get("stats")
        print(json.dumps(out, indent=None if args.terse else 2))
        if not args.quiet:
            print(f"crawl folder: {res.out_dir}", file=sys.stderr)
    elif not args.quiet:
        out = res.index if not args.terse else res.index.get("stats")
        print(json.dumps(out, indent=None if args.terse else 2))
    if args.markdown:
        import ray.data as rd

        docs = rd.read_parquet(os.path.join(res.out_dir, "crawl", "documents"))
        md = markdown_report(res, docs)
        # args.output may be None/'-'/'{return}' (stdout mode): the
        # report lives next to the crawl, in the resolved folder
        md_path = os.path.join(res.out_dir, "report.md")
        with open(md_path, "w") as f:
            f.write(md)
        if not args.quiet:
            print(f"markdown report: {md_path}", file=sys.stderr)
    return 0


def _load_fallback_spans(folder: str) -> tuple[dict, dict]:
    """Previous crawl's documents parquet → ({url: spans} fallback map,
    {url: validator} cache_info). The --fallback reuse path
    (specs-crawler.js:421-427) and the crawl-cache reuse
    (specs-crawler.js:87-98) read the SAME checkpoint: the
    last_modified column is the persisted conditional-GET state."""
    import pyarrow.parquet as pq

    docs_dir = os.path.join(folder, "crawl", "documents")
    if not os.path.isdir(docs_dir):
        docs_dir = folder
    try:
        tbl = pq.read_table(
            docs_dir, columns=["url", "spans", "last_modified", "error"]
        )
        lms = tbl.column("last_modified").to_pylist()
        errs = tbl.column("error").to_pylist()
    except Exception:
        # pre-0.2.0 checkpoint without the validator column
        tbl = pq.read_table(docs_dir, columns=["url", "spans"])
        lms = [None] * tbl.num_rows
        errs = [None] * tbl.num_rows
    urls = tbl.column("url").to_pylist()
    spans = dict(zip(urls, tbl.column("spans").to_pylist()))
    # Validator harvest skips rows whose error column is set: the
    # reference refuses cacheInfo reuse for errored cache entries
    # (specs-crawler.js:89-98) — otherwise the next --fallback crawl
    # gets a 304 and SpanAssembler would resurrect the tainted spans
    # with error=None, silently clearing a persistent extraction error.
    # Spans stay in the fallback map (content substitution keeps the
    # error column, SpanAssembler path), but the doc is refetched.
    cache = {u: lm for u, lm, e in zip(urls, lms, errs) if lm and not e}
    return spans, cache


def cmd_post_process(args) -> int:
    """--use-crawl: skip the crawl, run post-processing over existing
    extracts (§3.2 lifecycle; specs-crawler.js:100-102,606-612)."""
    _init_ray(args.num_cpus)
    import ray.data as rd

    from .functions.webidl import parse_idl_batch
    from .post.backrefs import backrefs
    from .post.idlnames import idlnames

    base = args.use_crawl
    extracts_dir = os.path.join(base, "extracts")
    post_dir = os.path.join(base, "post")
    os.makedirs(post_dir, exist_ok=True)
    ran = []

    wanted = set(args.post or ["idlnames", "backrefs"])

    if "idlnames" in wanted and os.path.isdir(os.path.join(extracts_dir, "idl")):
        import pyarrow as pa
        import pyarrow.parquet as pq

        idl = rd.read_parquet(os.path.join(extracts_dir, "idl"))
        # plain task pool — scales elastically, no actor-pool churn
        parsed = idl.map_batches(parse_idl_batch, batch_format="pyarrow")

        def add_rank(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "seed_rank", pa.array([0] * batch.num_rows, pa.int64())
            )

        tbl = idlnames(parsed.map_batches(add_rank, batch_format="pyarrow"))
        pq.write_table(tbl, os.path.join(post_dir, "idlnames.parquet"))
        ran.append("idlnames")

    if (
        "backrefs" in wanted
        and os.path.isdir(os.path.join(extracts_dir, "links"))
        and os.path.isdir(os.path.join(extracts_dir, "dfns"))
    ):
        links = rd.read_parquet(os.path.join(extracts_dir, "links"))
        dfns = rd.read_parquet(os.path.join(extracts_dir, "dfns")).select_columns(
            ["doc_id", "id", "href", "type", "access"]
        )
        backrefs(links, dfns).write_parquet(os.path.join(post_dir, "backrefs"))
        ran.append("backrefs")

    if not args.quiet:
        print(json.dumps({"post_processed": ran}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="reffy-ray")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("crawl", help="crawl specs and extract all modules")
    c.add_argument("--output", "-o", default=None,
                   help="output folder; omit, '-' or '{return}' to dump the "
                        "crawl index JSON to stdout (output:'{return}' magic)")
    c.add_argument("--mode", choices=["fixture", "synth", "http"],
                   default="fixture")
    c.add_argument("--http-base", default=None,
                   help="mode=http: base URL of the fetch endpoint "
                        "(host-in-path mapping, crawl/mockserver.py)")
    c.add_argument("--seeds", type=int, default=100, help="synth seed count")
    c.add_argument("--module", "-m", action="append",
                   help="restrict to these extractor modules")
    c.add_argument("--post", action="append", help="post modules to run")
    c.add_argument("--use-crawl", help="skip crawl; post-process this folder")
    c.add_argument("--fallback", help="previous crawl folder for fallback reuse")
    c.add_argument("--resume", action="store_true",
                   help="continue from an existing checkpoint")
    c.add_argument("--reset-cache", action="store_true",
                   help="ignore any existing checkpoint (config.json resetCache)")
    c.add_argument("--release", action="store_true",
                   help="crawl release URLs; skip seeds without one")
    c.add_argument("--markdown", action="store_true", help="write report.md")
    c.add_argument("--debug", action="store_true", help="serial crawl")
    c.add_argument("--terse", action="store_true", help="stats only")
    c.add_argument("--quiet", action="store_true")
    c.add_argument("--concurrency", type=int, default=8)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(func=cmd_crawl)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    code = args.func(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return code


if __name__ == "__main__":
    raise SystemExit(main())
