"""CLI surface: parser contract and the output:'{return}' magic
(reference: reffy.js:80-151; specs-crawler.js:590-596)."""

import json

from reffy_ray.cli import build_parser, cmd_crawl


def test_parser_defaults():
    args = build_parser().parse_args(["crawl"])
    assert args.output is None  # no --output → stdout dump path
    assert args.mode == "fixture"
    assert not args.terse and not args.quiet


def test_parser_http_mode_args():
    args = build_parser().parse_args(
        ["crawl", "--mode", "http", "--http-base", "http://127.0.0.1:1"]
    )
    assert args.mode == "http"
    assert args.http_base == "http://127.0.0.1:1"


def test_cli_return_magic_dumps_index(ray_session, capsys):
    # -o '{return}': crawl into scratch, index JSON on stdout
    args = build_parser().parse_args(["crawl", "-o", "{return}"])
    assert cmd_crawl(args) == 0
    out = capsys.readouterr().out
    # raylet chatter may precede the payload on stdout
    idx = json.loads(out[out.index("{"):])
    assert idx["type"] == "crawl"
    assert idx["stats"]["crawled"] == 5


def test_cli_terse_stats_only(ray_session, capsys, tmp_path):
    args = build_parser().parse_args(
        ["crawl", "-o", str(tmp_path / "out"), "--terse"]
    )
    assert cmd_crawl(args) == 0
    out = capsys.readouterr().out.strip()
    stats = json.loads(out[out.index("{"):])
    assert set(stats) == {"crawled", "errors"}
