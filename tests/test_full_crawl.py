"""End-to-end full pipeline test (crawl → extract → post → write),
the `reffy [options]` lifecycle analog (SURVEY.md §3.1)."""

import json
import os

import pytest

from reffy_ray.pipelines.crawl import CrawlConfig
from reffy_ray.pipelines.full_crawl import (
    ExtractorModule,
    default_modules,
    full_crawl,
    markdown_report,
    register_module,
)
from reffy_ray.sources.corpus import fixture_seeds


@pytest.fixture(scope="module")
def result(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("full_crawl"))
    cfg = CrawlConfig(mode="fixture", num_seen_shards=4, num_gates=2)
    return full_crawl(fixture_seeds(), out, cfg), out


def test_extract_dirs_written(result):
    res, out = result
    assert os.path.isdir(os.path.join(out, "extracts", "idl"))
    assert os.path.isdir(os.path.join(out, "extracts", "dfns"))
    # empty modules skipped (S6, specs-crawler.js:313-317)
    assert res.counts["cddl"] == 0
    assert not os.path.isdir(os.path.join(out, "extracts", "cddl"))


def test_index_json(result):
    res, out = result
    with open(os.path.join(out, "index.json")) as f:
        idx = json.load(f)
    assert idx["stats"]["crawled"] == 5
    assert idx["stats"]["errors"] == 0
    assert idx["crawler"].startswith("reffy-ray-")


def test_post_outputs(result):
    res, out = result
    post = os.path.join(out, "post")
    assert os.path.isdir(os.path.join(post, "annotated_links"))
    assert os.path.isdir(os.path.join(post, "idlparsed"))
    assert os.path.exists(os.path.join(post, "idlnames.parquet"))
    assert os.path.exists(os.path.join(post, "css.parquet"))
    assert os.path.exists(os.path.join(post, "events.parquet"))
    import pyarrow.parquet as pq

    names = pq.read_table(os.path.join(post, "idlnames.parquet")).to_pylist()
    by_name = {r["name"]: r for r in names}
    assert by_name["Foo"]["defined_in"] == "audio-output"
    assert by_name["Example"]["defined_in"] == "example-events"


def test_series_reduction_output(result):
    res, out = result
    assert os.path.isdir(os.path.join(out, "post", "idl_per_series"))


def test_markdown_report(result, ray_session):
    import ray.data as rd

    res, out = result
    docs = rd.read_parquet(os.path.join(out, "crawl", "documents"))
    md = markdown_report(res, docs)
    assert "# Crawl report" in md
    assert "Crawled 5 documents, 0 errors." in md
    assert "`WOFF2`" in md


def test_custom_module_registration():
    import pyarrow as pa

    def my_extractor(batch):
        return pa.table({"doc_id": pa.array([], pa.string())})

    mods = register_module(default_modules(), "extract-my-thing.mjs", my_extractor)
    assert mods[-1].name == "extractMyThing"  # util.js:106-121 camelCase
    assert mods[-1].fn is my_extractor


def test_validation_stage_green_on_fixture(tmp_path, ray_session):
    """Ajv-analog validation (stages/validate.py) passes on every
    module's fixture-corpus output."""
    import ray.data as rd

    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import full_crawl
    from reffy_ray.sources.corpus import fixture_seeds

    res = full_crawl(
        fixture_seeds(),
        str(tmp_path / "out"),
        CrawlConfig(mode="fixture", num_seen_shards=2, num_gates=1),
        run_post=False,
        validate=True,
    )
    validation = res.index["validation"]
    assert validation, "no modules validated"
    assert all(n == 0 for n in validation.values()), validation


def test_validate_extract_table_catches_drift():
    import pyarrow as pa

    from reffy_ray import schemas
    from reffy_ray.stages.validate import validate_extract_table

    good = pa.table(
        {
            "doc_id": ["d"], "name": ["a"],
            "href": ["https://x/#a"], "rationale": [".algorithm"],
            "steps_json": ['{"html": "x", "steps": [{"html": "y"}]}'],
        },
        schema=schemas.EXTRACTS_ALGORITHMS,
    )
    assert validate_extract_table("algorithms", good) == []
    bad = good.set_column(
        4, "steps_json",
        pa.array(['{"steps": [{"bogus": 1}]}'], pa.large_string()),
    )
    errs = validate_extract_table("algorithms", bad)
    assert errs and "unknown keys" in errs[0]


def test_markdown_spec_report(tmp_path, ray_session):
    """Per-spec markdown report parity (markdown-report.js
    generateSpecReport shape)."""
    import ray.data as rd

    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import full_crawl, markdown_report
    from reffy_ray.sources.corpus import fixture_seeds

    out = str(tmp_path / "out")
    res = full_crawl(
        fixture_seeds(), out,
        CrawlConfig(mode="fixture", num_seen_shards=2, num_gates=1),
        run_post=False,
    )
    docs = rd.read_parquet(out + "/crawl/documents")
    md = markdown_report(res, docs, extracts_dir=out + "/extracts")
    assert "Crawl summary:" in md
    assert "- Canonical URL: [" in md
    assert "- Spec defines:" in md
    assert "definitions found" in md       # "No X definitions found"
    # css fixture has a propdef → a details section with an xref link
    assert "<details>" in md
    assert "respec.org/xref" in md
    # dfns access split appears for the woff2 private dfn
    assert "private" in md


def test_generate_spec_report_idl_details():
    from reffy_ray.post.report import generate_spec_report

    md = generate_spec_report(
        {"url": "https://x.example/", "crawled": "https://x.example/nightly"},
        {
            "idl": [{"doc_id": "d", "idl": "interface Foo {};"}],
            "dfns": [
                {"doc_id": "d", "id": "t", "href": "https://x.example/#t",
                 "linking_text": ["term"], "type": "dfn", "for": [],
                 "access": "public"},
            ],
        },
        idlparsed={
            "idlNames": {"Foo": {"type": "interface"}},
            "idlExtendedNames": {"Bar": [{"type": "interface"}]},
            "globals": {"Window": ["Foo"]},
        },
    )
    assert "- Crawled URL: [https://x.example/nightly]" in md
    assert "2 names (or partials), 1 global" in md
    assert "1 Web IDL name" in md
    assert "1 extended Web IDL name" in md
    assert "1 explicitly exported term" in md
    assert "- interface `Foo` ([xref search]" in md


def test_full_crawl_does_not_mutate_caller_cfg(ray_session, tmp_path):
    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import full_crawl
    from reffy_ray.sources.corpus import fixture_seeds

    cfg = CrawlConfig(mode="fixture")
    full_crawl(fixture_seeds(), str(tmp_path / "o1"), cfg, run_post=False)
    assert cfg.extract_modules is None
    assert cfg.extracts_dir is None
    assert cfg.checkpoint_dir is None
    # same cfg reused into a second out_dir: both runs complete and the
    # second run's extracts land in ITS OWN tree
    res2 = full_crawl(fixture_seeds(), str(tmp_path / "o2"), cfg, run_post=False)
    assert res2.counts["headings"] > 0
    import os

    assert os.path.isdir(str(tmp_path / "o2" / "extracts" / "headings"))


def test_full_crawl_rejects_drop_spans(ray_session, tmp_path):
    import pytest as _pytest

    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import full_crawl
    from reffy_ray.sources.corpus import fixture_seeds

    with _pytest.raises(ValueError, match="fused_drop_spans"):
        full_crawl(fixture_seeds(), str(tmp_path / "o"),
                   CrawlConfig(mode="fixture", fused_drop_spans=True))


def test_full_crawl_module_set_switch_no_stale_extracts(ray_session, tmp_path):
    """Re-running into the same out_dir with a different module set must
    not read back the previous run's extract part files."""
    from reffy_ray.pipelines.crawl import CrawlConfig
    from reffy_ray.pipelines.full_crawl import ExtractorModule, full_crawl
    from reffy_ray.sources.corpus import fixture_seeds
    from reffy_ray.stages.extract import EXTRACTORS

    out = str(tmp_path / "same_out")
    r1 = full_crawl(fixture_seeds(), out, CrawlConfig(mode="fixture"),
                    run_post=False)
    assert r1.counts["headings"] > 0

    # custom (non-stock) single-module run into the SAME out_dir
    custom = [ExtractorModule("headings", EXTRACTORS["headings"])]

    def wrapped(docs):
        return EXTRACTORS["headings"](docs)

    custom = [ExtractorModule("headings", wrapped)]  # non-stock fn
    r2 = full_crawl(fixture_seeds(), out, CrawlConfig(mode="fixture"),
                    modules=custom, run_post=False)
    # counts must equal a single clean run, not doubled by stale parts
    assert r2.counts["headings"] == r1.counts["headings"]
    import os

    assert not os.path.isdir(os.path.join(out, "extracts", "dfns"))
