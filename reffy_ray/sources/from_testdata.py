"""Bridge from the driver's testdata `documents` table to the span
corpus.

`/root/testdata/sf*/documents.parquet` is (doc_id:int64, text, lang,
source, n_chars). ``doc_html`` derives a deterministic HTML document
from each row; running it through the real SpanParser + extractors
yields extract tables whose contents are *SQL-predictable* — the
DuckDB oracles in ``__ray_entry__.oracle_sql`` state the same facts
directly over the raw table, so a value-hash match exercises the whole
fetch-free parse → span → extract path at sf scale.

Derivation rules (keep in sync with the oracle SQL!):
  title    = 'Doc <doc_id>'
  heading  = id 'sec<doc_id % 5>', level 2, number '<doc_id % 5>',
             title 'Section <doc_id % 5>'
  dfn      iff doc_id % 3 == 0: id 'term-<doc_id>', type 'dfn'
  link     iff doc_id % 7 == 0: href
             'https://specs.example.org/spec-<doc_id % 50>/#frag<doc_id % 11>'
  xref     iff doc_id % 5 == 4: link to
             'https://corpus.example.org/doc-<t>/#term-<t>' where
             t = doc_id - doc_id % 10 (a backref when t % 3 == 0 ∧ t ≠ doc_id)
  idl      iff doc_id % 11 == 0: 'interface I<doc_id> { };'
  figure   iff doc_id % 13 == 0: media_ref
             'https://img.example.org/doc-<doc_id>.png',
             caption 'Figure <doc_id>'
  base url = 'https://corpus.example.org/doc-<doc_id>/'
"""

from __future__ import annotations

import html as _html

import pyarrow as pa
import ray.data as rd

from ..schemas import SPAN_STRUCT
from ..stages.parse import spans_from_html


def base_url(doc_id: int) -> str:
    return f"https://corpus.example.org/doc-{doc_id}/"


def doc_html(doc_id: int, text: str) -> str:
    s = doc_id % 5
    parts = [
        f"<title>Doc {doc_id}</title>",
        f"<h2 id='sec{s}'><span class='secno'>{s}.</span> Section {s}</h2>",
        f"<p>{_html.escape(text or '')}</p>",
    ]
    if doc_id % 3 == 0:
        parts.append(
            f"<dfn id='term-{doc_id}' data-dfn-type='dfn'>term {doc_id}</dfn>"
        )
    if doc_id % 7 == 0:
        parts.append(
            f"<a href='https://specs.example.org/spec-{doc_id % 50}/#frag{doc_id % 11}'>x</a>"
        )
    if doc_id % 5 == 4:
        t = doc_id - doc_id % 10
        parts.append(
            f"<a href='https://corpus.example.org/doc-{t}/#term-{t}'>xref</a>"
        )
    if doc_id % 11 == 0:
        parts.append(f"<pre class='idl'>interface I{doc_id} {{ }};</pre>")
    if doc_id % 13 == 0:
        parts.append(
            f"<figure><img src='https://img.example.org/doc-{doc_id}.png'>"
            f"<figcaption>Figure {doc_id}</figcaption></figure>"
        )
    return "".join(parts)


class TestdataSpanParser:
    """map_batches stage: (doc_id:int64, text) → documents span rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        spans_col, urls = [], []
        for i, t in zip(ids, texts):
            url = base_url(i)
            urls.append(url)
            spans_col.append(spans_from_html(doc_html(i, t), url))
        return pa.table(
            {
                "doc_id": pa.array([str(i) for i in ids], pa.string()),
                "spans": pa.array(spans_col, pa.list_(SPAN_STRUCT)),
                "url": pa.array(urls, pa.string()),
            }
        )


def span_documents(sf_dir: str, concurrency: int = 4) -> rd.Dataset:
    """sf documents table → span-table Dataset (columns pruned at read).

    Fixed-size actor pool (autoscaling pools under-provision; see
    pipelines/crawl.py); num_cpus=0.5 keeps a 4-actor pool viable on a
    4-CPU test session while a bench caller passes a bigger pool."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_blocks = max(4, int(concurrency) * 4)
    return ds.repartition(n_blocks).map_batches(
        TestdataSpanParser,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=0.5,
    )
