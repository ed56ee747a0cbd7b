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
  meta     generator 'bikeshed' iff doc_id % 4 == 0, 'respec' iff % 4 == 2;
           revision 'rev-<doc_id>' iff doc_id % 6 == 1;
           date '2026-03-15' iff doc_id % 5 == 2
  refs     iff doc_id % 6 == 0: normative ref '[REF<doc_id % 9>]' →
             'https://refs.example.org/ref-<doc_id % 9>/' — bikeshed
             '#normative + dl' when %4==0, respec
             '#normative-references > dl' when %4==2
           iff doc_id % 6 == 3: informative ref '[XREF<doc_id % 9>]' →
             'https://refs.example.org/iref-<doc_id % 9>/' (generic
             'Informative references' heading + dl)
           (the <dd> link also lands in the links extract)
  css      iff doc_id % 8 == 0: propdef table, property 'p<doc_id % 20>',
             dfn id 'propdef-p<doc_id>' (type 'property' → also a dfn row)
           iff doc_id % 16 == 0: pre.prod typed-dfn rule '<len<doc_id % 6>> = px | em'
  event    iff doc_id % 9 == 0: def-table type 'ev<doc_id % 7>',
             interface 'Event', bubbles yes, id 'eventdef-<doc_id>'
  algo     iff doc_id % 12 == 0: ol.algorithm id 'algo-<doc_id>',
             name 'compute <doc_id>', intro 'To run algorithm <doc_id>:',
             steps ['Let x be <doc_id>.', 'Return x.']
  cddl     iff doc_id % 14 == 0: module 'modA', 'msg<doc_id> = tstr'
  element  iff doc_id % 15 == 0: heading dfn id 'eldef-<doc_id>'
             (type 'dfn' → also a dfn row), element 'x-el<doc_id>',
             interface 'HTMLElement'
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
    parts = []
    if doc_id % 4 == 0:
        parts.append("<meta name='generator' content='Bikeshed version 3'>")
    elif doc_id % 4 == 2:
        parts.append("<meta name='generator' content='ReSpec'>")
    if doc_id % 6 == 1:
        parts.append(f"<meta name='revision' content='rev-{doc_id}'>")
    if doc_id % 5 == 2:
        parts.append("<meta name='dcterms.date' content='2026-03-15'>")
    parts += [
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
    if doc_id % 6 == 0:
        # normative refs: %6==0 docs are even, so the generator is
        # always bikeshed (%4==0: '#normative + dl') or respec
        # (%4==2: '#normative-references > dl')
        k = doc_id % 9
        dl = (
            f"<dl><dt>[REF{k}]</dt>"
            f"<dd><a href='https://refs.example.org/ref-{k}/'>Reference {k}</a></dd>"
            "</dl>"
        )
        if doc_id % 4 == 0:
            parts.append(f"<div id='normative'></div>{dl}")
        else:
            parts.append(f"<section id='normative-references'>{dl}</section>")
    elif doc_id % 6 == 3:
        # informative refs: %6==3 docs are odd → no generator meta →
        # the generic heading-scan path
        k = doc_id % 9
        parts.append(
            "<h3>Informative references</h3><dl>"
            f"<dt>[XREF{k}]</dt>"
            f"<dd><a href='https://refs.example.org/iref-{k}/'>Reference {k}</a></dd>"
            "</dl>"
        )
    if doc_id % 8 == 0:
        parts.append(
            "<table class='propdef'>"
            f"<tr><th>Name:</th><td><dfn id='propdef-p{doc_id}' "
            f"data-dfn-type='property'>p{doc_id % 20}</dfn></td></tr>"
            "<tr><th>Value:</th><td>none | auto</td></tr>"
            "<tr><th>Initial:</th><td>none</td></tr>"
            "</table>"
        )
    if doc_id % 16 == 0:
        # typed dfn inside the production rule — a bare rule with no dfn
        # is a "Missing definition" warning in the reference model
        parts.append(
            f"<pre class='prod'><dfn data-dfn-type='type'>&lt;len{doc_id % 6}&gt;</dfn>"
            " = px | em</pre>"
        )
    if doc_id % 9 == 0:
        parts.append(
            # css-nav-1-style def table: bare row labels (the reference
            # matches th text "Bubbles" exactly, extract-events.mjs:147)
            f"<table class='def' id='eventdef-{doc_id}'>"
            f"<tr><th>Type</th><td>ev{doc_id % 7}</td></tr>"
            "<tr><th>Interface</th><td>Event</td></tr>"
            "<tr><th>Bubbles</th><td>Yes</td></tr>"
            "</table>"
        )
    if doc_id % 12 == 0:
        parts.append(
            f"<p>To run algorithm {doc_id}:</p>"
            f"<ol class='algorithm' id='algo-{doc_id}' "
            f"data-algorithm='compute {doc_id}'>"
            f"<li>Let x be {doc_id}.</li><li>Return x.</li></ol>"
        )
    if doc_id % 14 == 0:
        parts.append(
            f"<pre class='cddl' data-cddl-module='modA'>msg{doc_id} = tstr</pre>"
        )
    if doc_id % 15 == 0:
        parts.append(
            f"<h3><dfn id='eldef-{doc_id}'>x-el{doc_id}</dfn></h3>"
            "<dl class='element'><dt>DOM interface:</dt>"
            "<dd><code>HTMLElement</code></dd></dl>"
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


_PARSER_SINGLETON = TestdataSpanParser()


def parse_testdata_batch(batch: pa.Table) -> pa.Table:
    return _PARSER_SINGLETON(batch)


def span_documents(sf_dir: str, concurrency: int | None = None) -> rd.Dataset:
    """sf documents table → span-table Dataset (columns pruned at read).

    Runs as plain tasks (the parser is stateless): a fresh actor pool
    here intermittently stalled ~15 s waiting for a previous stage's
    dying pool to release its CPUs, and the task pool scales
    elastically to the session's CPUs. ``concurrency`` only sizes the
    block split now."""
    from ..util import pool_size

    if concurrency is None:
        concurrency = pool_size()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_blocks = max(4, int(concurrency) * 4)
    return ds.repartition(n_blocks).map_batches(
        parse_testdata_batch,
        batch_format="pyarrow",
        batch_size=256,
    )
