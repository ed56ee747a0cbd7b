"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init``/``ray.shutdown`` here or in the library code.

``queries()`` entries map to SURVEY.md §2 operators and the
training-data op suite; ``oracle_sql()`` provides DuckDB equivalents
for every SQL-expressible entry. Span-derived queries exploit the
deterministic testdata→HTML derivation in
``reffy_ray/sources/from_testdata.py`` — the SQL states the same facts
directly over the raw ``documents`` view, so a value-hash match
exercises the full parse → span → extract path.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import ray.data as rd

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _pa_mod(col, m: int):
    """Arrow has no modulo kernel; non-negative ints only (truncating
    integer divide == floor there)."""
    import pyarrow.compute as pc

    return pc.subtract(col, pc.multiply(pc.divide(col, m), m))


_SPAN_CACHE: dict[str, rd.Dataset] = {}


def _span_docs(sf_dir: str) -> rd.Dataset:
    """Span corpus, parsed once per sf_dir and cached materialized —
    the 13 span-derived queries share one parse pass instead of
    re-deriving HTML per query (round-1 verdict: parse_extract paid
    the span decode 5×)."""
    ds = _SPAN_CACHE.get(sf_dir)
    if ds is None:
        from reffy_ray.sources.from_testdata import span_documents

        ds = span_documents(sf_dir).materialize()
        _SPAN_CACHE[sf_dir] = ds
    return ds


def _pool() -> int:
    """Fixed actor-pool size from the session's CPUs (autoscaling pools
    idle at their minimum; round-1 verdict 'starved pools')."""
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 4)) - 1)


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    # every current consumer is a (doc_id, text) op — prune at the read
    # so nothing decodes the unused source/lang/n_chars columns
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _embeddings(sf_dir: str, columns=("vec_id", "embedding")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=list(columns))


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------


def q_headings(sf_dir: str):
    from reffy_ray.stages.extract import extract_headings

    # alternate_ids excluded: always NULL on this corpus and DuckDB
    # renders a NULL list as nan while Arrow yields None — the library
    # schema keeps the column (test_dfns_reference_suite covers it)
    return _span_docs(sf_dir).map_batches(
        extract_headings, batch_format="pyarrow"
    ).select_columns(["doc_id", "id", "href", "level", "title", "number"])


def q_dfns(sf_dir: str):
    from reffy_ray.stages.extract import extract_dfns

    ds = _span_docs(sf_dir).map_batches(extract_dfns, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "id", "href", "type", "access", "informative", "defined_in"]
    )


def q_idl(sf_dir: str):
    from reffy_ray.stages.extract import extract_idl

    return _span_docs(sf_dir).map_batches(extract_idl, batch_format="pyarrow")


def q_links(sf_dir: str):
    from reffy_ray.stages.extract import extract_links

    ds = _span_docs(sf_dir).map_batches(extract_links, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "page_url", "auto"])


def q_link_hosts(sf_dir: str):
    """Per-host link fan-in (post/linkgraph.host_link_stats) over the
    links extraction: n_links / n_docs (distinct sources) / n_auto per
    target host — batch-partial pyarrow group_by, then one (host, doc)
    shuffle and a tiny host fold."""
    from reffy_ray.post.linkgraph import host_link_stats

    return host_link_stats(q_links(sf_dir))


def q_titles(sf_dir: str):
    from reffy_ray.stages.extract import extract_title

    return _span_docs(sf_dir).map_batches(extract_title, batch_format="pyarrow")


def q_meta(sf_dir: str):
    from reffy_ray.stages.extract import extract_meta

    import pyarrow.compute as pc

    ds = _span_docs(sf_dir).map_batches(extract_meta, batch_format="pyarrow")

    def fill(b: pa.Table) -> pa.Table:
        for col in ("generator", "revision", "date"):
            i = b.schema.get_field_index(col)
            b = b.set_column(i, col, pc.fill_null(b.column(col), ""))
        return b

    return ds.map_batches(fill, batch_format="pyarrow")


def q_ids(sf_dir: str):
    from reffy_ray.stages.extract import extract_ids

    return _span_docs(sf_dir).map_batches(extract_ids, batch_format="pyarrow")


def q_refs(sf_dir: str):
    from reffy_ray.stages.extract import extract_refs

    return _span_docs(sf_dir).map_batches(extract_refs, batch_format="pyarrow")


def q_css(sf_dir: str):
    from reffy_ray.stages.extract import extract_css

    return _span_docs(sf_dir).map_batches(extract_css, batch_format="pyarrow")


def q_events(sf_dir: str):
    from reffy_ray.stages.extract import extract_events

    ds = _span_docs(sf_dir).map_batches(extract_events, batch_format="pyarrow")
    return ds.select_columns(
        ["doc_id", "type", "interface", "bubbles", "href", "src_format",
         "is_extension"]
    )


def q_algorithms(sf_dir: str):
    from reffy_ray.stages.extract import extract_algorithms

    return _span_docs(sf_dir).map_batches(extract_algorithms, batch_format="pyarrow")


def q_cddl(sf_dir: str):
    from reffy_ray.stages.extract import extract_cddl

    return _span_docs(sf_dir).map_batches(extract_cddl, batch_format="pyarrow")


def q_elements(sf_dir: str):
    from reffy_ray.stages.extract import extract_elements

    return _span_docs(sf_dir).map_batches(extract_elements, batch_format="pyarrow")


def q_token_count(sf_dir: str):
    from reffy_ray.ops.text import token_count

    return _docs(sf_dir).map_batches(token_count, batch_format="pyarrow")


def q_bpeish_tokens(sf_dir: str):
    from reffy_ray.ops.text import BpeishTokenCount

    return _docs(sf_dir).map_batches(BpeishTokenCount(), batch_format="pyarrow")


def q_word_counts(sf_dir: str):
    from reffy_ray.ops.text import word_counts

    return word_counts(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (ops/text.bpe_merges): 4
    greedy merge rounds over the word census; returns the merge table
    (step, left_sym, right_sym, merged, pair_count)."""
    from reffy_ray.ops.text import bpe_merges

    return bpe_merges(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        merges=4,
    )


def _bpe_oracle_sql(merges: int = 4) -> str:
    """Generate the unrolled k-round BPE oracle: each round is a pair
    census over the spaced-symbol vocab, an (count desc, pair asc)
    argmax, and a boundary-space replace — byte-identical semantics to
    the engine (see ops/text.bpe_merges docstring)."""
    parts = [
        r"""WITH w0 AS (
  SELECT ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS sym,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
)"""
    ]
    for s in range(merges):
        parts.append(
            f""", p{s} AS (
  SELECT l[i] || ' ' || l[i+1] AS pair, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(sym), ' ') AS l, n FROM w{s}),
       unnest(generate_series(1, len(l) - 1)) AS t(i)
  GROUP BY pair
), b{s} AS (SELECT pair, cnt FROM p{s} ORDER BY cnt DESC, pair ASC LIMIT 1)"""
        )
        if s + 1 < merges:
            parts.append(
                f""", w{s + 1} AS (
  SELECT replace(sym, ' ' || (SELECT pair FROM b{s}) || ' ',
                 ' ' || replace((SELECT pair FROM b{s}), ' ', '') || ' ') AS sym,
         n FROM w{s}
)"""
            )
    selects = [
        f"""SELECT {s} AS step, split_part(pair, ' ', 1) AS left_sym,
       split_part(pair, ' ', 2) AS right_sym,
       replace(pair, ' ', '') AS merged, cnt AS pair_count FROM b{s}"""
        for s in range(merges)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _bpe_encode_oracle_sql(merges: int = 4) -> str:
    """Encode oracle: the same unrolled merge rounds as
    :func:`_bpe_oracle_sql` but carrying the source ``word`` through
    every round, so the final vocab maps word → post-merge token
    count; corpus words then join against it per document."""
    parts = [
        r"""WITH w0 AS (
  SELECT word, ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS sym,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
)"""
    ]
    for s in range(merges):
        parts.append(
            f""", p{s} AS (
  SELECT l[i] || ' ' || l[i+1] AS pair, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT string_split(trim(sym), ' ') AS l, n FROM w{s}),
       unnest(generate_series(1, len(l) - 1)) AS t(i)
  GROUP BY pair
), b{s} AS (SELECT pair, cnt FROM p{s} ORDER BY cnt DESC, pair ASC LIMIT 1)"""
        )
        parts.append(
            f""", w{s + 1} AS (
  SELECT word, replace(sym, ' ' || (SELECT pair FROM b{s}) || ' ',
                 ' ' || replace((SELECT pair FROM b{s}), ' ', '') || ' ') AS sym,
         n FROM w{s}
)"""
        )
    return "".join(parts) + f"""
, tok AS (
  SELECT word, CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS n_tok
  FROM w{merges}
), docw AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\\W+')) AS word
  FROM documents
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(t.n_tok) AS BIGINT) AS n_tokens
FROM docw d JOIN tok t ON d.word = t.word
WHERE d.word <> '' GROUP BY d.doc_id
"""


def q_bpe_encode(sf_dir: str):
    """Tokenizer application (ops/text.bpe_encode): train 4 BPE merges
    over the corpus (bpe_merges), then encode every document with the
    single-pass merge chain — per-doc word and post-merge token
    counts. The tiny merge table is the only driver-side state."""
    from reffy_ray.ops.text import bpe_encode, bpe_merges

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    trained = (
        bpe_merges(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
            merges=4,
        )
        .to_pandas()
        .sort_values("step")
    )
    rules = list(
        zip(trained["left_sym"], trained["right_sym"], trained["merged"])
    )
    return bpe_encode(docs, rules)


def q_bigram_counts(sf_dir: str):
    from reffy_ray.ops.text import bigram_counts

    return bigram_counts(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    )


def q_pmi(sf_dir: str):
    """Top-100 PMI collocations (ops/text.pmi_collocations) over the
    3-window co-occurrence table, min pair count 5; PMI snapped to an
    int64 1e4 grid, fully ordered (pmi desc, words asc)."""
    from reffy_ray.ops.text import pmi_collocations

    return pmi_collocations(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        window=3, min_count=5, top_k=100,
    )


def q_skipgram_counts(sf_dir: str):
    from reffy_ray.ops.text import skipgram_counts

    return skipgram_counts(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"]),
        window=3,
    )


def q_source_dup_stats(sf_dir: str):
    from reffy_ray.ops.dedup import source_dup_stats

    return source_dup_stats(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
    )


def q_dup_size_hist(sf_dir: str):
    from reffy_ray.ops.dedup import dup_size_hist

    return dup_size_hist(_docs(sf_dir))


def q_vocab_size_by_lang(sf_dir: str):
    from reffy_ray.ops.text import vocab_size_by_lang

    return vocab_size_by_lang(_docs(sf_dir, columns=("lang", "text")))


def q_funnel_conversion(sf_dir: str):
    from reffy_ray.ops.stats import funnel_conversion

    return funnel_conversion(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
        )
    )


def q_sessionize(sf_dir: str):
    """Gap-based sessionization (ops/window.sessionize): 8-hour
    inactivity gap over the event log — the median inter-event gap in
    the synthetic stream is ~7.3 h, so sessions mix multi-event runs
    and singletons."""
    from reffy_ray.ops.window import sessionize

    return sessionize(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
        ),
        gap_us=28_800_000_000,
    )


def q_cohort_retention(sf_dir: str):
    """Weekly cohort retention (ops/stats.cohort_retention) over a
    staggered event log: users shifted by (user_id % 4) weeks so four
    cohorts exist, with deterministic (user*7+week) % 5 dropout so the
    triangle has real attrition."""
    from reffy_ray.ops.stats import WEEK_US, cohort_retention

    def stagger(batch: pa.Table) -> pa.Table:
        import numpy as np

        u = batch.column("user_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) + (u % 4) * WEEK_US
        week = t // WEEK_US
        keep = (u * 7 + week) % 5 != 0
        return pa.table(
            {
                "user_id": pa.array(u[keep], pa.int64()),
                "ts": pa.array(t[keep], pa.int64()).cast(
                    pa.timestamp("us")
                ),
            }
        )

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(stagger, batch_format="pyarrow")
    return cohort_retention(ev)


def q_line_dedup(sf_dir: str):
    """Cross-corpus keep-first line dedup (ops/curation.line_dedup)
    over the same line-laced corpus as q_boilerplate: the planted
    footers survive only in their first document, and the corpus's
    exact-duplicate documents collapse to empty text (anchors keep
    them in the output)."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import line_dedup

    def lace(batch: pa.Table) -> pa.Table:
        lined = pc.replace_substring_regex(
            batch.column("text"),
            pattern=r"(\w+ \w+ \w+ \w+ \w+) ",
            replacement="\\1\n",
        )
        with_footer = pc.binary_join_element_wise(
            lined, "all rights reserved footer", "\n"
        )
        extra = pc.binary_join_element_wise(
            with_footer, "subscribe to newsletter", "\n"
        )
        text = pc.if_else(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0),
            extra,
            with_footer,
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": text})

    docs = _docs(sf_dir, columns=("doc_id", "text")).map_batches(
        lace, batch_format="pyarrow"
    )
    return line_dedup(docs)


def q_kmeans(sf_dir: str):
    """Distributed exact-parity Lloyd k-means
    (ops/similarity.kmeans): k=8 seeds = lowest vec_ids, 2 assignment
    passes, 6-dp centroid snap."""
    from reffy_ray.ops.similarity import kmeans

    return kmeans(
        rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ),
        k=8,
        iters=2,
    )


def q_pagerank(sf_dir: str):
    """3-iteration PageRank (ops/graph.pagerank) over a hub-skewed
    deterministic link graph derived from the corpus: each doc links to
    doc_id // j for j in {2, 4, 8}, so low ids are hubs and the rank
    distribution spans ~3 orders of magnitude."""
    import numpy as np

    from reffy_ray.ops.graph import pagerank

    docs = _docs(sf_dir, columns=("doc_id",))
    n = docs.count()

    def mk_edges(batch: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        src = np.repeat(ids, 3)
        j = np.tile(np.array([2, 4, 8]), len(ids))
        return pd.DataFrame(
            {
                "src": src.astype("int64"),
                "dst": (src // j).astype("int64"),
            }
        )

    edges = docs.map_batches(mk_edges, batch_format="pandas")
    return pagerank(edges, n_nodes=n, iters=3)


def q_hits(sf_dir: str):
    """2-iteration HITS hub/authority scores (ops/graph.hits,
    broadcast tier at test scale; join tier beyond 20M nodes) over the
    same hub-skewed doc_id // j link graph as pagerank — low ids
    accumulate authority, high ids are pure hubs."""
    import numpy as np

    from reffy_ray.ops.graph import hits

    docs = _docs(sf_dir, columns=("doc_id",))
    n = docs.count()

    def mk_edges(batch: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        src = np.repeat(ids, 3)
        j = np.tile(np.array([2, 4, 8]), len(ids))
        return pd.DataFrame(
            {
                "src": src.astype("int64"),
                "dst": (src // j).astype("int64"),
            }
        )

    edges = docs.map_batches(mk_edges, batch_format="pandas")
    return hits(edges, n_nodes=n, iters=2)


def q_random_walks(sf_dir: str):
    """Deterministic hash-chosen random walks (ops/graph.random_walks,
    broadcast tier at test scale): one 3-step walk per doc over the
    doc_id // j link graph; next hop = out-neighbor minimizing the
    32-bit integer mix hash over (salt32, w, t, d) — vectorized numpy
    in the engine, and plain BIGINT arithmetic in the SQL oracle
    (_walk_step_ctes), so both replay the exact same 'random'
    choices."""
    from reffy_ray.ops.graph import random_walks

    edges, n = _walk_graph_edges(sf_dir)
    return random_walks(edges, n_nodes=n, walk_len=3)


def q_biased_walks(sf_dir: str):
    """Second-order (p,q)-biased node2vec walks
    (ops/graph.biased_walks, broadcast tier at test scale): one
    3-step walk per doc over the doc_id // j link graph with p=2
    (return-shy), q=0.5 (exploration-shy → in/out bias 1000 vs
    2000/500 scaled integers). Step 0 draws uniformly; later steps
    draw r = mix32(salt#r, w, t) mod Σwt and take the first neighbor
    (ascending) whose integer cumulative weight exceeds r — the SQL
    oracle replays the identical draw with a window cumsum."""
    from reffy_ray.ops.graph import biased_walks

    edges, n = _walk_graph_edges(sf_dir)
    return biased_walks(edges, n_nodes=n, walk_len=3, p=2.0, q=0.5)


def _walk_graph_edges(sf_dir: str):
    """The shared deterministic doc link graph (doc_id → doc_id // j
    for j in {2,4,8}) plus its node count."""
    import numpy as np

    docs = _docs(sf_dir, columns=("doc_id",))
    n = docs.count()

    def mk_edges(batch: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        ids = batch["doc_id"].to_numpy()
        src = np.repeat(ids, 3)
        j = np.tile(np.array([2, 4, 8]), len(ids))
        return pd.DataFrame(
            {
                "src": src.astype("int64"),
                "dst": (src // j).astype("int64"),
            }
        )

    return docs.map_batches(mk_edges, batch_format="pandas"), n


def _build_doc_adjacency(sf_dir: str):
    import hashlib
    import shutil

    from reffy_ray.ops.graphstore import BucketedAdjacency

    edges, n = _walk_graph_edges(sf_dir)
    # deterministic per-sf scratch path, wiped before rebuild: repeat
    # contract runs reuse ONE directory instead of leaking a fresh
    # mkdtemp per invocation (review finding)
    import os

    # per-(sf, pid) path: deterministic WITHIN a process (repeat calls
    # reuse + wipe one directory) but collision-free ACROSS concurrent
    # processes — a shared fixed name would let process B's rmtree
    # delete process A's buckets mid-read (review finding)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = f"/tmp/graft_adj_{tag}_{os.getpid()}"
    # bound the per-pid leak: sweep stale siblings (same sf, other
    # pids) older than an hour — old enough that their owning process
    # is done, so the cross-process race stays closed
    import glob
    import time

    for old_dir in glob.glob(f"/tmp/graft_adj_{tag}_*"):
        if old_dir != d:
            try:
                if time.time() - os.path.getmtime(old_dir) > 3600:
                    shutil.rmtree(old_dir, ignore_errors=True)
            except OSError:
                pass
    # build() owns the wipe-and-replace contract for d itself
    return BucketedAdjacency.build(edges, d, n_nodes=n, n_buckets=16), n


def q_bucketed_walks(sf_dir: str):
    """Walks over the PERSISTED hash-bucketed adjacency
    (ops/graphstore.BucketedAdjacency + bucketed_walks): the edge
    table is written once to bucket=<src%16>/ Parquet, then each step
    reads only the buckets the frontier touches (path-level pruning,
    the IVFIndex pattern) — per-step cost tracks frontier size, not
    edge count. Identical choice rule to random_walks; started from
    the doc_id % 7 == 0 subset so the pruning actually prunes."""
    import pandas as pd

    from reffy_ray.ops.graphstore import bucketed_walks

    adj, n = _build_doc_adjacency(sf_dir)
    starts = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(
            lambda b: pd.DataFrame(
                {"id": b["doc_id"][b["doc_id"] % 7 == 0].astype("int64")}
            ),
            batch_format="pandas",
        )
    )
    return bucketed_walks(adj, starts, walk_len=3)


def q_bucketed_pagerank(sf_dir: str):
    """3-iteration PageRank over the persisted bucketed adjacency
    (ops/graphstore.bucketed_pagerank): per iteration the node-sized
    rank table shuffles once by bucket; each bucket group reads ITS
    edge partition straight from Parquet inside the task and emits
    in-group pre-aggregated per-dst partials — the edge table is
    never reshuffled. Same math and snap as ops/graph.pagerank, so
    the oracle is pagerank's."""
    from reffy_ray.ops.graphstore import bucketed_pagerank

    adj, _n = _build_doc_adjacency(sf_dir)
    return bucketed_pagerank(adj, iters=3)


def q_walk_pairs(sf_dir: str):
    """Skip-gram pairs from the deterministic walks
    (ops/graph.walk_skipgrams over random_walks output) — the
    node2vec/DeepWalk training-pair generator; window 2 over the
    3-step walks."""
    from reffy_ray.ops.graph import walk_skipgrams

    walks = q_random_walks(sf_dir)
    return walk_skipgrams(walks, window=2)


def q_node2vec_embeddings(sf_dir: str):
    """Node embeddings from the biased-walk pair corpus: PPMI +
    randomized subspace SVD (ops/embeddings.ppmi_svd_embeddings — the
    Levy & Goldberg 2014 SGNS-equivalent factorization; hash-defined
    test matrix, TSQR orthonormalization, Rayleigh-Ritz). Iterative
    float linear algebra → no SQL oracle; the driver records
    rows-only, and tests/test_embeddings.py asserts the geometric
    invariants (cluster structure, determinism up to eigenvector
    sign)."""
    from reffy_ray.ops.embeddings import ppmi_svd_embeddings
    from reffy_ray.ops.graph import walk_skipgrams

    _edges, n = _walk_graph_edges(sf_dir)
    pairs = walk_skipgrams(q_biased_walks(sf_dir), window=2)
    return ppmi_svd_embeddings(pairs, n_nodes=n, dim=8, iters=2)


def q_biased_walk_pairs(sf_dir: str):
    """Skip-gram pairs over the second-order biased walks
    (ops/graph.walk_skipgrams ∘ biased_walks) — the actual node2vec
    training-pair generator: p,q-biased corpus, window-2 pairs."""
    from reffy_ray.ops.graph import walk_skipgrams

    return walk_skipgrams(q_biased_walks(sf_dir), window=2)


def _custkey_big_orders(sf_dir: str):
    """Customer dim side + the key column of orders over 300k total
    price (threshold keeps BOTH the semi and anti results non-empty at
    every test scale), key renamed so the join is single-key."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    okeys = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice"],
        )
        .filter(expr="o_totalprice > 300000")
        .select_columns(["o_custkey"])
        .map_batches(
            lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
        )
    )
    return cust, okeys


def q_semi_join(sf_dir: str):
    """Customers with >= 1 order over 300k (ops/joins.semi_join,
    shuffle tier: Ray native left_semi hash join, deduped key side)."""
    from reffy_ray.ops.joins import semi_join

    cust, okeys = _custkey_big_orders(sf_dir)
    return semi_join(cust, okeys, on="c_custkey")


def q_anti_join(sf_dir: str):
    """Customers with no order over 300k (ops/joins.anti_join — NOT
    EXISTS, Ray native left_anti hash join)."""
    from reffy_ray.ops.joins import anti_join

    cust, okeys = _custkey_big_orders(sf_dir)
    return anti_join(cust, okeys, on="c_custkey")


def q_skew_join(sf_dir: str):
    """Inner equi-join with explicit hot-key skew handling
    (ops/joins.equi_join — the north rule's skew-salting clause
    applied to the general join). Key jk = 0 when user_id % 3 == 0
    else user_id manufactures one hot key owning ~1/3 of the corpus;
    ``hot_cap = max(200, n/20)`` routes it through the broadcast
    map-side tier while every other key goes through Ray's native
    hash join, masked so no partition ever sees the hot key's flood."""
    from ray.data.aggregate import Count

    from reffy_ray.ops.joins import equi_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )

    def add_jk(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy()
        jk = np.where(u % 3 == 0, np.int64(0), u)
        return pa.table(
            {"event_id": b.column("event_id"), "jk": pa.array(jk, pa.int64())}
        )

    left = ev.map_batches(add_jk, batch_format="pyarrow")
    counts = left.groupby("jk").aggregate(Count(alias_name="jk_rows"))
    n = ev.count()
    return equi_join(left, counts, on="jk", hot_cap=max(200, n // 20))


def q_lang_fertility(sf_dir: str):
    """Per-language tokenizer fertility (ops/text.lang_fertility):
    exact integer word / BPE-ish subword totals, combiner shape."""
    from reffy_ray.ops.text import lang_fertility

    return lang_fertility(_docs(sf_dir, columns=("text", "lang")))


def q_daily_new_users(sf_dir: str):
    """Daily acquisition curve (ops/stats.daily_new_users): first-seen
    day per user -> per-day new users + running cumulative total."""
    from reffy_ray.ops.stats import daily_new_users

    return daily_new_users(rd.read_parquet(f"{sf_dir}/events.parquet"))


def q_price_histogram(sf_dir: str):
    """Fixed-width histogram (ops/stats.histogram) of lineitem
    extended price, 10k-wide buckets; exact integer bucket ids."""
    from reffy_ray.ops.stats import histogram

    return histogram(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        ),
        value_col="l_extendedprice",
        width=10_000.0,
    )


def q_user_top_event(sf_dir: str):
    """Per-user modal event type (ops/stats.top_value_per_group),
    ties -> lexicographically smallest type."""
    from reffy_ray.ops.stats import top_value_per_group

    return top_value_per_group(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ),
        group_col="user_id",
        value_col="event_type",
    )


def q_kmv_distinct(sf_dir: str):
    """KMV bottom-k distinct-count sketch (ops/stats.kmv_distinct)
    over the corpus vocabulary (lowercased \\w+ words). Deterministic
    md5 hashing + integer floor division make the *estimate* itself
    exactly restatable in SQL — a sketch with an exact oracle."""
    import re as _re

    from reffy_ray.ops.stats import kmv_distinct

    tok = _re.compile(r"\w+")

    def words(batch):
        out = []
        for t in batch.column("text").to_pylist():
            out.extend(tok.findall(t.lower()))
        return out

    return kmv_distinct(_docs(sf_dir, columns=("text",)), words, k=1024)


def q_event_type_pairs(sf_dir: str):
    """Market-basket pair support (ops/stats.event_type_pairs): for
    every unordered pair of event types, how many users did both."""
    from reffy_ray.ops.stats import event_type_pairs

    return event_type_pairs(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
    )


def q_rare_gram_pairs(sf_dir: str):
    """Entity-blocking candidates (ops/dedup.rare_gram_pairs): doc
    pairs sharing ≥2 rare word trigrams (df ∈ [2,5]) — bucketed
    inverted-index blocking, pair volume bounded per gram."""
    from reffy_ray.ops.dedup import rare_gram_pairs

    return rare_gram_pairs(_docs(sf_dir, columns=("doc_id", "text")))


def q_pivot_counts(sf_dir: str):
    """Crosstab activity matrix (ops/stats.pivot_counts): one row per
    user with an int64 count column per event type — per-block
    crosstab partials, one groupby(user) shuffle of partials."""
    from reffy_ray.ops.stats import pivot_counts

    return pivot_counts(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        ),
        key_col="user_id",
        cat_col="event_type",
        categories=["click", "error", "purchase", "signup", "view"],
    )


def q_rollup(sf_dir: str):
    """ROLLUP subtotals (ops/stats.rollup_agg): exact quantity
    sums/counts at (returnflag, linestatus), (returnflag, ALL) and
    (ALL, ALL) — finest-level combiner partials, one tiny groupby,
    coarser levels derived from the cardinality-bounded result."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import rollup_agg

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty": pc.cast(b.column("l_quantity"), pa.int64()),
            }
        )

    return rollup_agg(
        li.map_batches(to_int, batch_format="pyarrow"),
        dims=["l_returnflag", "l_linestatus"],
        value_col="qty",
    )


def q_cumulative(sf_dir: str):
    """Per-user running spend (ops/window.cumulative_agg): cumulative
    integer-cents sum + 1-based running count over (ts, event_id)
    order — one sort, census-stitched carry, vectorized cumsum."""
    import pyarrow.compute as pc

    from reffy_ray.ops.window import cumulative_agg

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64())
        return b.drop_columns(["value"]).append_column("cents", cents)

    return cumulative_agg(
        ev.map_batches(to_cents, batch_format="pyarrow"), value_col="cents"
    )


def q_distinct_users(sf_dir: str):
    """Exact per-day COUNT(DISTINCT user) (ops/stats.distinct_count):
    local dedup → (day,user) groupby for global distinctness → tiny
    per-day sum. The exact counterpart of the kmv_distinct sketch."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import distinct_count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def to_day(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(b.column("ts"), unit="day"),
                "user_id": b.column("user_id"),
            }
        )

    return distinct_count(
        ev.map_batches(to_day, batch_format="pyarrow"),
        by="day",
        value="user_id",
        out_col="n_users",
    )


def q_rrf(sf_dir: str):
    """Reciprocal-rank fusion (ops/similarity.rrf_fuse) of two ranked
    doc lists — by whitespace token count and by char length — exact
    integer contributions scale//(k+rank), rank via the distributed
    prefix-count primitive; missing-side rank reports -1."""
    import pyarrow.compute as pc

    from reffy_ray.ops.similarity import rrf_fuse
    from reffy_ray.ops.text import token_count

    docs = _docs(sf_dir)
    a = docs.map_batches(token_count, batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(["doc_id", "score"]), batch_format="pyarrow"
    )

    def by_chars(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "score": pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
            }
        )

    b = docs.map_batches(by_chars, batch_format="pyarrow")
    return rrf_fuse(a, b, id_col="doc_id", score_col="score")


_ER_JOINED_CACHE: dict = {}


def _er_joined(sf_dir: str):
    """Shared, memoized ER front half (rare-gram blocking + both
    candidate texts attached) for the er_pairs / edit_distance /
    containment trio — all three verify stages run over the IDENTICAL
    bounded candidate table, so it is built and materialized once per
    sf_dir and reused (plain CTE reuse; the verify math is untouched).
    Single-slot cache: only the most recent sf_dir is held."""
    from reffy_ray.ops.dedup import _er_candidates_with_texts

    if sf_dir not in _ER_JOINED_CACHE:
        _ER_JOINED_CACHE.clear()
        _ER_JOINED_CACHE[sf_dir] = _er_candidates_with_texts(
            _docs(sf_dir, columns=("doc_id", "text"))
        ).materialize()
    return _ER_JOINED_CACHE[sf_dir]


def q_er_pairs(sf_dir: str):
    """Two-stage entity resolution (ops/dedup.er_verified_pairs):
    rare-gram blocking → exact trigram-Jaccard verification (≥0.3,
    integer cross-multiplication) on the bounded candidate set."""
    from reffy_ray.ops.dedup import er_verified_pairs

    return er_verified_pairs(
        _docs(sf_dir, columns=("doc_id", "text")),
        candidates=_er_joined(sf_dir),
    )


def q_max_concurrency(sf_dir: str):
    """Sweep-line interval overlap (ops/window.max_concurrency): each
    event held open 60 s; per event type, the max number of
    simultaneously open intervals — end-exclusive tie rule, one sort +
    census-stitched running sum, per-(block,key) max partials."""
    from reffy_ray.ops.window import max_concurrency

    return max_concurrency(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type"],
        )
    ).sort("event_type")


def q_rolling_distinct(sf_dir: str):
    """Rolling 7-day distinct users per day (ops/window.rolling_distinct):
    local (day,user) dedup → constant-fanout window-end explode
    filtered to the broadcast live-day set → distinct_count's
    two-stage groupby. The rolling-DAU metric plain window functions
    can't express."""
    from reffy_ray.ops.window import rolling_distinct

    return rolling_distinct(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    ).sort("day_num")


def q_pair_lift(sf_dir: str):
    """Co-occurrence lift (ops/stats.pair_lift): support>0 event-type
    pairs ranked by exact integer lift_ppm = support·n_users·10⁶ //
    (cnt_a·cnt_b); joints, marginals and the user total fall out of
    one ones-augmented XᵀX matmul."""
    from reffy_ray.ops.stats import pair_lift

    return pair_lift(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
    )


def q_streaks(sf_dir: str):
    """Longest consecutive-day streak per user (ops/window.
    activity_streaks): global (user,day) dedup, then sessionize with
    the day number as a 1-us clock and gap_us=1 — gaps-and-islands
    without a dedicated kernel."""
    from reffy_ray.ops.window import activity_streaks

    return activity_streaks(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    ).sort("user_id")


def q_inverted_index(sf_dir: str):
    """Rare-term inverted index (ops/text.inverted_index): terms with
    df ≤ n_docs/5 and ordered comma-joined postings, built with ONE
    term-hash bucket shuffle (df filter and ordered join local to the
    bucket). The df cap is a corpus FRACTION (rare = appears in <20%
    of docs), so the query yields rows at every scale of the fixed
    31-term synthetic vocab."""
    import pyarrow.parquet as pq

    from reffy_ray.ops.text import inverted_index

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    return inverted_index(
        _docs(sf_dir, columns=("doc_id", "text")), max_df=n_docs // 5
    ).sort("term")


def q_ab_test(sf_dir: str):
    """A/B rollup (ops/sampling.ab_test_summary): md5-bucket arm
    assignment (hash_split scheme, SQL-restatable), converts on ≥1
    purchase event, exact integer conv_ppm per arm."""
    from reffy_ray.ops.sampling import ab_test_summary

    return ab_test_summary(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
    ).sort("arm")


def q_share_of_total(sf_dir: str):
    """Ratio-to-report (ops/stats.share_of_total): each event type's
    exact integer-ppm share of global spend (integer cents) — the
    ``sum(x)/sum(sum(x)) OVER ()`` report without float division."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import share_of_total

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
        )
        return pa.table(
            {"event_type": b.column("event_type"), "cents": cents}
        )

    return share_of_total(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        key_col="event_type",
        value_col="cents",
    )


def q_edit_distance(sf_dir: str):
    """Bounded-Levenshtein linkage (ops/dedup.edit_distance_pairs):
    rare-gram blocking → banded edit-distance DP on 64-char prefixes,
    pairs kept at distance ≤ 10 — candidate set bounded by blocking,
    never corpus × corpus."""
    from reffy_ray.ops.dedup import edit_distance_pairs

    return edit_distance_pairs(
        _docs(sf_dir, columns=("doc_id", "text")),
        candidates=_er_joined(sf_dir),
    ).sort(["a", "b"])


def q_trending_terms(sf_dir: str):
    """Per-source trending terms: document frequency per (source,
    term) via combiner partials, then ops/sampling.top_k_per_group
    keeps each source's top-3 terms (ties broken by ascending term)."""
    import re as _re

    from ray.data.aggregate import Sum

    from reffy_ray.ops.sampling import top_k_per_group

    tok = _re.compile(r"\w+")

    def explode(b):
        import pandas as pd

        src_out, term_out = [], []
        for src, text in zip(b["source"], b["text"]):
            for t in set(tok.findall((text or "").lower())):
                src_out.append(src)
                term_out.append(t)
        out = pd.DataFrame({"source": src_out, "term": term_out})
        out = out.groupby(["source", "term"], as_index=False).size()
        return out.rename(columns={"size": "pn"}).astype({"pn": "int64"})

    counts = (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(explode, batch_format="pandas")
        .groupby(["source", "term"])
        .aggregate(Sum("pn", alias_name="df"))
    )
    top = top_k_per_group(
        counts, k=3, key_col="source", order_col="df", id_col="term"
    )

    def fin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": t.column("source").cast(pa.string()),
                "term": t.column("term").cast(pa.string()),
                "df": t.column("df").cast(pa.int64()),
            }
        )

    return top.map_batches(fin, batch_format="pyarrow").sort(
        ["source", "term"]
    )


def q_pareto(sf_dir: str):
    """Per-priority 2-D Pareto frontier over orders
    (ops/stats.pareto_front): the skyline of (maximize price cents,
    minimize order date) — no order both cheaper-or-equal in date and
    higher-or-equal in price dominates a kept point. Per-block local
    skylines → one tiny groupby; the fact table never shuffles."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import pareto_front

    odr = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice", "o_orderdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "price_cents": pc.cast(
                    pc.floor(pc.multiply(b.column("o_totalprice"), 100.0)),
                    pa.int64(),
                ),
                "date_us": b.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        )

    return pareto_front(
        odr.map_batches(prep, batch_format="pyarrow"),
        by="o_orderpriority",
        max_col="price_cents",
        min_col="date_us",
    ).sort(["o_orderpriority", "price_cents", "date_us"])


def q_decayed(sf_dir: str):
    """Per-event-type freshness-decayed score (ops/stats.decayed_score):
    each event contributes cents >> whole-days-old at the 2024-02-01
    reference — exact integer bit-shift halving, one combiner pass."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import decayed_score

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "ts": b.column("ts"),
                "cents": pc.cast(
                    pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    return decayed_score(
        ev.map_batches(to_cents, batch_format="pyarrow"),
        by="event_type",
        ts_col="ts",
        value_col="cents",
        ref_us=1_706_745_600_000_000,  # 2024-02-01T00:00:00Z
    ).sort("event_type")


def q_hll_users(sf_dir: str):
    """HyperLogLog distinct-user estimate (ops/stats.hll_distinct,
    m=64): deterministic md5 registers make the raw HLL estimate
    itself exactly SQL-restatable — the register-table twin of
    kmv_distinct. ≤64 rows per block cross the wire."""
    from reffy_ray.ops.stats import hll_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def users(batch: pa.Table):
        return [str(u) for u in batch.column("user_id").to_pylist()]

    return hll_distinct(ev, users, m=64)


def q_interval_merge(sf_dir: str):
    """Variable-duration interval union per user
    (ops/window.interval_coalesce): each event holds an interval of
    60 s + 1 ms per value-cent; overlapping/touching intervals merge
    into islands (running-max-end semantics, the PACK primitive
    sessionize's constant-gap rule cannot express)."""
    import pyarrow.compute as pc

    from reffy_ray.ops.window import interval_coalesce

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
        )
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "dur_us": pc.add(
                    pc.multiply(cents, pa.scalar(1000, pa.int64())),
                    pa.scalar(60_000_000, pa.int64()),
                ),
            }
        )

    return interval_coalesce(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="user_id",
        ts_col="ts",
        dur_col="dur_us",
    ).sort(["user_id", "island_seq"])


def q_containment(sf_dir: str):
    """Asymmetric n-gram containment pairs
    (ops/dedup.containment_pairs): directed src⊂dst relations with
    |A∩B| ≥ |A|/2 on the rare-gram-blocked candidate set — the
    quote/subset signal Jaccard misses."""
    from reffy_ray.ops.dedup import containment_pairs

    return containment_pairs(
        _docs(sf_dir, columns=("doc_id", "text")),
        candidates=_er_joined(sf_dir),
    ).sort(["src", "dst"])


def q_debounce(sf_dir: str):
    """At-least-once stream dedup (ops/window.debounce_events): drop
    events repeating the same (user, type) within 1 h — lag-gap
    semantics, one sort + census-stitched block boundaries."""
    from reffy_ray.ops.window import debounce_events

    return debounce_events(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
    )


def q_table_diff(sf_dir: str):
    """Snapshot diff (ops/joins.table_diff): old = docs with id%4≠0,
    new = docs with id%7≠0 and text mutated when id%5=0 — added /
    removed / changed verdicts via one bucketed outer-merge shuffle."""
    import pyarrow.compute as pc

    from reffy_ray.ops.joins import table_diff

    docs = _docs(sf_dir, columns=("doc_id", "text"))

    import numpy as np

    def keep_mod(m: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % m != 0))

        return fn

    old = docs.map_batches(keep_mod(4), batch_format="pyarrow")

    def mutate(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        mod5 = pa.array(ids % 5 == 0)
        text = pc.if_else(
            mod5,
            pc.binary_join_element_wise(b.column("text"), "X", ""),
            b.column("text"),
        )
        return pa.table({"doc_id": b.column("doc_id"), "text": text})

    new = docs.map_batches(keep_mod(7), batch_format="pyarrow").map_batches(
        mutate, batch_format="pyarrow"
    )
    return table_diff(old, new, key="doc_id", payload="text")


def q_tumbling_window(sf_dir: str):
    """Hourly tumbling event-time windows (ops/window.tumbling_agg):
    count + integer-cents sum per (window_start_us, event_type)."""
    from reffy_ray.ops.window import tumbling_agg

    return tumbling_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )
    )


def q_hopping_window(sf_dir: str):
    """1-hour windows hopping every 15 min (ops/window.hopping_agg):
    each event lands in 4 overlapping windows; in-block combiner
    re-reduces before the shuffle."""
    from reffy_ray.ops.window import hopping_agg

    return hopping_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )
    )


def q_cms_counts(sf_dir: str):
    """Count-min sketch estimates (ops/stats.cms_counts) for the bm25
    query terms over the corpus vocabulary — deterministic hashing
    makes the sketch (collisions included) exactly SQL-restatable."""
    import re as _re

    from reffy_ray.ops.stats import cms_counts

    tok = _re.compile(r"\w+")

    def words(batch):
        out = []
        for t in batch.column("text").to_pylist():
            out.extend(tok.findall(t.lower()))
        return out

    return cms_counts(
        _docs(sf_dir, columns=("text",)),
        words,
        terms=("hash", "join", "vector", "stream"),
    )


def q_zscore_outliers(sf_dir: str):
    """Per-event-type |x−μ|>3σ outliers with zero float arithmetic
    (ops/stats.zscore_outliers — the test cross-multiplied into exact
    int64): combiner stats pass + broadcast + vectorized filter."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import zscore_outliers

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "x": pc.cast(pc.floor(b.column("value")), pa.int64()),
            }
        )

    return zscore_outliers(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="event_type",
        value="x",
        id_col="event_id",
        z=3,
    )


def q_bloom_semi_join(sf_dir: str):
    """Bloom-filter pre-join (ops/joins.bloom_semi_join): lineitem rows
    whose order key passes an m=8192/k=3 filter of urgent orders —
    deterministic false positives, so the oracle reproduces them."""
    from reffy_ray.ops.joins import bloom_semi_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )
    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).filter(expr="o_orderpriority == '1-URGENT'")
    return bloom_semi_join(
        li, urgent, probe_key="l_orderkey", build_key="o_orderkey"
    )


def q_tfidf_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document (ops/text.tfidf_terms) with
    all-integer (tf×1e6)//df scores and a DISTRIBUTED token join for
    the df attachment (no vocabulary broadcast)."""
    from reffy_ray.ops.text import tfidf_terms

    return tfidf_terms(_docs(sf_dir, columns=("doc_id", "text")), k=3)


def q_corr_stats(sf_dir: str):
    """Per-event-type Pearson sufficient statistics
    (ops/stats.corr_stats) between hour-of-day and value cents — six
    exact int64 sums; corr itself is a driver-side formula."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import corr_stats

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": pc.cast(pc.hour(b.column("ts")), pa.int64()),
                "cents": pc.cast(
                    pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    return corr_stats(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="event_type",
        x="hour",
        y="cents",
    )


def q_winsorize(sf_dir: str):
    """Per-returnflag winsorization of extended price at the exact
    discrete [p01, p99] quantiles (ops/stats.winsorize): tiny bounds
    broadcast + pure vectorized clip, the fact table never shuffles."""
    from reffy_ray.ops.stats import winsorize

    return winsorize(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_extendedprice"],
        ),
        by="l_returnflag",
        value="l_extendedprice",
    )


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts between event types within
    each user's stream (ops/window.event_transitions): one sort,
    per-block partial counts, census-stitched block boundaries."""
    from reffy_ray.ops.window import event_transitions

    return event_transitions(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
    )


def q_user_paths(sf_dir: str):
    """Ordered collect: each user's full event-type path string
    (ops/window.user_paths — string_agg ORDER BY ts, event_id)."""
    from reffy_ray.ops.window import user_paths

    return user_paths(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
    )


def q_heavy_hitters(sf_dir: str):
    """Exact two-pass φ-frequent vocabulary words
    (ops/stats.heavy_hitters): per-block local-frequency candidates,
    then broadcast-verified exact counts — no full-vocabulary shuffle."""
    import re as _re

    from reffy_ray.ops.stats import heavy_hitters

    tok = _re.compile(r"\w+")

    def words(batch):
        out = []
        for t in batch.column("text").to_pylist():
            out.extend(tok.findall(t.lower()))
        return out

    return heavy_hitters(_docs(sf_dir, columns=("text",)), words, phi=0.01)


def q_priority_sample(sf_dir: str):
    """Deterministic bottom-k uniform sample
    (ops/sampling.priority_sample): k=256 smallest salted-md5
    priorities, per-block partial bottom-k, no global sort."""
    from reffy_ray.ops.sampling import priority_sample

    return priority_sample(_docs(sf_dir, columns=("doc_id",)), k=256)


def q_nation_revenue(sf_dir: str):
    """TPC-H Q5-style star join: lineitem → orders → customer →
    nation, revenue per nation. Scale shape: revenue is converted to
    integer cents PER ROW (floor(x*100+0.5) on the identical double in
    both engines — from there every sum is exact int64, no float
    accumulation anywhere), lineitem is pre-aggregated by orderkey
    before the first join (combiner: the join moves one row per order,
    not one per line item), the two fact joins are hash joins
    materialized apart, and the 25-row nation dim is a broadcast
    lookup, never a shuffle."""
    import numpy as np

    from ray.data.aggregate import Sum
    from reffy_ray.util import join_ready, safe_num_blocks

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def rev_cents(b: pa.Table) -> pa.Table:
        # arrow out: Ray's sort-shuffle aggregate over pandas blocks is
        # ~16× slower than over arrow blocks (measured 18 s vs 1.1 s on
        # this very groupby at sf0.01)
        p = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = b.column("l_discount").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": b.column("l_orderkey").cast(pa.int64()),
                "c": pa.array(
                    np.floor(p * (1.0 - d) * 100.0 + 0.5).astype("int64")
                ),
            }
        )

    per_order = (
        li.map_batches(rev_cents, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    nation = {
        int(r["n_nationkey"]): r["n_name"]
        for r in rd.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).take_all()
    }
    import ray as _ray

    nref = _ray.put(nation)

    # dimension-broadcast tier: order→cust and cust→nation are lookup
    # maps, not fact tables. When they fit (well past sf0.1; the
    # threshold is rows, not bytes), ray.put them once and resolve
    # per-order rows to n_name in ONE stateless pass — no join
    # operators at all, identical math. Past the limit, the original
    # two hash joins (key-collocating shuffles) take over.
    BROADCAST_LIMIT = 5_000_000
    if orders.count() <= BROADCAST_LIMIT:
        odf = orders.to_pandas()
        cdf = rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        o2c = dict(
            zip(odf["o_orderkey"].astype("int64"), odf["o_custkey"].astype("int64"))
        )
        c2n = dict(
            zip(cdf["c_custkey"].astype("int64"), cdf["c_nationkey"].astype("int64"))
        )
        oref, cref = _ray.put(o2c), _ray.put(c2n)

        def resolve(b: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd
            import ray as _r

            o2c_m, c2n_m, nm = _r.get(oref), _r.get(cref), _r.get(nref)
            cust = b["o_orderkey"].astype("int64").map(o2c_m)
            nat = cust.map(c2n_m)
            out = pd.DataFrame(
                {"n_name": nat.map(nm), "c": b["c"].astype("int64")}
            ).dropna(subset=["n_name"])
            # per-batch partial: ≤25 rows leave each batch
            return out.groupby("n_name", as_index=False)["c"].sum()

        return (
            per_order.map_batches(resolve, batch_format="pandas")
            .groupby("n_name")
            .aggregate(Sum("c", alias_name="revenue_c"))
        )

    with_cust = orders.join(
        join_ready(per_order),
        join_type="inner",
        num_partitions=safe_num_blocks(per_order),
        on=("o_orderkey",),
    ).materialize()

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    with_nat = with_cust.join(
        join_ready(cust),
        join_type="inner",
        num_partitions=safe_num_blocks(with_cust),
        on=("o_custkey",),
    ).materialize()

    def name_of(b: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        import ray as _ray2

        nm = _ray2.get(nref)
        return pd.DataFrame(
            {
                "n_name": b["c_nationkey"].map(nm),
                "c": b["c"].astype("int64"),
            }
        )

    return (
        with_nat.map_batches(name_of, batch_format="pandas")
        .groupby("n_name")
        .aggregate(Sum("c", alias_name="revenue_c"))
    )


def q_weighted_sample(sf_dir: str):
    """Length-weighted Bernoulli sampling
    (ops/sampling.weighted_sample): keep probability n_chars/1000,
    integer hash threshold, pure map."""
    from reffy_ray.ops.sampling import weighted_sample

    return weighted_sample(
        _docs(sf_dir, columns=("doc_id", "text", "lang", "source", "n_chars")),
        weight_col="n_chars",
        denom=1000,
    )


def q_watermark_window(sf_dir: str):
    """Daily tumbling windows with watermark accounting: per event-time
    window, how many events arrived on-time vs late (per
    ops/window.late_events' sharded-arrival watermark) and the total
    microseconds of lateness — the corrections budget a streaming
    sink must reprocess. Composite: late_events → bucket_join back to
    event ts → per-block window partials → one tiny window groupby."""
    import pyarrow.compute as pc

    from reffy_ray.ops.window import late_events
    from reffy_ray.util import bucket_join, join_ready

    DAY = 86_400_000_000
    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    lat = late_events(ev).select_columns(["event_id", "is_late", "late_us"])

    def ts_cols(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "event_id": b.column("event_id").cast(pa.int64()),
                "window_start_us": pc.multiply(
                    pc.floor(pc.divide(pc.cast(t, pa.float64()), DAY)),
                    float(DAY),
                ).cast(pa.int64()),
            }
        )

    wins = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    ).map_batches(ts_cols, batch_format="pyarrow")
    joined = bucket_join(join_ready(lat), join_ready(wins), on="event_id")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("window_start_us").aggregate(
            [("event_id", "count"), ("is_late", "sum"), ("late_us", "sum")]
        )
        return pa.table(
            {
                "window_start_us": g.column("window_start_us"),
                "n_events": pc.cast(g.column("event_id_count"), pa.int64()),
                "n_late": pc.cast(g.column("is_late_sum"), pa.int64()),
                "late_us_sum": pc.cast(g.column("late_us_sum"), pa.int64()),
            }
        )

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start_us": b.column("window_start_us"),
                "n_events": pc.cast(b.column("sum(n_events)"), pa.int64()),
                "n_late": pc.cast(b.column("sum(n_late)"), pa.int64()),
                "late_us_sum": pc.cast(
                    b.column("sum(late_us_sum)"), pa.int64()
                ),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start_us")
        .sum(["n_events", "n_late", "late_us_sum"])
        .map_batches(rename, batch_format="pyarrow")
    )


def q_event_pattern(sf_dir: str):
    """MATCH_RECOGNIZE-style skip-till-next-match instances
    (ops/patterns.event_pattern): per user, non-overlapping
    view→click→purchase triples in event-id stream order. One groupby
    shuffle; per-group loop bounded by #matches, not #events."""
    from reffy_ray.ops.patterns import event_pattern

    return event_pattern(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
    )


def q_event_gaps(sf_dir: str):
    """Per-user lag features (ops/window.event_gaps): microseconds
    since the previous event (-1 on stream starts) and 0-based stream
    position — one sort + census stitch, no per-group dispatch."""
    from reffy_ray.ops.window import event_gaps

    return event_gaps(rd.read_parquet(f"{sf_dir}/events.parquet"))


def q_late_events(sf_dir: str):
    """Streaming watermark lateness (ops/window.late_events): replay
    each user's events in the deterministic 4-shard arrival order
    (event_id % 4, event_id) and flag events arriving behind the
    per-user watermark max(seen ts) - 1 hour. One sort + census
    stitch + vectorized grouped-cummax pass."""
    from reffy_ray.ops.window import late_events

    return late_events(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
        )
    )


def q_bm25(sf_dir: str):
    """BM25 relevance (ops/text.bm25_scores) of every document against
    a fixed 4-term query over the corpus vocabulary; integer ×1e6
    emission."""
    from reffy_ray.ops.text import bm25_scores

    return bm25_scores(
        _docs(sf_dir, columns=("doc_id", "text")),
        terms=("hash", "join", "vector", "stream"),
    )


def _doc_graph_edges(sf_dir: str):
    """Deterministic undirected test graph over doc ids: intra-block
    chain (i, i+1) and skip link (i, i+2) within blocks of 10 (the
    skip links create triangles), plus a block-merging bridge
    (i, i+13) from every block head — so components span two blocks
    and have diameter ~20. Already canonical (a < b) and duplicate
    free."""
    import numpy as np

    docs = _docs(sf_dir, columns=("doc_id",))
    n = docs.count()

    def mk_edges(batch: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        i = batch["doc_id"].to_numpy().astype("int64")
        outs = []
        for step, keep in (
            (1, i % 10 < 9),
            (2, i % 10 < 8),
            (13, i % 10 == 0),
        ):
            m = keep & (i + step < n)
            outs.append(
                pd.DataFrame({"a": i[m], "b": i[m] + step})
            )
        return pd.concat(outs, ignore_index=True)

    return docs.map_batches(mk_edges, batch_format="pandas")


def q_cc_components(sf_dir: str):
    """Connected components (ops/sampling.connected_components:
    min-label CCF rounds) over the derived doc graph; representative =
    component min id."""
    from reffy_ray.ops.sampling import connected_components

    return connected_components(_doc_graph_edges(sf_dir))


def _kcore_edges(sf_dir: str):
    """Deterministic graph for the k-core query: the doc graph's
    intra-block chain + skip WITHOUT the block bridges (so peel
    cascades stay block-local, bounding peel depth by block size),
    plus a wrap-around circulant ring over hub nodes (doc_id % 7 == 0:
    ring step 7 and 14 modulo 7·#hubs) whose members always keep
    degree ≥ 4 and anchor the core. Canonical (a < b), duplicate
    free; converges in 5 peel rounds at every test scale."""
    import numpy as np

    docs = _docs(sf_dir, columns=("doc_id",))
    n = docs.count()
    if n < 29:
        # below 29 docs the hub ring wraps onto itself (step-7 and
        # step-14 edges can coincide as unordered pairs), and the
        # engine's per-batch dedup vs the oracle's global UNION dedup
        # would diverge; every test corpus has >= 500 docs
        raise ValueError("kcore derivation needs >= 29 documents")
    H = (n + 6) // 7
    M = 7 * H

    def mk_edges(batch: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        i = batch["doc_id"].to_numpy().astype("int64")
        outs = []
        for step, keep in ((1, i % 10 < 9), (2, i % 10 < 8)):
            m = keep & (i + step < n)
            outs.append(pd.DataFrame({"a": i[m], "b": i[m] + step}))
        h = i[i % 7 == 0]
        for step in (7, 14):
            t = (h + step) % M
            outs.append(
                pd.DataFrame(
                    {"a": np.minimum(h, t), "b": np.maximum(h, t)}
                )
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    return docs.map_batches(mk_edges, batch_format="pandas")


def q_kcore(sf_dir: str):
    """k-core backbone (ops/graph.kcore: iterative peeling, broadcast
    degree-partial tier) of the hub-anchored block graph at k=3 —
    surviving nodes with their in-core degree."""
    from reffy_ray.ops.graph import kcore

    return kcore(_kcore_edges(sf_dir), k=3)


def q_triangle_count(sf_dir: str):
    """Per-node triangle counts (ops/graph.triangles: wedge join +
    composite-key closing join) over the derived doc graph — the skip
    links make every chain step a triangle."""
    from reffy_ray.ops.graph import triangles

    return triangles(_doc_graph_edges(sf_dir), src_col="a", dst_col="b")


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS discovery depth (ops/graph.bfs_hops) over the
    derived doc graph: min hop distance from the seed set
    {doc_id % 100 == 0} within 4 hops — the crawl's seed-rank /
    discovery-depth ordering signal as a first-class graph query."""
    import numpy as np

    from reffy_ray.ops.graph import bfs_hops

    n = _docs(sf_dir, columns=("doc_id",)).count()
    seeds = np.arange(0, n, 100, dtype=np.int64)
    return bfs_hops(_doc_graph_edges(sf_dir), seeds, max_hops=4)


def q_interleave_sources(sf_dir: str):
    from reffy_ray.ops.sampling import interleave_sources

    return interleave_sources(_docs(sf_dir, columns=("doc_id", "source")))


def q_rank_buckets(sf_dir: str):
    from reffy_ray.ops.sampling import rank_buckets

    return rank_buckets(_docs(sf_dir, columns=("doc_id", "n_chars")))


def q_quality(sf_dir: str):
    from reffy_ray.ops.text import quality_score

    return _docs(sf_dir).map_batches(quality_score, batch_format="pyarrow")


def q_char_entropy(sf_dir: str):
    from reffy_ray.ops.text import char_entropy

    return _docs(sf_dir).map_batches(char_entropy, batch_format="pyarrow")


def q_exact_dedup(sf_dir: str):
    from reffy_ray.ops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    from reffy_ray.ops.text import lang_id_batch

    return _docs(sf_dir).map_batches(lang_id_batch, batch_format="pyarrow")


def q_fingerprint(sf_dir: str):
    from reffy_ray.ops.text import fingerprint_batch

    return _docs(sf_dir).map_batches(fingerprint_batch, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    from reffy_ray.ops.dedup import simhash_table

    return simhash_table(_docs(sf_dir))


def q_minhash_pairs(sf_dir: str):
    from reffy_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), jaccard_threshold=0.5).select_columns(
        ["a", "b", "est_jaccard"]
    )


def q_stratified_sample(sf_dir: str):
    """Per-language deterministic downsampling
    (ops/sampling.stratified_sample): keep 20% of English, 80% of
    Chinese, 100% of everything else — integer bucket thresholds on
    the same md5 scheme as hash_split, so it is float-free."""
    from reffy_ray.ops.sampling import stratified_sample

    return stratified_sample(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]),
        fracs={"en": 0.2, "zh": 0.8},
        default_frac=1.0,
    )


def q_jaccard_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard pairs within source blocks
    (ops/dedup.jaccard_pairs) at threshold 1/100 — the exact
    verification tier of the near-dup family; integer-only emission
    (inter, union_size) so the hash is float-free."""
    from reffy_ray.ops.dedup import jaccard_pairs

    return jaccard_pairs(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ),
        n=3, threshold_num=1, threshold_den=100,
    )


def q_doc_freq(sf_dir: str):
    from reffy_ray.ops.text import doc_freq

    return doc_freq(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    )


def q_top_terms(sf_dir: str):
    from reffy_ray.ops.text import top_terms

    return top_terms(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        n=5,
        max_df_frac=0.8,
    )


def q_sample_split(sf_dir: str):
    from reffy_ray.ops.sampling import hash_split

    return hash_split(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    )


def q_source_cap(sf_dir: str):
    from reffy_ray.ops.sampling import source_cap

    return source_cap(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        ),
        cap=20,
    )


def q_near_dup_clusters(sf_dir: str):
    from reffy_ray.ops.sampling import near_dup_clusters

    return near_dup_clusters(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        jaccard_threshold=0.5,
    )


def q_near_dedup(sf_dir: str):
    """Corpus filtered to near-dup cluster representatives + singletons
    (ops/sampling.near_dedup over the same LSH pair set as
    near_dup_clusters)."""
    from reffy_ray.ops.sampling import near_dedup

    return near_dedup(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        jaccard_threshold=0.5,
    ).select_columns(["doc_id"])


def q_quantize_embeddings(sf_dir: str):
    """Int8 embedding quantization (ops/similarity.quantize_embeddings):
    per-vector symmetric scale, floors computed in float64 on both
    sides; the query serializes the int8 payload to a comma-joined
    string purely for oracle-hash parity (the driver compare sorts by
    column values, which list columns break — storage stays int8 in
    the op)."""
    from reffy_ray.ops.similarity import quantize_embeddings

    out = quantize_embeddings(_embeddings(sf_dir))

    def flatten(b: pa.Table) -> pa.Table:
        qs = [",".join(str(int(v)) for v in vec)
              for vec in b.column("qvec").to_pylist()]
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "scale_ppm": b.column("scale_ppm"),
                "qvec": pa.array(qs, pa.string()),
            }
        )

    return out.map_batches(flatten, batch_format="pyarrow")


def q_curation_pipeline(sf_dir: str):
    """END-TO-END curation composite — the pipeline a training-data
    team actually runs, as one lazy Dataset chain with one exact SQL
    oracle: near-dedup to cluster representatives (MinHash LSH +
    distributed CC) → Gopher quality gates → exact 4-gram benchmark
    decontamination → per-language stratified downsampling → token
    budget cut (distributed prefix sum). Every stage streams; the only
    driver exchanges are the tiny label/census tables of the
    constituent ops."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import decontaminate, gopher_quality
    from reffy_ray.ops.sampling import (
        near_dedup,
        stratified_sample,
        token_budget_sample,
    )
    from reffy_ray.ops.text import quality_score
    from reffy_ray.util import filter_by_drop_ids

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    deduped = near_dedup(docs, jaccard_threshold=0.5)
    flags = gopher_quality(deduped, min_words=24)
    gated = filter_by_drop_ids(
        deduped,
        flags.filter(expr="keep == 0").select_columns(["doc_id"]).materialize(),
        "doc_id",
        1_000_000,
    )

    def part(is_bench: bool):
        def split(batch: pa.Table) -> pa.Table:
            m = pc.equal(_pa_mod(batch.column("doc_id"), 41), 0)
            return batch.filter(m if is_bench else pc.invert(m))

        return split

    bench = docs.map_batches(part(True), batch_format="pyarrow")
    train = gated.map_batches(part(False), batch_format="pyarrow")
    clean = decontaminate(train, bench, n=4, keep_cols=("doc_id", "text", "lang"))
    sampled = stratified_sample(clean, fracs={"en": 0.5}, default_frac=1.0)
    counts = sampled.map_batches(
        quality_score, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens"])
    return token_budget_sample(counts, budget=10_000)


def q_token_budget_sample(sf_dir: str):
    """Token-budget corpus selection (ops/sampling.token_budget_sample):
    docs in deterministic hash order until the running token sum
    reaches 20 000 — the distributed prefix-sum op; integer-only."""
    from reffy_ray.ops.sampling import token_budget_sample
    from reffy_ray.ops.text import quality_score

    counts = _docs(sf_dir).map_batches(
        quality_score, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens"])
    return token_budget_sample(counts, budget=20_000)


def q_near_dedup_best(sf_dir: str):
    """Near-dedup keeping the highest-alpha_ppm member per cluster
    (ops/sampling.near_dedup_best; ties by min doc_id) — same LSH
    pair set as near_dup_clusters, quality from ops/text.quality_score
    (integer ppm, so the winner choice is float-free)."""
    from reffy_ray.ops.sampling import near_dedup_best
    from reffy_ray.ops.text import quality_score

    docs = _docs(sf_dir)
    quality = docs.map_batches(quality_score, batch_format="pyarrow")
    return near_dedup_best(
        docs, quality, quality_col="alpha_ppm", jaccard_threshold=0.5
    ).select_columns(["doc_id"])


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (ops/curation.decontaminate): corpus
    docs sharing any exact word 4-gram with the held-out benchmark
    partition (doc_id % 41 == 0) are dropped; the benchmark n-gram set
    is broadcast once, the corpus streams."""
    from reffy_ray.ops.curation import decontaminate

    import pyarrow.compute as pc

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def part(is_bench: bool):
        def split(batch: pa.Table) -> pa.Table:
            m = pc.equal(_pa_mod(batch.column("doc_id"), 41), 0)
            return batch.filter(m if is_bench else pc.invert(m))

        return split

    bench = docs.map_batches(part(True), batch_format="pyarrow")
    train = docs.map_batches(part(False), batch_format="pyarrow")
    return decontaminate(train, bench, n=4)


def q_pii_redact(sf_dir: str):
    """PII redaction (ops/curation.pii_redact) over deterministically
    PII-laced text (the synthetic corpus contains none, so the query
    plants one email/IP/phone per doc — identically in the oracle)."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import pii_redact

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def lace(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string())
        octet = pc.cast(pc.bit_wise_and(batch.column("doc_id"), 255), pa.string())
        text = pc.binary_join_element_wise(
            batch.column("text"),
            " contact user", ids, "@example.com from 10.0.0.", octet,
            " call 555-123-4567.",
            "",  # element-wise separator (last positional arg)
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": text})

    return pii_redact(docs.map_batches(lace, batch_format="pyarrow"))


def q_gopher_quality(sf_dir: str):
    from reffy_ray.ops.curation import gopher_quality

    return gopher_quality(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        min_words=24,
    )


def q_normalize_text(sf_dir: str):
    """Whitespace/case normalization over deterministically messed-up
    input (upper-cased, padded) so the kernels are actually exercised."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import normalize_text

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def mess(batch: pa.Table) -> pa.Table:
        text = pc.binary_join_element_wise(
            "  ",
            pc.utf8_upper(batch.column("text")),
            "   TAIL x  ",
            "",  # element-wise separator (last positional arg)
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": text})

    return normalize_text(docs.map_batches(mess, batch_format="pyarrow"))


def q_top_k_per_group(sf_dir: str):
    from reffy_ray.ops.sampling import top_k_per_group

    return top_k_per_group(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
        ),
        k=10,
    )


def q_knn_join(sf_dir: str):
    from reffy_ray.ops.similarity import knn_join

    return knn_join(rd.read_parquet(f"{sf_dir}/embeddings.parquet"), k=3)


def q_group_centroids(sf_dir: str):
    """Per-label embedding centroids (ops/similarity.group_centroids),
    long-form (label, dim, centroid) rounded to 6 decimals."""
    from reffy_ray.ops.similarity import group_centroids

    return group_centroids(rd.read_parquet(f"{sf_dir}/embeddings.parquet"))


def q_repetition_stats(sf_dir: str):
    """Gopher repetition gates (ops/curation.repetition_stats) over
    deterministically line-structured input: a newline after every 5
    words, and docs with doc_id % 3 == 0 duplicated wholesale (planting
    a ~0.5 duplicate-line fraction) — identically in the oracle."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import repetition_stats

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def lace(batch: pa.Table) -> pa.Table:
        lined = pc.replace_substring_regex(
            batch.column("text"),
            pattern=r"(\w+ \w+ \w+ \w+ \w+) ",
            replacement="\\1\n",
        )
        dup = pc.binary_join_element_wise(lined, lined, "\n")
        mask = pc.equal(_pa_mod(batch.column("doc_id"), 3), 0)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "text": pc.if_else(mask, dup, lined)}
        )

    return repetition_stats(docs.map_batches(lace, batch_format="pyarrow"))


def q_chunk_tokens(sf_dir: str):
    """Fixed-window token chunking (ops/curation.chunk_tokens) with
    overlapping windows (window=16, stride=12)."""
    from reffy_ray.ops.curation import chunk_tokens

    return chunk_tokens(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        window=16,
        stride=12,
    )


def q_boilerplate(sf_dir: str):
    """Cross-document boilerplate removal
    (ops/curation.remove_boilerplate_lines): line-structured input with
    a footer planted in every doc and a second one in every even doc —
    both must be stripped corpus-wide (doc-frequency >= 3), natural
    lines survive."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import remove_boilerplate_lines

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def lace(batch: pa.Table) -> pa.Table:
        lined = pc.replace_substring_regex(
            batch.column("text"),
            pattern=r"(\w+ \w+ \w+ \w+ \w+) ",
            replacement="\\1\n",
        )
        with_footer = pc.binary_join_element_wise(
            lined, "all rights reserved footer", "\n"
        )
        extra = pc.binary_join_element_wise(
            with_footer, "subscribe to newsletter", "\n"
        )
        even = pc.equal(_pa_mod(batch.column("doc_id"), 2), 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.if_else(even, extra, with_footer),
            }
        )

    return remove_boilerplate_lines(
        docs.map_batches(lace, batch_format="pyarrow"), min_count=3
    )


def q_regression(sf_dir: str):
    """Per-user purchase-trend OLS (ops/stats.group_regression):
    y = cents on x = days since 2024-01-01, slope/intercept as exact
    integer num/den pairs."""
    import pyarrow.compute as pc

    from reffy_ray.ops.stats import group_regression

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    )
    epoch_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros

    def prep(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), "purchase")
        f = b.filter(m)
        us = pc.cast(f.column("ts"), pa.int64())
        days = pc.divide(pc.subtract(us, epoch_us), 86_400_000_000)
        return pa.table(
            {
                "user_id": f.column("user_id"),
                "day": pc.cast(days, pa.int64()),
                "cents": pc.cast(
                    pc.floor(pc.multiply(f.column("value"), 100.0)), pa.int64()
                ),
            }
        )

    return group_regression(
        ev.map_batches(prep, batch_format="pyarrow"),
        by="user_id", x="day", y="cents",
    )


def q_attribution(sf_dir: str):
    """Last-touch attribution (ops/joins.last_touch_attribution):
    each purchase credited to the user's latest click within 7 days,
    integer cents, -1/epoch sentinels for unattributed."""
    import pandas as pd

    from reffy_ray.ops.joins import last_touch_attribution

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"],
    )
    return last_touch_attribution(ev, window=pd.Timedelta(days=7))


def q_source_overlap(sf_dir: str):
    """Cross-source 8-gram contamination matrix
    (ops/dedup.source_overlap): distinct shared grams per source pair
    via one gram-keyed shuffle and an int64 source-bitmask per gram."""
    from reffy_ray.ops.dedup import source_overlap

    return source_overlap(
        rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
    )


def q_c4_clean(sf_dir: str):
    """C4 cleaning rules (ops/curation.c4_clean; Raffel et al. 2020
    §2.2) over a line-laced corpus: every 5-word group becomes a
    '.'-terminated line (the <5-word tail line fails the terminal-punct
    rule), every 7th doc gets a '{'-bearing code line (doc-level drop),
    and docs mentioning the badword 'vector' are dropped."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import c4_clean

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def lace(batch: pa.Table) -> pa.Table:
        lined = pc.replace_substring_regex(
            batch.column("text"),
            pattern=r"(\w+ \w+ \w+ \w+ \w+) ",
            replacement="\\1.\n",
        )
        coded = pc.binary_join_element_wise(
            lined, "this page uses code { sample }", "\n"
        )
        sev = pc.equal(_pa_mod(batch.column("doc_id"), 7), 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pc.if_else(sev, coded, lined),
            }
        )

    return c4_clean(
        docs.map_batches(lace, batch_format="pyarrow"),
        badwords=("vector",),
    )


def q_pack_chunks(sf_dir: str):
    """Sequence packing (ops/curation.pack_chunks) over the
    chunk_tokens output: 16 hash shards, 128-token training bins."""
    from reffy_ray.ops.curation import chunk_tokens, pack_chunks

    chunks = chunk_tokens(
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        window=16,
        stride=12,
    )
    return pack_chunks(chunks, budget=128, n_shards=16).select_columns(
        ["doc_id", "chunk_id", "shard", "n_tokens", "bin", "bin_pos"]
    )


def q_temperature_mix(sf_dir: str):
    """Temperature source mixing (ops/sampling.temperature_mix,
    alpha=0.5 exact-integer path) over a deterministically skewed
    source remap (60% of docs in one 'hot' source) — the synthetic
    table's sources are uniform, so the query plants the skew the
    operator exists to flatten, identically in the oracle."""
    import pyarrow.compute as pc

    from reffy_ray.ops.sampling import temperature_mix

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def remap(batch: pa.Table) -> pa.Table:
        hot = pc.less(_pa_mod(batch.column("doc_id"), 10), 6)
        cold = pc.binary_join_element_wise(
            "src", pc.cast(_pa_mod(batch.column("doc_id"), 4), pa.string()), ""
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": pc.if_else(hot, pa.scalar("hot"), cold),
            }
        )

    return temperature_mix(
        docs.map_batches(remap, batch_format="pyarrow"), alpha=0.5, keep_frac=0.5
    )


def q_asof_join(sf_dir: str):
    """As-of join (ops/joins.asof_join): each purchase event matched to
    the same user's most recent click at-or-before it (DuckDB
    ``ASOF LEFT JOIN`` semantics). Unmatched rows are coalesced to
    sentinels (epoch / -1) on BOTH sides so the emission is type-stable
    — DuckDB materializes NULL-bearing BIGINT as float64, which breaks
    the value hash even when every value matches."""
    import pyarrow.compute as pc

    from reffy_ray.ops.joins import asof_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    purchases = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id"]
    )
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"]
    )
    out = asof_join(purchases, clicks, on="ts", by="user_id").select_columns(
        ["event_id", "user_id", "ts", "ts_r", "event_id_r"]
    )

    def fill_sentinels(b: pa.Table) -> pa.Table:
        ts_r = pc.fill_null(b.column("ts_r"), pa.scalar(0, b.column("ts_r").type))
        eid = pc.fill_null(
            pc.cast(b.column("event_id_r"), pa.int64()), pa.scalar(-1, pa.int64())
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "ts_r": ts_r,
                "event_id_r": eid,
            }
        )

    return out.map_batches(fill_sentinels, batch_format="pyarrow")


def q_range_join(sf_dir: str):
    """Range join (ops/joins.range_join): line items that shipped
    within 90 days of their order's date (interval containment within
    the shared order key)."""
    import pyarrow.compute as pc

    from reffy_ray.ops.joins import range_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"],
    )
    odr = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )

    def add_end(b: pa.Table) -> pa.Table:
        end = pc.add(
            b.column("o_orderdate"),
            pa.scalar(90 * 86_400_000_000, pa.duration("us")),
        )
        b = b.append_column("o_end", end)
        return b.rename_columns(["l_orderkey", "o_orderdate", "o_end"])

    odr = odr.map_batches(add_end, batch_format="pyarrow")
    return range_join(
        li, odr, by="l_orderkey", left_on="l_shipdate", lo="o_orderdate", hi="o_end"
    ).select_columns(
        ["l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate", "o_end"]
    )


def q_rolling_window(sf_dir: str):
    """Trailing 7-day per-user rolling count/sum (ops/window.rolling_agg)
    — SQL RANGE-frame semantics; the summed value is integer cents so
    the result is bitwise stable across engines."""
    import pyarrow.compute as pc

    from reffy_ray.ops.window import rolling_agg

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def to_cents(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(b.column("value"), 100.0)), pa.int64())
        return b.drop_columns(["value"]).append_column("cents", cents)

    ev = ev.map_batches(to_cents, batch_format="pyarrow")
    out = rolling_agg(ev, by="user_id", ts="ts", value="cents", window="7 days")
    return out.select_columns(["event_id", "user_id", "ts", "w_count", "w_sum"])


def q_group_quantiles(sf_dir: str):
    """Exact discrete quantiles of extended price per return flag
    (ops/stats.group_quantiles, percentile_disc semantics — returned
    values are actual data elements, bitwise engine-independent)."""
    from reffy_ray.ops.stats import group_quantiles

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    return group_quantiles(li, by="l_returnflag", value="l_extendedprice")


def q_global_quantiles(sf_dir: str):
    """Exact global quantiles without a global sort
    (ops/stats.global_quantiles: histogram-CDF + bucket refinement)."""
    from reffy_ray.ops.stats import global_quantiles

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    return global_quantiles(li, value="l_extendedprice", qs=(0.5, 0.9, 0.99))


def q_global_quantiles_skew(sf_dir: str):
    """Exact global quantiles on a heavy-duplicate column (~95% zeros)
    with a deliberately tiny driver cap — exercises the recursive
    bucket refinement (ops/stats.global_quantiles): the hot zero bucket
    is re-histogrammed until min==max instead of collecting it."""
    from reffy_ray.ops.stats import global_quantiles

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    def derive(b: pa.Table) -> pa.Table:
        import numpy as np

        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        v = np.where(ok % 20 == 0, price.astype(np.float64), 0.0)
        return pa.table({"v": v})

    ds = li.map_batches(derive, batch_format="pyarrow")
    return global_quantiles(ds, value="v", qs=(0.5, 0.9, 0.99), driver_cap=1000)


def q_embedding_near_dups(sf_dir: str):
    from reffy_ray.ops.dedup import embedding_near_dups

    # threshold 0.3: the synthetic embeddings carry no planted
    # near-identical pairs (max cosine ≈0.51), so a production 0.95+
    # threshold would always return empty; a moderate threshold makes
    # the oracle check exercise the banding + verification machinery
    # on real pairs. The operator default stays 0.95.
    return embedding_near_dups(_embeddings(sf_dir), threshold=0.3).select_columns(
        ["a", "b", "cosine"]
    )


_IVF_CACHE: dict[str, Any] = {}


def q_ann_ivf(sf_dir: str):
    """Inverted-list IVF index probed at nprobe == n_centroids: every
    partition is read, so the result is exactly brute-force top-k (same
    oracle) while exercising the build → partitioned-write →
    partition-pruned-read path end to end."""
    import hashlib
    import shutil

    from reffy_ray.ops.similarity import IVFIndex

    idx = _IVF_CACHE.get(sf_dir)
    if idx is None:
        d = f"/tmp/reffy_ray_ivf/{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}"
        shutil.rmtree(d, ignore_errors=True)
        idx = IVFIndex.build(_embeddings(sf_dir), d, n_centroids=8)
        _IVF_CACHE[sf_dir] = idx
    qrows = (
        _embeddings(sf_dir).filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    )
    queries = np.stack(qrows["embedding"].to_numpy())
    out = idx.topk(queries, k=10, nprobe=len(idx.centroids))
    return out.select(["query_id", "vec_id"])


def q_ann_topk(sf_dir: str):
    from reffy_ray.ops.similarity import brute_force_topk

    emb = _embeddings(sf_dir)
    qrows = (
        emb.filter(expr="vec_id < 4").to_pandas().sort_values("vec_id")
    )
    queries = np.stack(qrows["embedding"].to_numpy())
    out = brute_force_topk(emb, queries, k=10)
    return out.select(["query_id", "vec_id"])


def q_idlparsed(sf_dir: str):
    """extract_idl → WebIDL parser actor stage (ST2) → defined names."""
    import json

    from reffy_ray.functions.webidl import parse_idl_batch
    from reffy_ray.stages.extract import extract_idl

    idl = _span_docs(sf_dir).map_batches(extract_idl, batch_format="pyarrow")
    parsed = idl.map_batches(parse_idl_batch, batch_format="pyarrow")

    def names(batch: pa.Table) -> pa.Table:
        out_doc, out_name = [], []
        for doc_id, rep in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("idlparsed").to_pylist(),
        ):
            for n in json.loads(rep or "{}").get("idlNames", {}):
                out_doc.append(doc_id)
                out_name.append(n)
        return pa.table(
            {"doc_id": pa.array(out_doc, pa.string()),
             "idl_name": pa.array(out_name, pa.string())}
        )

    return parsed.map_batches(names, batch_format="pyarrow")


def q_idlnames(sf_dir: str):
    """idlnames index (A3 groupby, first-in-crawl-order wins)."""
    import json

    from reffy_ray.functions.webidl import parse_idl_batch
    from reffy_ray.post.idlnames import idlnames
    from reffy_ray.stages.extract import extract_idl

    idl = _span_docs(sf_dir).map_batches(extract_idl, batch_format="pyarrow")
    parsed = idl.map_batches(parse_idl_batch, batch_format="pyarrow")

    def add_rank(batch: pa.Table) -> pa.Table:
        ranks = [int(d) for d in batch.column("doc_id").to_pylist()]
        return batch.append_column("seed_rank", pa.array(ranks, pa.int64()))

    out = idlnames(parsed.map_batches(add_rank, batch_format="pyarrow"))
    return out.select(["name", "defined_in"])


def q_backrefs(sf_dir: str):
    """backrefs wide join (J3): links × dfns over the derived corpus."""
    from reffy_ray.post.backrefs import backrefs
    from reffy_ray.stages.extract import extract_dfns, extract_links

    docs = _span_docs(sf_dir).materialize()
    links = docs.map_batches(extract_links, batch_format="pyarrow")
    dfns = docs.map_batches(extract_dfns, batch_format="pyarrow").select_columns(
        ["doc_id", "id", "href", "type", "access"]
    )
    out = backrefs(links, dfns)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_refs = pc.list_value_length(batch.column("referenced_by"))
        return pa.table(
            {
                "defining_doc": batch.column("defining_doc"),
                "href": batch.column("href"),
                "n_refs": pc.cast(n_refs, pa.int64()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def q_annotate_links(sf_dir: str):
    """annotate-links broadcast join (J2) over the fixture corpus
    (rows-only: depends on the fixture spec list, not the sf tables)."""
    import pyarrow as pa
    import ray.data as rd

    from reffy_ray.post.annotate_links import annotate_links
    from reffy_ray.sources.corpus import fixture_html, fixture_seeds
    from reffy_ray.stages.extract import extract_links
    from reffy_ray.stages.parse import spans_from_html
    from reffy_ray.schemas import SPAN_STRUCT

    seeds = fixture_seeds()
    rows = []
    for s in seeds.to_pylist():
        html = fixture_html(s["nightly_url"]) or ""
        rows.append(
            {
                "doc_id": s["shortname"],
                "spans": spans_from_html(html, s["nightly_url"]),
                "url": s["nightly_url"],
            }
        )
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows]),
                "spans": pa.array([r["spans"] for r in rows], pa.list_(SPAN_STRUCT)),
                "url": pa.array([r["url"] for r in rows]),
            }
        )
    )
    links = docs.map_batches(extract_links, batch_format="pyarrow")
    return annotate_links(links, seeds).to_pandas()


def q_annotate_links_sf(sf_dir: str):
    """annotate-links broadcast join (J2) over the testdata corpus: a
    deterministic 50-spec list matches the spec-<k> link targets the
    derivation plants, so the join is oracle-checkable."""
    from reffy_ray.post.annotate_links import annotate_links
    from reffy_ray.stages.extract import extract_links

    import pyarrow.compute as pc

    links = _span_docs(sf_dir).map_batches(extract_links, batch_format="pyarrow")
    seeds = pa.table(
        {
            "shortname": pa.array([f"spec-{k}" for k in range(50)]),
            "url": pa.array(
                [f"https://specs.example.org/spec-{k}/" for k in range(50)]
            ),
            "nightly_url": pa.array(
                [f"https://specs.example.org/spec-{k}/" for k in range(50)]
            ),
            "release_url": pa.array([None] * 50, pa.string()),
            "pages": pa.array([[] for _ in range(50)], pa.list_(pa.string())),
            "seed_rank": pa.array(list(range(50)), pa.int64()),
        }
    )
    out = annotate_links(links, seeds).select_columns(
        ["doc_id", "page_url", "spec_shortname"]
    )

    def fill(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("spec_shortname")
        return b.set_column(
            i, "spec_shortname", pc.fill_null(b.column("spec_shortname"), "")
        )

    return out.map_batches(fill, batch_format="pyarrow")


def q_span_stream(sf_dir: str):
    """The north rule's own per-row invariant as an oracle query: the
    exploded interleaved span stream (kind, media_ref, order) of every
    parsed document. The SQL reconstructs the exact span sequence the
    SpanParser emits for the deterministic testdata→HTML derivation
    (predictor verified exact over doc_ids 0..5000 incl. empty /
    whitespace-only text), so a value-hash match pins the parser's
    span ordering contract at sf scale. Text payloads are extractor
    territory (the 13 *_from_text oracles); this query pins the
    sequence itself."""
    import pyarrow.compute as pc

    def explode(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "seq": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.string()),
                    "media_ref": pa.array([], pa.string()),
                }
            )
        combined = b.column("spans").combine_chunks()
        flat = pc.list_flatten(combined)
        parents = pc.list_parent_indices(combined)
        doc_ids = pc.cast(pc.take(b.column("doc_id"), parents), pa.int64())
        return pa.table(
            {
                "doc_id": doc_ids,
                "seq": pc.cast(pc.struct_field(flat, "offset"), pa.int64()),
                "kind": pc.struct_field(flat, "kind"),
                "media_ref": pc.struct_field(flat, "media_ref"),
            }
        )

    return _span_docs(sf_dir).map_batches(explode, batch_format="pyarrow")


def q_span_runs(sf_dir: str):
    """Run-length encoding of the interleaved span stream
    (ops/multimodal.span_runs): maximal same-kind stretches per
    document — zero-shuffle, fully vectorized (dictionary-encoded
    kind codes + boundary diff)."""
    from reffy_ray.ops.multimodal import span_runs

    return _span_docs(sf_dir).map_batches(span_runs, batch_format="pyarrow")


def q_span_sections(sf_dir: str):
    """Heading-delimited section profile of the interleaved span
    stream (ops/multimodal.span_sections): per-section span/media
    counts — zero-shuffle cumsum + reduceat kernel."""
    from reffy_ray.ops.multimodal import span_sections

    return _span_docs(sf_dir).map_batches(span_sections, batch_format="pyarrow")


def q_span_templates(sf_dir: str):
    """Structural template clusters (ops/multimodal.span_templates):
    documents sharing an identical span kind-sequence md5 — the
    boilerplate-template dedup signal; per-batch fingerprint + one
    fingerprint groupby."""
    from reffy_ray.ops.multimodal import span_templates

    return span_templates(_span_docs(sf_dir))


def q_pack_interleaved(sf_dir: str):
    """Multimodal sequence packing: greedy budget-128 chunking of the
    interleaved span stream (prose = token count, figure = 64-patch
    media cost, structural spans = 1). Oracle replays the same greedy
    reset-scan as a recursive CTE over the span_stream reconstruction."""
    from functools import partial

    from reffy_ray.ops.multimodal import pack_interleaved

    return _span_docs(sf_dir).map_batches(
        partial(pack_interleaved, budget=128, media_cost=64),
        batch_format="pyarrow",
    )


def q_media_manifest(sf_dir: str):
    """Interleaved media spans → manifest (multimodal column plumbing)."""
    from reffy_ray.ops.multimodal import media_manifest

    return _span_docs(sf_dir).map_batches(media_manifest, batch_format="pyarrow")


def q_media_text_pairs(sf_dir: str):
    """Image-text pair mining: media span + caption + nearest preceding
    prose context (title fallback). Oracle: figures live on %13 docs and
    the nearest preceding prose is the whitespace-collapsed document
    text (title 'Doc N' when the text is blank)."""
    from reffy_ray.ops.multimodal import media_text_pairs

    return _span_docs(sf_dir).map_batches(media_text_pairs, batch_format="pyarrow")


def q_media_dedup(sf_dir: str):
    """Cross-document exact media dedup by payload content hash
    (ops/multimodal.media_dedup): two synth_media_batch_real batches
    with different seeds share EVERY payload byte-for-byte (pixel/
    sample/box rules are all seed-independent as of the MP4-skeleton
    change) — so every row has exactly one cross-seed duplicate and
    the canonical (min media_id) is the seed-0 row. The
    engine hashes REAL payload bytes; the oracle predicts the groups
    from the closed-form generation rules, so a codec or generator
    drift breaks the match."""
    from reffy_ray.ops.multimodal import media_dedup, synth_media_batch_real

    media = rd.from_arrow(
        pa.concat_tables(
            [synth_media_batch_real(150, seed=0),
             synth_media_batch_real(150, seed=1)]
        )
    )
    return media_dedup(media)


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style grouped aggregate (generic relational capability)."""
    from ray.data.aggregate import Count, Sum

    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Count(alias_name="n_rows"),
    )

    def round_cols(b: pa.Table) -> pa.Table:
        # cents trick: round(sum*100) → int → /100 gives a bitwise-stable
        # double on both engines (plain round-to-2dp leaves the two sums
        # an ulp apart when their unrounded values differ by float
        # summation order)
        for col in ("sum_qty", "sum_price"):
            cents = pc.cast(pc.round(pc.multiply(b.column(col), 100.0)), pa.int64())
            b = b.set_column(
                b.schema.get_field_index(col), col,
                pc.divide(pc.cast(cents, pa.float64()), 100.0),
            )
        return b

    return out.map_batches(round_cols, batch_format="pyarrow")


def q_orders_by_segment(sf_dir: str):
    """Broadcast hash join orders⋈customer + grouped count."""
    import pandas as pd
    import ray

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    _cache: dict = {}

    def join_seg(b: pd.DataFrame) -> pd.DataFrame:
        # task-based broadcast lookup with a per-worker-process cache —
        # an actor pool here only pays spin-up (round-2 perf journal)
        key = seg_ref.hex()
        seg = _cache.get(key)
        if seg is None:
            seg = ray.get(seg_ref)
            _cache[key] = seg
        b = b.copy()
        b["c_mktsegment"] = b["o_custkey"].map(seg)
        return b[["o_orderkey", "c_mktsegment"]]

    from ray.data.aggregate import Count

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = orders.map_batches(join_seg, batch_format="pandas")
    return joined.groupby("c_mktsegment").aggregate(Count(alias_name="n_orders"))


def q_events_window(sf_dir: str):
    """Tumbling daily window per event_type (streaming-shaped op)."""
    import pandas as pd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def window(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["day"] = b["ts"].dt.floor("D")
        g = (
            b.groupby(["event_type", "day"], as_index=False)
            .agg(n=("value", "size"), sum_value=("value", "sum"))
        )
        return g

    partial = ds.map_batches(window, batch_format="pandas")

    # merge partials (pre-aggregation pattern: combine inside map_batches,
    # small groupby on the partials)
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "day": [g["day"].iloc[0]],
                "n": [int(g["n"].sum())],
                # scaled-integer snap (see q_lineitem_agg): bitwise-stable
                # 4-dp double on both engines
                "sum_value": [round(float(g["sum_value"].sum()) * 1e4) / 1e4],
            }
        )

    return partial.groupby(["event_type", "day"]).map_groups(merge, batch_format="pandas")


# --- post-stage queries over testdata-derived inputs ----------------------
# These exercise the crawl-level post-processors (S8 merger, A4
# cssmerge, A5 events consolidation) on inputs derived deterministically
# from the documents table, so a DuckDB oracle can restate the merged
# result directly. Derivation rules live in the builder fns below —
# keep in sync with the oracle SQL.


def q_merge_crawl(sf_dir: str):
    """S8 merge_crawl_results: reference crawl = every doc, new crawl =
    doc_id % 4 == 0 re-crawls; merged = anti-join + union + sort."""
    import pyarrow.compute as pc

    from reffy_ray.post.sinks import merge_crawl_results

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(tag: str, mod: int | None = None):
        def fn(b: pa.Table) -> pa.Table:
            import numpy as np_

            ids = b.column("doc_id")
            if mod is not None:
                keep = (ids.to_numpy(zero_copy_only=False) % mod) == 0
                ids = ids.filter(pa.array(keep))
            sid = pc.cast(ids, pa.string())
            url = pc.binary_join_element_wise(
                "https://corpus.example.org/doc-", sid, "/", ""
            )
            title = pc.binary_join_element_wise(tag + " ", sid, "")
            return pa.table(
                {
                    "url": url,
                    "title": title,
                    "status": pa.array([tag] * len(ids), pa.string()),
                    "doc_id": ids,
                }
            )

        return fn

    ref = docs.map_batches(build("ref"), batch_format="pyarrow")
    new = docs.map_batches(build("new", mod=4), batch_format="pyarrow")
    merged = merge_crawl_results(ref, new, key="url")
    return merged.select_columns(["url", "title", "status"])


def q_cssmerge(sf_dir: str):
    """A4 merge_css (faithful cssmerge.js consolidation): every
    doc_id % 8 == 0 doc is a spec defining property p<doc_id % 20>;
    docs with doc_id % 16 == 0 carry the base definition (value
    v<(doc_id//16) % 5>), the others extend it (newValues
    n<doc_id % 5>). Specs of one property share a series; the base is
    the latest level, newValues union in crawl order with extension
    hrefs recorded under `extended`."""
    import json

    import pandas as pd

    from reffy_ray.post.cssmerge import merge_css

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(b: pd.DataFrame) -> pd.DataFrame:
        out = {
            "doc_id": [], "crawl_rank": [], "css_json": [], "shortname": [],
            "series_shortname": [], "series_version": [], "crawled": [],
            "url": [],
        }
        for i in b["doc_id"].to_numpy():
            i = int(i)
            if i % 8 != 0:
                continue
            href = f"https://corpus.example.org/doc-{i}/#propdef-p{i}"
            prop = {"name": f"p{i % 20}", "href": href}
            if i % 16 == 0:
                prop["value"] = f"v{(i // 16) % 5}"
            else:
                prop["newValues"] = f"n{i % 5}"
            out["doc_id"].append(str(i))
            out["crawl_rank"].append(i)
            out["css_json"].append(json.dumps({
                "properties": [prop], "atrules": [], "selectors": [],
                "values": [],
            }))
            out["shortname"].append(f"doc-{i}")
            out["series_shortname"].append(f"ser-p{i % 20}")
            out["series_version"].append(str(1 + i % 3))
            out["crawled"].append(f"https://corpus.example.org/doc-{i}/")
            out["url"].append(f"https://corpus.example.org/doc-{i}/")
        return pd.DataFrame(out)

    specs = docs.map_batches(build, batch_format="pandas")
    return merge_css(specs).to_pandas()


def q_events_consolidated(sf_dir: str):
    """A5/J4 consolidate_events: originals for doc_id % 9 == 0 (target
    MixinA when doc_id % 18 == 0, else IFace<doc_id % 4>), extension
    rows for doc_id % 9 == 3 extending the event of doc_id − 3; one
    idlparsed report declares IncA/IncB include MixinA. Consolidation
    expands the mixin, folds extensions into the original's target set
    and sorts."""
    import json

    import pandas as pd

    from reffy_ray.post.events import consolidate_events

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i in b["doc_id"].to_numpy():
            i = int(i)
            if i % 9 == 0:
                rows.append(
                    {
                        "type": f"ev{i % 7}",
                        "interface": "Event",
                        "bubbles": True,
                        "cancelable": False,
                        "href": f"https://corpus.example.org/doc-{i}/#eventdef-{i}",
                        "targets": ["MixinA"] if i % 18 == 0 else [f"IFace{i % 4}"],
                        "is_extension": False,
                    }
                )
            elif i % 9 == 3 and i >= 3:
                o = i - 3
                rows.append(
                    {
                        "type": f"ev{o % 7}",
                        "interface": None,
                        "bubbles": None,
                        "cancelable": None,
                        "href": f"https://corpus.example.org/doc-{o}/#eventdef-{o}",
                        "targets": [f"IFaceX{i % 5}"],
                        "is_extension": True,
                    }
                )
        return pd.DataFrame(
            rows,
            columns=[
                "type", "interface", "bubbles", "cancelable", "href",
                "targets", "is_extension",
            ],
        )

    events = docs.map_batches(build, batch_format="pandas")
    idlparsed = rd.from_items(
        [
            {
                "doc_id": "mixins",
                "idlparsed": json.dumps(
                    {
                        "idlExtendedNames": {
                            "IncA": [{"type": "includes", "includes": "MixinA"}],
                            "IncB": [{"type": "includes", "includes": "MixinA"}],
                        }
                    }
                ),
            }
        ]
    )
    out = consolidate_events(events, idlparsed).to_pandas()
    out["targets"] = out["targets"].map(
        lambda t: ",".join(t) if t is not None else ""
    )
    return out[["type", "interface", "bubbles", "href", "targets"]]


def q_crawl_fixture(sf_dir: str):
    """Flagship crawl pipeline over the fixture corpus (rows-only
    check: crawl semantics are not SQL-expressible)."""
    import tempfile

    from reffy_ray.pipelines.crawl import CrawlConfig, crawl
    from reffy_ray.sources.corpus import fixture_seeds

    with tempfile.TemporaryDirectory() as ckpt:
        res = crawl(
            fixture_seeds(),
            CrawlConfig(mode="fixture", checkpoint_dir=ckpt, num_seen_shards=4,
                        num_gates=2),
        )
        docs = res.ordered_documents().to_pandas()
    return docs[["doc_id", "url", "seed_rank", "depth", "status"]]


def q_frame_sample(sf_dir: str):
    """Video frame sampling (ops/multimodal.sample_frames): one row per
    sampled frame at 500 ms steps, ≤8 frames per video. The video table
    is derived deterministically from documents (every third doc is a
    'video' with duration 1000 + (doc_id % 97)·250 ms) — same
    fixture-derivation pattern as merge_crawl. Integer-only output."""
    import numpy as np

    from reffy_ray.ops.multimodal import sample_frames

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def vids(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 3 == 2]
        dur = 1000 + (ids % 97) * 250
        return pa.table(
            {
                "media_id": pa.array([f"m-{i}" for i in ids], pa.string()),
                "duration_ms": pa.array(dur, pa.int64()),
            }
        )

    return sample_frames(
        docs.map_batches(vids, batch_format="pyarrow"), step_ms=500, max_frames=8
    )


def q_media_features(sf_dir: str):
    """REAL multimodal decode inside the MediaDecoder actor pool
    (pure-numpy codecs, ops/codecs.py): PPM and PNG images decoded to
    pixels, RIFF WAVE PCM16 audio to samples, and MP4 video probed
    via a real ISO-BMFF box walk (width/height/duration/sample count
    — the frame decode itself is the one stub left). The synthetic
    payloads follow closed-form rules (synth_media_batch_real
    docstring), so the oracle verifies every decoded/probed value
    analytically."""
    from reffy_ray.ops.multimodal import MediaDecoder, synth_media_batch_real

    media = rd.from_arrow(synth_media_batch_real(256))
    decoded = media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": False},
        batch_format="pyarrow",
        concurrency=2,
    )

    def flatten(b: pa.Table) -> pa.Table:
        feats = b.column("feature").to_pylist()
        names = ["dim_a", "dim_b", "channels", "units",
                 "v_first", "v_last", "v_min", "v_max"]
        cols = {
            "media_id": b.column("media_id"),
            "kind": b.column("kind"),
            "decode_status": b.column("decode_status"),
        }
        for j, name in enumerate(names):
            cols[name] = pa.array(
                [None if f is None else int(f[j]) for f in feats], pa.int64()
            )
        return pa.table(cols)

    return decoded.map_batches(flatten, batch_format="pyarrow")


def q_duplicated_substrings(sf_dir: str):
    """Suffix-group substring dedup detection (ops/substr,
    Lee et al. 2021 shape): every 32-char gram shared by ≥2 docs."""
    from reffy_ray.ops.substr import duplicated_substrings

    return duplicated_substrings(_docs(sf_dir), n=32, min_docs=2)


def q_substring_dedup(sf_dir: str):
    """Documents kept after substring-level dedup: drop docs ≥50%
    covered by 32-grams shared with other documents."""
    from reffy_ray.ops.substr import substring_dedup

    return substring_dedup(
        _docs(sf_dir), n=32, min_docs=2, max_dup_frac=0.5
    ).select_columns(["doc_id"])


def q_fuzzy_decontaminate(sf_dir: str):
    """Fuzzy benchmark decontamination
    (ops/curation.fuzzy_decontaminate): train docs (doc_id % 41 != 0)
    MinHash-near-dup (est Jaccard ≥ 0.5, same LSH parameters as
    minhash_pairs) to any benchmark doc (doc_id % 41 == 0) are
    dropped; returns the kept train ids."""
    import pyarrow.compute as pc

    from reffy_ray.ops.curation import fuzzy_decontaminate

    docs = _docs(sf_dir)

    def part(is_bench: bool):
        def split(batch: pa.Table) -> pa.Table:
            m = pc.equal(_pa_mod(batch.column("doc_id"), 41), 0)
            return batch.filter(m if is_bench else pc.invert(m))

        return split

    bench = docs.map_batches(part(True), batch_format="pyarrow")
    train = docs.map_batches(part(False), batch_format="pyarrow")
    return fuzzy_decontaminate(
        train, bench, jaccard_threshold=0.5
    ).select_columns(["doc_id"])


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic dedup (ops/dedup.semantic_dedup):
    grid-cell bucketing on the first two embedding dims, keep-first
    within cell at cosine ≥ 0.3 (the synthetic embeddings' max cosine
    is ≈0.51, so a production 0.95 threshold would be vacuous — same
    rationale as embedding_near_dups)."""
    from reffy_ray.ops.dedup import semantic_dedup

    return semantic_dedup(_embeddings(sf_dir), threshold=0.3)


def q_quality_classifier(sf_dir: str):
    """Hashed linear quality classifier (ops/classify.quality_classifier):
    fasttext-style bag-of-words scorer — feature j = H(word) mod 64,
    deterministic milli-unit weights w[j] = (j·2654435761) mod 2001
    built once per actor, per-doc floor-mean score — exact int64
    end-to-end, keep at score_milli ≥ 1000."""
    from reffy_ray.ops.classify import quality_classifier

    return quality_classifier(_docs(sf_dir), dim=64, threshold_milli=1000)


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (ops/classify.dsir_weights; Xie et al.
    2023): target domain = doc_id % 41 == 0 docs (the benchmark split
    the decontamination ops use), raw = the rest; weight = per-doc mean
    log2 p_target(w) − log2 p_raw(w), add-one smoothed over the union
    vocab, snapped to 4 dp."""
    import pyarrow.compute as pc

    from reffy_ray.ops.classify import dsir_weights

    docs = _docs(sf_dir)

    def part(is_target: bool):
        def split(batch: pa.Table) -> pa.Table:
            m = pc.equal(_pa_mod(batch.column("doc_id"), 41), 0)
            return batch.filter(m if is_target else pc.invert(m))

        return split

    target = docs.map_batches(part(True), batch_format="pyarrow")
    raw = docs.map_batches(part(False), batch_format="pyarrow")
    return dsir_weights(raw, target)


def q_corpus_report(sf_dir: str):
    """Per-language corpus audit (ops/text.corpus_report): doc count,
    whitespace-token total, and exact distinct-payload count per
    detected language — all int64."""
    from reffy_ray.ops.text import corpus_report

    return corpus_report(_docs(sf_dir))


def q_ngram_novelty(sf_dir: str):
    """Per-doc first-occurrence 8-gram novelty share
    (ops/dedup.ngram_novelty): the incremental-value curve over
    ingestion order — shared gram explode, groupby-min first-doc
    table, hash join back."""
    from reffy_ray.ops.dedup import ngram_novelty

    return ngram_novelty(_docs(sf_dir, columns=("doc_id", "text")))


def q_dup_ngram_fraction(sf_dir: str):
    """Per-doc duplicated-8-gram fraction (ops/dedup.dup_ngram_fraction;
    Lee et al. 2022): share of each doc's distinct word 8-grams that
    occur in ≥2 documents — all-int64 (n_grams, n_dup, dup_ppm)."""
    from reffy_ray.ops.dedup import dup_ngram_fraction

    return dup_ngram_fraction(_docs(sf_dir), n=8)


def q_ccnet_buckets(sf_dir: str):
    """CCNet per-language perplexity tiers (ops/text.ccnet_buckets;
    Wenzek et al. 2020): per-doc unigram logppl + stopword lang-id,
    then EXACT within-language rank split into 3 equal-frequency
    buckets (0 = head). Rank order (logppl, doc_id) on the 4 dp-
    snapped signal; bucket math all-integer."""
    from reffy_ray.ops.text import ccnet_buckets

    return ccnet_buckets(_docs(sf_dir), buckets=3)


def q_unigram_logppl(sf_dir: str):
    """CCNet-style unigram LM quality signal (ops/text.unigram_logppl):
    per-doc mean −log2 p(token) under the corpus's own unigram LM,
    snapped to 4 dp (the repo's bitwise-stable float convention)."""
    from reffy_ray.ops.text import unigram_logppl

    return unigram_logppl(_docs(sf_dir))


def q_bigram_logppl(sf_dir: str):
    """Bigram LM quality signal (ops/text.bigram_logppl): per-doc mean
    −log2 p(w2|w1) under the corpus's own bigram LM, snapped to 4 dp
    (the repo's bitwise-stable float convention)."""
    from reffy_ray.ops.text import bigram_logppl

    return bigram_logppl(_docs(sf_dir))


def q_check_missing_dfns(sf_dir: str):
    """Missing-definitions checker (post/check_dfns, reference
    check-missing-dfns.js) over a deterministic fixture: every doc
    defines interface I<id> with attribute a<id> and method m<id>(x),
    plus a CSS "Missing definition" warning for --p<id> on even ids;
    dfn coverage varies by doc_id modulus so every cascade branch
    (exact, wrong-type fallback, wrong-args warning) is exercised."""
    import json as _json

    from reffy_ray.functions.webidl import parse_webidl
    from reffy_ray.post.check_dfns import check_missing_dfns

    def idl_fixture(batch: pa.Table) -> pa.Table:
        ids = [int(i) for i in batch.column("doc_id").to_pylist()]
        reports = [
            _json.dumps(
                parse_webidl(
                    f"interface I{i} {{ attribute DOMString a{i}; "
                    f"undefined m{i}(long x); }};"
                )
            )
            for i in ids
        ]
        return pa.table(
            {
                "doc_id": pa.array([str(i) for i in ids], pa.string()),
                "idlparsed": pa.array(reports, pa.large_string()),
            }
        )

    def dfns_fixture(batch: pa.Table) -> pa.Table:
        doc, lt, for_, typ = [], [], [], []

        def add(i, text, t, f=()):
            doc.append(str(i))
            lt.append([text])
            for_.append(list(f))
            typ.append(t)

        for i in (int(v) for v in batch.column("doc_id").to_pylist()):
            if i % 3 == 0:
                add(i, f"I{i}", "interface")
            if i % 4 == 0:
                add(i, f"a{i}", "attribute", [f"I{i}"])
            elif i % 4 == 1:
                add(i, f"a{i}", "dfn", [f"I{i}"])  # wrong type → fallback
            if i % 5 == 0:
                add(i, f"m{i}(x)", "method", [f"I{i}"])
            elif i % 5 == 1:
                add(i, f"m{i}(y)", "method", [f"I{i}"])  # wrong args → warning
            if i % 10 == 0:
                add(i, f"--p{i}", "property")
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.string()),
                "linking_text": pa.array(lt, pa.list_(pa.string())),
                "for": pa.array(for_, pa.list_(pa.string())),
                "type": pa.array(typ, pa.string()),
            }
        )

    def css_fixture(batch: pa.Table) -> pa.Table:
        ids = [
            int(i)
            for i in batch.column("doc_id").to_pylist()
            if int(i) % 2 == 0
        ]
        return pa.table(
            {
                "doc_id": pa.array([str(i) for i in ids], pa.string()),
                "category": pa.array(["warnings"] * len(ids), pa.string()),
                "payload_json": pa.array(
                    [
                        _json.dumps(
                            {
                                "msg": "Missing definition",
                                "name": f"--p{i}",
                                "type": "property",
                            }
                        )
                        for i in ids
                    ],
                    pa.large_string(),
                ),
            }
        )

    docs = _docs(sf_dir, columns=("doc_id",))
    out = check_missing_dfns(
        docs.map_batches(dfns_fixture, batch_format="pyarrow"),
        docs.map_batches(css_fixture, batch_format="pyarrow"),
        docs.map_batches(idl_fixture, batch_format="pyarrow"),
    )
    return out


def q_patch_dfns(sf_dir: str):
    """Spec-level dfn patching (post/patch_dfns, reference
    patch-dfns.js:13-51) over a deterministic dfn fixture derived from
    documents.doc_id: doc_id%8 picks the spec URL (6 patched patterns +
    2 unpatched), doc_id%3 the linking-text list, doc_id%5==0 adds a
    PermissionState `for` entry."""
    import pyarrow.compute as pc

    from reffy_ray.post.patch_dfns import patch_dfns

    bases = pa.array([
        "https://w3c.github.io/deviceorientation/",
        "https://www.w3.org/TR/orientation-event/",
        "https://wicg.github.io/portals/",
        "https://www.w3.org/TR/WebCryptoAPI/",
        "https://www.w3.org/TR/pub-manifest/",
        "https://www.w3.org/TR/audiobooks/",
        "https://example.org/spec-a/",
        "https://example.org/spec-b/",
    ])
    lt_opts = pa.array(
        [["PermissionState"], ["MessageEventSource", "other"], ["term"]],
        pa.list_(pa.string()),
    )
    for_opts = pa.array([[], ["PermissionState"]], pa.list_(pa.string()))

    def fixture(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        href = pc.binary_join_element_wise(
            pc.take(bases, _pa_mod(ids, 8)),
            pc.cast(ids, pa.string()),
            "#d",
        )
        return pa.table({
            "doc_id": ids,
            "href": href,
            "linking_text": pc.take(lt_opts, _pa_mod(ids, 3)),
            "for": pc.take(for_opts,
                           pc.cast(pc.equal(_pa_mod(ids, 5), 0), pa.int8())),
            "access": pa.nulls(batch.num_rows, pa.string()).fill_null("public"),
        })

    dfns = _docs(sf_dir, columns=("doc_id",)).map_batches(
        fixture, batch_format="pyarrow"
    )
    return patch_dfns(dfns).select_columns(["doc_id", "href", "access"])


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: crawl the fixture corpus AND parse the sf0.001 span
    corpus, return the merged heading extract."""
    sf_dir = "/root/testdata/sf0.001"
    return q_headings(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "headings_from_text": q_headings,
        "dfns_from_text": q_dfns,
        "idl_from_text": q_idl,
        "links_from_text": q_links,
        "link_hosts": q_link_hosts,
        "titles_from_text": q_titles,
        "meta_from_text": q_meta,
        "ids_from_text": q_ids,
        "refs_from_text": q_refs,
        "css_from_text": q_css,
        "events_from_text": q_events,
        "algorithms_from_text": q_algorithms,
        "cddl_from_text": q_cddl,
        "elements_from_text": q_elements,
        "token_count": q_token_count,
        "bpeish_tokens": q_bpeish_tokens,
        "quality_score": q_quality,
        "word_counts": q_word_counts,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "bigram_counts": q_bigram_counts,
        "skipgram_counts": q_skipgram_counts,
        "source_dup_stats": q_source_dup_stats,
        "exact_dedup": q_exact_dedup,
        "dup_size_hist": q_dup_size_hist,
        "vocab_size_by_lang": q_vocab_size_by_lang,
        "funnel_conversion": q_funnel_conversion,
        "sessionize": q_sessionize,
        "cohort_retention": q_cohort_retention,
        "line_dedup": q_line_dedup,
        "interleave_sources": q_interleave_sources,
        "rank_buckets": q_rank_buckets,
        "char_entropy": q_char_entropy,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "simhash": q_simhash,
        "minhash_pairs": q_minhash_pairs,
        "jaccard_pairs": q_jaccard_pairs,
        "stratified_sample": q_stratified_sample,
        "doc_freq": q_doc_freq,
        "top_terms": q_top_terms,
        "sample_split": q_sample_split,
        "source_cap": q_source_cap,
        "near_dup_clusters": q_near_dup_clusters,
        "near_dedup": q_near_dedup,
        "near_dedup_best": q_near_dedup_best,
        "token_budget_sample": q_token_budget_sample,
        "curation_pipeline": q_curation_pipeline,
        "quantize_embeddings": q_quantize_embeddings,
        "decontaminate": q_decontaminate,
        "pii_redact": q_pii_redact,
        "gopher_quality": q_gopher_quality,
        "normalize_text": q_normalize_text,
        "top_k_per_group": q_top_k_per_group,
        "knn_join": q_knn_join,
        "group_centroids": q_group_centroids,
        "repetition_stats": q_repetition_stats,
        "chunk_tokens": q_chunk_tokens,
        "temperature_mix": q_temperature_mix,
        "pack_chunks": q_pack_chunks,
        "boilerplate": q_boilerplate,
        "c4_clean": q_c4_clean,
        "source_overlap": q_source_overlap,
        "attribution": q_attribution,
        "regression": q_regression,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "rolling_window": q_rolling_window,
        "group_quantiles": q_group_quantiles,
        "global_quantiles": q_global_quantiles,
        "global_quantiles_skew": q_global_quantiles_skew,
        "embedding_near_dups": q_embedding_near_dups,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "merge_crawl": q_merge_crawl,
        "cssmerge": q_cssmerge,
        "events_consolidated": q_events_consolidated,
        "idlparsed": q_idlparsed,
        "idlnames": q_idlnames,
        "backrefs": q_backrefs,
        "annotate_links": q_annotate_links,
        "annotate_links_sf": q_annotate_links_sf,
        "span_stream": q_span_stream,
        "span_runs": q_span_runs,
        "span_sections": q_span_sections,
        "span_templates": q_span_templates,
        "pack_interleaved": q_pack_interleaved,
        "media_text_pairs": q_media_text_pairs,
        "media_manifest": q_media_manifest,
        "media_dedup": q_media_dedup,
        "frame_sample": q_frame_sample,
        "lineitem_agg": q_lineitem_agg,
        "orders_by_segment": q_orders_by_segment,
        "events_window": q_events_window,
        "crawl_fixture": q_crawl_fixture,
        "media_features": q_media_features,
        "patch_dfns": q_patch_dfns,
        "duplicated_substrings": q_duplicated_substrings,
        "substring_dedup": q_substring_dedup,
        "check_missing_dfns": q_check_missing_dfns,
        "unigram_logppl": q_unigram_logppl,
        "ccnet_buckets": q_ccnet_buckets,
        "dup_ngram_fraction": q_dup_ngram_fraction,
        "ngram_novelty": q_ngram_novelty,
        "pmi": q_pmi,
        "corpus_report": q_corpus_report,
        "bigram_logppl": q_bigram_logppl,
        "semantic_dedup": q_semantic_dedup,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "quality_classifier": q_quality_classifier,
        "dsir_weights": q_dsir_weights,
        "kmeans": q_kmeans,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "random_walks": q_random_walks,
        "biased_walks": q_biased_walks,
        "biased_walk_pairs": q_biased_walk_pairs,
        "node2vec_embeddings": q_node2vec_embeddings,
        "bucketed_walks": q_bucketed_walks,
        "bucketed_pagerank": q_bucketed_pagerank,
        "walk_pairs": q_walk_pairs,
        "cc_components": q_cc_components,
        "triangle_count": q_triangle_count,
        "bfs_hops": q_bfs_hops,
        "bm25": q_bm25,
        "weighted_sample": q_weighted_sample,
        "event_gaps": q_event_gaps,
        "late_events": q_late_events,
        "event_pattern": q_event_pattern,
        "kcore": q_kcore,
        "watermark_window": q_watermark_window,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "skew_join": q_skew_join,
        "nation_revenue": q_nation_revenue,
        "lang_fertility": q_lang_fertility,
        "daily_new_users": q_daily_new_users,
        "price_histogram": q_price_histogram,
        "user_top_event": q_user_top_event,
        "kmv_distinct": q_kmv_distinct,
        "event_type_pairs": q_event_type_pairs,
        "heavy_hitters": q_heavy_hitters,
        "priority_sample": q_priority_sample,
        "event_transitions": q_event_transitions,
        "user_paths": q_user_paths,
        "corr_stats": q_corr_stats,
        "winsorize": q_winsorize,
        "cms_counts": q_cms_counts,
        "zscore_outliers": q_zscore_outliers,
        "bloom_semi_join": q_bloom_semi_join,
        "tfidf_terms": q_tfidf_terms,
        "tumbling_window": q_tumbling_window,
        "hopping_window": q_hopping_window,
        "table_diff": q_table_diff,
        "debounce": q_debounce,
        "rare_gram_pairs": q_rare_gram_pairs,
        "pivot_counts": q_pivot_counts,
        "rollup": q_rollup,
        "cumulative": q_cumulative,
        "distinct_users": q_distinct_users,
        "rrf": q_rrf,
        "er_pairs": q_er_pairs,
        "max_concurrency": q_max_concurrency,
        "rolling_distinct": q_rolling_distinct,
        "pair_lift": q_pair_lift,
        "streaks": q_streaks,
        "inverted_index": q_inverted_index,
        "ab_test": q_ab_test,
        "share_of_total": q_share_of_total,
        "edit_distance": q_edit_distance,
        "trending_terms": q_trending_terms,
        "pareto": q_pareto,
        "decayed": q_decayed,
        "hll_users": q_hll_users,
        "interval_merge": q_interval_merge,
        "containment": q_containment,
    }


# --- hash-kernel oracles --------------------------------------------------
# Exact SQL recomputation of the md5-derived dedup/fingerprint kernels.
# Conventions shared with the Python kernels:
#   H(x)  = big-endian uint64 of md5(x)[:8]  ⇔  ('0x'||substr(md5(x),1,16))::UBIGINT
#   mod 2⁶⁴ arithmetic in HUGEINT (products < 2¹⁰⁴ never overflow 128 bits)

# ops/text.py Fingerprint: h = Horner fold of bytes of the
# whitespace-normalized text over base P=1099511628211 mod 2⁶⁴, emitted >>1.
# (ord() == utf-8 byte only for ASCII; the synthetic corpus is pure
# ASCII at every sf — verified — so the SQL fold matches the byte fold.)
_FINGERPRINT_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '^\s+|\s+$', '', 'g'),
                        '\s+', ' ', 'g') AS s
  FROM documents
), h AS (
  SELECT doc_id,
    CASE WHEN length(s) = 0 THEN 0::HUGEINT
    ELSE list_reduce(
      list_transform(range(1, length(s) + 1),
                     i -> ord(substr(s, i, 1))::HUGEINT),
      (acc, b) -> (acc * 1099511628211 + b) % 18446744073709551616::HUGEINT)
    END AS hv
  FROM norm
)
SELECT doc_id, CAST(hv // 2 AS BIGINT) AS fingerprint FROM h
"""

# ops/dedup.py SimHasher: per unique token t, H(t); bit m of the simhash is
# sign(Σ_t count_t·(2·bit_m(H(t))−1)); value emitted >>1.
_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
  FROM documents
), tc AS (
  SELECT doc_id, tok, count(*)::HUGEINT AS cnt FROM toks GROUP BY doc_id, tok
), th AS (
  SELECT doc_id, cnt,
         ('0x' || substr(md5(tok), 1, 16))::UBIGINT::HUGEINT AS h
  FROM tc
), bits AS (
  SELECT doc_id, m.m AS m,
         sum(CASE WHEN (h // (1::HUGEINT << m.m)) % 2 = 1
                  THEN cnt ELSE -cnt END) AS acc
  FROM th, (SELECT unnest(range(64)) AS m) m
  GROUP BY doc_id, m.m
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN 1::HUGEINT << m ELSE 0::HUGEINT END) AS v
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(sh.v, 0::HUGEINT) // 2 AS BIGINT) AS simhash
FROM documents d LEFT JOIN sh USING (doc_id)
"""

# ops/dedup.py minhash_lsh_pairs (num_perm=64, bands=16 → 4 rows/band,
# k=3 word shingles, seed=7, est-Jaccard threshold 0.5): signatures
# sigⱼ = min over shingles of (aⱼ·base+bⱼ) mod p (p=2³¹−1), band key =
# joined signature slice, candidates = same (band, key), est = matching
# signature fraction.
_MINHASH_SQL = r"""
WITH params AS (
  SELECT j.j AS j,
     1 + ('0x' || substr(md5('minhash-a-7-' || j.j), 1, 16))::UBIGINT::HUGEINT
         % 2147483646 AS a,
     ('0x' || substr(md5('minhash-b-7-' || j.j), 1, 16))::UBIGINT::HUGEINT
         % 2147483647 AS b
  FROM (SELECT unnest(range(64)) AS j) j
), shing AS (
  SELECT doc_id,
    CASE WHEN len(toks) = 0 THEN []::VARCHAR[]
         WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
         ELSE list_distinct(list_transform(range(1, len(toks) - 1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    END AS shingles
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents)
), sh AS (
  SELECT doc_id, unnest(shingles) AS s FROM shing WHERE len(shingles) > 0
), base AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 16))::UBIGINT::HUGEINT % 2147483647 AS x
  FROM sh
), sigs AS MATERIALIZED (
  SELECT doc_id, j, min((a * x + b) % 2147483647) AS sig
  FROM base, params GROUP BY doc_id, j
), bandkeys AS (
  SELECT doc_id, j // 4 AS band,
         string_agg(CAST(sig AS VARCHAR), '-' ORDER BY j) AS band_val
  FROM sigs GROUP BY doc_id, j // 4
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandkeys x JOIN bandkeys y
    ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
), est AS (
  SELECT c.a, c.b,
         avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END) AS est_jaccard
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.a
  JOIN sigs sb ON sb.doc_id = c.b AND sb.j = sa.j
  GROUP BY c.a, c.b
)
SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.5
"""

# ops/curation.fuzzy_decontaminate: same MinHash/LSH machinery, pairs
# restricted to cross-side (train = doc_id%41!=0, bench = %41==0);
# kept train ids = those with no qualifying benchmark near-dup.
_FUZZY_DECON_SQL = _MINHASH_SQL.replace(
    "SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.5",
    """, dropped AS (
  SELECT CASE WHEN a % 41 = 0 THEN b ELSE a END AS doc_id
  FROM est
  WHERE est_jaccard >= 0.5 AND ((a % 41 = 0) <> (b % 41 = 0))
)
SELECT doc_id FROM documents
WHERE doc_id % 41 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM dropped)""",
)

# ops/dedup.py embedding_near_dups (n_bits=32, bands=4 → 8 bits/band,
# seed=13, cosine threshold 0.3): Rademacher sign s(d,b) = parity of the
# last md5 byte of 'hp-13-d-b'; code bit b = (Σ_d emb_d·s(d,b)) > 0;
# candidates share a (band, band_val); exact cosine verified per pair.
_LATE_EVENTS_SQL = """
            WITH arr AS (
              SELECT event_id, user_id, epoch_us(ts) AS t,
                     max(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY event_id % 4, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS wm,
                     CAST(row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY event_id % 4, event_id) - 1
                          AS BIGINT) AS arrival_seq
              FROM events
            )
            SELECT event_id, user_id, arrival_seq,
                   CAST(CASE WHEN wm IS NOT NULL
                             AND t < wm - 3600000000
                        THEN 1 ELSE 0 END AS BIGINT) AS is_late,
                   CAST(CASE WHEN wm IS NOT NULL
                             AND t < wm - 3600000000
                        THEN (wm - 3600000000) - t
                        ELSE 0 END AS BIGINT) AS late_us
            FROM arr
"""


_KCORE_EDGES_SYM_SQL = """
    nn AS (SELECT count(*) AS n,
                  7 * ((count(*) + 6) // 7) AS m FROM documents),
    e0 AS (
      SELECT doc_id AS a, doc_id + 1 AS b FROM documents, nn
      WHERE doc_id % 10 < 9 AND doc_id + 1 < nn.n
      UNION ALL
      SELECT doc_id, doc_id + 2 FROM documents, nn
      WHERE doc_id % 10 < 8 AND doc_id + 2 < nn.n
      UNION
      SELECT least(doc_id, (doc_id + 7) % nn.m),
             greatest(doc_id, (doc_id + 7) % nn.m)
      FROM documents, nn WHERE doc_id % 7 = 0
      UNION
      SELECT least(doc_id, (doc_id + 14) % nn.m),
             greatest(doc_id, (doc_id + 14) % nn.m)
      FROM documents, nn WHERE doc_id % 7 = 0
    ), sym AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e0
      UNION ALL SELECT b, a FROM e0
    )
"""


def _kcore_sql(k: int = 3, rounds: int = 10) -> str:
    """Unrolled iterative peeling over the hub-anchored block graph
    (the bpe_merges bounded-round oracle pattern): round i keeps
    nodes whose degree among round-i survivors is >= k. ``rounds``
    bounds peel depth, not result size — the engine iterates to
    fixpoint and the hash can only match if the peel converged within
    the unroll (the graph is constructed to converge in 5 rounds:
    cascades are block-local, hubs are immortal)."""
    # every round CTE is MATERIALIZED: d{i} references s{i} twice and
    # s{i} chains to d{i-1}, so inlined evaluation doubles the plan
    # per round (exponential scans — "too many open files" in practice)
    ctes = [_KCORE_EDGES_SYM_SQL.strip()]
    ctes.append("s0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)")
    for i in range(rounds):
        ctes.append(
            f"d{i} AS MATERIALIZED (SELECT e.u AS node, count(*) AS deg"
            f" FROM sym e"
            f" JOIN s{i} x ON e.u = x.node"
            f" JOIN s{i} y ON e.v = y.node"
            f" GROUP BY e.u)"
        )
        ctes.append(
            f"s{i + 1} AS MATERIALIZED"
            f" (SELECT node FROM d{i} WHERE deg >= {k})"
        )
    joined = ",\n        ".join(ctes)
    return f"""
        WITH {joined}
        SELECT node, CAST(deg AS BIGINT) AS deg
        FROM d{rounds - 1} WHERE deg >= {k}
    """


_EVENT_PATTERN_SQL = """
    WITH RECURSIVE
    va AS MATERIALIZED (
      SELECT user_id, event_id FROM events WHERE event_type = 'view'),
    vb AS MATERIALIZED (
      SELECT user_id, event_id FROM events WHERE event_type = 'click'),
    vc AS MATERIALIZED (
      SELECT user_id, event_id FROM events WHERE event_type = 'purchase'),
    -- skip-till-next-match replay: each iteration advances every
    -- still-active user by one view->click->purchase triple, scanning
    -- strictly past the previous match's purchase (c_id carries the
    -- consumed position; the seed row is a sentinel at -inf)
    m AS (
      SELECT user_id, CAST(-1 AS BIGINT) AS match_idx,
             CAST(NULL AS BIGINT) AS a_id, CAST(NULL AS BIGINT) AS b_id,
             CAST(-9223372036854775808 AS BIGINT) AS c_id
      FROM (SELECT DISTINCT user_id FROM events)
      UNION ALL
      SELECT t.user_id, t.match_idx + 1, t.a_id, t.b_id, t.c_id FROM (
        SELECT m.user_id, m.match_idx,
               (SELECT min(e.event_id) FROM va e
                 WHERE e.user_id = m.user_id AND e.event_id > m.c_id) AS a_id,
               (SELECT min(e.event_id) FROM vb e
                 WHERE e.user_id = m.user_id AND e.event_id >
                   (SELECT min(e2.event_id) FROM va e2
                     WHERE e2.user_id = m.user_id
                       AND e2.event_id > m.c_id)) AS b_id,
               (SELECT min(e.event_id) FROM vc e
                 WHERE e.user_id = m.user_id AND e.event_id >
                   (SELECT min(e3.event_id) FROM vb e3
                     WHERE e3.user_id = m.user_id AND e3.event_id >
                       (SELECT min(e2.event_id) FROM va e2
                         WHERE e2.user_id = m.user_id
                           AND e2.event_id > m.c_id))) AS c_id
        FROM m
      ) t
      WHERE t.c_id IS NOT NULL
    )
    SELECT m.user_id, m.match_idx, m.a_id, m.b_id, m.c_id,
           epoch_us(ec.ts) - epoch_us(ea.ts) AS span_us
    FROM m
    JOIN events ea ON ea.event_id = m.a_id
    JOIN events ec ON ec.event_id = m.c_id
    WHERE m.match_idx >= 0
"""


_LINKS_SQL = """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://specs.example.org/spec-' || CAST(doc_id % 50 AS VARCHAR)
                     || '/' AS page_url,
                   FALSE AS auto
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://corpus.example.org/doc-'
                     || CAST(doc_id - doc_id % 10 AS VARCHAR) || '/' AS page_url,
                   FALSE AS auto
            FROM documents WHERE doc_id % 5 = 4
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://refs.example.org/ref-' || CAST(doc_id % 9 AS VARCHAR)
                     || '/' AS page_url,
                   FALSE AS auto
            FROM documents WHERE doc_id % 6 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://refs.example.org/iref-' || CAST(doc_id % 9 AS VARCHAR)
                     || '/' AS page_url,
                   FALSE AS auto
            FROM documents WHERE doc_id % 6 = 3
"""


_SPAN_PARTS_SQL = r"""
              SELECT doc_id, 0 AS ph, 0 AS i, 'meta' AS kind, '' AS media_ref
                FROM documents WHERE doc_id % 4 = 0 OR doc_id % 4 = 2
              UNION ALL SELECT doc_id, 1, 0, 'meta', '' FROM documents WHERE doc_id % 6 = 1
              UNION ALL SELECT doc_id, 2, 0, 'meta', '' FROM documents WHERE doc_id % 5 = 2
              UNION ALL SELECT doc_id, 3, 0, 'title', '' FROM documents
              UNION ALL SELECT doc_id, 4, 0, 'anchor', '' FROM documents
              UNION ALL SELECT doc_id, 5, 0, 'heading', '' FROM documents
              UNION ALL SELECT doc_id, 6, 0, 'prose', '' FROM documents
                WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> ''
              UNION ALL SELECT doc_id, 7, t.i,
                  CASE t.i WHEN 0 THEN 'anchor' ELSE 'dfn' END, ''
                FROM documents CROSS JOIN (VALUES (0),(1)) t(i) WHERE doc_id % 3 = 0
              UNION ALL SELECT doc_id, 9, 0, 'link', '' FROM documents WHERE doc_id % 7 = 0
              UNION ALL SELECT doc_id, 10, 0, 'link', '' FROM documents WHERE doc_id % 5 = 4
              UNION ALL SELECT doc_id, 11, 0, 'idl-block', '' FROM documents WHERE doc_id % 11 = 0
              UNION ALL SELECT doc_id, 12, 0, 'figure',
                  'https://img.example.org/doc-' || CAST(doc_id AS VARCHAR) || '.png'
                FROM documents WHERE doc_id % 13 = 0
              UNION ALL SELECT doc_id, 13, 0, 'anchor', '' FROM documents WHERE doc_id % 6 = 0
              UNION ALL SELECT doc_id, 13, 1, 'ref-entry', ''
                FROM documents WHERE doc_id % 6 = 0 AND doc_id % 4 = 2
              UNION ALL SELECT doc_id, 13, 2, 'link', '' FROM documents WHERE doc_id % 6 = 0
              UNION ALL SELECT doc_id, 14, t.i,
                  CASE t.i WHEN 0 THEN 'heading' WHEN 1 THEN 'ref-entry' ELSE 'link' END, ''
                FROM documents CROSS JOIN (VALUES (0),(1),(2)) t(i) WHERE doc_id % 6 = 3
              UNION ALL SELECT doc_id, 15, t.i,
                  CASE WHEN t.i = 0 THEN 'anchor' WHEN t.i = 1 THEN 'dfn'
                       ELSE 'css-propdef-row' END, ''
                FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) t(i)
                WHERE doc_id % 8 = 0
              UNION ALL SELECT doc_id, 16, 0, 'css-prod', '' FROM documents WHERE doc_id % 16 = 0
              UNION ALL SELECT doc_id, 17, t.i,
                  CASE WHEN t.i = 0 THEN 'anchor' ELSE 'event-row' END, ''
                FROM documents CROSS JOIN (VALUES (0),(1),(2)) t(i) WHERE doc_id % 9 = 0
              UNION ALL SELECT doc_id, 18, t.i,
                  CASE WHEN t.i = 0 THEN 'prose' WHEN t.i = 1 THEN 'anchor'
                       ELSE 'algo-step' END, ''
                FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) t(i)
                WHERE doc_id % 12 = 0
              UNION ALL SELECT doc_id, 19, 0, 'cddl-block', '' FROM documents WHERE doc_id % 14 = 0
              UNION ALL SELECT doc_id, 20, t.i,
                  CASE t.i WHEN 0 THEN 'heading' WHEN 3 THEN 'dfn'
                       WHEN 4 THEN 'element-def' ELSE 'anchor' END, ''
                FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) t(i)
                WHERE doc_id % 15 = 0
              UNION ALL SELECT doc_id, 21, 0, 'css-data', '' FROM documents WHERE doc_id % 8 = 0
              UNION ALL SELECT doc_id, 22, 0, 'refs-data', ''
                FROM documents WHERE doc_id % 6 = 0 OR doc_id % 6 = 3
              UNION ALL SELECT doc_id, 23, 0, 'events-data', '' FROM documents WHERE doc_id % 9 = 0
              UNION ALL SELECT doc_id, 24, 0, 'algos-data', '' FROM documents WHERE doc_id % 12 = 0
"""


_EMB_NEAR_DUP_SQL = r"""
WITH dims AS (
  SELECT vec_id, i - 1 AS d, embedding[i]::DOUBLE AS val
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
), signs AS (
  SELECT dd.d, bb.b,
         CASE WHEN ('0x' || substr(md5('hp-13-' || dd.d || '-' || bb.b), 31, 2))::UBIGINT % 2 = 1
              THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT DISTINCT d FROM dims) dd,
       (SELECT unnest(range(32)) AS b) bb
), proj AS (
  SELECT dims.vec_id, signs.b, sum(dims.val * signs.s) AS p
  FROM dims JOIN signs ON dims.d = signs.d
  GROUP BY dims.vec_id, signs.b
), bandvals AS (
  SELECT vec_id, b // 8 AS band,
         sum(CASE WHEN p > 0 THEN 1::HUGEINT << (b % 8) ELSE 0::HUGEINT END) AS band_val
  FROM proj GROUP BY vec_id, b // 8
), cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM bandvals x JOIN bandvals y
    ON x.band = y.band AND x.band_val = y.band_val AND x.vec_id < y.vec_id
), cos AS (
  SELECT c.a, c.b,
    list_inner_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
      / (sqrt(list_inner_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))
         * sqrt(list_inner_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a
  JOIN embeddings eb ON eb.vec_id = c.b
)
SELECT a, b, round(cosine, 6) AS cosine FROM cos WHERE cosine >= 0.3
"""


# Shared walk-replay CTE chain (ops/graph.random_walks choice rule:
# next hop = argmin of the 32-bit integer mix hash over
# (salt32, walk, step, dst) — ops/graph._walk_choice_keys — with a
# min-d tie-break). The rule is pure mod-2^32 integer arithmetic so
# DuckDB replays the ENGINE-IDENTICAL key values in BIGINT (every
# product < 2^63 at test scale: w,d < 2^32/2654435761 and the mix
# multiplier 73244475 < 2^31). salt32 = 1190748949 =
# int(md5('walk').hexdigest()[:8], 16). ONE definition consumed by
# both the random_walks and walk_pairs oracles so the two can never
# drift apart.


def _walk_step_ctes(step: int, prev: str, cand: str, key: str,
                    nxt: str) -> str:
    """One walk step: candidates d = node//j for j in (2,4,8), choice
    key = mix32((salt32 + w*2654435761 + t*2246822519 + d*3266489917)
    mod 2^32), argmin (key, d) per walk."""
    t_term = (step * 2246822519) % 4294967296
    return f"""
            {cand} AS MATERIALIZED (
              SELECT s.w, s.node // j AS d,
                     CAST((1190748949 + {t_term}
                       + (s.w * 2654435761) % 4294967296
                       + ((s.node // j) * 3266489917) % 4294967296
                     ) % 4294967296 AS BIGINT) AS x
              FROM {prev} s, (VALUES (2), (4), (8)) AS v(j)),
            {key} AS MATERIALIZED (
              SELECT w, d, xor(y2, y2 // 65536) AS h FROM (
                SELECT w, d,
                       (xor(y1, y1 // 65536) * 73244475)
                         % 4294967296 AS y2
                FROM (
                  SELECT w, d,
                         (xor(x, x // 65536) * 73244475)
                           % 4294967296 AS y1
                  FROM {cand}))),
            {nxt} AS MATERIALIZED (
              SELECT w, d AS node FROM (
                SELECT w, d,
                       row_number() OVER (PARTITION BY w
                                          ORDER BY h, d) AS rn
                FROM {key}) WHERE rn = 1)"""


_WALK_CTES = (
    """
            WITH nodes AS (
              SELECT CAST(doc_id AS BIGINT) AS w FROM documents
            ),
            s0 AS (SELECT w, w AS node FROM nodes),"""
    + _walk_step_ctes(0, "s0", "c1", "k1", "s1") + ","
    + _walk_step_ctes(1, "s1", "c2", "k2", "s2") + ","
    + _walk_step_ctes(2, "s2", "c3", "k3", "s3")
    + "\n"
)


# ops/graphstore.bucketed_walks shares random_walks' choice rule;
# only the start set differs (doc_id % 7 == 0) — reuse the step
# generator so the two replays can never drift apart.
_BUCKETED_START_CTES = (
    """
            WITH nodes AS (
              SELECT CAST(doc_id AS BIGINT) AS w FROM documents
              WHERE doc_id % 7 = 0
            ),
            s0 AS (SELECT w, w AS node FROM nodes),"""
    + _walk_step_ctes(0, "s0", "c1", "k1", "s1") + ","
    + _walk_step_ctes(1, "s1", "c2", "k2", "s2") + ","
    + _walk_step_ctes(2, "s2", "c3", "k3", "s3")
    + "\n"
)


def _biased_step_ctes(step: int, prev: str, nxt: str) -> str:
    """One second-order biased walk step (ops/graph.biased_walks with
    p=2, q=0.5, scale 1000 → integer weights 500/1000/2000; salt32 of
    'walk#r' = 3924683320). Candidates d = node//j, DISTINCT per walk
    (the engine's CSR dedupes parallel edges); weight 500 when d
    returns to prev, 1000 when prev→d is an edge of the doc_id//j
    graph (d IN (prev//2, prev//4, prev//8)), else 2000; step 0
    uniform. Draw r = mix32(...) mod Σwt; chosen = first d ascending
    whose window cumsum exceeds r."""
    t_term = (step * 2246822519) % 4294967296
    n = str(step + 1)
    if step == 0:
        cand = f"""
            bc{n} AS MATERIALIZED (
              SELECT DISTINCT s.w, s.node // j AS d
              FROM {prev} s, (VALUES (2), (4), (8)) AS v(j)),
            bw{n} AS (SELECT w, d, CAST(1 AS BIGINT) AS wt FROM bc{n}),"""
    else:
        cand = f"""
            bc{n} AS MATERIALIZED (
              SELECT DISTINCT s.w, s.prev, s.node // j AS d
              FROM {prev} s, (VALUES (2), (4), (8)) AS v(j)),
            bw{n} AS (
              SELECT w, d,
                     CAST(CASE WHEN d = prev THEN 500
                          WHEN d IN (prev // 2, prev // 4, prev // 8)
                            THEN 1000
                          ELSE 2000 END AS BIGINT) AS wt
              FROM bc{n}),"""
    return cand + f"""
            br{n} AS MATERIALIZED (
              SELECT w, xor(y2, y2 // 65536) % tot AS r FROM (
                SELECT w, tot,
                       (xor(y1, y1 // 65536) * 73244475)
                         % 4294967296 AS y2
                FROM (
                  SELECT w, tot,
                         (xor(x, x // 65536) * 73244475)
                           % 4294967296 AS y1
                  FROM (
                    SELECT w, SUM(wt) AS tot,
                           CAST((3924683320 + {t_term}
                             + (w * 2654435761) % 4294967296
                           ) % 4294967296 AS BIGINT) AS x
                    FROM bw{n} GROUP BY w)))),
            bp{n} AS (
              SELECT w, d,
                     SUM(wt) OVER (PARTITION BY w ORDER BY d) AS cum
              FROM bw{n}),
            bch{n} AS (
              SELECT p.w, MIN(p.d) AS node
              FROM bp{n} p JOIN br{n} r ON p.w = r.w
              WHERE p.cum > r.r GROUP BY p.w),
            {nxt} AS MATERIALIZED (
              SELECT ch.w, ch.node, s.node AS prev
              FROM bch{n} ch JOIN {prev} s ON ch.w = s.w)"""


_BIASED_WALK_CTES = (
    """
            WITH nodes AS (
              SELECT CAST(doc_id AS BIGINT) AS w FROM documents
            ),
            b0 AS (SELECT w, w AS node, w AS prev FROM nodes),"""
    + _biased_step_ctes(0, "b0", "b1") + ","
    + _biased_step_ctes(1, "b1", "b2") + ","
    + _biased_step_ctes(2, "b2", "b3")
    + "\n"
)


def oracle_sql() -> dict[str, str]:
    out = {
        "headings_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'sec' || CAST(doc_id % 5 AS VARCHAR) AS id,
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#sec' || CAST(doc_id % 5 AS VARCHAR) AS href,
                   CAST(2 AS INT) AS level,
                   'Section ' || CAST(doc_id % 5 AS VARCHAR) AS title,
                   CAST(doc_id % 5 AS VARCHAR) AS number
            FROM documents
        """,
        "semantic_dedup": """
            WITH e AS (
              SELECT vec_id, embedding,
                     CAST(floor(embedding[1] * 8) AS BIGINT) AS gx,
                     CAST(floor(embedding[2] * 8) AS BIGINT) AS gy
              FROM embeddings
            )
            SELECT a.vec_id FROM e a
            WHERE NOT EXISTS (
              SELECT 1 FROM e b
              WHERE b.gx = a.gx AND b.gy = a.gy AND b.vec_id < a.vec_id
                AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3
            )
        """,
        # exact integer recomputation of the hashed linear classifier:
        # feature j = H(word) mod 64 with the repo's md5-prefix H(x),
        # weight (j*2654435761) mod 2001, per-doc floor-mean (all values
        # non-negative so // floor == truncate in every engine)
        "quality_classifier": r"""
            WITH tok AS (
              SELECT doc_id, word, count(*) AS tf FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS word
                FROM documents)
              WHERE word <> ''
              GROUP BY doc_id, word
            ),
            sc AS (
              SELECT doc_id,
                     sum(tf * ((CAST(('0x' || substr(md5(word), 1, 16))::UBIGINT
                                % 64 AS BIGINT) * 2654435761) % 2001)) AS score,
                     sum(tf) AS n
              FROM tok GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(score // n AS BIGINT) AS score_milli,
                   (score // n) >= 1000 AS keep
            FROM sc
        """,
        # DSIR: add-one-smoothed unigram LM log-ratio, target = the
        # doc_id % 41 == 0 split, union-vocab smoothing; same
        # x/y-then-log2 form as the engine kernel, 4 dp snap
        "dsir_weights": r"""
            WITH tokall AS MATERIALIZED (
              SELECT doc_id, word, (doc_id % 41 = 0) AS is_t FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS word
                FROM documents)
              WHERE word <> ''
            ),
            lm AS MATERIALIZED (
              SELECT word,
                     sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS nr,
                     sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt
              FROM tokall GROUP BY word
            ),
            scal AS (SELECT sum(nr) AS tr, sum(nt) AS tt, count(*) AS v FROM lm)
            SELECT doc_id,
                   round(sum(log2((nt + 1) / (tt + v))
                           - log2((nr + 1) / (tr + v))) / count(*), 4) AS dsir_w
            FROM tokall JOIN lm USING (word), scal
            WHERE NOT is_t
            GROUP BY doc_id
        """,
        # CCNet tiers: logppl (same form as unigram_logppl) ⋈ lang_id,
        # row_number within language ordered by the 4 dp-snapped signal
        # with doc_id tiebreak, integer bucket = rk*3 // n
        "ccnet_buckets": _ccnet_buckets_sql(),
        # per-lang audit: lang_id CTE ⋈ documents; token convention
        # matches token_count (whitespace runs on trimmed text); sums
        # CAST to BIGINT per the repo rule
        "corpus_report": f"""
            WITH lang AS ({_lang_id_sql()})
            SELECT l.lang_pred,
                   count(*) AS n_docs,
                   CAST(sum(CASE WHEN trim(d.text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(d.text), '\\s+'))
                            END) AS BIGINT) AS n_tokens,
                   count(DISTINCT md5(d.text)) AS n_unique_texts
            FROM documents d JOIN lang l USING (doc_id)
            GROUP BY l.lang_pred
        """,
        # per-doc distinct 8-grams via ordered token lists + slice
        # windows; df = distinct-doc count per gram; every output
        # column integer (sums CAST to BIGINT per the repo rule)
        "dup_ngram_fraction": r"""
            WITH tok AS MATERIALIZED (
              SELECT doc_id, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                       generate_subscripts(
                         regexp_split_to_array(lower(text), '\W+'), 1) AS i
                FROM documents)
              WHERE w <> ''
            ),
            dl AS (SELECT doc_id, list(w ORDER BY j) AS ws FROM tok GROUP BY doc_id),
            g AS MATERIALIZED (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
              FROM (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws) - 7)) AS i
                    FROM dl)
            ),
            df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
            SELECT doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup,
                   CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000
                        // count(*) AS BIGINT) AS dup_ppm
            FROM g JOIN df USING (gram)
            GROUP BY doc_id
        """,
        # ops/dedup.ngram_novelty: first-occurrence novelty share
        # (same gram reconstruction as dup_ngram_fraction)
        "ngram_novelty": r"""
            WITH tok AS MATERIALIZED (
              SELECT doc_id, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                       generate_subscripts(
                         regexp_split_to_array(lower(text), '\W+'), 1) AS i
                FROM documents)
              WHERE w <> ''
            ),
            dl AS (SELECT doc_id, list(w ORDER BY j) AS ws FROM tok GROUP BY doc_id),
            g AS MATERIALIZED (
              SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS gram
              FROM (SELECT doc_id, ws,
                           unnest(generate_series(1, len(ws) - 7)) AS i
                    FROM dl)
            ),
            fd AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY gram)
            SELECT doc_id,
                   count(*) AS n_grams,
                   CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel,
                   CAST(sum(CASE WHEN fd = doc_id THEN 1 ELSE 0 END)
                        * 1000000 // count(*) AS BIGINT) AS novelty_ppm
            FROM g JOIN fd USING (gram)
            GROUP BY doc_id
        """,

        "unigram_logppl": r"""
            WITH tok AS (
              SELECT doc_id, word FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS word
                FROM documents)
              WHERE word <> ''
            ),
            freq AS (SELECT word, count(*) AS n FROM tok GROUP BY word),
            tot AS (SELECT count(*) AS t FROM tok)
            SELECT doc_id,
                   round(sum(-log2(n / t)) / count(*), 4) AS logppl
            FROM tok JOIN freq USING (word), tot
            GROUP BY doc_id
        """,
        # MATERIALIZED: tok self-joins and pairs feeds three consumers —
        # without the hint DuckDB re-evaluates the unnest closure each time
        "bigram_logppl": r"""
            WITH tok AS MATERIALIZED (
              SELECT doc_id, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                       generate_subscripts(
                         regexp_split_to_array(lower(text), '\W+'), 1) AS i
                FROM documents)
              WHERE w <> ''
            ),
            pairs AS MATERIALIZED (
              SELECT a.doc_id, a.w AS w1, b.w AS w2
              FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.j = a.j + 1
            ),
            bg AS MATERIALIZED (
              SELECT w1, w2, count(*) AS n FROM pairs GROUP BY w1, w2
            ),
            ctx AS (SELECT w1, sum(n) AS cn FROM bg GROUP BY w1)
            SELECT doc_id,
                   round(sum(-log2(n / cn)) / count(*), 4) AS logppl
            FROM pairs JOIN bg USING (w1, w2) JOIN ctx USING (w1)
            GROUP BY doc_id
        """,
        "check_missing_dfns": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id, 'idl' AS source,
                   'I' || CAST(doc_id AS VARCHAR) AS expected_lt,
                   'interface' AS expected_type, '' AS expected_for,
                   '' AS found_lt, '' AS found_type, FALSE AS warning
            FROM documents WHERE doc_id % 3 <> 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'idl',
                   'a' || CAST(doc_id AS VARCHAR), 'attribute',
                   'I' || CAST(doc_id AS VARCHAR),
                   CASE WHEN doc_id % 4 = 1
                        THEN 'a' || CAST(doc_id AS VARCHAR) ELSE '' END,
                   CASE WHEN doc_id % 4 = 1 THEN 'dfn' ELSE '' END,
                   FALSE
            FROM documents WHERE doc_id % 4 <> 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'idl',
                   'm' || CAST(doc_id AS VARCHAR) || '(x)', 'method',
                   'I' || CAST(doc_id AS VARCHAR),
                   CASE WHEN doc_id % 5 = 1
                        THEN 'm' || CAST(doc_id AS VARCHAR) || '(y)'
                        ELSE '' END,
                   CASE WHEN doc_id % 5 = 1 THEN 'method' ELSE '' END,
                   doc_id % 5 = 1
            FROM documents WHERE doc_id % 5 <> 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'css',
                   '--p' || CAST(doc_id AS VARCHAR), 'property',
                   '', '', '', FALSE
            FROM documents WHERE doc_id % 2 = 0 AND doc_id % 10 <> 0
        """,
        "duplicated_substrings": """
            WITH g AS (
              SELECT doc_id, substr(text, CAST(i AS INT), 32) AS gram
              FROM documents, unnest(range(1, length(text) - 30)) AS t(i)
            ),
            per AS (
              SELECT doc_id, gram, count(*) AS occ FROM g GROUP BY 1, 2
            )
            SELECT gram, count(*) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occ
            FROM per GROUP BY gram HAVING count(*) >= 2
        """,
        "substring_dedup": """
            WITH g AS (
              SELECT doc_id, substr(text, CAST(i AS INT), 32) AS gram
              FROM documents, unnest(range(1, length(text) - 30)) AS t(i)
            ),
            per AS (
              SELECT doc_id, gram, count(*) AS occ FROM g GROUP BY 1, 2
            ),
            dup AS (
              SELECT gram FROM per GROUP BY gram HAVING count(*) >= 2
            ),
            stat AS (
              SELECT per.doc_id,
                     sum(CASE WHEN per.gram IN (SELECT gram FROM dup)
                         THEN per.occ ELSE 0 END) AS dup_occ,
                     sum(per.occ) AS total
              FROM per GROUP BY per.doc_id
            )
            SELECT d.doc_id FROM documents d
            LEFT JOIN stat s ON s.doc_id = d.doc_id
            WHERE s.doc_id IS NULL OR s.dup_occ < 0.5 * s.total
        """,
        "patch_dfns": """
            WITH f AS (
              SELECT doc_id,
                CASE doc_id % 8
                  WHEN 0 THEN 'https://w3c.github.io/deviceorientation/'
                  WHEN 1 THEN 'https://www.w3.org/TR/orientation-event/'
                  WHEN 2 THEN 'https://wicg.github.io/portals/'
                  WHEN 3 THEN 'https://www.w3.org/TR/WebCryptoAPI/'
                  WHEN 4 THEN 'https://www.w3.org/TR/pub-manifest/'
                  WHEN 5 THEN 'https://www.w3.org/TR/audiobooks/'
                  WHEN 6 THEN 'https://example.org/spec-a/'
                  ELSE 'https://example.org/spec-b/'
                END || '#d' || CAST(doc_id AS VARCHAR) AS href,
                (doc_id % 3 = 0) AS lt_ps,
                (doc_id % 3 = 1) AS lt0_mes,
                (doc_id % 5 = 0) AS for_ps
              FROM documents
            )
            SELECT doc_id, href,
              CASE WHEN doc_id % 8 IN (3, 4, 5)
                   THEN 'private' ELSE 'public' END AS access
            FROM f
            WHERE NOT (doc_id % 8 IN (0, 1) AND (lt_ps OR for_ps))
              AND NOT (doc_id % 8 = 2 AND lt0_mes)
        """,
        "dfns_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'term-' || CAST(doc_id AS VARCHAR) AS id,
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#term-' || CAST(doc_id AS VARCHAR) AS href,
                   'dfn' AS type,
                   'private' AS access,
                   FALSE AS informative,
                   'prose' AS defined_in
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR),
                   'propdef-p' || CAST(doc_id AS VARCHAR),
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#propdef-p' || CAST(doc_id AS VARCHAR),
                   'property', 'public', FALSE, 'table'
            FROM documents WHERE doc_id % 8 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR),
                   'eldef-' || CAST(doc_id AS VARCHAR),
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#eldef-' || CAST(doc_id AS VARCHAR),
                   'dfn', 'private', FALSE, 'heading'
            FROM documents WHERE doc_id % 15 = 0
        """,
        "idl_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'interface I' || CAST(doc_id AS VARCHAR) || ' { };' AS idl
            FROM documents WHERE doc_id % 11 = 0
        """,
        "links_from_text": _LINKS_SQL,
        # post/linkgraph.host_link_stats: per-host fan-in over the
        # links reconstruction
        "link_hosts": f"""
            WITH links AS ({_LINKS_SQL}),
            h AS (
              SELECT doc_id,
                     regexp_extract(page_url,
                                    '^[a-z][a-z0-9+.-]*://([^/]+)', 1) AS host,
                     auto
              FROM links
            )
            SELECT host,
                   CAST(count(*) AS BIGINT) AS n_links,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) FILTER (auto) AS BIGINT) AS n_auto
            FROM h GROUP BY host
        """,
        "meta_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CASE WHEN doc_id % 4 = 0 THEN 'bikeshed'
                        WHEN doc_id % 4 = 2 THEN 'respec'
                        ELSE '' END AS generator,
                   CASE WHEN doc_id % 6 = 1
                        THEN 'rev-' || CAST(doc_id AS VARCHAR)
                        ELSE '' END AS revision,
                   CASE WHEN doc_id % 5 = 2 THEN '2026-03-15'
                        ELSE '' END AS "date"
            FROM documents
        """,
        "ids_from_text": """
            WITH d AS (
              SELECT doc_id,
                     'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                       || '/' AS base
              FROM documents
            )
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   base || '#sec' || CAST(doc_id % 5 AS VARCHAR) AS href FROM d
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#term-' || CAST(doc_id AS VARCHAR)
              FROM d WHERE doc_id % 3 = 0
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#normative' FROM d
              WHERE doc_id % 6 = 0 AND doc_id % 4 = 0
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#normative-references' FROM d
              WHERE doc_id % 6 = 0 AND doc_id % 4 = 2
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#propdef-p' || CAST(doc_id AS VARCHAR)
              FROM d WHERE doc_id % 8 = 0
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#eventdef-' || CAST(doc_id AS VARCHAR)
              FROM d WHERE doc_id % 9 = 0
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#algo-' || CAST(doc_id AS VARCHAR)
              FROM d WHERE doc_id % 12 = 0
            UNION ALL SELECT CAST(doc_id AS VARCHAR),
                   base || '#eldef-' || CAST(doc_id AS VARCHAR)
              FROM d WHERE doc_id % 15 = 0
        """,
        "refs_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'REF' || CAST(doc_id % 9 AS VARCHAR) AS name,
                   'https://refs.example.org/ref-' || CAST(doc_id % 9 AS VARCHAR)
                     || '/' AS url,
                   TRUE AS normative
            FROM documents WHERE doc_id % 6 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR),
                   'XREF' || CAST(doc_id % 9 AS VARCHAR),
                   'https://refs.example.org/iref-' || CAST(doc_id % 9 AS VARCHAR)
                     || '/',
                   FALSE
            FROM documents WHERE doc_id % 6 = 3
        """,
        "css_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'properties' AS category,
                   'p' || CAST(doc_id % 20 AS VARCHAR) AS name,
                   '{"href": "https://corpus.example.org/doc-'
                     || CAST(doc_id AS VARCHAR) || '/#propdef-p'
                     || CAST(doc_id AS VARCHAR)
                     || '", "initial": "none", "name": "p'
                     || CAST(doc_id % 20 AS VARCHAR)
                     || '", "value": "none | auto"}' AS payload_json
            FROM documents WHERE doc_id % 8 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR), 'values',
                   '<len' || CAST(doc_id % 6 AS VARCHAR) || '>',
                   '{"name": "<len' || CAST(doc_id % 6 AS VARCHAR)
                     || '>", "type": "type", "value": "px | em"}'
            FROM documents WHERE doc_id % 16 = 0
        """,
        "events_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'ev' || CAST(doc_id % 7 AS VARCHAR) AS "type",
                   'Event' AS interface,
                   TRUE AS bubbles,
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#eventdef-' || CAST(doc_id AS VARCHAR) AS href,
                   'css definition table' AS src_format,
                   FALSE AS is_extension
            FROM documents WHERE doc_id % 9 = 0
        """,
        "algorithms_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'compute ' || CAST(doc_id AS VARCHAR) AS name,
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#algo-' || CAST(doc_id AS VARCHAR) AS href,
                   '.algorithm' AS rationale,
                   '{"html": "To run algorithm ' || CAST(doc_id AS VARCHAR)
                     || ':", "steps": [{"html": "Let x be '
                     || CAST(doc_id AS VARCHAR)
                     || '."}, {"html": "Return x."}]}' AS steps_json
            FROM documents WHERE doc_id % 12 = 0
        """,
        "cddl_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   m AS module,
                   'msg' || CAST(doc_id AS VARCHAR) || ' = tstr' AS cddl
            FROM documents
            CROSS JOIN (VALUES ('all'), ('modA')) AS t(m)
            WHERE doc_id % 14 = 0
        """,
        "elements_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'x-el' || CAST(doc_id AS VARCHAR) AS name,
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#eldef-' || CAST(doc_id AS VARCHAR) AS href,
                   'HTMLElement' AS interface
            FROM documents WHERE doc_id % 15 = 0
        """,
        "idlparsed": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'I' || CAST(doc_id AS VARCHAR) AS idl_name
            FROM documents WHERE doc_id % 11 = 0
        """,
        "idlnames": """
            SELECT 'I' || CAST(doc_id AS VARCHAR) AS name,
                   CAST(doc_id AS VARCHAR) AS defined_in
            FROM documents WHERE doc_id % 11 = 0
        """,
        "backrefs": """
            SELECT CAST(t AS VARCHAR) AS defining_doc,
                   'https://corpus.example.org/doc-' || CAST(t AS VARCHAR)
                     || '/#term-' || CAST(t AS VARCHAR) AS href,
                   count(DISTINCT doc_id) AS n_refs
            FROM (
              SELECT doc_id, doc_id - doc_id % 10 AS t
              FROM documents WHERE doc_id % 5 = 4
            )
            WHERE t % 3 = 0 AND doc_id <> t
              AND t IN (SELECT doc_id FROM documents)
            GROUP BY t
        """,
        "titles_from_text": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS title
            FROM documents
        """,
        "token_count": r"""
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                     AS n_tokens
            FROM documents
        """,
        "bpeish_tokens": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
                     AS n_bpeish
            FROM documents
        """,
        "quality_score": r"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 1
                        ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                     AS n_tokens,
                   CAST(floor(len(regexp_extract_all(text, '[A-Za-z]')) * 1000000.0
                        / greatest(length(text), 1)) AS BIGINT) AS alpha_ppm,
                   CAST(floor(len(regexp_extract_all(text, '[.,;:!?]')) * 1000000.0
                        / greatest(length(text), 1)) AS BIGINT) AS punct_ppm
            FROM documents
        """,
        # ops/text.bpe_merges: generated k-round unrolled BPE oracle —
        # see _bpe_oracle_sql for the round shape.
        "bpe_merges": _bpe_oracle_sql(4),
        "bpe_encode": _bpe_encode_oracle_sql(4),
        "word_counts": r"""
            SELECT word, count(*) AS n
            FROM (
              SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
              FROM documents
            )
            WHERE word <> ''
            GROUP BY word
        """,
        # Empty tokens are dropped BEFORE pairing (row_number re-indexes
        # the filtered stream), matching the engine's filtered-list zip.
        "bigram_counts": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                     generate_subscripts(
                       regexp_split_to_array(lower(text), '\W+'), 1) AS i
              FROM documents
            ),
            filtered AS (
              SELECT doc_id, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM toks WHERE w <> ''
            )
            SELECT a.w AS w1, b.w AS w2, count(*) AS n
            FROM filtered a
            JOIN filtered b ON a.doc_id = b.doc_id AND b.j = a.j + 1
            GROUP BY a.w, b.w
        """,
        # ops/text.skipgram_counts: ordered pairs within 3 positions
        # (same filtered-position CTE as bigram_counts)
        # ops/text.pmi_collocations: PMI over the 3-window pair table,
        # min_count 5, top 100; double math mirrors the engine's
        # expression tree term for term ((n/tp)/((c1/tw)*(c2/tw)))
        # and snaps floor(x*1e4+0.5) (the bm25 convention)
        "pmi": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                     generate_subscripts(
                       regexp_split_to_array(lower(text), '\W+'), 1) AS i
              FROM documents
            ),
            filtered AS (
              SELECT doc_id, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM toks WHERE w <> ''
            ),
            pairs AS (
              SELECT a.w AS w1, b.w AS w2, count(*) AS n
              FROM filtered a
              JOIN filtered b
                ON a.doc_id = b.doc_id AND b.j - a.j BETWEEN 1 AND 3
              GROUP BY a.w, b.w
            ),
            uni AS (SELECT w, count(*) AS c FROM filtered GROUP BY w),
            tot AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM pairs) AS tp,
                           (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS tw)
            SELECT w1, w2, CAST(n AS BIGINT) AS n,
                   CAST(floor(
                     log2((CAST(n AS DOUBLE) / tp) /
                          ((CAST(u1.c AS DOUBLE) / tw)
                           * (CAST(u2.c AS DOUBLE) / tw)))
                     * 10000 + 0.5) AS BIGINT) AS pmi_e4
            FROM pairs
            JOIN uni u1 ON pairs.w1 = u1.w
            JOIN uni u2 ON pairs.w2 = u2.w, tot
            WHERE n >= 5
            ORDER BY pmi_e4 DESC, w1 ASC, w2 ASC
            LIMIT 100
        """,
        "skipgram_counts": r"""
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                     generate_subscripts(
                       regexp_split_to_array(lower(text), '\W+'), 1) AS i
              FROM documents
            ),
            filtered AS (
              SELECT doc_id, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM toks WHERE w <> ''
            )
            SELECT a.w AS w1, b.w AS w2, count(*) AS n
            FROM filtered a
            JOIN filtered b
              ON a.doc_id = b.doc_id AND b.j - a.j BETWEEN 1 AND 3
            GROUP BY a.w, b.w
        """,
        "exact_dedup": """
            SELECT min(doc_id) AS doc_id, md5(text) AS content_md5
            FROM documents GROUP BY md5(text)
        """,
        # ops/dedup.source_dup_stats: per-source duplication audit,
        # integer-floor ppm
        "source_dup_stats": """
            WITH g AS (
              SELECT source, md5(text) AS m, count(*) AS c
              FROM documents GROUP BY 1, 2
            )
            SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_unique,
                   CAST((sum(c) - count(*)) * 1000000 // sum(c)
                        AS BIGINT) AS dup_ratio_ppm
            FROM g GROUP BY source
        """,
        "dup_size_hist": """
            SELECT sz, count(*) AS n_clusters FROM (
              SELECT count(*) AS sz FROM documents GROUP BY md5(text)
            ) GROUP BY sz
        """,
        "vocab_size_by_lang": r"""
            SELECT lang, count(DISTINCT word) AS vocab
            FROM (
              SELECT lang,
                     unnest(regexp_split_to_array(lower(text), '\W+')) AS word
              FROM documents
            )
            WHERE word <> ''
            GROUP BY lang
        """,
        # first-occurrence funnel: NULL-safe >= comparisons drop users
        # missing a step (NULL >= x is NULL → not counted)
        "funnel_conversion": """
            WITH f AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                     min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                     min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
              FROM events GROUP BY user_id
            )
            SELECT count(CASE WHEN t0 IS NOT NULL THEN 1 END) AS n_view,
                   count(CASE WHEN t1 >= t0 THEN 1 END) AS n_click,
                   count(CASE WHEN t1 >= t0 AND t2 >= t1 THEN 1 END)
                     AS n_purchase
            FROM f
        """,
        # 8 h gap; all-int64 output (epoch µs) so the hash is free of
        # timestamp-representation skew; event_id tiebreaks both
        # windows so ts-ties order identically on both engines
        "sessionize": """
            WITH o AS (
              SELECT user_id, event_id, epoch_us(ts) AS t,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                               > 28800000000
                          THEN 1 ELSE 0 END AS s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), seq AS (
              -- CAST: windowed sum() is HUGEINT in DuckDB; the engine
              -- emits int64 and the driver hash is dtype-sensitive
              SELECT user_id, t,
                     CAST(sum(s) OVER (PARTITION BY user_id
                                       ORDER BY t, event_id
                                       ROWS UNBOUNDED PRECEDING)
                          AS BIGINT) AS session_seq
              FROM o
            )
            SELECT user_id, session_seq, count(*) AS n_events,
                   min(t) AS start_us, max(t) AS end_us
            FROM seq GROUP BY user_id, session_seq
        """,
        # same stagger + dropout pre-transform as q_cohort_retention;
        # weeks are integer epoch-week indices on both sides
        "cohort_retention": """
            WITH ev AS (
              SELECT user_id,
                     epoch_us(ts) + (user_id % 4) * 604800000000 AS t
              FROM events
            ), wk AS (
              SELECT user_id, t // 604800000000 AS week FROM ev
              WHERE (user_id * 7 + (t // 604800000000)) % 5 <> 0
            ), cohort AS (
              SELECT user_id, min(week) AS cohort_week FROM wk
              GROUP BY user_id
            ), active AS (
              SELECT DISTINCT user_id, week FROM wk
            )
            SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
                   count(*) AS n_users
            FROM active a JOIN cohort c USING (user_id)
            GROUP BY 1, 2
        """,
        # same lacing as the boilerplate oracle; the first occurrence
        # in (doc_id, line_no) order wins via the bijective order key
        # doc_id*2^21 + line_no (ops/curation.LINE_KEY_SHIFT)
        "line_dedup": r"""
            WITH laced0 AS (
              SELECT doc_id,
                     regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ',
                                    '\1' || chr(10), 'g')
                       || chr(10) || 'all rights reserved footer' AS text
              FROM documents
            ), laced AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN text || chr(10) || 'subscribe to newsletter'
                          ELSE text END AS text
              FROM laced0
            ), split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM laced
            ), lines AS (
              SELECT doc_id, i, ls[i] AS l
              FROM split, LATERAL unnest(generate_series(1, len(ls))) AS u(i)
            ), firsts AS (
              SELECT l, min(doc_id * 2097152 + (i - 1)) AS k
              FROM lines WHERE l <> '' GROUP BY l
            ), kept AS (
              SELECT doc_id, i, l FROM lines
              WHERE l = ''
                 OR (doc_id * 2097152 + (i - 1)) IN (SELECT k FROM firsts)
            )
            SELECT s.doc_id,
                   coalesce(string_agg(k.l, chr(10) ORDER BY k.i), '') AS text,
                   len(s.ls) - count(k.l) AS n_removed
            FROM split s LEFT JOIN kept k USING (doc_id)
            GROUP BY s.doc_id, len(s.ls)
        """,
        "interleave_sources": """
            WITH ranked AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source ORDER BY doc_id
                     ) - 1 AS mix_rank
              FROM documents
            )
            SELECT doc_id, source, mix_rank,
                   row_number() OVER (ORDER BY mix_rank, source) - 1 AS mix_pos
            FROM ranked
        """,
        # char = code point on both sides: RE2's [\s\S] steps over UTF-8
        # code points like Python str iteration; 4-dp snap absorbs the
        # summation-order ulp between DuckDB and numpy
        "char_entropy": r"""
            WITH ch AS MATERIALIZED (
              SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
              FROM documents WHERE text <> ''
            ),
            cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
            tot AS (SELECT doc_id, count(*) AS t FROM ch GROUP BY doc_id)
            SELECT doc_id, round(sum(-(k / t) * log2(k / t)), 4) AS entropy
            FROM cnt JOIN tot USING (doc_id)
            GROUP BY doc_id
        """,
        "rank_buckets": """
            WITH r AS (
              SELECT doc_id, n_chars,
                     row_number() OVER (ORDER BY n_chars, doc_id) - 1
                       AS rank_idx
              FROM documents
            )
            SELECT doc_id, n_chars, rank_idx,
                   (rank_idx * 10) // (SELECT count(*) FROM documents)
                     AS bucket
            FROM r
        """,
        "ann_topk": """
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                e.vec_id ASC
                     ) AS rn
              FROM embeddings e, embeddings q
              WHERE q.vec_id < 4
            ) WHERE rn <= 10
        """,
        # IVF at full probe == exhaustive scan == the same top-k
        "ann_ivf": """
            SELECT query_id, vec_id FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                                e.vec_id ASC
                     ) AS rn
              FROM embeddings e, embeddings q
              WHERE q.vec_id < 4
            ) WHERE rn <= 10
        """,
        # The north rule's per-row invariant (span kind/media_ref/order)
        # reconstructed directly over the raw documents table: one
        # UNION ALL branch per derivation feature, phase-ordered, then
        # row_number per doc = the SpanParser's offset. Predictor
        # verified exact vs spans_from_html over doc_ids 0..5000.
        "span_stream": f"""
            WITH parts AS (
{_SPAN_PARTS_SQL}
            )
            SELECT doc_id,
                   CAST(row_number() OVER (PARTITION BY doc_id ORDER BY ph, i) - 1
                        AS BIGINT) AS seq,
                   kind, media_ref
            FROM parts
        """,
        # span_runs: RLE of consecutive same-kind spans per document —
        # gaps-and-islands over the span_stream parts reconstruction
        "span_runs": f"""
            WITH parts AS (
{_SPAN_PARTS_SQL}
            ),
            seqd AS (
              SELECT doc_id, kind,
                     row_number() OVER (PARTITION BY doc_id ORDER BY ph, i)
                       - 1 AS seq
              FROM parts
            ),
            isl AS (
              SELECT doc_id, kind, seq,
                     seq - row_number() OVER (
                       PARTITION BY doc_id, kind ORDER BY seq) AS grp
              FROM seqd
            ),
            runs AS (
              SELECT doc_id, kind, min(seq) AS run_start,
                     count(*) AS run_len
              FROM isl GROUP BY doc_id, kind, grp
            )
            SELECT doc_id,
                   CAST(row_number() OVER (
                     PARTITION BY doc_id ORDER BY run_start) - 1
                        AS BIGINT) AS run_idx,
                   kind,
                   CAST(run_start AS BIGINT) AS run_start,
                   CAST(run_len AS BIGINT) AS run_len
            FROM runs
        """,
        # span_sections: heading-delimited section profile (inclusive
        # running heading count segments the stream; section 0 is the
        # pre-first-heading prefix)
        "span_sections": f"""
            WITH parts AS (
{_SPAN_PARTS_SQL}
            ),
            seqd AS (
              SELECT doc_id, kind,
                     row_number() OVER (PARTITION BY doc_id ORDER BY ph, i)
                       - 1 AS seq,
                     sum(CASE WHEN kind = 'heading' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY ph, i
                             ROWS UNBOUNDED PRECEDING) AS sec
              FROM parts
            )
            SELECT doc_id,
                   CAST(sec AS BIGINT) AS section_idx,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(count(*) FILTER (kind IN ('figure', 'image'))
                        AS BIGINT) AS n_media,
                   CAST(min(seq) AS BIGINT) AS first_seq
            FROM seqd GROUP BY doc_id, sec
        """,
        # span_templates: identical-kind-sequence clusters over the
        # span_stream parts reconstruction
        "span_templates": f"""
            WITH parts AS (
{_SPAN_PARTS_SQL}
            ),
            seqd AS (
              SELECT doc_id, kind,
                     row_number() OVER (PARTITION BY doc_id ORDER BY ph, i)
                       - 1 AS seq
              FROM parts
            ),
            fps AS (
              SELECT doc_id,
                     md5(string_agg(kind, ',' ORDER BY seq))
                       AS fingerprint,
                     CAST(count(*) AS BIGINT) AS n_spans
              FROM seqd GROUP BY doc_id
            )
            SELECT fingerprint,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(min(doc_id) AS BIGINT) AS rep_doc,
                   CAST(min(n_spans) AS BIGINT) AS n_spans
            FROM fps GROUP BY fingerprint HAVING count(*) >= 2
        """,
        # pack_interleaved: same parts enumeration as span_stream plus a
        # per-span cost (prose = \S+ token count, figure = 64, algo
        # intro prose = 4 tokens, structural = 1); the greedy budget-128
        # reset-scan is replayed as a recursive CTE walking seq order.
        "pack_interleaved": r"""
            WITH RECURSIVE parts AS (
              SELECT doc_id, 0 AS ph, 0 AS i, 'meta' AS kind, 1 AS cost
                FROM documents WHERE doc_id % 4 = 0 OR doc_id % 4 = 2
              UNION ALL SELECT doc_id, 1, 0, 'meta', 1 FROM documents WHERE doc_id % 6 = 1
              UNION ALL SELECT doc_id, 2, 0, 'meta', 1 FROM documents WHERE doc_id % 5 = 2
              UNION ALL SELECT doc_id, 3, 0, 'title', 1 FROM documents
              UNION ALL SELECT doc_id, 4, 0, 'anchor', 1 FROM documents
              UNION ALL SELECT doc_id, 5, 0, 'heading', 1 FROM documents
              UNION ALL SELECT doc_id, 6, 0, 'prose',
                  length(regexp_extract_all(text, '\S+'))
                FROM documents
                WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> ''
              UNION ALL SELECT doc_id, 7, t.i,
                  CASE t.i WHEN 0 THEN 'anchor' ELSE 'dfn' END, 1
                FROM documents CROSS JOIN (VALUES (0),(1)) t(i) WHERE doc_id % 3 = 0
              UNION ALL SELECT doc_id, 9, 0, 'link', 1 FROM documents WHERE doc_id % 7 = 0
              UNION ALL SELECT doc_id, 10, 0, 'link', 1 FROM documents WHERE doc_id % 5 = 4
              UNION ALL SELECT doc_id, 11, 0, 'idl-block', 1 FROM documents WHERE doc_id % 11 = 0
              UNION ALL SELECT doc_id, 12, 0, 'figure', 64 FROM documents WHERE doc_id % 13 = 0
              UNION ALL SELECT doc_id, 13, 0, 'anchor', 1 FROM documents WHERE doc_id % 6 = 0
              UNION ALL SELECT doc_id, 13, 1, 'ref-entry', 1
                FROM documents WHERE doc_id % 6 = 0 AND doc_id % 4 = 2
              UNION ALL SELECT doc_id, 13, 2, 'link', 1 FROM documents WHERE doc_id % 6 = 0
              UNION ALL SELECT doc_id, 14, t.i,
                  CASE t.i WHEN 0 THEN 'heading' WHEN 1 THEN 'ref-entry' ELSE 'link' END, 1
                FROM documents CROSS JOIN (VALUES (0),(1),(2)) t(i) WHERE doc_id % 6 = 3
              UNION ALL SELECT doc_id, 15, t.i,
                  CASE WHEN t.i = 0 THEN 'anchor' WHEN t.i = 1 THEN 'dfn'
                       ELSE 'css-propdef-row' END, 1
                FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) t(i)
                WHERE doc_id % 8 = 0
              UNION ALL SELECT doc_id, 16, 0, 'css-prod', 1 FROM documents WHERE doc_id % 16 = 0
              UNION ALL SELECT doc_id, 17, t.i,
                  CASE WHEN t.i = 0 THEN 'anchor' ELSE 'event-row' END, 1
                FROM documents CROSS JOIN (VALUES (0),(1),(2)) t(i) WHERE doc_id % 9 = 0
              UNION ALL SELECT doc_id, 18, t.i,
                  CASE WHEN t.i = 0 THEN 'prose' WHEN t.i = 1 THEN 'anchor'
                       ELSE 'algo-step' END,
                  CASE WHEN t.i = 0 THEN 4 ELSE 1 END
                FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) t(i)
                WHERE doc_id % 12 = 0
              UNION ALL SELECT doc_id, 19, 0, 'cddl-block', 1 FROM documents WHERE doc_id % 14 = 0
              UNION ALL SELECT doc_id, 20, t.i,
                  CASE t.i WHEN 0 THEN 'heading' WHEN 3 THEN 'dfn'
                       WHEN 4 THEN 'element-def' ELSE 'anchor' END, 1
                FROM documents CROSS JOIN (VALUES (0),(1),(2),(3),(4)) t(i)
                WHERE doc_id % 15 = 0
              UNION ALL SELECT doc_id, 21, 0, 'css-data', 1 FROM documents WHERE doc_id % 8 = 0
              UNION ALL SELECT doc_id, 22, 0, 'refs-data', 1
                FROM documents WHERE doc_id % 6 = 0 OR doc_id % 6 = 3
              UNION ALL SELECT doc_id, 23, 0, 'events-data', 1 FROM documents WHERE doc_id % 9 = 0
              UNION ALL SELECT doc_id, 24, 0, 'algos-data', 1 FROM documents WHERE doc_id % 12 = 0
            ), seqd AS (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY doc_id ORDER BY ph, i) - 1 AS seq,
                     kind, cost
              FROM parts
            ), rec AS (
              SELECT doc_id, seq, kind, cost, 0 AS chunk_idx, cost AS running
              FROM seqd WHERE seq = 0
              UNION ALL
              SELECT s.doc_id, s.seq, s.kind, s.cost,
                     CASE WHEN r.running + s.cost > 128
                          THEN r.chunk_idx + 1 ELSE r.chunk_idx END,
                     CASE WHEN r.running + s.cost > 128
                          THEN s.cost ELSE r.running + s.cost END
              FROM rec r JOIN seqd s ON s.doc_id = r.doc_id AND s.seq = r.seq + 1
            )
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(chunk_idx AS BIGINT) AS chunk_idx,
                   count(*) AS n_spans,
                   CAST(sum(cost) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN kind = 'figure' THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_media
            FROM rec GROUP BY doc_id, chunk_idx
        """,
        # media_text_pairs: figures sit on %13 docs; the nearest
        # preceding prose span is the whitespace-collapsed document
        # text (the parser's prose normalization), falling back to the
        # title when the text is blank.
        "media_text_pairs": r"""
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://img.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '.png' AS media_ref,
                   'Figure ' || CAST(doc_id AS VARCHAR) AS caption,
                   CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) <> ''
                        THEN trim(regexp_replace(text, '\s+', ' ', 'g'))
                        ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS context
            FROM documents WHERE doc_id % 13 = 0
        """,
        "media_manifest": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://img.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '.png' AS media_ref,
                   'figure' AS kind,
                   'Figure ' || CAST(doc_id AS VARCHAR) AS caption
            FROM documents WHERE doc_id % 13 = 0
        """,
        # ops/multimodal.sample_frames over the derived video table
        # (every third doc, duration 1000 + (doc_id % 97)*250 ms):
        # frames at 0,500,1000,… ms capped at 8 per video
        "frame_sample": """
            WITH vids AS (
              SELECT 'm-' || CAST(doc_id AS VARCHAR) AS media_id,
                     1000 + (doc_id % 97) * 250 AS duration_ms
              FROM documents WHERE doc_id % 3 = 2
            )
            SELECT media_id, CAST(t.i AS BIGINT) AS frame_idx,
                   CAST(t.i * 500 AS BIGINT) AS ts_ms
            FROM vids, unnest(range(0, least(8, 1 + duration_ms // 500))) AS t(i)
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity) * 100) AS BIGINT) / 100.0 AS sum_qty,
                   CAST(round(sum(l_extendedprice) * 100) AS BIGINT) / 100.0 AS sum_price,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_segment": """
            SELECT c_mktsegment, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "events_window": """
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*) AS n,
                   CAST(round(sum(value) * 10000) AS BIGINT) / 10000.0 AS sum_value
            FROM events GROUP BY event_type, date_trunc('day', ts)
        """,
        "annotate_links_sf": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   'https://specs.example.org/spec-' || CAST(doc_id % 50 AS VARCHAR)
                     || '/' AS page_url,
                   'spec-' || CAST(doc_id % 50 AS VARCHAR) AS spec_shortname
            FROM documents WHERE doc_id % 7 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR),
                   'https://corpus.example.org/doc-'
                     || CAST(doc_id - doc_id % 10 AS VARCHAR) || '/', ''
            FROM documents WHERE doc_id % 5 = 4
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR),
                   'https://refs.example.org/ref-' || CAST(doc_id % 9 AS VARCHAR)
                     || '/', ''
            FROM documents WHERE doc_id % 6 = 0
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR),
                   'https://refs.example.org/iref-' || CAST(doc_id % 9 AS VARCHAR)
                     || '/', ''
            FROM documents WHERE doc_id % 6 = 3
        """,
        # lang_id oracle: same stopword tables + tie-break order
        # (alphabetical langs, first max wins) as ops.text.LangId
        "lang_id": _lang_id_sql(),
        # Hash-kernel oracles: the md5-derived kernels (ops/dedup.py,
        # ops/text.py Fingerprint) are recomputed exactly in SQL with
        # HUGEINT modular arithmetic — md5 hex → uint64 via
        # ('0x'||substr(md5(x),1,16))::UBIGINT, mod-2⁶⁴ Horner folds
        # via list_reduce.
        "fingerprint": _FINGERPRINT_SQL,
        "simhash": _SIMHASH_SQL,
        "minhash_pairs": _MINHASH_SQL,
        # ops/dedup.jaccard_pairs: exact word-3-gram Jaccard within
        # source blocks, integer threshold inter/union >= 1/100
        "jaccard_pairs": r"""
            WITH d AS (
              SELECT doc_id, source,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), g AS (
              SELECT DISTINCT doc_id, source,
                     unnest(list_transform(range(1, len(t) - 1),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
              FROM d WHERE len(t) >= 3
            ), sz AS (
              SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS inter
              FROM g a JOIN g b
                ON a.gram = b.gram AND a.source = b.source
               AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT p.doc_a, p.doc_b, p.inter,
                   sa.n + sb.n - p.inter AS union_size
            FROM pairs p
            JOIN sz sa ON sa.doc_id = p.doc_a
            JOIN sz sb ON sb.doc_id = p.doc_b
            WHERE p.inter * 100 >= 1 * (sa.n + sb.n - p.inter)
        """,
        "fuzzy_decontaminate": _FUZZY_DECON_SQL,
        # ops/text.doc_freq: distinct-doc count per token
        "doc_freq": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents
            )
            SELECT tok AS token, count(DISTINCT doc_id) AS df
            FROM toks GROUP BY tok
        """,
        # ops/text.top_terms(n=5, max_df_frac=0.8): per-doc top-5 tokens
        # by (tf desc, token asc) after dropping tokens with df*5 > n*4
        "top_terms": r"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents
            ), tf AS (
              SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
            ), df AS (
              SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
            ), n AS (SELECT count(*) AS n FROM documents),
            ranked AS (
              SELECT t.doc_id, t.tok, t.tf,
                     row_number() OVER (
                       PARTITION BY t.doc_id ORDER BY t.tf DESC, t.tok
                     ) AS rank
              FROM tf t JOIN df USING (tok), n
              WHERE df.df * 5 <= n.n * 4
            )
            SELECT doc_id, tok AS token, tf, rank FROM ranked WHERE rank <= 5
        """,
        # ops/sampling.hash_split: bucket = H(id || '|split-42') mod 10000,
        # thresholds at the cumulative 0.8/0.1/0.1 weights
        # ops/sampling.stratified_sample: keep iff
        # H(id || '|strat-42') % 10000 < per-lang integer threshold
        "stratified_sample": """
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|strat-42'),
                                     1, 16))::UBIGINT % 10000 AS bkt
              FROM documents
            )
            WHERE bkt < CASE lang WHEN 'en' THEN 2000
                                  WHEN 'zh' THEN 8000
                                  ELSE 10000 END
        """,
        "sample_split": """
            SELECT doc_id,
                   CASE WHEN bkt < 8000 THEN 'train'
                        WHEN bkt < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|split-42'),
                                     1, 16))::UBIGINT % 10000 AS bkt
              FROM documents
            )
        """,
        # ops/sampling.source_cap(cap=20): rank per source by (H(id), id)
        "source_cap": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 16))::UBIGINT, doc_id
                     ) AS rn
              FROM documents
            ) WHERE rn <= 20
        """,
        # ops/curation.decontaminate(n=4): drop train docs (doc_id%41!=0)
        # sharing any exact lower-cased word 4-gram with the benchmark
        # partition (doc_id%41==0); tokens = regexp_extract_all '\w+'
        "decontaminate": r"""
            WITH toks AS (
              SELECT doc_id, source,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), grams AS (
              SELECT doc_id, array_to_string(t[i:i+3], ' ') AS g
              FROM toks,
                   LATERAL unnest(generate_series(1, greatest(len(t)-3, 0))) AS u(i)
            ), bench AS (
              SELECT DISTINCT g FROM grams WHERE doc_id % 41 = 0
            )
            SELECT d.doc_id, d.source FROM toks d
            WHERE d.doc_id % 41 != 0
              AND NOT EXISTS (
                SELECT 1 FROM grams x JOIN bench b ON x.g = b.g
                WHERE x.doc_id = d.doc_id)
        """,
        # ops/curation.pii_redact over the same deterministically
        # PII-laced text the query builds; same regex chain, same order
        "pii_redact": r"""
            WITH laced AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com from 10.0.0.'
                          || CAST(doc_id % 256 AS VARCHAR)
                          || ' call 555-123-4567.' AS text
              FROM documents
            ), stage1 AS (
              SELECT doc_id,
                len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g') AS text
              FROM laced
            ), stage2 AS (
              SELECT doc_id, n_email,
                len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
                regexp_replace(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                               '<IP>', 'g') AS text
              FROM stage1
            )
            SELECT doc_id, n_email, n_ip,
                   len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS n_phone,
                   regexp_replace(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b',
                                  '<PHONE>', 'g') AS text
            FROM stage2
        """,
        # ops/curation.gopher_quality(min_words=24): word-count and
        # mean-word-length (integer ppm, floor) gates
        "gopher_quality": r"""
            WITH m AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\w+')) AS n_words,
                     length(regexp_replace(text, '\W+', '', 'g')) AS wc
              FROM documents
            )
            SELECT doc_id, n_words,
                   CASE WHEN n_words > 0
                        THEN (wc * 1000000) // n_words ELSE 0 END AS mean_word_len_ppm,
                   CASE WHEN n_words >= 24 AND n_words <= 1048576
                         AND (wc * 1000000) // n_words BETWEEN 2000000 AND 12000000
                        THEN 1 ELSE 0 END AS keep
            FROM m
        """,
        # ops/curation.normalize_text over the query's messed-up input
        "normalize_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(
                     lower(' ' || ' ' || upper(text) || ' ' || '  TAIL x  '),
                     '\s+', ' ', 'g')) AS text
            FROM documents
        """,
        # ops/sampling.top_k_per_group(k=10, order=n_chars desc, id asc)
        "top_k_per_group": """
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (
                       PARTITION BY source ORDER BY n_chars DESC, doc_id
                     ) AS rn
              FROM documents
            ) WHERE rn <= 10
        """,
        # ops/similarity.knn_join(k=3): exact cosine 3-NN self-join,
        # self-match excluded, ties by ascending neighbor id
        "knn_join": """
            SELECT vec_id, neighbor_id, rank FROM (
              SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC,
                                b.vec_id ASC
                     ) - 1 AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            ) WHERE rank < 3
        """,
        # ops/similarity.group_centroids: per-label mean embedding,
        # long form, rounded at emission (matching convention w/ ann)
        "group_centroids": """
            SELECT label,
                   i - 1 AS dim,
                   round(avg(embedding[i]), 6) AS centroid
            FROM embeddings,
                 LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
            GROUP BY label, i
        """,
        # ops/similarity.kmeans(k=8, iters=2): seeds = 8 lowest
        # vec_ids in id order; one centroid update (6-dp snapped
        # mean, same convention as group_centroids) then a final
        # nearest-centroid labeling. Squared euclidean in the SQL —
        # monotone with the engine's sqrt'd distance, so argmin +
        # lowest-cluster tie-break agree.
        "kmeans": """
            WITH seeds AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                     embedding
              FROM (SELECT vec_id, embedding FROM embeddings
                    ORDER BY vec_id LIMIT 8)
            ), elems AS (
              SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
              FROM embeddings,
                   LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
            ), seed_elems AS (
              SELECT cluster, i AS dim, CAST(embedding[i] AS DOUBLE) AS c
              FROM seeds,
                   LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
            ), d1 AS (
              SELECT e.vec_id, s.cluster,
                     sum((e.x - s.c) * (e.x - s.c)) AS d2
              FROM elems e JOIN seed_elems s ON e.dim = s.dim
              GROUP BY e.vec_id, s.cluster
            ), a1 AS (
              SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY d2 ASC, cluster ASC) AS rn
                FROM d1) WHERE rn = 1
            ), cent AS (
              SELECT a1.cluster, e.dim, round(avg(e.x), 6) AS c
              FROM a1 JOIN elems e ON a1.vec_id = e.vec_id
              GROUP BY a1.cluster, e.dim
            ), d2 AS (
              SELECT e.vec_id, c.cluster,
                     sum((e.x - c.c) * (e.x - c.c)) AS dd
              FROM elems e JOIN cent c ON e.dim = c.dim
              GROUP BY e.vec_id, c.cluster
            )
            SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM (
              SELECT vec_id, cluster,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY dd ASC, cluster ASC) AS rn
              FROM d2) WHERE rn = 1
        """,
        # ops/graph.pagerank(iters=3, damping=0.85) over the derived
        # doc_id -> doc_id // {2,4,8} link graph; outdeg is 3 for
        # every node. CAST(0.85 AS DOUBLE) reproduces the engine's
        # float64 constants bit-for-bit ((1 - 0.85) != decimal 0.15);
        # per-iteration 12-dp snap keeps summation order out of the
        # hash; floor(r*1e9 + 0.5) is evaluated on the identical
        # double on both sides.
        "pagerank": """
            WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            edges AS (
              SELECT doc_id AS src, doc_id // j AS dst
              FROM documents, (VALUES (2), (4), (8)) AS v(j)
            ),
            nodes AS (
              SELECT CAST(unnest(generate_series(
                       0, (SELECT count(*) FROM documents) - 1))
                     AS BIGINT) AS node
            ),
            r0 AS (SELECT node,
                          CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS r
                   FROM nodes),
            c1 AS (SELECT e.dst AS node, sum(r0.r / 3) AS c
                   FROM edges e JOIN r0 ON e.src = r0.node
                   GROUP BY e.dst),
            r1 AS (SELECT nd.node,
                          round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                                  / (SELECT n FROM nn)
                                + CAST(0.85 AS DOUBLE)
                                  * coalesce(c1.c, CAST(0 AS DOUBLE)),
                                12) AS r
                   FROM nodes nd LEFT JOIN c1 ON nd.node = c1.node),
            c2 AS (SELECT e.dst AS node, sum(r1.r / 3) AS c
                   FROM edges e JOIN r1 ON e.src = r1.node
                   GROUP BY e.dst),
            r2 AS (SELECT nd.node,
                          round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                                  / (SELECT n FROM nn)
                                + CAST(0.85 AS DOUBLE)
                                  * coalesce(c2.c, CAST(0 AS DOUBLE)),
                                12) AS r
                   FROM nodes nd LEFT JOIN c2 ON nd.node = c2.node),
            c3 AS (SELECT e.dst AS node, sum(r2.r / 3) AS c
                   FROM edges e JOIN r2 ON e.src = r2.node
                   GROUP BY e.dst),
            r3 AS (SELECT nd.node,
                          round((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                                  / (SELECT n FROM nn)
                                + CAST(0.85 AS DOUBLE)
                                  * coalesce(c3.c, CAST(0 AS DOUBLE)),
                                12) AS r
                   FROM nodes nd LEFT JOIN c3 ON nd.node = c3.node)
            SELECT node,
                   CAST(floor(r * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                     AS rank_e9
            FROM r3
        """,
        # ops/graph.hits: 2 iterations of a[dst]+=h[src] / h[src]+=a[dst],
        # each L2-normalized then snapped to 12 decimals (both engine
        # tiers use the identical snapped math)
        "hits": """
            WITH edges AS (
              SELECT doc_id AS src, doc_id // j AS dst
              FROM documents, (VALUES (2), (4), (8)) AS v(j)
            ),
            nodes AS (
              SELECT CAST(unnest(generate_series(
                       0, (SELECT count(*) FROM documents) - 1))
                     AS BIGINT) AS node
            ),
            h0 AS (SELECT node, CAST(1 AS DOUBLE) AS v FROM nodes),
            ar1 AS MATERIALIZED (
              SELECT e.dst AS node, sum(h0.v) AS c
              FROM edges e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
            arf1 AS MATERIALIZED (
              SELECT nd.node, coalesce(ar1.c, CAST(0 AS DOUBLE)) AS c
              FROM nodes nd LEFT JOIN ar1 ON nd.node = ar1.node),
            na1 AS (SELECT CASE WHEN sqrt(sum(c*c)) = 0
                                THEN CAST(1 AS DOUBLE)
                                ELSE sqrt(sum(c*c)) END AS s FROM arf1),
            a1 AS MATERIALIZED (
              SELECT node, round(c / (SELECT s FROM na1), 12) AS v
              FROM arf1),
            hr1 AS MATERIALIZED (
              SELECT e.src AS node, sum(a1.v) AS c
              FROM edges e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
            hrf1 AS MATERIALIZED (
              SELECT nd.node, coalesce(hr1.c, CAST(0 AS DOUBLE)) AS c
              FROM nodes nd LEFT JOIN hr1 ON nd.node = hr1.node),
            nh1 AS (SELECT CASE WHEN sqrt(sum(c*c)) = 0
                                THEN CAST(1 AS DOUBLE)
                                ELSE sqrt(sum(c*c)) END AS s FROM hrf1),
            h1 AS MATERIALIZED (
              SELECT node, round(c / (SELECT s FROM nh1), 12) AS v
              FROM hrf1),
            ar2 AS MATERIALIZED (
              SELECT e.dst AS node, sum(h1.v) AS c
              FROM edges e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
            arf2 AS MATERIALIZED (
              SELECT nd.node, coalesce(ar2.c, CAST(0 AS DOUBLE)) AS c
              FROM nodes nd LEFT JOIN ar2 ON nd.node = ar2.node),
            na2 AS (SELECT CASE WHEN sqrt(sum(c*c)) = 0
                                THEN CAST(1 AS DOUBLE)
                                ELSE sqrt(sum(c*c)) END AS s FROM arf2),
            a2 AS MATERIALIZED (
              SELECT node, round(c / (SELECT s FROM na2), 12) AS v
              FROM arf2),
            hr2 AS MATERIALIZED (
              SELECT e.src AS node, sum(a2.v) AS c
              FROM edges e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
            hrf2 AS MATERIALIZED (
              SELECT nd.node, coalesce(hr2.c, CAST(0 AS DOUBLE)) AS c
              FROM nodes nd LEFT JOIN hr2 ON nd.node = hr2.node),
            nh2 AS (SELECT CASE WHEN sqrt(sum(c*c)) = 0
                                THEN CAST(1 AS DOUBLE)
                                ELSE sqrt(sum(c*c)) END AS s FROM hrf2),
            h2 AS MATERIALIZED (
              SELECT node, round(c / (SELECT s FROM nh2), 12) AS v
              FROM hrf2)
            SELECT h2.node,
                   CAST(floor(h2.v * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                     AS hub_e9,
                   CAST(floor(a2.v * 1e9 + CAST(0.5 AS DOUBLE)) AS BIGINT)
                     AS auth_e9
            FROM h2 JOIN a2 ON h2.node = a2.node
        """,
        # ops/graph.random_walks: the hash-chosen walk replayed step
        # by step — row_number over the md5 ordering IS the engine's
        # argmin choice rule
        "random_walks": _WALK_CTES + """
            SELECT w AS walk_id, CAST(0 AS BIGINT) AS step, node FROM s0
            UNION ALL
            SELECT w, CAST(1 AS BIGINT), node FROM s1
            UNION ALL
            SELECT w, CAST(2 AS BIGINT), node FROM s2
            UNION ALL
            SELECT w, CAST(3 AS BIGINT), node FROM s3
        """,
        # ops/graph.biased_walks: the (p=2, q=0.5) node2vec draw
        # replayed step by step via integer window cumsums
        "biased_walks": _BIASED_WALK_CTES + """
            SELECT w AS walk_id, CAST(0 AS BIGINT) AS step,
                   CAST(node AS BIGINT) AS node FROM b0
            UNION ALL
            SELECT w, CAST(1 AS BIGINT), CAST(node AS BIGINT) FROM b1
            UNION ALL
            SELECT w, CAST(2 AS BIGINT), CAST(node AS BIGINT) FROM b2
            UNION ALL
            SELECT w, CAST(3 AS BIGINT), CAST(node AS BIGINT) FROM b3
        """,
        # ops/graph.walk_skipgrams over the same walks: every ordered
        # pair at step distance 1..2 within a walk (shared CTE chain —
        # the two walk oracles cannot drift apart)
        "walk_pairs": _WALK_CTES + """,
            allsteps AS MATERIALIZED (
              SELECT w, CAST(0 AS BIGINT) AS step, node FROM s0
              UNION ALL SELECT w, CAST(1 AS BIGINT), node FROM s1
              UNION ALL SELECT w, CAST(2 AS BIGINT), node FROM s2
              UNION ALL SELECT w, CAST(3 AS BIGINT), node FROM s3
            )
            SELECT a.node AS node_a, b.node AS node_b,
                   count(*) AS n_pairs
            FROM allsteps a JOIN allsteps b
              ON a.w = b.w AND b.step - a.step BETWEEN 1 AND 2
            GROUP BY a.node, b.node
        """,
        # walk_skipgrams over the biased walks (shared biased CTE
        # chain — pair logic identical to walk_pairs)
        "biased_walk_pairs": _BIASED_WALK_CTES + """,
            allsteps AS MATERIALIZED (
              SELECT w, CAST(0 AS BIGINT) AS step, node FROM b0
              UNION ALL SELECT w, CAST(1 AS BIGINT), node FROM b1
              UNION ALL SELECT w, CAST(2 AS BIGINT), node FROM b2
              UNION ALL SELECT w, CAST(3 AS BIGINT), node FROM b3
            )
            SELECT CAST(a.node AS BIGINT) AS node_a,
                   CAST(b.node AS BIGINT) AS node_b,
                   count(*) AS n_pairs
            FROM allsteps a JOIN allsteps b
              ON a.w = b.w AND b.step - a.step BETWEEN 1 AND 2
            GROUP BY a.node, b.node
        """,
        # ops/stats.histogram(width=10000): bucket = floor(v/10000),
        # identical IEEE division+floor in both engines
        "price_histogram": """
            SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT)
                     AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY 1
        """,
        # ops/stats.top_value_per_group: per-user modal event type,
        # ties -> smallest type string
        "user_top_event": """
            SELECT user_id, event_type, n FROM (
              SELECT user_id, event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY count(*) DESC, event_type ASC) AS rn
              FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        # ops/stats.kmv_distinct: bottom-k (k=1024) sketch of the
        # vocabulary; same md5-prefix uint64 hash and integer floor
        # division as the kernel, so the ESTIMATE matches exactly
        "kmv_distinct": r"""
            WITH words AS (
              SELECT DISTINCT unnest(
                regexp_split_to_array(lower(text), '\W+')) AS w
              FROM documents
            ),
            hs AS (
              SELECT DISTINCT CAST(('0x' || substr(md5(w), 1, 16))
                       AS UBIGINT) AS h
              FROM words WHERE w <> ''
            ),
            bottom AS (SELECT h FROM hs ORDER BY h LIMIT 1024)
            SELECT CAST(count(*) AS BIGINT) AS n_seen,
                   CAST(CASE WHEN count(*) < 1024 THEN count(*)
                        ELSE CAST(1023 AS HUGEINT)
                             * CAST(18446744073709551616 AS HUGEINT)
                             // CAST(max(h) AS HUGEINT)
                        END AS BIGINT) AS estimate
            FROM bottom
        """,
        # ops/dedup.rare_gram_pairs: inverted-index blocking on rare
        # word trigrams (df in [2,5]), >= 2 shared grams per pair
        "rare_gram_pairs": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       regexp_split_to_array(lower(text), '\W+'),
                       x -> x <> '') AS ws
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
              FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
            ),
            rare AS (
              SELECT gram FROM g GROUP BY gram
              HAVING count(*) BETWEEN 2 AND 5
            ),
            p AS (
              SELECT x.doc_id AS a, y.doc_id AS b
              FROM g x JOIN g y USING (gram) JOIN rare USING (gram)
              WHERE x.doc_id < y.doc_id
            )
            SELECT a, b, CAST(count(*) AS BIGINT) AS shared
            FROM p GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # ops/stats.pivot_counts: conditional-aggregation crosstab
        "pivot_counts": """
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE event_type = 'click')
                        AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (WHERE event_type = 'error')
                        AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase')
                        AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (WHERE event_type = 'signup')
                        AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (WHERE event_type = 'view')
                        AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        # ops/stats.rollup_agg: GROUP BY ROLLUP with 'ALL' sentinels
        "rollup": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        # ops/window.cumulative_agg: ROWS UNBOUNDED PRECEDING running
        # sum of integer cents + running count per user
        "cumulative": """
            SELECT event_id, user_id,
                   CAST(epoch_us(ts) AS BIGINT) AS t_us,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w
                        AS BIGINT) AS cum_sum,
                   CAST(count(*) OVER w AS BIGINT) AS cum_n
            FROM events
            WINDOW w AS (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )
        """,
        # ops/stats.distinct_count: exact per-day distinct users
        "distinct_users": """
            SELECT date_trunc('day', ts) AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1
        """,
        # ops/similarity.rrf_fuse: reciprocal-rank fusion, integer
        # contributions scale//(k+rank), row_number ranks
        "rrf": r"""
            WITH a AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS score
              FROM documents
            ),
            b AS (
              SELECT doc_id, length(text) AS score FROM documents
            ),
            ra AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS r
              FROM a
            ),
            rb AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id) AS r
              FROM b
            )
            SELECT doc_id,
                   CAST(COALESCE(1000000000000 // (60 + ra.r), 0)
                      + COALESCE(1000000000000 // (60 + rb.r), 0)
                        AS BIGINT) AS fused,
                   CAST(COALESCE(ra.r, -1) AS BIGINT) AS rank_a,
                   CAST(COALESCE(rb.r, -1) AS BIGINT) AS rank_b
            FROM ra FULL JOIN rb USING (doc_id)
        """,
        # ops/dedup.er_verified_pairs: rare-gram blocking + exact
        # trigram-Jaccard verification (>= 30/100, integer compare)
        "er_pairs": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       regexp_split_to_array(lower(text), '\W+'),
                       x -> x <> '') AS ws
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
              FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
            ),
            rare AS (
              SELECT gram FROM g GROUP BY gram
              HAVING count(*) BETWEEN 2 AND 5
            ),
            pr AS (
              SELECT x.doc_id AS a, y.doc_id AS b
              FROM g x JOIN g y USING (gram) JOIN rare USING (gram)
              WHERE x.doc_id < y.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            c AS (
              SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
            ),
            i AS (
              SELECT pr.a, pr.b, count(*) AS inter
              FROM pr
              JOIN g ga ON ga.doc_id = pr.a
              JOIN g gb ON gb.doc_id = pr.b AND gb.gram = ga.gram
              GROUP BY 1, 2
            )
            SELECT i.a, i.b,
                   CAST(i.inter AS BIGINT) AS inter,
                   CAST(ca.ng + cb.ng - i.inter AS BIGINT) AS uni
            FROM i
            JOIN c ca ON ca.doc_id = i.a
            JOIN c cb ON cb.doc_id = i.b
            WHERE i.inter * 100 >= (ca.ng + cb.ng - i.inter) * 30
        """,
        # ops/window.max_concurrency: sweep-line interval overlap,
        # 60s half-open intervals, end-exclusive ties (-1 before +1)
        "max_concurrency": """
            WITH d AS (
              SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS t,
                     1 AS dd, event_id AS i
              FROM events
              UNION ALL
              SELECT event_type, CAST(epoch_us(ts) AS BIGINT) + 60000000,
                     -1, event_id
              FROM events
            ),
            r AS (
              SELECT event_type,
                     CAST(sum(dd) OVER (
                       PARTITION BY event_type ORDER BY t, dd, i
                       ROWS UNBOUNDED PRECEDING
                     ) AS BIGINT) AS conc
              FROM d
            )
            SELECT event_type, CAST(max(conc) AS BIGINT) AS max_conc
            FROM r GROUP BY event_type ORDER BY event_type
        """,
        # ops/window.rolling_distinct: trailing 7-day distinct users
        # per live day (integer day numbers since epoch)
        "rolling_distinct": """
            WITH du AS (
              SELECT DISTINCT
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_num,
                     user_id
              FROM events
            ),
            days AS (SELECT DISTINCT day_num FROM du)
            SELECT d.day_num,
                   CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_w
            FROM days d
            JOIN du u ON u.day_num BETWEEN d.day_num - 6 AND d.day_num
            GROUP BY d.day_num ORDER BY d.day_num
        """,
        # ops/stats.pair_lift: integer lift_ppm over support>0
        # unordered event-type pairs
        "pair_lift": """
            WITH pu AS (
              SELECT DISTINCT user_id, event_type FROM events
            ),
            cnt AS (
              SELECT event_type, count(*) AS c FROM pu GROUP BY 1
            ),
            n AS (SELECT count(DISTINCT user_id) AS nu FROM events),
            pr AS (
              SELECT x.event_type AS e1, y.event_type AS e2,
                     count(*) AS support
              FROM pu x JOIN pu y
                ON x.user_id = y.user_id AND x.event_type < y.event_type
              GROUP BY 1, 2
            )
            SELECT pr.e1, pr.e2, CAST(pr.support AS BIGINT) AS support,
                   CAST(pr.support * n.nu * 1000000 // (ca.c * cb.c)
                        AS BIGINT) AS lift_ppm
            FROM pr
            CROSS JOIN n
            JOIN cnt ca ON ca.event_type = pr.e1
            JOIN cnt cb ON cb.event_type = pr.e2
            ORDER BY e1, e2
        """,
        # ops/window.activity_streaks: longest consecutive-day streak
        # per user (gaps-and-islands via day - row_number grouping)
        "streaks": """
            WITH du AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
              FROM events
            ),
            g AS (
              SELECT user_id, day,
                     day - row_number() OVER (
                       PARTITION BY user_id ORDER BY day
                     ) AS grp
              FROM du
            ),
            s AS (
              SELECT user_id, count(*) AS len
              FROM g GROUP BY user_id, grp
            )
            SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        # ops/text.inverted_index: rare-term postings (df <= n_docs/5),
        # comma-joined ascending doc ids
        "inverted_index": r"""
            WITH tok AS (
              SELECT DISTINCT doc_id, t AS term
              FROM documents,
                   unnest(list_filter(
                     regexp_split_to_array(lower(text), '\W+'),
                     x -> x <> '')) AS u(t)
            ),
            rare AS (
              SELECT term FROM tok GROUP BY term
              HAVING count(*) <= (SELECT count(*) // 5 FROM documents)
            )
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM tok JOIN rare USING (term)
            GROUP BY term ORDER BY term
        """,
        # ops/sampling.ab_test_summary: md5-bucket arms (hash_split
        # scheme), converts on >=1 purchase, integer conv_ppm
        "ab_test": """
            WITH pu AS (
              SELECT user_id,
                     max(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) AS conv
              FROM events GROUP BY user_id
            ),
            arms AS (
              SELECT CASE WHEN ('0x' || substr(
                         md5(CAST(user_id AS VARCHAR) || '|ab-42'),
                         1, 16))::UBIGINT % 10000 < 5000
                          THEN 'A' ELSE 'B' END AS arm,
                     conv
              FROM pu
            )
            SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(conv) AS BIGINT) AS converters,
                   CAST(sum(conv) * 1000000 // count(*) AS BIGINT)
                     AS conv_ppm
            FROM arms GROUP BY arm ORDER BY arm
        """,
        # ops/stats.share_of_total: integer-ppm ratio-to-report over
        # event-type spend (cents = floor(value*100))
        "share_of_total": """
            WITH s AS (
              SELECT event_type,
                     sum(CAST(floor(value * 100) AS BIGINT)) AS key_sum
              FROM events GROUP BY event_type
            )
            SELECT event_type, CAST(key_sum AS BIGINT) AS key_sum,
                   CAST(key_sum * 1000000 //
                        (SELECT sum(key_sum) FROM s) AS BIGINT) AS share_ppm
            FROM s ORDER BY event_type
        """,
        # ops/dedup.edit_distance_pairs: rare-gram blocking + exact
        # Levenshtein on 64-char prefixes, dist <= 10
        "edit_distance": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       regexp_split_to_array(lower(text), '\W+'),
                       x -> x <> '') AS ws
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
              FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
            ),
            rare AS (
              SELECT gram FROM g GROUP BY gram
              HAVING count(*) BETWEEN 2 AND 5
            ),
            pr AS (
              SELECT x.doc_id AS a, y.doc_id AS b
              FROM g x JOIN g y USING (gram) JOIN rare USING (gram)
              WHERE x.doc_id < y.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            tx AS (SELECT doc_id, substr(text, 1, 64) AS p FROM documents)
            SELECT pr.a, pr.b,
                   CAST(levenshtein(ta.p, tb.p) AS BIGINT) AS dist
            FROM pr
            JOIN tx ta ON ta.doc_id = pr.a
            JOIN tx tb ON tb.doc_id = pr.b
            WHERE levenshtein(ta.p, tb.p) <= 10
            ORDER BY a, b
        """,
        # top-3 terms per source by doc frequency, ties by term asc
        "trending_terms": r"""
            WITH tok AS (
              SELECT DISTINCT doc_id, source, t AS term
              FROM documents,
                   unnest(list_filter(
                     regexp_split_to_array(lower(text), '\W+'),
                     x -> x <> '')) AS u(t)
            ),
            cnt AS (
              SELECT source, term, count(*) AS df
              FROM tok GROUP BY 1, 2
            ),
            r AS (
              SELECT source, term, df,
                     row_number() OVER (
                       PARTITION BY source ORDER BY df DESC, term ASC
                     ) AS rn
              FROM cnt
            )
            SELECT source, term, CAST(df AS BIGINT) AS df
            FROM r WHERE rn <= 3 ORDER BY source, term
        """,
        # ops/stats.pareto_front: per-priority 2-D skyline of
        # (max price_cents, min date_us), NOT EXISTS dominance
        "pareto": """
            WITH p AS (
              SELECT DISTINCT o_orderpriority AS k,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
                     CAST(epoch_us(o_orderdate) AS BIGINT) AS date_us
              FROM orders
            )
            SELECT k AS o_orderpriority, price_cents, date_us
            FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.k = a.k
                AND b.price_cents >= a.price_cents
                AND b.date_us <= a.date_us
                AND (b.price_cents > a.price_cents
                     OR b.date_us < a.date_us)
            )
            ORDER BY 1, 2, 3
        """,
        # ops/stats.decayed_score: cents >> whole-days-old at the
        # 2024-02-01 reference, exact integer halving
        "decayed": """
            SELECT event_type,
                   CAST(sum(
                     CAST(floor(value * 100) AS BIGINT)
                     >> CAST(LEAST(GREATEST(
                          (1706745600000000
                           - CAST(epoch_us(ts) AS BIGINT)) // 86400000000,
                          0), 62) AS BIGINT)
                   ) AS BIGINT) AS decayed
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # ops/stats.hll_distinct: m=64 md5 registers; raw HLL estimate
        # in exact rational arithmetic (alpha_64 = 0.709 as ppm)
        "hll_users": """
            WITH h AS (
              SELECT DISTINCT CAST(
                ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
                AS UBIGINT) AS hv
              FROM events
            ),
            r AS (
              SELECT CAST(hv >> 58 AS BIGINT) AS bkt,
                     CASE WHEN (hv & 288230376151711743) = 0 THEN 59
                          ELSE 59 - length(bin(CAST(
                            hv & 288230376151711743 AS BIGINT)))
                     END AS rho
              FROM h
            ),
            regs AS (
              SELECT i AS bkt,
                     COALESCE((SELECT max(rho) FROM r WHERE r.bkt = i), 0)
                       AS rho
              FROM unnest(range(0, 64)) AS t(i)
            ),
            s AS (
              SELECT sum(18446744073709551616::HUGEINT
                         // (CAST(1 AS BIGINT) << rho)) AS denom,
                     sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS nz
              FROM regs
            )
            SELECT CAST(64 AS BIGINT) AS m,
                   CAST(nz AS BIGINT) AS n_zero,
                   CAST(709000::HUGEINT * 64 * 64
                        * 18446744073709551616::HUGEINT
                        // (1000000::HUGEINT * denom) AS BIGINT) AS estimate
            FROM s
        """,
        # ops/window.interval_coalesce: running-max-end interval
        # islands per user, 60s + 1ms/cent durations
        "interval_merge": """
            WITH iv AS (
              SELECT user_id AS k,
                     CAST(epoch_us(ts) AS BIGINT) AS t,
                     CAST(epoch_us(ts) AS BIGINT) + 60000000
                       + CAST(floor(value * 100) AS BIGINT) * 1000 AS e
              FROM events
            ),
            m AS (
              SELECT k, t, e,
                     max(e) OVER (
                       PARTITION BY k ORDER BY t, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS prev_max
              FROM iv
            ),
            b AS (
              SELECT k, t, e,
                     CASE WHEN prev_max IS NULL OR t > prev_max
                          THEN 1 ELSE 0 END AS brk
              FROM m
            ),
            isl AS (
              SELECT k, t, e,
                     sum(brk) OVER (
                       PARTITION BY k ORDER BY t, e
                       ROWS UNBOUNDED PRECEDING
                     ) AS island
              FROM b
            )
            SELECT k AS user_id, CAST(island AS BIGINT) AS island_seq,
                   min(t) AS start_us, max(e) AS end_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM isl GROUP BY k, island ORDER BY 1, 2
        """,
        # ops/dedup.containment_pairs: directed |A∩B| >= |A|/2 on the
        # rare-gram-blocked candidate set (same CTEs as er_pairs)
        "containment": r"""
            WITH w AS (
              SELECT doc_id,
                     list_filter(
                       regexp_split_to_array(lower(text), '\W+'),
                       x -> x <> '') AS ws
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
              FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
            ),
            rare AS (
              SELECT gram FROM g GROUP BY gram
              HAVING count(*) BETWEEN 2 AND 5
            ),
            pr AS (
              SELECT x.doc_id AS a, y.doc_id AS b
              FROM g x JOIN g y USING (gram) JOIN rare USING (gram)
              WHERE x.doc_id < y.doc_id
              GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            c AS (
              SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
            ),
            i AS (
              SELECT pr.a, pr.b, count(*) AS inter
              FROM pr
              JOIN g ga ON ga.doc_id = pr.a
              JOIN g gb ON gb.doc_id = pr.b AND gb.gram = ga.gram
              GROUP BY 1, 2
            )
            SELECT src, dst, inter, n_src FROM (
              SELECT i.a AS src, i.b AS dst,
                     CAST(i.inter AS BIGINT) AS inter,
                     CAST(ca.ng AS BIGINT) AS n_src
              FROM i JOIN c ca ON ca.doc_id = i.a
              WHERE i.inter * 2 >= ca.ng
              UNION ALL
              SELECT i.b, i.a, CAST(i.inter AS BIGINT),
                     CAST(cb.ng AS BIGINT)
              FROM i JOIN c cb ON cb.doc_id = i.b
              WHERE i.inter * 2 >= cb.ng
            ) ORDER BY src, dst
        """,
        # ops/window.debounce_events: lag-gap stream dedup per
        # (user, type), 1h window
        "debounce": """
            SELECT user_id, event_type,
                   CAST(epoch_us(ts) AS BIGINT) AS t_us, event_id
            FROM (
              SELECT user_id, event_type, ts, event_id,
                     lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                     ) AS pt
              FROM events
            )
            WHERE pt IS NULL
               OR CAST(epoch_us(ts) AS BIGINT) - pt > 3600000000
        """,
        # ops/joins.table_diff: CDC verdicts via FULL JOIN
        "table_diff": """
            WITH o AS (
              SELECT doc_id, text AS p FROM documents
              WHERE doc_id % 4 <> 0
            ),
            n AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN text || 'X'
                          ELSE text END AS p
              FROM documents WHERE doc_id % 7 <> 0
            )
            SELECT doc_id, status FROM (
              SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                     CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN o.p <> n.p THEN 'changed'
                          ELSE 'same' END AS status
              FROM o FULL JOIN n ON o.doc_id = n.doc_id
            ) WHERE status <> 'same'
        """,
        # ops/window.tumbling_agg: hourly tumbling event-time windows
        "tumbling_window": """
            SELECT (CAST(epoch_us(ts) AS BIGINT) // 3600000000)
                     * 3600000000 AS w,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT))
                     AS BIGINT) AS cents
            FROM events GROUP BY 1, 2
        """,
        # ops/window.hopping_agg: 1h windows hopping every 15min (k=4)
        "hopping_window": """
            WITH ev AS (
              SELECT CAST(epoch_us(ts) AS BIGINT) AS t, event_type,
                     CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events
            ),
            ks AS (SELECT unnest([0, 1, 2, 3]) AS i)
            SELECT ((t // 900000000) - i) * 900000000 AS w, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM ev, ks GROUP BY 1, 2
        """,
        # ops/stats.cms_counts: count-min sketch, exactly restated
        # (same md5-prefix cell hash, min over depth=4 rows)
        "cms_counts": r"""
            WITH t2 AS (
              SELECT w FROM (
                SELECT unnest(
                  regexp_split_to_array(lower(text), '\W+')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
            cells AS (
              SELECT r,
                     CAST(CAST(('0x' || substr(md5(
                       'cms' || CAST(r AS VARCHAR) || ':' || w),
                       1, 16)) AS UBIGINT) % 1024 AS BIGINT) AS cell,
                     count(*) AS n
              FROM t2, rs GROUP BY 1, 2
            ),
            q AS (SELECT unnest(
                    ['hash', 'join', 'stream', 'vector']) AS term),
            qc AS (
              SELECT term, r,
                     CAST(CAST(('0x' || substr(md5(
                       'cms' || CAST(r AS VARCHAR) || ':' || term),
                       1, 16)) AS UBIGINT) % 1024 AS BIGINT) AS cell
              FROM q, rs
            )
            SELECT term, CAST(min(COALESCE(cells.n, 0)) AS BIGINT) AS est
            FROM qc LEFT JOIN cells USING (r, cell)
            GROUP BY term
        """,
        # ops/stats.zscore_outliers: (n*x-S)^2 > 9*(n*Sxx-S^2), exact ints
        "zscore_outliers": """
            WITH ev AS (
              SELECT event_id, event_type,
                     CAST(floor(value) AS BIGINT) AS x
              FROM events
            ),
            s AS (
              SELECT event_type,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM ev GROUP BY 1
            )
            SELECT e.event_id, e.event_type, e.x
            FROM ev e JOIN s USING (event_type)
            WHERE (s.n * e.x - s.sx) * (s.n * e.x - s.sx)
                  > 9 * (s.n * s.sxx - s.sx * s.sx)
        """,
        # ops/joins.bloom_semi_join: m=8192/k=3 filter of urgent order
        # keys; passers = rows whose 3 cells are all set (false
        # positives reproduced exactly)
        "bloom_semi_join": """
            WITH bk AS (
              SELECT DISTINCT o_orderkey AS key FROM orders
              WHERE o_orderpriority = '1-URGENT'
            ),
            rs AS (SELECT unnest([0, 1, 2]) AS i),
            bits AS (
              SELECT DISTINCT
                CAST(CAST(('0x' || substr(md5(
                  'bloom' || CAST(i AS VARCHAR) || ':'
                          || CAST(key AS VARCHAR)),
                  1, 16)) AS UBIGINT) % 8192 AS BIGINT) AS pos
              FROM bk, rs
            ),
            pk AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
            pos AS (
              SELECT key,
                CAST(CAST(('0x' || substr(md5(
                  'bloom' || CAST(i AS VARCHAR) || ':'
                          || CAST(key AS VARCHAR)),
                  1, 16)) AS UBIGINT) % 8192 AS BIGINT) AS pos
              FROM pk, rs
            ),
            passk AS (
              SELECT key FROM pos JOIN bits USING (pos)
              GROUP BY key HAVING count(*) = 3
            )
            SELECT l.l_orderkey, l.l_linenumber
            FROM lineitem l JOIN passk ON l.l_orderkey = passk.key
        """,
        # ops/text.tfidf_terms: integer (tf*1e6)//df, top-3 per doc
        "tfidf_terms": r"""
            WITH t2 AS (
              SELECT doc_id, w FROM (
                SELECT doc_id, unnest(
                  regexp_split_to_array(lower(text), '\W+')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            tf AS (
              SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
              FROM t2 GROUP BY 1, 2
            ),
            df AS (
              SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM t2 GROUP BY 1
            ),
            sc AS (
              SELECT tf.doc_id, tf.w AS token,
                     (tf.tf * 1000000) // df.df AS score,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY (tf.tf * 1000000) // df.df DESC, tf.w
                     ) AS rn
              FROM tf JOIN df USING (w)
            )
            SELECT doc_id, token, CAST(score AS BIGINT) AS score
            FROM sc WHERE rn <= 3
        """,
        # ops/stats.corr_stats: exact int64 sufficient statistics for
        # corr(hour-of-day, value cents) per event type
        "corr_stats": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sum_x,
                   CAST(sum(y) AS BIGINT) AS sum_y,
                   CAST(sum(x * x) AS BIGINT) AS sum_xx,
                   CAST(sum(y * y) AS BIGINT) AS sum_yy,
                   CAST(sum(x * y) AS BIGINT) AS sum_xy
            FROM (
              SELECT event_type,
                     CAST(extract(hour FROM ts) AS BIGINT) AS x,
                     CAST(floor(value * 100) AS BIGINT) AS y
              FROM events
            )
            GROUP BY event_type
        """,
        # ops/stats.winsorize: clip to exact discrete [p01, p99]
        # per-group quantiles (clip limits are data elements)
        "winsorize": """
            WITH b AS (
              SELECT l_returnflag,
                     quantile_disc(l_extendedprice, 0.01) AS lo,
                     quantile_disc(l_extendedprice, 0.99) AS hi
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT l.l_returnflag, l.l_extendedprice,
                   CASE WHEN l.l_extendedprice < b.lo THEN b.lo
                        WHEN l.l_extendedprice > b.hi THEN b.hi
                        ELSE l.l_extendedprice END AS clipped
            FROM lineitem l JOIN b USING (l_returnflag)
        """,
        # ops/window.event_transitions: lag(type) per user then count
        "event_transitions": """
            SELECT prev, event_type AS "next",
                   CAST(count(*) AS BIGINT) AS n
            FROM (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev
              FROM events
            )
            WHERE prev IS NOT NULL
            GROUP BY 1, 2
        """,
        # ops/window.user_paths: ordered string_agg per user
        "user_paths": """
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                     AS path,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        """,
        # ops/stats.heavy_hitters: exact phi=0.01 frequent words
        # (two-pass candidates+verify == plain GROUP BY ... HAVING)
        "heavy_hitters": r"""
            WITH t2 AS (
              SELECT w FROM (
                SELECT unnest(
                  regexp_split_to_array(lower(text), '\W+')) AS w
                FROM documents
              ) WHERE w <> ''
            ),
            tot AS (SELECT count(*) AS n FROM t2)
            SELECT w AS term, CAST(count(*) AS BIGINT) AS n
            FROM t2, tot
            GROUP BY w, tot.n
            HAVING count(*) >= CAST(ceil(0.01 * tot.n) AS BIGINT)
        """,
        # ops/sampling.priority_sample: bottom-k by salted md5-prefix
        # priority; emitted prio = H >> 1 (signed-safe)
        "priority_sample": """
            SELECT doc_id,
                   CAST(CAST(('0x' || substr(
                       md5('prio-42:' || CAST(doc_id AS VARCHAR)),
                       1, 16)) AS UBIGINT) >> 1 AS BIGINT) AS prio
            FROM documents
            ORDER BY CAST(('0x' || substr(
                       md5('prio-42:' || CAST(doc_id AS VARCHAR)),
                       1, 16)) AS UBIGINT), doc_id
            LIMIT 256
        """,
        # ops/stats.event_type_pairs: users-who-did-both support for
        # every unordered type pair (zero-support pairs included)
        "event_type_pairs": """
            WITH t AS (SELECT DISTINCT event_type FROM events),
                 u AS (SELECT DISTINCT user_id, event_type FROM events),
                 s AS (
                   SELECT a.event_type AS e1, b.event_type AS e2,
                          count(*) AS c
                   FROM u a JOIN u b
                     ON a.user_id = b.user_id
                    AND a.event_type < b.event_type
                   GROUP BY 1, 2
                 )
            SELECT t1.event_type AS e1, t2.event_type AS e2,
                   CAST(COALESCE(s.c, 0) AS BIGINT) AS support
            FROM t t1 JOIN t t2 ON t1.event_type < t2.event_type
            LEFT JOIN s ON s.e1 = t1.event_type AND s.e2 = t2.event_type
        """,
        # ops/text.lang_fertility: exact integer token totals per lang
        "lang_fertility": r"""
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(regexp_extract_all(text, '\w+')))
                     AS BIGINT) AS words,
                   CAST(sum(len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')))
                     AS BIGINT) AS bpe_tokens
            FROM documents GROUP BY lang
        """,
        # ops/stats.daily_new_users: first-seen epoch-us per user,
        # floor-divided to days; running total over the day table
        "daily_new_users": """
            WITH firsts AS (
              SELECT user_id, min(epoch_us(ts)) AS f
              FROM events GROUP BY user_id
            ), per AS (
              SELECT f // 86400000000 AS day,
                     CAST(count(*) AS BIGINT) AS new_users
              FROM firsts GROUP BY f // 86400000000
            )
            SELECT day, new_users,
                   CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM per
        """,
        # q_nation_revenue star join: revenue is floored to integer
        # cents PER ROW on the identical double, so every sum is exact
        # int64 — no float accumulation, no cents-boundary risk.
        # CAST(sum(...) AS BIGINT): DuckDB sum(BIGINT) is HUGEINT.
        "nation_revenue": """
            SELECT n.n_name,
                   CAST(sum(CAST(floor(
                       l.l_extendedprice
                       * (CAST(1 AS DOUBLE) - l.l_discount)
                       * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT))
                     AS BIGINT) AS revenue_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        # ops/joins.semi_join (shuffle tier): EXISTS semantics over
        # the >300k-order key side
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000)
        """,
        # ops/joins.anti_join: NOT EXISTS
        "anti_join": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000)
        """,
        # ops/joins.equi_join: inner join over the manufactured
        # hot key (jk=0 owns ~1/3 of events); the engine splits hot
        # keys onto a broadcast map-side tier and cold keys onto the
        # native hash join — same rows either way
        "skew_join": """
            WITH l AS (
                SELECT event_id,
                       CASE WHEN user_id % 3 = 0 THEN 0
                            ELSE user_id END AS jk
                FROM events
            ),
            r AS (SELECT jk, COUNT(*) AS jk_rows FROM l GROUP BY jk)
            SELECT l.event_id, l.jk, r.jk_rows
            FROM l JOIN r USING (jk)
        """,
        # ops/sampling.weighted_sample(weight=n_chars, denom=1000):
        # keep iff H(id|salt) mod 1000 < n_chars — integer-only
        # Bernoulli inclusion, same md5 kernel as sample_split
        "weighted_sample": """
            SELECT * FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                      || '|wsample-42'), 1, 16))::UBIGINT
                  % 1000 < n_chars
        """,
        # ops/window.event_gaps: lag(ts) + row_number per user stream,
        # -1 sentinel keeps gap_us NULL-free int64 (hash-type safety)
        "event_gaps": """
            SELECT event_id,
                   coalesce(date_diff('microsecond',
                                      lag(ts) OVER w, ts),
                            CAST(-1 AS BIGINT)) AS gap_us,
                   CAST(row_number() OVER w - 1 AS BIGINT) AS seq
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        # q_watermark_window: daily window on-time/late accounting over
        # the late_events watermark replay
        "watermark_window": f"""
            WITH lat AS ({_LATE_EVENTS_SQL}),
            w AS (
              SELECT l.event_id, l.is_late, l.late_us,
                     (epoch_us(e.ts) // 86400000000) * 86400000000
                       AS window_start_us
              FROM lat l JOIN events e ON e.event_id = l.event_id
            )
            SELECT window_start_us,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(is_late) AS BIGINT) AS n_late,
                   CAST(sum(late_us) AS BIGINT) AS late_us_sum
            FROM w GROUP BY window_start_us
        """,
        # ops/graph.kcore: bounded-round peel unroll (see _kcore_sql)
        "kcore": _kcore_sql(),
        # ops/patterns.event_pattern: recursive skip-till-next-match
        # replay (fixpoint recursion, one round per match per user)
        "event_pattern": _EVENT_PATTERN_SQL,
        # ops/window.late_events: watermark lateness under the
        # deterministic 4-shard arrival order; first arrival never
        # late; all-int64 emission (hash-type safety)
        "late_events": _LATE_EVENTS_SQL,
        # ops/text.bm25_scores over terms (hash, join, vector,
        # stream), k1=1.2 b=0.75: the SQL mirrors the engine's float
        # expression token-for-token (same literal casts, same
        # left-to-right association), idf snapped at 6 dp on both
        # sides, floor(x*1e6+0.5) on the identical double.
        "bm25": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), stats AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(len(t)) AS BIGINT) AS tot
              FROM toks
            ), consts AS (
              SELECT n, CAST(tot AS DOUBLE) / n AS avgdl FROM stats
            ), q AS (
              SELECT * FROM (VALUES ('hash'), ('join'), ('vector'),
                                    ('stream')) v(term)
            ), df AS (
              SELECT q.term, CAST(count(*) AS BIGINT) AS df
              FROM q JOIN toks ON list_contains(toks.t, q.term)
              GROUP BY q.term
            ), idf AS (
              SELECT term,
                     round(ln((CAST((SELECT n FROM consts) AS DOUBLE)
                                 - df + CAST(0.5 AS DOUBLE))
                              / (df + CAST(0.5 AS DOUBLE))
                              + CAST(1 AS DOUBLE)), 6) AS idf
              FROM df
            ), tf AS (
              SELECT toks.doc_id, q.term,
                     len(list_filter(toks.t, x -> x = q.term)) AS f,
                     len(toks.t) AS dl
              FROM toks CROSS JOIN q
            ), per AS (
              SELECT tf.doc_id,
                     i.idf
                       * (tf.f * (CAST(1.2 AS DOUBLE)
                                  + CAST(1 AS DOUBLE)))
                       / (tf.f + CAST(1.2 AS DOUBLE)
                          * (CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE) * tf.dl
                               / (SELECT avgdl FROM consts))) AS s
              FROM tf JOIN idf i ON tf.term = i.term
              WHERE tf.f > 0
            )
            SELECT doc_id,
                   CAST(floor(sum(s) * 1e6 + CAST(0.5 AS DOUBLE))
                        AS BIGINT) AS bm25_e6
            FROM per GROUP BY doc_id
        """,
        # ops/sampling.connected_components over the derived doc
        # graph (_doc_graph_edges): generic min-reachability closure —
        # min reachable id == component min == the engine's min-label
        # fixpoint. UNION (not UNION ALL) dedups rows so the recursion
        # terminates.
        "cc_components": """
            WITH RECURSIVE e0 AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 10 < 9
                AND doc_id + 1 < (SELECT count(*) FROM documents)
              UNION ALL
              SELECT doc_id, doc_id + 2 FROM documents
              WHERE doc_id % 10 < 8
                AND doc_id + 2 < (SELECT count(*) FROM documents)
              UNION ALL
              SELECT doc_id, doc_id + 13 FROM documents
              WHERE doc_id % 10 = 0
                AND doc_id + 13 < (SELECT count(*) FROM documents)
            ), sym AS (
              SELECT a AS u, b AS v FROM e0
              UNION ALL SELECT b, a FROM e0
            ), gnodes AS (
              SELECT DISTINCT u AS node FROM sym
            ), reach AS (
              SELECT node, node AS r FROM gnodes
              UNION
              SELECT p.node, s.v FROM reach p JOIN sym s ON p.r = s.u
            )
            SELECT node AS doc_id, min(r) AS cluster_rep
            FROM reach GROUP BY node
        """,
        # ops/graph.triangles over the same derived graph: each
        # triangle {x<y<z} found once via its middle-vertex wedge
        # (x,y)+(y,z) closed by (x,z); per-node count = corner
        # expansion.
        "triangle_count": """
            WITH e0 AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 10 < 9
                AND doc_id + 1 < (SELECT count(*) FROM documents)
              UNION ALL
              SELECT doc_id, doc_id + 2 FROM documents
              WHERE doc_id % 10 < 8
                AND doc_id + 2 < (SELECT count(*) FROM documents)
              UNION ALL
              SELECT doc_id, doc_id + 13 FROM documents
              WHERE doc_id % 10 = 0
                AND doc_id + 13 < (SELECT count(*) FROM documents)
            ), tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e0 e1
              JOIN e0 e2 ON e1.b = e2.a
              JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT node, count(*) AS triangles FROM (
              SELECT x AS node FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri
            ) GROUP BY node
        """,
        # ops/graph.bfs_hops over the same derived graph: min hop
        # distance from the {doc_id % 100 == 0} seed set, capped at 4
        # hops. Exact min-hop semantics: recursive UNION dedups, the
        # final GROUP BY min collapses multi-path reaches.
        "bfs_hops": """
            WITH RECURSIVE e0 AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 10 < 9
                AND doc_id + 1 < (SELECT count(*) FROM documents)
              UNION ALL
              SELECT doc_id, doc_id + 2 FROM documents
              WHERE doc_id % 10 < 8
                AND doc_id + 2 < (SELECT count(*) FROM documents)
              UNION ALL
              SELECT doc_id, doc_id + 13 FROM documents
              WHERE doc_id % 10 = 0
                AND doc_id + 13 < (SELECT count(*) FROM documents)
            ), sym AS (
              SELECT a AS u, b AS v FROM e0
              UNION ALL SELECT b, a FROM e0
            ), bfs AS (
              SELECT doc_id AS node, 0 AS dist FROM documents
              WHERE doc_id % 100 = 0
              UNION
              SELECT s.v, p.dist + 1 FROM bfs p
              JOIN sym s ON s.u = p.node
              WHERE p.dist < 4
            )
            SELECT node, CAST(min(dist) AS BIGINT) AS dist
            FROM bfs GROUP BY node
        """,
        # ops/curation.repetition_stats over the query's laced input
        # (newline per 5 words; doc_id%3==0 duplicated wholesale):
        # Gopher dup-line / dup-line-char / top-bigram-char fractions,
        # integer ppm floor, keep gates 0.30/0.20/0.18
        "repetition_stats": r"""
            WITH laced0 AS (
              SELECT doc_id,
                     regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ',
                                    '\1' || chr(10), 'g') AS text
              FROM documents
            ), laced AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0
                          THEN text || chr(10) || text ELSE text END AS text
              FROM laced0
            ), lines AS (
              SELECT doc_id, l
              FROM laced, LATERAL unnest(string_split(text, chr(10))) AS u(l)
              WHERE l != ''
            ), per_line AS (
              SELECT doc_id, l, count(*) AS c, length(l) AS ln
              FROM lines GROUP BY doc_id, l
            ), line_stats AS (
              SELECT doc_id,
                     CAST(sum(c) AS BIGINT) AS n_lines,
                     CAST(sum(c) - count(*) AS BIGINT) AS n_dup,
                     CAST(sum(c * ln) AS BIGINT) AS tot_chars,
                     CAST(sum((c - 1) * ln) AS BIGINT) AS dup_chars
              FROM per_line GROUP BY doc_id
            ), toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t,
                     length(regexp_replace(lower(text), '\W+', '', 'g')) AS denom
              FROM laced
            ), grams AS (
              SELECT doc_id, length(t[i]) + length(t[i+1]) AS chars,
                     t[i] AS g1, t[i+1] AS g2
              FROM toks,
                   LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 2
            ), best AS (
              SELECT doc_id, max(cnt * chars) AS best FROM (
                SELECT doc_id, g1, g2, chars, count(*) AS cnt
                FROM grams GROUP BY doc_id, g1, g2, chars
              ) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(ls.n_lines, 0) AS n_lines,
                   CASE WHEN coalesce(ls.n_lines, 0) > 0
                        THEN ls.n_dup * 1000000 // ls.n_lines ELSE 0 END
                     AS dup_line_frac_ppm,
                   CASE WHEN coalesce(ls.tot_chars, 0) > 0
                        THEN ls.dup_chars * 1000000 // ls.tot_chars ELSE 0 END
                     AS dup_line_char_frac_ppm,
                   CASE WHEN coalesce(b.best, 0) > 0 AND tk.denom > 0
                        THEN b.best * 1000000 // tk.denom ELSE 0 END
                     AS top_bigram_frac_ppm,
                   CASE WHEN coalesce(ls.n_lines, 0) > 0
                         AND (CASE WHEN ls.n_lines > 0
                              THEN ls.n_dup * 1000000 // ls.n_lines ELSE 0 END) <= 300000
                         AND (CASE WHEN ls.tot_chars > 0
                              THEN ls.dup_chars * 1000000 // ls.tot_chars ELSE 0 END) <= 200000
                         AND (CASE WHEN coalesce(b.best, 0) > 0 AND tk.denom > 0
                              THEN b.best * 1000000 // tk.denom ELSE 0 END) <= 180000
                        THEN 1 ELSE 0 END AS keep
            FROM laced d
            LEFT JOIN line_stats ls USING (doc_id)
            LEFT JOIN toks tk USING (doc_id)
            LEFT JOIN best b USING (doc_id)
        """,
        # ops/curation.chunk_tokens(window=16, stride=12): overlapping
        # fixed token windows, case preserved, final partial kept
        "chunk_tokens": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\w+') AS t
              FROM documents
            )
            SELECT doc_id,
                   (i - 1) // 12 AS chunk_id,
                   least(16, len(t) - i + 1) AS n_tokens,
                   array_to_string(t[i:i+15], ' ') AS chunk_text
            FROM toks,
                 LATERAL unnest(generate_series(1, len(t), 12)) AS u(i)
        """,
        # ops/curation.remove_boilerplate_lines(min_count=3) over the
        # query's laced input (5-word lines + one footer in every doc,
        # a second in even docs): lines with doc-frequency >= 3 are
        # stripped everywhere; survivors rejoined by \n in order
        "boilerplate": r"""
            WITH laced0 AS (
              SELECT doc_id,
                     regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ',
                                    '\1' || chr(10), 'g')
                       || chr(10) || 'all rights reserved footer' AS text
              FROM documents
            ), laced AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN text || chr(10) || 'subscribe to newsletter'
                          ELSE text END AS text
              FROM laced0
            ), split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM laced
            ), lines AS (
              SELECT doc_id, i, ls[i] AS l
              FROM split, LATERAL unnest(generate_series(1, len(ls))) AS u(i)
            ), boiler AS (
              SELECT l FROM lines WHERE l != ''
              GROUP BY l HAVING count(DISTINCT doc_id) >= 3
            ), kept AS (
              SELECT doc_id, i, l FROM lines
              WHERE l = '' OR l NOT IN (SELECT l FROM boiler)
            )
            SELECT d.doc_id,
                   coalesce(string_agg(k.l, chr(10) ORDER BY k.i), '') AS text,
                   (SELECT count(*) FROM lines x WHERE x.doc_id = d.doc_id)
                     - count(k.l) AS n_removed
            FROM laced d LEFT JOIN kept k USING (doc_id)
            GROUP BY d.doc_id
        """,
        # per-user OLS on (days since 2024-01-01, floor cents) over
        # purchases; slope/intercept emitted as exact integer num/den
        # (n·Sxy−SxSy, n·Sxx−Sx², Sy·Sxx−Sx·Sxy) — no float anywhere
        "regression": """
            WITH pts AS (
              SELECT user_id,
                     date_diff('day', TIMESTAMP '2024-01-01', ts) AS x,
                     CAST(floor(value * 100) AS BIGINT) AS y
              FROM events WHERE event_type = 'purchase'
            ), s AS (
              SELECT user_id, count(*) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(x * y) AS BIGINT) AS sxy
              FROM pts GROUP BY user_id
            )
            SELECT user_id, n,
                   CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
                   CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num,
                   CAST(n * sxx - sx * sx AS BIGINT) AS intercept_den
            FROM s
        """,
        # last-touch attribution: latest click <= purchase ts within
        # 7 days per user (inclusive window edge, matching merge_asof
        # tolerance); floor-cents money; -1/epoch sentinels keep the
        # emission type-stable (the asof_join oracle rule)
        "attribution": """
            WITH p AS (SELECT event_id, user_id, ts,
                              CAST(floor(value * 100) AS BIGINT) AS value_cents
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT event_id, user_id, ts
                       FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.user_id, p.ts, p.value_cents,
                   coalesce(t.event_id, -1) AS touch_event_id,
                   coalesce(t.ts, TIMESTAMP '1970-01-01') AS touch_ts
            FROM p LEFT JOIN LATERAL (
              SELECT c.event_id, c.ts FROM c
              WHERE c.user_id = p.user_id AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL 7 DAY
              ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
            ) t ON true
        """,
        # distinct (source, 8-gram) pairs (same tokenizer + slice
        # convention as dup_ngram_fraction) self-joined on the gram,
        # lexicographic a<b pair order
        "source_overlap": r"""
            WITH tok AS MATERIALIZED (
              SELECT doc_id, source, w,
                     row_number() OVER (PARTITION BY doc_id ORDER BY i) AS j
              FROM (
                SELECT doc_id, source,
                       unnest(regexp_split_to_array(lower(text), '\W+')) AS w,
                       generate_subscripts(
                         regexp_split_to_array(lower(text), '\W+'), 1) AS i
                FROM documents)
              WHERE w <> ''
            ),
            dl AS (SELECT doc_id, source, list(w ORDER BY j) AS ws
                   FROM tok GROUP BY doc_id, source),
            g AS MATERIALIZED (
              SELECT DISTINCT source, array_to_string(ws[i:i+7], ' ') AS gram
              FROM (SELECT source, ws,
                           unnest(generate_series(1, len(ws) - 7)) AS i
                    FROM dl)
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_shared_grams
            FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
            GROUP BY 1, 2
        """,
        # C4 rules over the laced corpus: 5-word '.'-lines, %7 '{'
        # plant, badword 'vector'; line survives iff terminal punct +
        # >=5 words + no 'javascript'; doc keep iff >=3 kept lines and
        # none of badword / '{' / 'lorem ipsum' in the laced text
        "c4_clean": r"""
            WITH laced0 AS (
              SELECT doc_id,
                     regexp_replace(text, '(\w+ \w+ \w+ \w+ \w+) ',
                                    '\1.' || chr(10), 'g') AS text
              FROM documents
            ), laced AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN text || chr(10) || 'this page uses code { sample }'
                          ELSE text END AS text
              FROM laced0
            ), split AS (
              SELECT doc_id, string_split(text, chr(10)) AS ls FROM laced
            ), lines AS (
              SELECT doc_id, i, trim(ls[i]) AS l
              FROM split, LATERAL unnest(generate_series(1, len(ls))) AS u(i)
            ), kept AS (
              SELECT doc_id, i, l FROM lines
              WHERE l != ''
                AND regexp_matches(l, '[.!?"]$')
                AND len(regexp_split_to_array(l, '\s+')) >= 5
                AND NOT contains(lower(l), 'javascript')
            ), agg AS (
              SELECT doc_id, string_agg(l, chr(10) ORDER BY i) AS text,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(a.text, '') AS text,
                   (SELECT count(*) FROM lines x WHERE x.doc_id = d.doc_id)
                     AS n_lines,
                   coalesce(a.n_kept, 0) AS n_kept,
                   CAST(CASE WHEN coalesce(a.n_kept, 0) >= 3
                          AND NOT regexp_matches(lower(d.text), '\b(vector)\b')
                          AND NOT contains(d.text, '{')
                          AND NOT contains(lower(d.text), 'lorem ipsum')
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM laced d LEFT JOIN agg a USING (doc_id)
        """,
        # ops/curation.pack_chunks(budget=128, n_shards=16) over the
        # chunk_tokens(16,12) output: shard = md5-hash of doc_id,
        # offset = window cumsum within shard in (doc_id, chunk_id)
        # order, bin/bin_pos by integer division
        "pack_chunks": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(text, '\w+') AS t
              FROM documents
            ), chunks AS (
              SELECT doc_id,
                     (i - 1) // 12 AS chunk_id,
                     least(16, len(t) - i + 1) AS n_tokens
              FROM toks,
                   LATERAL unnest(generate_series(1, len(t), 12)) AS u(i)
            ), sharded AS (
              SELECT doc_id, chunk_id, n_tokens,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|pack-42'), 1, 16))::UBIGINT
                          % 16 AS BIGINT) AS shard
              FROM chunks
            ), packed AS (
              SELECT doc_id, chunk_id, shard, n_tokens,
                     CAST(coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id, chunk_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS off
              FROM sharded
            )
            SELECT doc_id, chunk_id, shard, n_tokens,
                   off // 128 AS bin, off % 128 AS bin_pos
            FROM packed
        """,
        # ops/sampling.temperature_mix(alpha=0.5, keep_frac=0.5) over
        # the query's skewed remap (doc_id%10<6 -> 'hot'): exact
        # integer rates, md5-hash row selection (shared convention)
        "temperature_mix": r"""
            WITH remap AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 6 THEN 'hot'
                          ELSE 'src' || CAST(doc_id % 4 AS VARCHAR)
                     END AS source
              FROM documents
            ), counts AS (
              SELECT source, CAST(count(*) AS BIGINT) AS c
              FROM remap GROUP BY source
            ), w AS (
              SELECT source, c, CAST(floor(sqrt(c)) AS BIGINT) AS w
              FROM counts
            ), tot AS (
              SELECT CAST(sum(c) AS BIGINT) AS total,
                     CAST(sum(w) AS BIGINT) AS wsum
              FROM w
            ), rates AS (
              SELECT source,
                     least(1000000,
                           ((CAST(floor(total * 0.5) AS BIGINT) * w) // wsum)
                             * 1000000 // c) AS rate_ppm
              FROM w, tot
            )
            SELECT r.doc_id, r.source
            FROM remap r JOIN rates t USING (source)
            WHERE ('0x' || substr(md5(CAST(r.doc_id AS VARCHAR) || '|mix-42'), 1, 16))::UBIGINT
                    % 1000000 < t.rate_ppm
        """,
        # ops/sampling.near_dup_clusters: transitive closure over the
        # minhash pair set (same params as minhash_pairs), rep = min id
        "near_dup_clusters": """
            WITH RECURSIVE pairs AS MATERIALIZED (
              SELECT a, b FROM (""" + _MINHASH_SQL + """) q
            ), edges AS (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ), nodes AS (
              SELECT DISTINCT a AS n FROM edges
            ), reach(n, m) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
            )
            SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n
        """,
        # ops/sampling.near_dedup: drop cluster members whose id is not
        # the component minimum (same closure as near_dup_clusters)
        "near_dedup": """
            WITH RECURSIVE pairs AS MATERIALIZED (
              SELECT a, b FROM (""" + _MINHASH_SQL + """) q
            ), edges AS (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ), nodes AS (
              SELECT DISTINCT a AS n FROM edges
            ), reach(n, m) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
            ), clusters AS (
              SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n
            )
            SELECT d.doc_id FROM documents d
            LEFT JOIN clusters c ON d.doc_id = c.doc_id
            WHERE c.doc_id IS NULL OR c.cluster_rep = d.doc_id
        """,
        # ops/similarity.quantize_embeddings: per-vector int8 symmetric
        # quantization, float64 floors on both sides; zero/empty
        # vectors pin to scale 0 / all-zero qvec exactly like the op
        "quantize_embeddings": """
            WITH s AS (
              SELECT vec_id, embedding,
                     COALESCE(list_aggregate(
                       list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                       'max'), 0.0) AS mx
              FROM embeddings
            )
            SELECT vec_id,
                   CAST(floor(mx * 1000000) AS BIGINT) AS scale_ppm,
                   COALESCE(array_to_string(
                     list_transform(embedding,
                       x -> CAST(CASE WHEN mx = 0 THEN 0
                                 ELSE CAST(floor(CAST(x AS DOUBLE) * 127.0
                                                 / mx) AS BIGINT)
                                 END AS VARCHAR)),
                     ','), '') AS qvec
            FROM s
        """,
        # q_curation_pipeline: near_dedup ∧ gopher ∧ decontaminate ∧
        # stratified_sample, then the 10k token-budget prefix — each
        # predicate is the proven per-op oracle, conjoined
        "curation_pipeline": """
            WITH RECURSIVE pairs AS MATERIALIZED (
              SELECT a, b FROM (""" + _MINHASH_SQL + r""") q
            ), edges AS (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ), nodes AS (
              SELECT DISTINCT a AS n FROM edges
            ), reach(n, m) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
            ), clusters AS (
              SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n
            ), kept_dedup AS (
              SELECT d.doc_id FROM documents d
              LEFT JOIN clusters c ON d.doc_id = c.doc_id
              WHERE c.doc_id IS NULL OR c.cluster_rep = d.doc_id
            ), gq AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\w+')) AS n_words,
                       length(regexp_replace(text, '\W+', '', 'g')) AS wc
                FROM documents
              )
              WHERE n_words >= 24 AND n_words <= 1048576
                AND (wc * 1000000) // n_words BETWEEN 2000000 AND 12000000
            ), dtoks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS t
              FROM documents
            ), dgrams AS (
              SELECT doc_id, array_to_string(t[i:i+3], ' ') AS g
              FROM dtoks,
                   LATERAL unnest(generate_series(1, greatest(len(t)-3, 0)))
                     AS u(i)
            ), dbench AS (
              SELECT DISTINCT g FROM dgrams WHERE doc_id % 41 = 0
            ), clean AS (
              SELECT d.doc_id FROM dtoks d
              WHERE d.doc_id % 41 != 0
                AND NOT EXISTS (
                  SELECT 1 FROM dgrams x JOIN dbench b ON x.g = b.g
                  WHERE x.doc_id = d.doc_id)
            ), strat AS (
              SELECT doc_id FROM (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                           || '|strat-42'), 1, 16))::UBIGINT
                         % 10000 AS sbkt
                FROM documents
              )
              WHERE sbkt < CASE lang WHEN 'en' THEN 5000 ELSE 10000 END
            ), surv AS (
              SELECT d.doc_id,
                     CASE WHEN trim(d.text) = '' THEN 1
                          ELSE len(regexp_split_to_array(trim(d.text), '\s+'))
                     END AS n_tokens,
                     ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)
                                         || '|budget-42'), 1, 16))::UBIGINT
                       % 10000 AS bkt
              FROM documents d
              JOIN kept_dedup USING (doc_id)
              JOIN gq USING (doc_id)
              JOIN clean USING (doc_id)
              JOIN strat USING (doc_id)
            ), run AS (
              SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (
                       ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING
                     ) AS cum
              FROM surv
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
            FROM run WHERE cum <= 10000
        """,
        # ops/sampling.token_budget_sample: keep docs while the running
        # token sum over (md5 bucket, doc_id) order stays ≤ 20000
        "token_budget_sample": r"""
            WITH t AS (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN 1
                          ELSE len(regexp_split_to_array(trim(text), '\s+'))
                     END AS n_tokens,
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                         || '|budget-42'), 1, 16))::UBIGINT
                       % 10000 AS bkt
              FROM documents
            ), run AS (
              SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (
                       ORDER BY bkt, doc_id ROWS UNBOUNDED PRECEDING
                     ) AS cum
              FROM t
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
            FROM run WHERE cum <= 20000
        """,
        # ops/sampling.near_dedup_best: drop cluster members that are
        # not the quality winner (max alpha_ppm, tie min doc_id)
        "near_dedup_best": """
            WITH RECURSIVE pairs AS MATERIALIZED (
              SELECT a, b FROM (""" + _MINHASH_SQL + """) q
            ), edges AS (
              SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ), nodes AS (
              SELECT DISTINCT a AS n FROM edges
            ), reach(n, m) AS (
              SELECT n, n FROM nodes
              UNION
              SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
            ), clusters AS (
              SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n
            ), quality AS (
              SELECT doc_id,
                     CAST(floor(len(regexp_extract_all(text, '[A-Za-z]'))
                          * 1000000.0 / greatest(length(text), 1)) AS BIGINT)
                       AS alpha_ppm
              FROM documents
            ), ranked AS (
              SELECT c.doc_id,
                     row_number() OVER (
                       PARTITION BY c.cluster_rep
                       ORDER BY q.alpha_ppm DESC, c.doc_id
                     ) AS rk
              FROM clusters c JOIN quality q USING (doc_id)
            )
            SELECT d.doc_id FROM documents d
            LEFT JOIN ranked r ON d.doc_id = r.doc_id
            WHERE r.doc_id IS NULL OR r.rk = 1
        """,
        # ops/joins.asof_join: purchases × most recent prior click per user
        "asof_join": """
            SELECT l.event_id, l.user_id, l.ts,
                   COALESCE(r.ts, TIMESTAMP '1970-01-01') AS ts_r,
                   COALESCE(r.event_id, -1) AS event_id_r
            FROM (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'purchase') l
            ASOF LEFT JOIN
                 (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'click') r
            ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        # ops/stats.group_quantiles: percentile_disc per return flag
        "group_quantiles": """
            SELECT l_returnflag,
                   quantile_disc(l_extendedprice, 0.25) AS q25,
                   quantile_disc(l_extendedprice, 0.5)  AS q50,
                   quantile_disc(l_extendedprice, 0.75) AS q75,
                   quantile_disc(l_extendedprice, 0.9)  AS q90
            FROM lineitem GROUP BY l_returnflag
        """,
        # ops/stats.global_quantiles: exact quantile_disc, no global sort
        "global_quantiles": """
            SELECT quantile_disc(l_extendedprice, 0.5)  AS q50,
                   quantile_disc(l_extendedprice, 0.9)  AS q90,
                   quantile_disc(l_extendedprice, 0.99) AS q99
            FROM lineitem
        """,
        # ops/stats.global_quantiles: recursive refinement on ~95% zeros
        "global_quantiles_skew": """
            SELECT quantile_disc(v, 0.5)  AS q50,
                   quantile_disc(v, 0.9)  AS q90,
                   quantile_disc(v, 0.99) AS q99
            FROM (
              SELECT CASE WHEN l_orderkey % 20 = 0
                          THEN CAST(l_extendedprice AS DOUBLE)
                          ELSE 0.0 END AS v
              FROM lineitem
            )
        """,
        # ops/window.rolling_agg: trailing 7-day RANGE frame per user
        "rolling_window": """
            SELECT event_id, user_id, ts,
                   count(*) OVER w AS w_count,
                   CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS w_sum
            FROM events
            WINDOW w AS (
              PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
            )
        """,
        # ops/joins.range_join: line items shipped within 90 days of order
        "range_join": """
            SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate,
                   o.o_orderdate, o.o_orderdate + INTERVAL 90 DAY AS o_end
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= o.o_orderdate
              AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
        """,
        "embedding_near_dups": _EMB_NEAR_DUP_SQL,
        # post-stage oracles over the derived inputs (see the q_* docstrings)
        "merge_crawl": """
            SELECT 'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/' AS url,
                   'ref ' || CAST(doc_id AS VARCHAR) AS title,
                   'ref' AS status
            FROM documents WHERE doc_id % 4 <> 0
            UNION ALL
            SELECT 'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/',
                   'new ' || CAST(doc_id AS VARCHAR), 'new'
            FROM documents WHERE doc_id % 4 = 0
        """,
        "cssmerge": """
            WITH rows AS (
              SELECT doc_id,
                     'p' || CAST(doc_id % 20 AS VARCHAR) AS name,
                     CAST(1 + doc_id % 3 AS VARCHAR) AS v,
                     'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                       || '/#propdef-p' || CAST(doc_id AS VARCHAR) AS href,
                     (doc_id % 16 = 0) AS is_base,
                     'v' || CAST((doc_id // 16) % 5 AS VARCHAR) AS val,
                     'n' || CAST(doc_id % 5 AS VARCHAR) AS nv
              FROM documents WHERE doc_id % 8 = 0
            ), base AS (
              SELECT name, val, href FROM (
                SELECT name, val, href,
                       row_number() OVER (
                         PARTITION BY name ORDER BY v DESC, doc_id ASC) AS rn
                FROM rows WHERE is_base)
              WHERE rn = 1
            ), exts AS (
              SELECT r.* FROM rows r
              WHERE NOT r.is_base AND NOT EXISTS (
                SELECT 1 FROM rows r2
                WHERE NOT r2.is_base AND r2.name = r.name
                  AND r2.nv = r.nv AND r2.v > r.v)
            ), ext_agg AS (
              SELECT name,
                     string_agg(nv, ' | ' ORDER BY doc_id) AS extra,
                     string_agg(href, '", "' ORDER BY doc_id) AS ext_hrefs
              FROM exts GROUP BY name
            )
            SELECT 'properties' AS category, b.name AS name,
              '{"extended": [' ||
                CASE WHEN e.name IS NULL THEN ']'
                     ELSE '"' || e.ext_hrefs || '"]' END ||
              ', "href": "' || b.href || '", "name": "' || b.name ||
              '", "syntax": "' ||
                CASE WHEN e.name IS NULL THEN b.val
                     ELSE b.val || ' | ' || e.extra END ||
              '"}' AS payload_json
            FROM base b LEFT JOIN ext_agg e USING (name)
        """,
        "events_consolidated": """
            SELECT 'ev' || CAST(doc_id % 7 AS VARCHAR) AS type,
                   'Event' AS interface,
                   TRUE AS bubbles,
                   'https://corpus.example.org/doc-' || CAST(doc_id AS VARCHAR)
                     || '/#eventdef-' || CAST(doc_id AS VARCHAR) AS href,
                   array_to_string(list_sort(
                     (CASE WHEN doc_id % 18 = 0 THEN ['IncA', 'IncB']
                           ELSE ['IFace' || CAST(doc_id % 4 AS VARCHAR)] END)
                     || (CASE WHEN doc_id + 3 IN (SELECT doc_id FROM documents)
                              THEN ['IFaceX' || CAST((doc_id + 3) % 5 AS VARCHAR)]
                              ELSE [] END)
                   ), ',') AS targets
            FROM documents WHERE doc_id % 9 = 0
        """,
        # ops/multimodal.media_dedup: payload-hash exact dedup. The
        # engine md5s the real PNM/WAV bytes; this oracle predicts the
        # duplicate groups from the closed-form generation rules
        # (image/audio payloads are seed-independent → one cross-seed
        # duplicate each; video payloads are seed-keyed → singletons)
        "media_dedup": """
            WITH rows AS (
              SELECT s.seed, g.i,
                     CASE g.i % 3 WHEN 0 THEN 'image'
                                  WHEN 1 THEN 'audio'
                                  ELSE 'video' END AS kind
              FROM range(0, 150) AS g(i), (VALUES (0), (1)) AS s(seed)
            ),
            keyed AS (
              SELECT kind,
                     'mr' || seed || '-' || i AS media_id,
                     kind || '-' || i AS dup_key
              FROM rows
            )
            SELECT k.media_id, k.kind,
                   min(k2.media_id) AS canonical_id,
                   count(*) AS group_size
            FROM keyed k JOIN keyed k2 USING (dup_key)
            GROUP BY k.media_id, k.kind
        """,
        # ops/multimodal.MediaDecoder(fake=False) + ops/codecs: real
        # PPM/PNG/WAV decode plus the MP4 metadata probe; the
        # synthetic payloads follow closed-form rules
        # (synth_media_batch_real), so the oracle reproduces every
        # decoded/probed value analytically.
        "media_features": """
            WITH m AS (
              SELECT i, i % 3 AS r,
                     16 + (i % 8) * 4 AS w,
                     12 + (i % 5) * 4 AS h,
                     160 + i AS ns
              FROM range(256) t(i)
            )
            SELECT 'mr0-' || CAST(i AS VARCHAR) AS media_id,
              CASE r WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                     ELSE 'video' END AS kind,
              'ok' AS decode_status,
              CASE r WHEN 0 THEN w WHEN 1 THEN 8000
                     ELSE 64 END AS dim_a,
              CASE r WHEN 0 THEN h WHEN 1 THEN 0
                     ELSE 48 END AS dim_b,
              CASE r WHEN 0 THEN 3 WHEN 1 THEN 1
                     ELSE 0 END AS channels,
              CASE r WHEN 0 THEN w * h WHEN 1 THEN ns
                     ELSE 24 + (i % 8) END AS units,
              CASE r WHEN 0 THEN i
                     WHEN 1 THEN (i - 128) * 256
                     ELSE 1000 + i END AS v_first,
              CASE r WHEN 0 THEN (i + h + w) % 256
                     WHEN 1 THEN (((2 * i + 159) % 256) - 128) * 256
                     ELSE 1000
                     END AS v_last,
              CASE r WHEN 0 THEN
                       CASE WHEN i + h + w > 255 THEN 0 ELSE i END
                     WHEN 1 THEN
                       CASE WHEN 2 * i + 159 > 255 THEN -32768
                            ELSE (i - 128) * 256 END
                     ELSE 0
                     END AS v_min,
              CASE r WHEN 0 THEN
                       CASE WHEN i + h + w > 255 THEN 255
                            ELSE i + h + w END
                     WHEN 1 THEN
                       CASE WHEN 2 * i + 159 > 255 THEN 32512
                            ELSE (2 * i + 31) * 256 END
                     ELSE 0
                     END AS v_max
            FROM m
        """,
        # crawl_fixture / annotate_links (fixture variant):
        # intentionally omitted — stateful-distributed semantics
        # (crawl rounds); driver records rows-only.
    }
    # ops/graphstore.bucketed_pagerank: same math, same graph, same
    # per-iteration snap as the in-memory tiers — the bucketed store
    # only changes WHERE the edges live, so the oracle is pagerank's
    out["bucketed_pagerank"] = out["pagerank"]
    # ops/graphstore.bucketed_walks: identical choice rule to
    # random_walks, walks started from the doc_id % 7 == 0 subset —
    # the shared step CTE chain with a filtered s0
    out["bucketed_walks"] = _BUCKETED_START_CTES + """
            SELECT w AS walk_id, CAST(0 AS BIGINT) AS step, node FROM s0
            UNION ALL
            SELECT w, CAST(1 AS BIGINT), node FROM s1
            UNION ALL
            SELECT w, CAST(2 AS BIGINT), node FROM s2
            UNION ALL
            SELECT w, CAST(3 AS BIGINT), node FROM s3
    """
    return out


def _ccnet_buckets_sql(buckets: int = 3) -> str:
    return f"""
        WITH tok AS MATERIALIZED (
          SELECT doc_id, word FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '\\W+')) AS word
            FROM documents)
          WHERE word <> ''
        ),
        freq AS (SELECT word, count(*) AS n FROM tok GROUP BY word),
        tot AS (SELECT count(*) AS t FROM tok),
        ppl AS (
          SELECT doc_id, round(sum(-log2(n / t)) / count(*), 4) AS logppl
          FROM tok JOIN freq USING (word), tot
          GROUP BY doc_id
        ),
        lang AS ({_lang_id_sql()}),
        r AS (
          SELECT p.doc_id, l.lang_pred, p.logppl,
                 row_number() OVER (
                   PARTITION BY l.lang_pred
                   ORDER BY p.logppl, p.doc_id) - 1 AS rk,
                 count(*) OVER (PARTITION BY l.lang_pred) AS n
          FROM ppl p JOIN lang l USING (doc_id)
        )
        SELECT doc_id, lang_pred, logppl,
               CAST((rk * {buckets}) // n AS BIGINT) AS ppl_bucket
        FROM r
    """


def _lang_id_sql() -> str:
    from reffy_ray.ops.text import _LANG_STOPWORDS, LangId

    langs = sorted(_LANG_STOPWORDS)
    cols = ",\n".join(
        f"  len(regexp_extract_all(lower(substr(text, 1, {LangId.MAX_CHARS})), "
        f"'\\b(?:{'|'.join(sorted(_LANG_STOPWORDS[lang]))})\\b')) AS {lang}"
        for lang in langs
    )
    # first max wins across alphabetically-ordered langs (numpy argmax)
    cases = []
    for i, lang in enumerate(langs):
        others = [o for o in langs[i + 1:]]
        cond = " AND ".join([f"{lang} >= {o}" for o in others]) or "TRUE"
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "\n       ".join(cases)
    greatest = ", ".join(langs)
    return f"""
        WITH scored AS (
          SELECT doc_id,
{cols}
          FROM documents
        )
        SELECT doc_id,
          CASE WHEN greatest({greatest}) = 0 THEN 'und'
       {case_sql}
          END AS lang_pred
        FROM scored
    """
