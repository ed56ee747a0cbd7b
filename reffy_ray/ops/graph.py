"""Link-graph operators.

``pagerank`` — fixed-iteration distributed PageRank over an edge-list
Dataset, the crawl-side "which pages matter" signal (reference analog:
the crawl prioritizes specs by how often they are referenced; see
``post/backrefs.py`` for the link graph itself).

Engine-exact semantics: every iteration's ranks are snapped to a fixed
decimal grid, so float summation order (which no distributed engine or
SQL database guarantees) never compounds across iterations — the same
unrolled computation in DuckDB hash-matches bit-for-bit. Output is
integer (``rank_e9``), the repo's hash-stable convention.

Scale shape: ranks and edges stay distributed — each iteration is one
hash join of edges against the rank table on ``src`` (both sides
partitioned by the same key) and one ``groupby(dst)`` sum of
contributions; per-node zero rows keep sink-only nodes in the frame.
Nothing corpus-sized ever reaches the driver. Nodes with no outbound
edges leak their mass (the "PageRank with leak" variant) — documented
so the SQL oracle states the same rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from reffy_ray.util import join_ready, safe_num_blocks


def pagerank(
    edges: rd.Dataset,
    n_nodes: int,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    snap: int = 12,
) -> rd.Dataset:
    """PageRank over integer node ids ``0..n_nodes-1``. ``edges`` has
    one row per directed edge (parallel edges count twice). Returns
    ``(node, rank_e9)`` — rank ×1e9 rounded to int64."""
    from ray.data.aggregate import Count, Sum

    deg = edges.groupby(src_col).aggregate(Count(alias_name="outdeg"))
    ewd = edges.join(
        join_ready(deg),
        join_type="inner",
        num_partitions=safe_num_blocks(edges),
        on=(src_col,),
    ).materialize()

    base = (1.0 - damping) / n_nodes
    nodes = rd.range(n_nodes)

    def zero_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": batch["id"].astype("int64"),
                "c": np.zeros(len(batch), dtype=np.float64),
            }
        )

    zeros = nodes.map_batches(zero_rows, batch_format="pandas").materialize()

    ranks = nodes.map_batches(
        lambda b: pd.DataFrame(
            {
                src_col: b["id"].astype("int64"),
                "r": np.full(len(b), 1.0 / n_nodes),
            }
        ),
        batch_format="pandas",
    ).materialize()

    for _ in range(iters):
        contribs = ewd.join(
            join_ready(ranks),
            join_type="inner",
            num_partitions=safe_num_blocks(ewd),
            on=(src_col,),
        )

        def contrib_rows(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": batch[dst_col].astype("int64"),
                    "c": batch["r"].to_numpy()
                    / batch["outdeg"].to_numpy(),
                }
            )

        summed = (
            contribs.map_batches(contrib_rows, batch_format="pandas")
            .union(zeros)
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )

        def next_rank(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    src_col: batch["node"].astype("int64"),
                    # per-iteration snap: summation order never leaks
                    # into the next join
                    "r": np.round(
                        base + damping * batch["c"].to_numpy(), snap
                    ),
                }
            )

        ranks = summed.map_batches(
            next_rank, batch_format="pandas"
        ).materialize()

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": batch[src_col].astype("int64"),
                # floor(x + 0.5), not round(): both numpy and SQL
                # evaluate it on the identical double, so exact .5
                # products can't split on rounding mode
                "rank_e9": np.floor(
                    batch["r"].to_numpy() * 1e9 + 0.5
                ).astype("int64"),
            }
        )

    return ranks.map_batches(finish, batch_format="pandas")
