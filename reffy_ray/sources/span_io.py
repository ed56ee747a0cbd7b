"""Span-table I/O: Lance when available, Parquet otherwise.

The north-star input is a Lance table of interleaved text + media
documents ``(doc_id:string, spans:list<struct<kind,text,media_ref,
offset>>)``. The ``lance`` package is not shipped in every
environment (not in this container), so the storage format is gated
behind an import-try: with ``lance`` importable, tables go through
Ray Data's public ``read_lance`` / ``write_lance`` (zero-copy Arrow,
column projection + fragment pruning at the read); without it, the
identical schema round-trips through Parquet. Everything downstream
consumes the Dataset, so the pipeline is format-agnostic.
"""

from __future__ import annotations

import os

import ray.data as rd

SPAN_COLUMNS = ("doc_id", "spans")


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _looks_like_lance(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(
        os.path.join(path, "_versions")
    )


def write_span_table(
    ds: rd.Dataset, path: str, format: str = "auto", **kwargs
) -> str:
    """Write a span-document Dataset; returns the chosen format.

    ``format``: "lance", "parquet", or "auto" (lance if the package is
    importable, else parquet)."""
    if format == "auto":
        format = "lance" if lance_available() else "parquet"
    if format == "lance":
        if not lance_available():
            raise ImportError(
                "format='lance' requested but the 'lance' package is not "
                "installed; use format='parquet' or install pylance"
            )
        ds.write_lance(path, **kwargs)
    elif format == "parquet":
        ds.write_parquet(path, **kwargs)
    else:
        raise ValueError(f"unknown span-table format: {format!r}")
    return format


def read_span_table(
    path: str, format: str = "auto", columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """Read a span-document table written by ``write_span_table``.

    ``format="auto"`` sniffs the on-disk layout (a ``.lance`` suffix or
    Lance ``_versions`` manifest directory ⇒ lance)."""
    if format == "auto":
        format = "lance" if _looks_like_lance(path) else "parquet"
    if format == "lance":
        if not lance_available():
            raise ImportError(
                f"{path} is a Lance dataset but the 'lance' package is not "
                "installed in this environment"
            )
        return rd.read_lance(path, columns=columns, **kwargs)
    if format == "parquet":
        return rd.read_parquet(path, columns=columns, **kwargs)
    raise ValueError(f"unknown span-table format: {format!r}")
