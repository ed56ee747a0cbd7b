"""Structural validation of extract tables.

Analog of the reference's Ajv validation of every extractor output
(reference: src/lib/util.js:1065-1140 getSchemaValidationFunction over
schemas/browserlib/*.json). Two layers:

1. Arrow-schema equality against ``schemas.EXTRACT_SCHEMAS`` — the
   columnar part of the contract.
2. Recursive checks of the JSON payload columns that Arrow cannot
   type (algorithm step trees, CSS definition payloads, dfn dev
   links) — the part Ajv covers in the reference and Arrow schemas
   alone would let drift.

``validate_extract_batch(module)`` returns a map_batches-compatible
callable emitting one row per violation, so validation runs as a
distributed streamed stage, not a driver-side scan.
"""

from __future__ import annotations

import json

import pyarrow as pa

from .. import schemas

_DFN_TYPES_EXTRA = {"element", "element-attr", "grammar", "cddl-type"}


def _check_algorithm_steps(payload, path: str, errors: list[str]) -> None:
    if not isinstance(payload, dict):
        errors.append(f"{path}: step payload must be an object")
        return
    allowed = {"html", "steps", "operation", "case", "additional", "ignored"}
    unknown = set(payload) - allowed
    if unknown:
        errors.append(f"{path}: unknown keys {sorted(unknown)}")
    if not payload:
        errors.append(f"{path}: empty step object")
    if "html" in payload and not isinstance(payload["html"], str):
        errors.append(f"{path}.html: must be a string")
    for key in ("operation", "case"):
        if key in payload and not isinstance(payload[key], str):
            errors.append(f"{path}.{key}: must be a string")
    steps = payload.get("steps")
    if steps is not None:
        if not isinstance(steps, list):
            errors.append(f"{path}.steps: must be a list")
        else:
            for i, st in enumerate(steps):
                _check_algorithm_steps(st, f"{path}.steps[{i}]", errors)


def _check_css_payload(payload, path: str, errors: list[str]) -> None:
    if not isinstance(payload, dict):
        errors.append(f"{path}: must be an object")
        return
    if not payload.get("name"):
        errors.append(f"{path}: missing required 'name'")
    for k, v in payload.items():
        if not isinstance(k, str):
            errors.append(f"{path}: non-string key {k!r}")
        elif not isinstance(v, (str, list, bool)):
            errors.append(f"{path}.{k}: value must be string, list or bool")


def _check_dfn_links(payload, path: str, errors: list[str]) -> None:
    if not isinstance(payload, list):
        errors.append(f"{path}: must be a list")
        return
    for i, link in enumerate(payload):
        if not isinstance(link, dict):
            errors.append(f"{path}[{i}]: must be an object")
            continue
        for key in ("type", "id", "name", "href"):
            if not isinstance(link.get(key), str):
                errors.append(f"{path}[{i}].{key}: must be a string")


_JSON_COLUMN_CHECKS = {
    "algorithms": ("steps_json", _check_algorithm_steps),
    "css": ("payload_json", _check_css_payload),
    "dfns": ("links", _check_dfn_links),
}

_REQUIRED_NONNULL = {
    "title": ("doc_id", "title"),
    "meta": ("doc_id",),
    "headings": ("doc_id", "id", "href"),
    "ids": ("doc_id", "href"),
    "links": ("doc_id", "page_url"),
    "refs": ("doc_id", "name"),
    "dfns": ("doc_id", "id", "href", "type", "access"),
    "idl": ("doc_id", "idl"),
    "css": ("doc_id", "category", "name", "payload_json"),
    "events": ("doc_id", "type"),
    "elements": ("doc_id", "name", "href"),
    "algorithms": ("doc_id", "steps_json"),
    "cddl": ("doc_id", "module", "cddl"),
}

_ENUMS = {
    "css": ("category", {"properties", "atrules", "selectors", "values", "warnings"}),
    "dfns": ("access", {"public", "private"}),
}


def validate_extract_table(module: str, table: pa.Table) -> list[str]:
    """All structural violations of ``table`` against the module's
    contract (empty list = valid)."""
    errors: list[str] = []
    expected = schemas.EXTRACT_SCHEMAS.get(module)
    if expected is not None and not table.schema.equals(expected):
        errors.append(
            f"{module}: schema mismatch — got {table.schema.names}, "
            f"expected {expected.names}"
        )
        return errors

    for col in _REQUIRED_NONNULL.get(module, ()):
        if col in table.column_names:
            nulls = table.column(col).null_count
            if nulls:
                errors.append(f"{module}.{col}: {nulls} null value(s)")

    enum = _ENUMS.get(module)
    if enum is not None:
        col, allowed = enum
        vals = set(table.column(col).to_pylist()) - {None}
        bad = vals - allowed
        if bad:
            errors.append(f"{module}.{col}: invalid values {sorted(bad)}")

    check = _JSON_COLUMN_CHECKS.get(module)
    if check is not None:
        col, fn = check
        for i, raw in enumerate(table.column(col).to_pylist()):
            if raw is None:
                continue
            try:
                payload = json.loads(raw)
            except (TypeError, ValueError) as e:
                errors.append(f"{module}.{col}[{i}]: invalid JSON ({e})")
                continue
            fn(payload, f"{module}.{col}[{i}]", errors)
    return errors


def validate_extract_batch(module: str):
    """map_batches stage: extract batch in → violations table out
    (doc_id, module, error). Streams; an all-green run yields an empty
    dataset."""

    def validate(batch: pa.Table) -> pa.Table:
        errs = validate_extract_table(module, batch)
        return pa.table(
            {
                "module": pa.array([module] * len(errs), pa.string()),
                "error": pa.array(errs, pa.string()),
            }
        )

    return validate


def validate_extracts(extracts: dict[str, "object"]) -> dict[str, int]:
    """Run the validation stage over every module Dataset; returns
    module → violation count (0 everywhere on a healthy crawl)."""
    counts: dict[str, int] = {}
    for module, ds in extracts.items():
        violations = ds.map_batches(
            validate_extract_batch(module), batch_format="pyarrow"
        )
        counts[module] = violations.count()
    return counts
