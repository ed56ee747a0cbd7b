"""Spec-level post-processing: csscomplete.

Reference: the csscomplete post module completes a spec's CSS extract
with the IDL attribute names each property generates per CSSOM
(getGeneratedIDLNamesByCSSProperty, src/lib/util.js:923-960).

Ray mapping: pure per-row map over the css extract — no shuffle.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from ..functions.scalars import css_property_to_idl_attributes


def complete_css(css: rd.Dataset) -> rd.Dataset:
    """Adds ``styleDeclaration`` (list of generated IDL attribute
    names) to every css extract row of category 'properties'."""

    def fn(batch: pa.Table) -> pa.Table:
        cats = batch.column("category").to_pylist()
        names = batch.column("name").to_pylist()
        payloads = batch.column("payload_json").to_pylist()
        out = []
        for cat, name, payload_json in zip(cats, names, payloads):
            if cat != "properties":
                out.append(payload_json)
                continue
            payload = json.loads(payload_json)
            payload["styleDeclaration"] = css_property_to_idl_attributes(name)
            out.append(json.dumps(payload, sort_keys=True, ensure_ascii=False))
        return batch.set_column(
            batch.schema.get_field_index("payload_json"),
            "payload_json",
            pa.array(out, pa.large_string()),
        )

    return css.map_batches(fn, batch_format="pyarrow")
