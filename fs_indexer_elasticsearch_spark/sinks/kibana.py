"""Kibana saved-objects generation (S12 — kibana_data_views.py).

The reference imports three NDJSON saved objects per index (config,
index-pattern/data view, default search) via the Kibana REST API
(kibana_data_views.py:245-313) with the field list mirroring the ES
mapping (133-157). REST delivery is a driver-side side effect; this
module builds the byte-accurate NDJSON payload (testable, shippable
by any HTTP client) and keeps the field list derived from ONE source
of truth: the engine's ES document shape.
"""

from __future__ import annotations

import json

from .es_bulk import ES_DOC_FIELDS

_FIELD_TYPES = {
    "size_bytes": "number",
    "modified_time": "date",
    "creation_time": "date",
    "last_seen": "date",
}


def data_view_objects(index: str, time_field: str = "modified_time") -> list[dict]:
    """The three saved objects the reference imports."""
    fields = [
        {
            "name": f,
            "type": _FIELD_TYPES.get(f, "string"),
            "searchable": True,
            "aggregatable": f not in ("filepath", "name"),
        }
        for f in ES_DOC_FIELDS
    ]
    return [
        {
            "type": "config",
            "id": "7.11.0",
            "attributes": {"defaultIndex": index},
        },
        {
            "type": "index-pattern",
            "id": index,
            "attributes": {
                "title": index,
                "timeFieldName": time_field,
                "fields": json.dumps(fields),
            },
        },
        {
            "type": "search",
            "id": f"{index}-default",
            "attributes": {
                "title": f"{index} files",
                "columns": ["name", "filepath", "size_bytes", "modified_time"],
                "sort": [[time_field, "desc"]],
            },
            "references": [
                {
                    "type": "index-pattern",
                    "id": index,
                    "name": "kibanaSavedObjectMeta.searchSourceJSON.index",
                }
            ],
        },
    ]


def to_ndjson(objects: list[dict]) -> str:
    """Kibana import payload: one JSON object per line."""
    return "\n".join(json.dumps(o, sort_keys=True) for o in objects) + "\n"
