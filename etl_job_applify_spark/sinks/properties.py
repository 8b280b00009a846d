"""Table-level properties for versioned tables (Delta TBLPROPERTIES
shape): a ``_properties.json`` at the TABLE root (not per snapshot)
recording durable configuration — today, which columns carry Bloom
point-lookup indexes.

This is what makes the index a TABLE property instead of a write-call
argument: MERGE commits, OPTIMIZE rewrites and plain ``write_version``
calls all consult it and rebuild the sidecar for the snapshot they
publish, so a point-lookup user never silently loses the index to a
maintenance job (degrade-to-scan is correct but is a performance cliff
nobody asked for).

Writes are atomic (tmp + rename) and last-writer-wins — properties are
operator configuration, not data; racing property writes are a
deployment mistake, not a correctness hazard.
"""

from __future__ import annotations

import json
import os

from .stats import _local_path

PROPERTIES_FILE = "_properties.json"


def get_table_properties(table_path: str) -> dict:
    local = _local_path(table_path)
    if local is None:
        return {}
    path = os.path.join(local, PROPERTIES_FILE)
    if not os.path.isfile(path):
        return {}
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}


def set_table_properties(table_path: str, props: dict) -> None:
    local = _local_path(table_path)
    if local is None:
        raise ValueError("table properties need a local table path")
    os.makedirs(local, exist_ok=True)
    tmp = os.path.join(local, f".{PROPERTIES_FILE}.tmp")
    with open(tmp, "w") as fh:
        json.dump(props, fh)
    os.replace(tmp, os.path.join(local, PROPERTIES_FILE))


def update_table_properties(table_path: str, **updates) -> dict:
    props = get_table_properties(table_path)
    props.update(updates)
    set_table_properties(table_path, props)
    return props
