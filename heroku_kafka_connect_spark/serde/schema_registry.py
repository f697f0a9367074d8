"""Fixture-backed schema registry — §4.3.1 (SURVEY.md).

The reference wires every converter to a Schema Registry URL
(main.sh:15, 72-75): producers register a schema per subject and
stamp its id into the 5-byte wire header; consumers resolve id →
schema to decode, and resolve subject → latest to project into their
reader schema. This module implements that id↔schema contract
against local fixtures (a dict or a directory of ``<id>.json``
files) so plan compilation can resolve schemas by id without a live
registry — the HTTP client is an environment concern; the lookup
protocol and evolution semantics are what the engine needs.

Registration is content-addressed per subject (re-registering an
identical schema returns the existing id), mirroring the registry's
idempotent POST /subjects/<s>/versions.
"""

from __future__ import annotations

import json
import os


def _canonical(schema: str | dict) -> str:
    s = json.loads(schema) if isinstance(schema, str) else schema
    return json.dumps(s, sort_keys=True, separators=(",", ":"))


class SchemaRegistry:
    """In-memory id↔schema store with subject versioning."""

    def __init__(self) -> None:
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    # -- producer half (POST /subjects/<s>/versions)
    def register(self, subject: str, schema: str | dict) -> int:
        canon = _canonical(schema)
        for sid in self._subjects.get(subject, []):
            if self._by_id[sid] == canon:
                return sid
        sid = self._next_id
        self._next_id += 1
        self._by_id[sid] = canon
        self._subjects.setdefault(subject, []).append(sid)
        return sid

    # -- consumer half (GET /schemas/ids/<id>)
    def get(self, schema_id: int) -> dict:
        if schema_id not in self._by_id:
            raise KeyError(f"schema id {schema_id} not registered")
        return json.loads(self._by_id[schema_id])

    def latest(self, subject: str) -> tuple[int, dict]:
        """GET /subjects/<s>/versions/latest."""
        ids = self._subjects.get(subject)
        if not ids:
            raise KeyError(f"subject {subject!r} has no versions")
        return ids[-1], json.loads(self._by_id[ids[-1]])

    def schemas_by_id(self) -> dict[int, dict]:
        """Snapshot for broadcasting to executors (the whole registry
        is tiny next to the data; decode UDFs capture this dict so id
        resolution is a local dict hit per record, never an RPC)."""
        return {sid: json.loads(s) for sid, s in self._by_id.items()}

    # -- fixtures
    @classmethod
    def from_dir(cls, path: str) -> SchemaRegistry:
        """Load ``<id>.json`` fixture files (subject taken from the
        schema's record name)."""
        reg = cls()
        # filter BEFORE the int() sort key — stray files (README,
        # .DS_Store, notes.json) in the fixtures dir must not crash
        # the load, so require the numeric <id>.json shape exactly
        fixture_files = [
            f for f in os.listdir(path) if f.endswith(".json") and f.split(".")[0].isdigit()
        ]
        for fname in sorted(fixture_files, key=lambda f: int(f.split(".")[0])):
            sid = int(fname.split(".")[0])
            with open(os.path.join(path, fname)) as f:
                schema = json.load(f)
            canon = _canonical(schema)
            reg._by_id[sid] = canon
            reg._subjects.setdefault(schema.get("name", "default"), []).append(sid)
            reg._next_id = max(reg._next_id, sid + 1)
        return reg

    @classmethod
    def from_dict(cls, fixtures: dict[int, dict | str]) -> SchemaRegistry:
        reg = cls()
        for sid in sorted(fixtures):
            schema = fixtures[sid]
            s = json.loads(schema) if isinstance(schema, str) else schema
            reg._by_id[sid] = _canonical(s)
            reg._subjects.setdefault(s.get("name", "default"), []).append(sid)
            reg._next_id = max(reg._next_id, sid + 1)
        return reg
