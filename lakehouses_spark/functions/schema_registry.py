"""Confluent-compatible schema-registry client (SURVEY §2.1 S14; VERDICT r3
"missing" #3 — schema lookup by registry rather than by-value).

Reference behavior: notebooks/03.ingestas_eventos/05.ingesta_incremental_
singleplex [avro].py:137-138 fetches the value schema from a Confluent Cloud
schema registry by URL + subject, then feeds it to from_avro. This module
provides that lookup surface with two backends:

- ``http(s)://`` — the real Confluent REST API (``/schemas/ids/<id>``,
  ``/subjects/<s>/versions/latest``, POST register). The container has no
  network, so this path is env-gated: connection failures raise
  ``SchemaRegistryUnavailableError`` with the endpoint in the message
  instead of a bare urllib trace. The request/response contract is the
  public Confluent one, so pointing at a live registry lights it up with
  no code change.
- ``file://`` (or a bare path) — a directory-backed registry with the same
  semantics (ids are global and immutable, subjects hold ordered versions),
  mirroring ``ingest/kafka_sim.py``'s file-backed-broker pattern so every
  consumer of the registry API is fully testable offline.

Schemas are immutable once registered (the Confluent contract), so the
id→schema cache never invalidates — at scale each executor-side decode
group resolves its schema ONCE per id, not per record.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouses_spark.functions.avro import (
    from_avro_confluent,
    schema_registry_id,
)


class SchemaRegistryError(RuntimeError):
    """HTTP-level registry rejection (e.g. 409 incompatible schema)."""


class SchemaRegistryUnavailableError(RuntimeError):
    pass


class SchemaNotFoundError(KeyError):
    pass


class SchemaRegistryClient:
    """Minimal Confluent-API client: get by id, get latest by subject,
    register. ``url`` selects the backend (http(s) = REST, else file)."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self._http = self.url.startswith(("http://", "https://"))
        self._by_id: dict[int, str] = {}  # immutable → cache forever
        if not self._http:
            root = self.url[len("file://"):] if self.url.startswith("file://") else self.url
            self._root = Path(root)
            (self._root / "ids").mkdir(parents=True, exist_ok=True)
            (self._root / "subjects").mkdir(parents=True, exist_ok=True)

    # --- REST backend ---------------------------------------------------- #
    def _get_json(self, path: str) -> dict:
        try:
            with urllib.request.urlopen(f"{self.url}{path}", timeout=10) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise SchemaNotFoundError(path) from e
            raise
        except OSError as e:
            raise SchemaRegistryUnavailableError(
                f"schema registry at {self.url} unreachable ({e}); this "
                "environment has no network — use a file-backed registry "
                "(SchemaRegistryClient('<dir>')) or pass the schema by value"
            ) from e

    # --- public API (same shape for both backends) ----------------------- #
    def get_schema(self, schema_id: int) -> str:
        """JSON Avro schema string for a global schema id."""
        if schema_id in self._by_id:
            return self._by_id[schema_id]
        if self._http:
            schema = self._get_json(f"/schemas/ids/{schema_id}")["schema"]
        else:
            f = self._root / "ids" / f"{schema_id}.json"
            if not f.exists():
                raise SchemaNotFoundError(f"schema id {schema_id}")
            schema = json.loads(f.read_text())["schema"]
        self._by_id[schema_id] = schema
        return schema

    def get_latest(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema) of the subject's latest version — the lookup
        the reference notebook performs before building from_avro."""
        if self._http:
            d = self._get_json(f"/subjects/{subject}/versions/latest")
            return int(d["id"]), d["schema"]
        f = self._root / "subjects" / subject / "versions.json"
        if not f.exists():
            raise SchemaNotFoundError(f"subject {subject}")
        versions = json.loads(f.read_text())
        latest = versions[-1]
        return int(latest["id"]), self.get_schema(int(latest["id"]))

    def register(self, subject: str, schema: str) -> int:
        """Register a schema under a subject, returning its global id.
        Identical schema content re-registers to the same id (Confluent
        dedupes by content)."""
        if self._http:
            req = urllib.request.Request(
                f"{self.url}/subjects/{subject}/versions",
                data=json.dumps({"schema": schema}).encode(),
                headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req, timeout=10) as r:
                    return int(json.loads(r.read())["id"])
            except urllib.error.HTTPError as e:
                # HTTPError subclasses OSError: handle it first so an
                # HTTP-level failure (409 incompatible-schema, 422 invalid)
                # surfaces its status instead of masquerading as
                # "registry unreachable" (mirrors _get_json).
                raise SchemaRegistryError(
                    f"register({subject}) rejected: HTTP {e.code} {e.reason}"
                ) from e
            except OSError as e:
                raise SchemaRegistryUnavailableError(
                    f"schema registry at {self.url} unreachable ({e})"
                ) from e
        # file backend: content-addressed id assignment
        ids_dir = self._root / "ids"
        for f in sorted(ids_dir.glob("*.json")):
            if json.loads(f.read_text())["schema"] == schema:
                sid = int(f.stem)
                break
        else:
            existing = [int(f.stem) for f in ids_dir.glob("*.json")]
            sid = max(existing, default=0) + 1
            (ids_dir / f"{sid}.json").write_text(json.dumps({"schema": schema}))
        subj = self._root / "subjects" / subject
        subj.mkdir(parents=True, exist_ok=True)
        vf = subj / "versions.json"
        versions = json.loads(vf.read_text()) if vf.exists() else []
        if not any(v["id"] == sid for v in versions):
            versions.append({"version": len(versions) + 1, "id": sid})
            vf.write_text(json.dumps(versions))
        return sid


def from_avro_registry(
    value: Column | str, client: SchemaRegistryClient, subject: str
) -> Column:
    """The reference's exact pattern: resolve the subject's latest schema
    from the registry, then decode the Confluent-framed payload with it
    (03…/05…[avro].py:137-152). One registry round-trip at plan time."""
    _, schema = client.get_latest(subject)
    return from_avro_confluent(value, schema)


def decode_multiplex(
    df: DataFrame,
    value_col: str,
    client: SchemaRegistryClient,
    known_ids: list[int] | None = None,
) -> DataFrame:
    """Registry-driven MULTIPLEX decode: a mixed stream where each record's
    Confluent header carries its own schema id. Splits the frame by header
    id (bounded: distinct ids = distinct schemas, a handful), decodes each
    group with its registry schema, and unions by name with null fill —
    the schema-evolution-tolerant union the reference's multiplex sink
    needs.

    100 TB shape: the id scan is a pure column expression; each per-id
    decode is an independent filtered branch of the SAME scan (Spark reuses
    the exchange), and the union is metadata-only. The distinct-id collect
    is bounded by the registry's schema count, never by data volume.

    Schema stability: the output schema depends on which ids appear in the
    batch. Pass ``known_ids`` (the subject's known schema ids, or the ids
    seen so far) to pin the output shape — an EMPTY batch then still yields
    every payload column of those schemas (zero rows), so a foreachBatch
    consumer writing to a fixed-schema sink no-ops instead of hitting a
    schema mismatch. WITHOUT ``known_ids``, the degenerate empty-input
    schema is a single ``_schema_id BIGINT`` column (no payload columns can
    be inferred from zero records) — callers with fixed-schema sinks must
    either pass ``known_ids`` or skip empty batches."""
    ids = [
        r.sid
        for r in df.select(schema_registry_id(F.col(value_col)).alias("sid"))
        .distinct()
        .collect()
        if r.sid is not None
    ]
    ids = sorted(set(ids) | set(known_ids or []))
    if not ids:
        # Empty input (or all-null value column) and no known_ids: no schema
        # ids to resolve, so no payload columns exist — return an empty
        # frame with just the id column rather than raising on branches[0].
        return (
            df.select(schema_registry_id(F.col(value_col)).alias("_schema_id"))
            .where(F.lit(False))
        )
    branches = []
    for sid in ids:
        schema = client.get_schema(sid)
        decoded = (
            df.where(schema_registry_id(F.col(value_col)) == sid)
            .withColumn("_schema_id", F.lit(sid))
            .withColumn("payload", from_avro_confluent(F.col(value_col), schema))
        )
        branches.append(decoded.select("_schema_id", "payload.*"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out
