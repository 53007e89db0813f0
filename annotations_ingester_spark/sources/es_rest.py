"""Pure-Python Elasticsearch REST backend (stdlib urllib) — the fallback
when the ``org.elasticsearch.spark.sql`` connector jar is absent, and the
hermetic round-trip target for the ES stub tests.

Speaks the same public REST subset the reference uses:

- bulk ndjson writes, chunk 10000 / 30 s timeout, per-item failure
  counting (ingester/es_common.py:98-99, 181-210)
- scroll scans with ``stored_fields: []`` id-only projection
  (es_common.py:273-292) — upgraded to the public *sliced* scroll so the
  read parallelizes one-scroll-per-Spark-task (the same parallel-scan
  shape the connector gets from one-partition-per-shard; the reference's
  single scroll is the 1-slice special case)
- range / match queries pushed down in the request body
  (es_common.py:254-271, 303-330)
- point get merging ``_id``/``_index`` metadata (es_common.py:212-231)
- count / exists / delete-index / put-mapping admin calls
  (es_common.py:153-167, 254-271; annotations_indexer.py:835-840)

Distribution discipline: writes run ``df.foreachPartition`` (each task
bulk-posts its own partition — nothing funnels through the driver); reads
run ``mapInPandas`` over one row per slice. Auth mirrors
``es_common_options``: basic auth or ApiKey header, from the same
``ConnectorConfig``.
"""

from __future__ import annotations

import base64
import json
import logging
import urllib.error
import urllib.request
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from annotations_ingester_spark.config import ConnectorConfig
from annotations_ingester_spark.functions.names import format_index_name
from annotations_ingester_spark.sources.elasticsearch import (
    BULK_CHUNK_SIZE,
    BULK_REQUEST_TIMEOUT_S,
)

log = logging.getLogger(__name__)


def _headers(conf: ConnectorConfig) -> dict[str, str]:
    h = {"Content-Type": "application/json"}
    if conf.username and conf.password:
        tok = base64.b64encode(f"{conf.username}:{conf.password}".encode()).decode()
        h["Authorization"] = f"Basic {tok}"
    elif conf.api_key:
        h["Authorization"] = f"ApiKey {conf.api_key}"
    return h


def _base_url(conf: ConnectorConfig) -> str:
    host = conf.hosts[0]
    if not host.startswith(("http://", "https://")):
        host = ("https://" if conf.ssl_enabled else "http://") + host
    return host.rstrip("/")


def _request(
    url: str,
    headers: dict[str, str],
    body: bytes | None = None,
    method: str = "GET",
    content_type: str | None = None,
    with_headers: bool = False,
) -> dict[str, Any] | tuple[dict[str, Any], dict[str, str]]:
    hdrs = dict(headers)
    if content_type:
        hdrs["Content-Type"] = content_type
    req = urllib.request.Request(url, data=body, headers=hdrs, method=method)
    with urllib.request.urlopen(req, timeout=BULK_REQUEST_TIMEOUT_S) as resp:
        payload = resp.read()
        resp_headers = {k.lower(): v for k, v in resp.headers.items()}
    parsed = json.loads(payload) if payload else {}
    return (parsed, resp_headers) if with_headers else parsed


class EsRestClient:
    """Driver- or executor-side client for the REST subset above. Plain
    picklable state (url + headers) so executors can construct requests
    inside ``foreachPartition``/``mapInPandas`` closures."""

    def __init__(self, conf: ConnectorConfig):
        self.url = _base_url(conf)
        self.headers = _headers(conf)
        self.index = format_index_name(conf.index_name) if conf.index_name else ""

    # -- compat handshake -------------------------------------------------
    def info(self) -> dict[str, Any]:
        """GET / — cluster name + version (the public root endpoint)."""
        return _request(f"{self.url}/", self.headers)

    def verify_compat(self) -> int:
        """The version handshake official 8.x clients perform: read the
        server major from GET /; an 8.x+ server MUST also send the
        ``X-Elastic-Product: Elasticsearch`` response header (added in
        8.0 precisely so clients can tell a real ES from a lookalike).
        Returns the major version; raises on a missing/invalid product
        header from an 8.x server or an unsupported major (<7). The
        REST subset this backend speaks (typeless mappings, untyped
        ``_doc`` endpoints, ndjson bulk) is valid wire traffic on both
        7.x and 8.x, so no request shape changes with the version."""
        body, resp_headers = _request(
            f"{self.url}/", self.headers, with_headers=True
        )
        number = str(body.get("version", {}).get("number", ""))
        major = int(number.split(".")[0]) if number.split(".")[0].isdigit() else 0
        if major >= 8 and resp_headers.get("x-elastic-product") != "Elasticsearch":
            raise RuntimeError(
                f"server reports {number} but is missing the X-Elastic-Product "
                "header — not a genuine Elasticsearch 8.x endpoint"
            )
        if major < 7:
            raise RuntimeError(f"unsupported Elasticsearch version: {number!r}")
        return major

    # -- admin -----------------------------------------------------------
    def create_index(self, index: str | None = None) -> None:
        try:
            _request(f"{self.url}/{index or self.index}", self.headers, b"{}", "PUT")
        except urllib.error.HTTPError as e:
            if e.code != 400:  # already exists
                raise

    def drop_index(self, index: str | None = None) -> None:
        # reference: es_common.py:162-167 (errors logged, not raised)
        try:
            _request(f"{self.url}/{index or self.index}", self.headers, method="DELETE")
        except urllib.error.HTTPError as e:
            log.warning("drop_index(%s): %s", index or self.index, e)

    def put_mapping(self, mapping: dict[str, Any], index: str | None = None) -> None:
        # reference: annotations_indexer.py:835-840
        _request(
            f"{self.url}/{index or self.index}/_mapping",
            self.headers,
            json.dumps(mapping).encode(),
            "PUT",
        )

    # -- point / aggregate reads ----------------------------------------
    def get_doc(self, doc_id: str, index: str | None = None) -> dict[str, Any] | None:
        # reference: es_common.py:212-231 — merge _id/_index into the source
        try:
            r = _request(
                f"{self.url}/{index or self.index}/_doc/{doc_id}", self.headers
            )
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise
        doc = dict(r.get("_source", {}))
        doc["_id"] = r.get("_id")
        doc["_index"] = r.get("_index")
        return doc

    def count(self, query: dict[str, Any] | None = None, index: str | None = None) -> int:
        # reference: es_common.py:153-160
        body = json.dumps({"query": query} if query else {}).encode()
        r = _request(f"{self.url}/{index or self.index}/_count", self.headers, body, "POST")
        return int(r.get("count", 0))

    def doc_exists(self, criteria: dict[str, Any], index: str | None = None) -> bool:
        # reference: es_common.py:254-271 — match-count > 0
        return self.count({"match": criteria}, index) > 0

    # -- scan ------------------------------------------------------------
    def scroll_slice(
        self,
        slice_id: int,
        max_slices: int,
        query: dict[str, Any] | None = None,
        stored_fields: list[str] | None = None,
        index: str | None = None,
        page_size: int = 1000,
    ) -> list[dict[str, Any]]:
        """One slice of a sliced scroll: the full result set for this slice
        across however many pages it takes (the scan-API posture of
        es_common.py:286-289 — never the first-page-only ``search`` bug of
        es_common.py:246-252)."""
        body: dict[str, Any] = {"size": page_size, "query": query or {"match_all": {}}}
        if stored_fields is not None:
            body["stored_fields"] = stored_fields
        if max_slices > 1:
            body["slice"] = {"id": slice_id, "max": max_slices}
        r = _request(
            f"{self.url}/{index or self.index}/_search?scroll=1m",
            self.headers,
            json.dumps(body).encode(),
            "POST",
        )
        out: list[dict[str, Any]] = []
        while True:
            hits = r.get("hits", {}).get("hits", [])
            if not hits:
                break
            for h in hits:
                doc = dict(h.get("_source") or {})
                doc["_id"] = h.get("_id")
                doc["_index"] = h.get("_index")
                out.append(doc)
            sid = r.get("_scroll_id")
            if not sid:
                break
            r = _request(
                f"{self.url}/_search/scroll",
                self.headers,
                json.dumps({"scroll": "1m", "scroll_id": sid}).encode(),
                "POST",
            )
        return out

    def search_page(
        self,
        query: dict[str, Any] | None = None,
        size: int = 100,
        index: str | None = None,
    ) -> list[dict[str, Any]]:
        """One plain (non-scroll) search page of at most ``size`` docs —
        for bounded driver-side samples. NOT a full scan: the reference's
        first-page-only ``get_doc_ids`` bug (es_common.py:246-252) came
        from using exactly this where a scroll was needed; scans go
        through :meth:`scroll_slice`."""
        body = {"size": size, "query": query or {"match_all": {}}}
        r = _request(
            f"{self.url}/{index or self.index}/_search",
            self.headers,
            json.dumps(body).encode(),
            "POST",
        )
        out = []
        for h in r.get("hits", {}).get("hits", []):
            doc = dict(h.get("_source") or {})
            doc["_id"] = h.get("_id")
            doc["_index"] = h.get("_index")
            out.append(doc)
        return out

    def scan_doc_ids(
        self, query: dict[str, Any] | None = None, index: str | None = None
    ) -> list[str]:
        # reference: es_common.py:273-292 (stored_fields=[] → ids only)
        return [
            d["_id"]
            for d in self.scroll_slice(0, 1, query, stored_fields=[], index=index)
        ]

    def range_query(
        self, date_field: str, gte: str, lte: str, fmt: str = "yyyy-MM-dd"
    ) -> dict[str, Any]:
        # reference: es_common.py:313-323 — both ends inclusive, explicit fmt
        return {"range": {date_field: {"gte": gte, "lte": lte, "format": fmt}}}

    # -- bulk ------------------------------------------------------------
    def bulk(
        self,
        actions: list[dict[str, Any]],
        chunk_size: int = BULK_CHUNK_SIZE,
        raise_on_error: bool = False,
    ) -> tuple[int, int]:
        """ndjson _bulk in ``chunk_size`` chunks; returns (ok, failed) with
        failures counted-and-logged, not raised (reference streaming_bulk
        semantics, es_common.py:193-210)."""
        ok = failed = 0
        for i in range(0, len(actions), chunk_size):
            lines: list[bytes] = []
            for a in actions[i : i + chunk_size]:
                op = a.get("_op_type", "index")
                meta: dict[str, Any] = {"_index": a.get("_index", self.index)}
                if a.get("_id") is not None:
                    meta["_id"] = a["_id"]
                lines.append(json.dumps({op: meta}).encode())
                src = {
                    k: v for k, v in a.items() if k not in ("_op_type", "_index", "_id")
                }
                if op == "update":
                    lines.append(
                        json.dumps({"doc": src, "doc_as_upsert": True}).encode()
                    )
                else:
                    lines.append(json.dumps(src).encode())
            body = b"\n".join(lines) + b"\n"
            r = _request(
                f"{self.url}/_bulk",
                self.headers,
                body,
                "POST",
                content_type="application/x-ndjson",
            )
            for item in r.get("items", []):
                result = next(iter(item.values()), {})
                if int(result.get("status", 500)) < 300:
                    ok += 1
                else:
                    failed += 1
                    log.warning("bulk item failed: %s", result)
        if failed and raise_on_error:
            raise RuntimeError(f"{failed} bulk items failed")
        return ok, failed


def write_es_rest(
    df: DataFrame,
    conf: ConnectorConfig,
    mapping_id: str | None = "row_id",
    upsert: bool = False,
    split_suffix_field: str | None = None,
    chunk_size: int = BULK_CHUNK_SIZE,
) -> None:
    """Distributed bulk write: each partition posts its own rows through
    ``EsRestClient.bulk`` (executor-side HTTP, driver ships only the plan —
    the reference's thread-pool writers become Spark tasks). Deterministic
    ``mapping_id`` gives idempotent re-runs (B2); ``split_suffix_field``
    implements the W2 per-value index routing ``base-{value}`` with F1 name
    normalization (es_common.py:133-151)."""
    client = EsRestClient(conf)
    base = client.index
    op = "update" if upsert else "index"

    def write_partition(rows) -> None:
        actions = []
        for row in rows:
            d = row.asDict(recursive=True)
            a: dict[str, Any] = {"_op_type": op}
            if mapping_id and d.get(mapping_id) is not None:
                a["_id"] = str(d[mapping_id])
            if split_suffix_field:
                a["_index"] = format_index_name(
                    f"{base}-{d.get(split_suffix_field, '')}"
                )
            a.update(d)
            actions.append(a)
        if actions:
            client.bulk(actions, chunk_size=chunk_size)

    df.foreachPartition(write_partition)


def infer_es_rest_schema(
    spark: SparkSession, conf: ConnectorConfig, sample_size: int = 100
) -> T.StructType:
    """Schema inference for the schemaless source (ES dynamic-mapping
    parity): one bounded driver-side sample page (``sample_size`` docs, a
    scalar-sized fetch — never the corpus) run through Spark's own
    inference. Callers who know the schema should pass it to
    :func:`read_es_rest` directly and skip the sample round trip."""
    docs = EsRestClient(conf).search_page(size=sample_size)
    if not docs:
        raise ValueError(
            f"cannot infer schema: index {conf.index_name!r} returned no documents"
        )
    return spark.createDataFrame(docs).schema


def read_es_rest(
    spark: SparkSession,
    conf: ConnectorConfig,
    schema: T.StructType | str,
    query: dict[str, Any] | None = None,
    slices: int = 8,
) -> DataFrame:
    """Distributed sliced-scroll read: one Spark task per scroll slice, each
    fetching its slice independently (the REST twin of the connector's
    partition-per-shard scan). ``schema`` is caller-declared — ES is
    schemaless, and guessing would make plans data-dependent. ``_id`` and
    ``_index`` are merged in when the schema asks for them (S4 metadata
    parity)."""
    import pandas as pd

    from annotations_ingester_spark.pyfiles import ensure_worker_imports

    ensure_worker_imports(spark)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    client = EsRestClient(conf)
    names = [f.name for f in schema.fields]
    n = max(1, slices)

    def fetch(batches):
        for pdf in batches:
            for sid in pdf["slice_id"]:
                docs = client.scroll_slice(int(sid), n, query)
                yield pd.DataFrame(
                    {name: [d.get(name) for d in docs] for name in names}
                )

    slice_df = spark.range(n).toDF("slice_id").repartition(n, "slice_id")
    return slice_df.mapInPandas(fetch, schema=schema)
