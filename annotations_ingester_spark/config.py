"""Typed pipeline configuration — same YAML surface as the reference.

Mirrors the reference's config dataclass
(reference: ingester/annotations_indexer.py:18-49 ``AnnotationIndexerConfig``
and config/config.yml keys) so a user of the reference can bring their
config file unchanged. Wiring/validation mirrors ingester/__main__.py:34-45
(requires ``source``, ``nlp-service``, ``sink``, ``mapping``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

try:  # YAML is optional — dict-based construction always works.
    import yaml  # type: ignore
except Exception:  # pragma: no cover
    yaml = None

REQUIRED_TOP_LEVEL = ("source", "nlp-service", "sink", "mapping")


@dataclass
class ConnectorConfig:
    """Source/sink connector options (reference: ingester/es_common.py:14-43).

    ``backend`` selects parquet (tests/local) or elasticsearch (production);
    both implement the same reader/writer interface in ``sources``/``sinks``.
    """

    # "parquet" | "elasticsearch" (connector jar) | "elasticsearch-rest"
    # (jar-free stdlib REST fallback, sources/es_rest.py)
    backend: str = "parquet"
    hosts: list[str] = field(default_factory=list)
    index_name: str = ""  # ES index or parquet path
    username: str | None = None
    password: str | None = None
    api_key: str | None = None
    ssl_enabled: bool = False
    ca_certs: str | None = None
    client_cert: str | None = None
    client_key: str | None = None
    check_certificate: bool = True


@dataclass
class NlpServiceConfig:
    """NLP REST endpoint options (reference: ingester/nlp_service.py:18-38)."""

    endpoints: list[str] = field(default_factory=list)
    mode: str = "medcat"  # "" / "medcat" | "gate-nlp" (config.yml:37)
    username: str | None = None
    password: str | None = None
    max_retries_on_failure: int = 1  # config.yml:39
    application_params: dict[str, Any] = field(default_factory=dict)
    # Back-pressure knobs (engine extension; the reference's implicit
    # bound is one 128-thread node, config.yml:64 — a cluster needs it
    # explicit). None = uncapped, the reference-parity default.
    max_in_flight: int | None = None  # per-executor-process concurrent calls
    rate_limit_per_sec: float | None = None  # per-executor-process req/s


@dataclass
class PipelineConfig:
    """The logical plan as configuration — 1:1 with the reference's
    ``AnnotationIndexerConfig`` fields (ingester/annotations_indexer.py:18-49).
    """

    source: ConnectorConfig = field(default_factory=ConnectorConfig)
    sink: ConnectorConfig = field(default_factory=ConnectorConfig)
    nlp: NlpServiceConfig = field(default_factory=NlpServiceConfig)

    text_field: str = "document"  # config.yml:52
    docid_field: str = "_id"  # config.yml:53
    persist_fields: list[str] = field(default_factory=lambda: ["_id"])  # :54-56
    date_field: str = "dct"  # config.yml:59
    es_date_format: str = "yyyy-MM-dd"  # config.yml:59
    python_date_format: str = "%Y-%m-%d"  # config.yml:60
    batch_interval_days: int = 30  # config.yml:61, annotations_indexer.py:46
    date_start: str = ""  # config.yml:62
    date_end: str = ""  # config.yml:63
    threads: int = 4  # annotations_indexer.py:40 (Spark: a parallelism hint)
    split_index_by_field: str = ""  # config.yml:66 → W2 partitioned sink
    skip_processed_doc_check: bool = False  # config.yml:68 → J1 anti-join
    use_bulk_indexing: bool = True
    use_nested_objects: bool = False  # README.md:66 → same-index nested|flattened
    ingest_mode: str = "separate-index"  # W1 | "same-index" (W3) | "nested" (W4)
    schema_mapping: str = "medcat-separate-index"  # config.yml:51
    annotation_id_field: str = "id"  # config.yml:69 mapping.nlp.annotation-id-field
    logging_level: int = 20  # config.yml:73 (INFO)

    @classmethod
    def from_dict(cls, params: dict[str, Any]) -> "PipelineConfig":
        """Build from the reference's YAML dict shape (ingester/__main__.py:100-117)."""
        missing = [k for k in REQUIRED_TOP_LEVEL if k not in params]
        if missing:
            raise ValueError(f"config missing required keys: {missing}")
        mapping = params.get("mapping", {}) or {}
        src_map = mapping.get("source", {}) or {}
        batch = src_map.get("batch", {}) or {}
        nlp = params.get("nlp-service", {}) or {}

        def conn(section: dict[str, Any]) -> ConnectorConfig:
            """Accepts BOTH the reference's canonical config.yml shape
            (``es.credentials`` / ``es.extra-params`` — config/config.yml:1-33)
            and this engine's flattened ``security`` block, so a reference
            config file loads unchanged."""
            sec = section or {}
            es = sec.get("es", sec)
            security = es.get("security", {}) or {}
            creds = es.get("credentials", {}) or {}
            extra = es.get("extra-params", {}) or {}
            api_key = creds.get("api-key") or security.get("elastic-api-key")
            if not creds.get("use-api-key", True):
                api_key = None  # reference flag: basic auth wins
            return ConnectorConfig(
                backend=sec.get("backend", "elasticsearch" if "es" in sec else "parquet"),
                hosts=es.get("hosts", []) or [],
                index_name=es.get("index-name", es.get("path", "")) or "",
                username=creds.get("username") or security.get("elastic-user"),
                password=creds.get("password") or security.get("elastic-password"),
                api_key=api_key,
                ssl_enabled=bool(
                    extra.get("use-ssl", security.get("security-enabled", False))
                ),
                ca_certs=security.get("ca-certs-path"),
                client_cert=security.get("client-cert-path"),
                client_key=security.get("client-key-path"),
                check_certificate=bool(
                    extra.get("verify-certs", security.get("check-certificate", True))
                ),
            )

        nlp_creds = nlp.get("credentials", nlp.get("security", {})) or {}
        # reference canonical: mapping.index-ingest-mode.{same-index,
        # use-nested-objects, es-nested-object-schema-mapping}
        # (config/config.yml:48-51); engine shorthand: mapping.sink.*
        ingest = mapping.get("index-ingest-mode", {}) or {}
        sink_map = mapping.get("sink", {}) or {}
        nlp_map = mapping.get("nlp", {}) or {}
        if "ingest-mode" in sink_map:
            ingest_mode = sink_map["ingest-mode"]
        elif ingest.get("same-index", False):
            ingest_mode = "same-index"
        else:
            ingest_mode = "separate-index"
        return cls(
            source=conn(params.get("source", {})),
            sink=conn(params.get("sink", {})),
            nlp=NlpServiceConfig(
                endpoints=nlp.get("endpoints-url", nlp.get("endpoint-url", [])) or [],
                mode=(
                    nlp.get("protocol-mode", nlp.get("endpoint-request-mode", ""))
                    or "medcat"
                ),
                username=nlp_creds.get("username", nlp_creds.get("user")) or None,
                password=nlp_creds.get("password") or None,
                max_retries_on_failure=int(nlp.get("max-retries-on-failure", 1)),
                application_params=nlp.get("application-params", {}) or {},
                max_in_flight=(
                    int(nlp["max-in-flight"])
                    if nlp.get("max-in-flight") is not None
                    else None
                ),
                rate_limit_per_sec=(
                    float(nlp["rate-limit-per-sec"])
                    if nlp.get("rate-limit-per-sec") is not None
                    else None
                ),
            ),
            text_field=src_map.get("text-field", "document"),
            docid_field=src_map.get("docid-field", "_id"),
            persist_fields=src_map.get("persist-fields", ["_id"]) or [],
            date_field=batch.get("date-field", "dct"),
            es_date_format=batch.get(
                "date-format", batch.get("es-date-format", "yyyy-MM-dd")
            ),
            python_date_format=batch.get("python-date-format", "%Y-%m-%d"),
            batch_interval_days=int(batch.get("interval", 30)),
            date_start=str(batch.get("date-start", "")),
            date_end=str(batch.get("date-end", "")),
            threads=int(batch.get("threads", 4)),
            split_index_by_field=sink_map.get("split-index-by-field", "") or "",
            skip_processed_doc_check=bool(
                nlp_map.get(
                    "skip-processed-doc-check",
                    src_map.get("skip-processed-doc-check", False),
                )
            ),
            use_bulk_indexing=bool(
                nlp.get("use-bulk-indexing", sink_map.get("use-bulk-indexing", True))
            ),
            use_nested_objects=bool(
                ingest.get(
                    "use-nested-objects", sink_map.get("use-nested-objects", False)
                )
            ),
            ingest_mode=ingest_mode,
            schema_mapping=ingest.get(
                "es-nested-object-schema-mapping",
                sink_map.get("es-nested-object-schema-mapping", "medcat-separate-index"),
            ),
            annotation_id_field=nlp_map.get("annotation-id-field", "id") or "id",
            logging_level=int(params.get("logging-level", 20) or 20),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        if yaml is None:  # pragma: no cover
            raise RuntimeError("pyyaml not available")
        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))
