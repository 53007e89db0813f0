"""Elasticsearch connector option mapping (SURVEY §2.1 S6/S7/S10).

Maps the engine's ``ConnectorConfig`` (same YAML surface as the reference's
ES client wiring, ingester/es_common.py:49-85) onto the public
``org.elasticsearch.spark.sql`` ("es") data source options:

- hosts             → ``es.nodes`` (inline ``host:port`` per node)
- basic auth        → ``es.net.http.auth.user`` / ``.pass``
- API key           → ``es.net.http.header.Authorization`` (ApiKey scheme)
- SSL + CA/client   → ``es.net.ssl*`` options
- bulk tuning       → ``es.batch.size.entries`` = 10000 (the reference's
  BULK_CHUNK_SIZE, es_common.py:98), retries, timeout (es_common.py:99)
- idempotent writes → ``es.mapping.id`` with the deterministic row id
  (annotations_indexer.py:221) so re-runs upsert instead of duplicating
- W2 split sink     → dynamic resource pattern ``{index}-{suffix_field}``
- W3 same-index     → ``es.write.operation=upsert``

The connector jar is not bundled in this environment; ``read_es``/``write_es``
raise a clear error when the format is unavailable, and everything above
them (option construction) is plain-Python tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from annotations_ingester_spark.config import ConnectorConfig

ES_FORMAT = "org.elasticsearch.spark.sql"
BULK_CHUNK_SIZE = 10_000  # reference: es_common.py:98
BULK_REQUEST_TIMEOUT_S = 30  # reference: es_common.py:99


def _nodes(hosts: list[str]) -> str:
    """``es.nodes`` in the connector's inline ``host:port`` form. A single
    global ``es.port`` would silently misconfigure clusters whose nodes
    listen on heterogeneous ports (the connector applies inline ports
    per-node; portless hosts keep its 9200 default)."""
    return ",".join(
        h.replace("http://", "").replace("https://", "") for h in hosts
    )


def es_common_options(conf: ConnectorConfig) -> dict[str, str]:
    opts: dict[str, str] = {"es.nodes": _nodes(conf.hosts)}
    if conf.username and conf.password:
        opts["es.net.http.auth.user"] = conf.username
        opts["es.net.http.auth.pass"] = conf.password
    elif conf.api_key:
        opts["es.net.http.header.Authorization"] = f"ApiKey {conf.api_key}"
    if conf.ssl_enabled:
        opts["es.net.ssl"] = "true"
        if conf.ca_certs:
            opts["es.net.ssl.cert.allow.self.signed"] = str(
                not conf.check_certificate
            ).lower()
            opts["es.net.ssl.truststore.location"] = conf.ca_certs
        if conf.client_cert:
            opts["es.net.ssl.keystore.location"] = conf.client_cert
        if conf.client_key and conf.client_key != conf.client_cert:
            # the connector has no separate private-key option: it expects a
            # keystore combining cert+key. A separately-configured key file
            # cannot be honored — fail loudly instead of silently dropping it.
            raise ValueError(
                "elasticsearch connector takes a combined keystore: bundle the "
                "client cert and key into one keystore file and set client_cert "
                "to it (client_key alone cannot be passed through)"
            )
    return opts


def es_read_options(conf: ConnectorConfig, query: str | None = None) -> dict[str, str]:
    """Scan options: scroll-based parallel read, one input partition per ES
    shard (the scalable twin of the reference's scan API choice,
    es_common.py:286-289); optional ``es.query`` pushdown (S3 range)."""
    opts = es_common_options(conf)
    opts["es.resource"] = conf.index_name
    opts["es.read.metadata"] = "true"  # merge _id/_index like es_common.py:219-231
    if query:
        opts["es.query"] = query
    return opts


# W3 same-index merge: replace the doc's annotations array with the merged
# set the engine computed (the reference's painless scripted update,
# annotations_indexer.py:155-163 — dedup happens engine-side there too,
# :151-153, so the script only assigns)
PAINLESS_SET_ANNOTATIONS = (
    "ctx._source.annotations = new ArrayList(); "
    "ctx._source.annotations = params.annotations"
)


def es_write_options(
    conf: ConnectorConfig,
    mapping_id: str | None = "row_id",
    upsert: bool = False,
    split_suffix_field: str | None = None,
    scripted_upsert: bool = False,
    annotations_field: str = "annotations",
) -> dict[str, str]:
    """Bulk sink options with the reference's batch tuning (S7) and
    idempotency via deterministic doc ids (B2). ``scripted_upsert`` maps the
    reference's painless scripted update (W3) onto the connector's
    ``es.update.script.*`` options."""
    opts = es_common_options(conf)
    resource = conf.index_name
    if split_suffix_field:
        resource = f"{conf.index_name}-{{{split_suffix_field}}}"  # W2 dynamic routing
    opts["es.resource"] = resource
    opts["es.batch.size.entries"] = str(BULK_CHUNK_SIZE)
    opts["es.http.timeout"] = f"{BULK_REQUEST_TIMEOUT_S}s"
    opts["es.batch.write.retry.count"] = "3"
    if mapping_id:
        opts["es.mapping.id"] = mapping_id
    if upsert or scripted_upsert:
        opts["es.write.operation"] = "upsert"
    if scripted_upsert:
        opts["es.update.script.inline"] = PAINLESS_SET_ANNOTATIONS
        opts["es.update.script.lang"] = "painless"
        # connector param syntax: script-param:dataframe-column
        opts["es.update.script.params"] = f"annotations:{annotations_field}"
    return opts


def _require_format(spark: SparkSession) -> None:
    jvm_ok = True
    try:
        spark._jvm.java.lang.Class.forName("org.elasticsearch.spark.sql.DefaultSource")
    except Exception:
        jvm_ok = False
    if not jvm_ok:
        raise RuntimeError(
            "elasticsearch-spark connector jar not on the classpath; add "
            "org.elasticsearch:elasticsearch-spark-30_2.13 via spark.jars.packages "
            "(parquet backend is the hermetic default)"
        )


def read_es(spark: SparkSession, conf: ConnectorConfig, query: str | None = None) -> DataFrame:
    _require_format(spark)
    return spark.read.format(ES_FORMAT).options(**es_read_options(conf, query)).load()


def write_es(
    df: DataFrame,
    conf: ConnectorConfig,
    mode: str = "append",
    **kw,
) -> None:
    _require_format(df.sparkSession)
    df.write.format(ES_FORMAT).options(**es_write_options(conf, **kw)).mode(mode).save()


def es_foreach_batch(conf: ConnectorConfig, **kw):
    """S7 streaming bulk sink: a ``foreachBatch`` function bulk-writing each
    micro-batch through the same option surface as ``write_es`` (batch size
    10000 / 30 s timeout parity with the reference's streaming_bulk,
    es_common.py:98-99,191-210). Deterministic ``es.mapping.id`` makes
    micro-batch replay after failure an idempotent upsert (B2)."""

    def apply(batch: DataFrame, epoch_id: int) -> None:
        write_es(batch, conf, **kw)

    return apply
