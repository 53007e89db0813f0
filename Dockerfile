# Deployment image mirroring the reference's shape
# (/root/reference/Dockerfile: python base, config volume, run.sh
# entry), rebuilt for the Spark engine: Java 17 + pip-installed package
# with its console entry point. In cluster deployments this image is the
# DRIVER/CLIENT; point spark.master at the cluster (k8s/YARN/standalone)
# via config or SPARK_MASTER — local[*] is only the default.
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python3 /usr/bin/python

WORKDIR /app

COPY pyproject.toml README.md /app/
COPY annotations_ingester_spark /app/annotations_ingester_spark

RUN pip3 install --no-cache-dir --upgrade pip \
    && pip3 install --no-cache-dir /app

# config is volume-mounted (compose mirrors the reference's
# ./config/config.yml:/app/config/config.yml:ro mapping)
COPY scripts/ /app/scripts/

CMD ["/app/scripts/run.sh"]
