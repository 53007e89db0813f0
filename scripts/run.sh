#!/usr/bin/env bash
# Container entry point mirroring the reference's scripts/run.sh
# lifecycle (await the services named in $SERVICES_USED, then start the
# pipeline with the mounted config).
set -u

echo "*** Awaiting services to start Ingester ***"
while IFS=',' read -ra ADDR; do
  for i in "${ADDR[@]}"; do
    [ -n "$i" ] && /app/scripts/wait_for_service.sh "$i"
  done
done <<< "${SERVICES_USED:-}"

echo "*** Starting Ingester (Spark) ***"
exec annotations-ingester-spark --config /app/config/config.yml
