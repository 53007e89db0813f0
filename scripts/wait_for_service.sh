#!/usr/bin/env bash
# Block until host:port accepts TCP connections (reference:
# scripts/wait_for_service.sh contract; bash /dev/tcp so the image needs
# no netcat). Usage: wait_for_service.sh host:port [timeout_sec]
set -u
target="${1:?usage: wait_for_service.sh host:port [timeout_sec]}"
timeout="${2:-0}"   # 0 = wait forever, matching the reference's --timeout=0
host="${target%%:*}"
port="${target##*:}"
start=$(date +%s)
until (exec 3<>"/dev/tcp/${host}/${port}") 2>/dev/null; do
  exec 3>&- 2>/dev/null || true
  if [ "$timeout" -gt 0 ] && [ $(( $(date +%s) - start )) -ge "$timeout" ]; then
    echo "timed out waiting for ${target}" >&2
    exit 1
  fi
  echo "waiting for ${target} ..."
  sleep 2
done
exec 3>&- 2>/dev/null || true
echo "${target} is up"
