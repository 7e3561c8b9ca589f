#!/usr/bin/env bash
# CI-style smoke for the PySpark call path (round 16 — VERDICT r15
# ask 4): package the library jar, then drive every graft.api.PyBridge
# entry point from Python via spark-submit. Exit 0 iff every semantic
# assertion in python/graft_pybridge_example.py holds.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
JAR="target/scala-2.13/oeemetlspark_2.13-0.1.0.jar"

if [ ! -f "$JAR" ] || [ -n "$(find src/main -newer "$JAR" -name '*.scala' -print -quit)" ]; then
  echo "[pybridge-smoke] packaging $JAR"
  sbt -batch package > /dev/null
fi

exec /opt/spark/bin/spark-submit \
  --master 'local[4]' \
  --jars "$JAR" \
  --conf spark.ui.enabled=false \
  python/graft_pybridge_example.py "$SF_DIR"
