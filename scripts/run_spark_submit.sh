#!/usr/bin/env bash
# spark-submit deployment path (north rule: "run via spark-submit
# --py-files on multi-executor clusters"). Packages the engine as a zip
# and submits the CLI job; on a real cluster swap --master for
# yarn/k8s and size executors.
#
# Usage: scripts/run_spark_submit.sh [extract|reconstruct|...] [args...]
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS="${SPARK_GRAFT_CPUS:-8}"
ZIP=/tmp/afes_pkg.zip
rm -f "$ZIP"
python -c "
import zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w') as z:
    for p in pathlib.Path('audio_feature_extraction_spark').rglob('*.py'):
        z.write(p, p.as_posix())
"

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "local[$CPUS]" \
  --conf spark.sql.shuffle.partitions="$CPUS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  scripts/submit_main.py "$@"
