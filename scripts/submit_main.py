"""spark-submit entry shim: delegates to the package CLI (shipped via
--py-files)."""

import sys

from audio_feature_extraction_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
