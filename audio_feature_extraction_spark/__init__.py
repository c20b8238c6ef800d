"""audio_feature_extraction_spark — a PySpark-native point-in-time
feature-engineering engine.

Reinterprets the frame/hop/window audio-feature semantics of the reference
(``Cafelat/audio-feature-extraction``, spec at
``.kiro/specs/audio-feature-extraction/design.md``) as sliding-window token
features over a table of pre-tokenized sequences:

* frame/hop grids over ``tokens: array<int>``  (≙ STFT framing, design.md:522-592)
* per-frame feature vectors via vectorized Arrow UDFs (≙ per-frame bins)
* exact inverse reconstruction                 (≙ ISTFT overlap-add, design.md:630-744)
* as-of (point-in-time) joins, lag/lead, backfill, sessionization
  (≙ causal streaming state, design.md:594-609, 1848-2002)
* controlled mixing, fixed-size adjustment, deterministic splits
* per-partition lineage + metrics for checkpoint/resume

Everything is DataFrame/SQL + pandas/Arrow UDFs — no per-row Python, no RDDs.
"""

__version__ = "0.1.0"

from audio_feature_extraction_spark.core.config import FrameSpec  # noqa: F401
from audio_feature_extraction_spark.core.session import get_spark  # noqa: F401
