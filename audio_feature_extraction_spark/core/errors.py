"""Engine exception hierarchy (≙ design.md:2349-2377 §9.1).

The reference defines DatasetGeneratorError with Load / FeatureExtraction
/ InvalidConfig / Device subclasses, plus recovery strategies (§9.2):
load failures are skipped-and-logged (processing continues), config
errors fail fast with detail. Spark mapping: "skip and continue" becomes
a per-row error column emitted by the decoding kernels (a 100 TB job
must not die on one corrupt payload); "fail fast" stays an eager raise
at plan-construction time.

Subclassing ValueError keeps ``pytest.raises(ValueError)`` and generic
callers working.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class (≙ DatasetGeneratorError)."""


class LoadError(EngineError, ValueError):
    """Payload/source decode failure (≙ AudioLoadError). Recovery: skip
    the row, record the reason, continue (design.md:2374)."""


class FeatureExtractionError(EngineError, ValueError):
    """Kernel/feature computation failure (≙ FeatureExtractionError)."""


class InvalidConfigError(EngineError, ValueError):
    """Bad spec/config — detected eagerly at construction
    (≙ InvalidConfigError; design.md:2376 'early detection')."""


class ResourceError(EngineError, RuntimeError):
    """Executor resource failure (≙ DeviceError — the GPU/CPU fallback
    analog; Spark's recovery is task retry / AQE, not driver logic)."""
