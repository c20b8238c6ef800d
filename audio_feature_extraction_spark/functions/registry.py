"""Feature-extractor registry (≙ FeatureExtractorRegistry,
tasks.md:741-760; FR-2.6 requirements.md:39; plugin NFR-2.1
requirements.md:106-108).

Extractors are named factories ``(FrameSpec) -> (DataFrame) -> DataFrame``
over the token table. Registration checks Protocol conformance the Spark
way: the produced plan must carry the declared output schema (checked
lazily against an empty frame, no job run).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from audio_feature_extraction_spark.core.config import DEFAULT_FRAME, FrameSpec

Extractor = Callable[[DataFrame], DataFrame]
Factory = Callable[[FrameSpec], Extractor]


@dataclass(frozen=True)
class ExtractorSpec:
    name: str
    factory: Factory
    required_output_cols: tuple[str, ...]


class FeatureExtractorRegistry:
    def __init__(self) -> None:
        self._specs: dict[str, ExtractorSpec] = {}

    def register(
        self, name: str, factory: Factory, required_output_cols: tuple[str, ...]
    ) -> None:
        if name in self._specs:
            raise ValueError(f"extractor {name!r} already registered")
        self._specs[name] = ExtractorSpec(name, factory, required_output_cols)

    def get(self, name: str, spec: FrameSpec = DEFAULT_FRAME) -> Extractor:
        if name not in self._specs:
            raise KeyError(
                f"unknown extractor {name!r}; available: {sorted(self._specs)}"
            )
        return self._specs[name].factory(spec)

    def names(self) -> list[str]:
        return sorted(self._specs)

    def conforms(self, name: str, df: DataFrame, spec: FrameSpec = DEFAULT_FRAME) -> bool:
        """Schema-conformance check (≙ Protocol runtime check): the plan's
        schema must contain the declared columns. Lazy — no job runs."""
        out = self.get(name, spec)(df)
        have = set(out.columns)
        return all(c in have for c in self._specs[name].required_output_cols)


def default_registry() -> FeatureExtractorRegistry:
    from audio_feature_extraction_spark.operators import framing, spectral

    reg = FeatureExtractorRegistry()
    reg.register(
        "frame_features",
        lambda s: lambda df: framing.frame_features_flat(df, s),
        ("doc_id", "frame_id", "features"),
    )
    reg.register(
        "frame_features_sql",
        lambda s: lambda df: framing.frame_features_sql(df, s),
        ("doc_id", "frame_id", "features"),
    )
    reg.register(
        "mel",
        lambda s: lambda df: spectral.project_mel(
            framing.frame_features_sql(df, s), s
        ),
        ("doc_id", "frame_id", "mel"),
    )
    reg.register(
        "mfcc",
        lambda s: lambda df: spectral.mfcc(framing.frame_features_sql(df, s), s),
        ("doc_id", "frame_id", "mfcc"),
    )
    reg.register(
        "descriptors",
        lambda s: lambda df: spectral.frame_descriptors(
            framing.frame_table(df, s), s
        ),
        ("doc_id", "frame_id", "centroid"),
    )
    return reg
