"""Declarative pipeline configuration (≙ PipelineConfig + YAML loader,
design.md:2141-2221; config/loader.py design.md:2188-2221).

YAML → typed dataclasses → a composed DataFrame pipeline. The config is
the *logical* plan only — Catalyst remains the physical planner (the
reference's hand-ordered stages have no optimizer; ours do).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml

from audio_feature_extraction_spark.core.config import FrameSpec


@dataclass(frozen=True)
class PreprocessConfig:
    trim_threshold: int | None = None
    target_length: int | None = None
    pad_mode: str = "constant"
    pad_value: int = 0


@dataclass(frozen=True)
class WriterConfig:
    format: str = "magnitude_phase_trig"  # DatasetFormat default, design.md:1251
    output_dir: str = "out"
    split: bool = True


@dataclass(frozen=True)
class PipelineConfig:
    frame: FrameSpec = field(default_factory=FrameSpec)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    writer: WriterConfig = field(default_factory=WriterConfig)
    extractor: str = "frame_features"

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "PipelineConfig":
        frame = FrameSpec(**raw.get("frame", {}))
        pre = PreprocessConfig(**raw.get("preprocess", {}))
        wr = WriterConfig(**raw.get("writer", {}))
        return cls(
            frame=frame,
            preprocess=pre,
            writer=wr,
            extractor=raw.get("extractor", "frame_features"),
        )
