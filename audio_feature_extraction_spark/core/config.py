"""Engine configuration dataclasses.

``FrameSpec`` is the analog of the reference's ``STFTConfig``
(design.md:2195-2199) and carries the same invariant ``hop <= frame_len``
(design.md:203-204 enforces ``hop_length <= n_fft``); the feature width
``n_buckets = frame_len//2 + 1`` mirrors the STFT bin count
``n_freq_bins = n_fft//2 + 1`` (design.md:184-189).

Canonical framing semantics (shared by the Spark UDF kernel, the pure-SQL
formulation, the numpy oracle, and the DuckDB oracle SQL — all four must
agree exactly):

* frame ``f`` covers token positions ``[f*hop, f*hop + frame_len)`` (0-based)
* ``n_frames = floor((n_tok - 1) / hop) + 1`` — frames start at every hop
  multiple ``< n_tok``, so with ``hop <= frame_len`` every position is
  covered and the grid is exactly invertible (first-occurrence per position)
* the tail frame is NOT padded in the long ("raw") frame table — features
  and stats are computed over the truncated slice; the fixed-shape writer
  pads separately (PadMode), mirroring the reference's split between
  extraction and dataset-layout adjustment (design.md:1143-1236)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from audio_feature_extraction_spark.core.errors import InvalidConfigError


@dataclass(frozen=True)
class FrameSpec:
    """Frame/hop grid parameters (≙ STFTConfig, design.md:2195-2199)."""

    frame_len: int = 16
    hop: int = 8
    # _to_db clamp parameters (design.md:615-623 defaults amin=1e-10, top_db=80)
    amin: float = 1e-10
    top_db: float = 80.0
    # feature-hash constants (bigram hash: (t1*MULT + t2) % n_buckets)
    bigram_mult: int = 31
    # centered framing (≙ torch.stft center=True, design.md:538-547):
    # frame f is centered at position f*hop, boundaries reflect-padded.
    # Batch-only: centered frames read frame_len//2 positions of
    # LOOKAHEAD, so PIT/causal paths must refuse center=True.
    center: bool = False

    def __post_init__(self) -> None:
        if self.frame_len <= 0:
            raise InvalidConfigError(f"frame_len must be positive, got {self.frame_len}")
        if self.hop <= 0:
            raise InvalidConfigError(f"hop must be positive, got {self.hop}")
        # invariant carried from the reference: hop_length <= n_fft
        # (design.md:203-204) — guarantees full coverage / invertibility
        if self.hop > self.frame_len:
            raise InvalidConfigError(
                f"hop ({self.hop}) must be <= frame_len ({self.frame_len})"
            )
        if self.top_db <= 0:
            raise InvalidConfigError(f"top_db must be positive, got {self.top_db}")

    @property
    def n_buckets(self) -> int:
        """Feature-vector width (≙ n_freq_bins = n_fft//2+1, design.md:184-189)."""
        return self.frame_len // 2 + 1

    def n_frames(self, n_tok: int) -> int:
        """Number of frames over a sequence of ``n_tok`` tokens (0 if empty).

        Centered mode mirrors torch.stft(center=True): one frame per hop
        multiple <= n_tok, i.e. ``n_tok // hop + 1``."""
        if n_tok <= 0:
            return 0
        if self.center:
            return n_tok // self.hop + 1
        return (n_tok - 1) // self.hop + 1


@dataclass(frozen=True)
class TokenizerSpec:
    """Deterministic word tokenizer, expressible identically in Spark SQL,
    DuckDB SQL, and numpy — tokens depend only on (first char, length,
    last char) of each whitespace-separated word.

    token(w) = (ascii(w[0])*131 + len(w)*7 + ascii(w[-1])) % vocab
    """

    vocab: int = 32768
    first_mult: int = 131
    len_mult: int = 7


@dataclass(frozen=True)
class SessionizeSpec:
    """Gap-based sessionization (≙ silence-gap trimming, design.md:837-859)."""

    gap_seconds: float = 1800.0  # 30 min


@dataclass(frozen=True)
class MixSpec:
    """SNR-controlled mixing (≙ AudioMixer, design.md:928-1001)."""

    target_snr_db: float = 10.0
    tolerance_db: float = 1.0  # tasks.md:391


@dataclass(frozen=True)
class MinHashSpec:
    """MinHash-LSH dedup parameters. All integer arithmetic stays < 2^62 so
    Spark (non-ANSI wraparound never triggered) and DuckDB agree exactly."""

    num_perm: int = 16
    bands: int = 4  # rows_per_band = num_perm // bands
    prime: int = 2147483647  # 2^31 - 1
    # a_j = A0 + j*ASTEP, b_j = B0 + j*BSTEP (odd, < prime)
    a0: int = 1103515245
    astep: int = 12345
    b0: int = 7
    bstep: int = 1000003

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.bands


DEFAULT_FRAME = FrameSpec()
DEFAULT_TOKENIZER = TokenizerSpec()
