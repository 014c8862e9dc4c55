"""Configuration objects.

Mirrors the reference's parameter surface:
- ``FieldParams``/``MatchConfig`` <- ``FuzzyMatcherParameters``
  (/root/reference/fuzzy_types/types.go:50-56): per-field
  max_depth / max_edits / weight / method / min_distance.
- ``CoreParams`` <- ``FuzzyMatcherCoreParameters``
  (/root/reference/fuzzy_types/types.go:59-63): OCR correction toggle,
  global total-edit cap, expiration toggle.
- ``DedupConfig`` is new (north-rule generalization): shingling /
  MinHash / LSH banding / SimHash / verification thresholds for
  document-scale near-duplicate detection.

These are plain dataclasses; they are broadcast implicitly by closure
capture into pandas UDFs (small, immutable) and recorded into run
metrics for lineage.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Dict, Optional

# Calculation methods (reference enum fuzzy_types/types.go:11-15)
JARO_WINKLER = "jaro"
LEVENSHTEIN = "levenshtein"
DEFAULT = "default"  # constant 1.0 — exact fields rely on exact blocking


@dataclass(frozen=True)
class FieldParams:
    """Per-field search budget and verification config.

    Reference: fuzzy_types/types.go:50-56 (maps keyed by Field);
    example values fuzzy_classes/example_source.go:20-81.

    ``max_depth``: in the reference walk Depth increments exactly when
    NumEdits does (recurse.go:91-161, breadth_first_search.go:67-73),
    so the effective per-field edit budget is
    ``min(max_edits, max_depth)`` — max_depth is a second edit cap,
    not a completion-length cap (completions beyond the query end are
    depth-free, bfs :62-73). Enforced in operators/matcher.search.
    """

    max_depth: int = 5
    max_edits: int = 2
    weight: float = 1.0
    method: str = JARO_WINKLER
    min_distance: float = 0.8


@dataclass(frozen=True)
class CoreParams:
    """Engine-level config (fuzzy_types/types.go:59-63)."""

    correct_ocr_misreads: bool = False
    max_edits: int = 6  # global total-edit cap across fields (clean.go:69-77)
    use_expiration: bool = False


@dataclass
class MatchConfig:
    """Full multi-field matcher config: fields + core + top-k."""

    fields: Dict[str, FieldParams] = field(default_factory=dict)
    core: CoreParams = field(default_factory=CoreParams)
    top_k: int = 5  # fuzzy_matcher_core.go:285-287

    # Candidate blocking strategy (operators/matcher.py):
    # - "keys": prefix-1 + char-bigram + short-value fallback keys.
    #   Provably complete w.r.t. the trie-edit budget (see matcher.py
    #   blocking contract); right for probe-scale workloads.
    # - "minhash": prefix-1 + char-bigram MinHash band keys + the same
    #   short-value fallback. Probabilistic (recall tunable via
    #   bands x rows, validated >= 0.99 by tests/test_matcher_recall),
    #   bounded candidate volume; the web-scale path.
    blocking: str = "keys"
    block_bands: int = 12
    block_rows: int = 1
    block_seed: int = 7

    def validate(self) -> None:
        total_w = sum(f.weight for f in self.fields.values())
        if self.fields and abs(total_w - 1.0) > 1e-9:
            raise ValueError(f"field weights must sum to 1.0, got {total_w}")
        if self.blocking not in ("keys", "minhash"):
            raise ValueError(f"unknown blocking mode: {self.blocking!r}")
        if self.blocking == "minhash" and (
            self.block_bands < 1 or self.block_rows < 1
        ):
            raise ValueError("block_bands and block_rows must be >= 1")

    def as_dict(self) -> dict:
        return {
            "fields": {k: asdict(v) for k, v in self.fields.items()},
            "core": asdict(self.core),
            "top_k": self.top_k,
        }


def example_member_config(valid: bool = True) -> MatchConfig:
    """The reference example config (fuzzy_classes/example_source.go:20-81).

    ``valid=False`` reproduces the short-name validation gate: all
    budgets zero => exact-only matching (example_source.go:27-40).
    """
    d = 6 if valid else 0
    return MatchConfig(
        fields={
            "firstname": FieldParams(d, d, 0.2, JARO_WINKLER, 0.7),
            "surname": FieldParams(
                2 if valid else 0, 2 if valid else 0, 0.4, JARO_WINKLER, 0.9
            ),
            "birthdate": FieldParams(
                2 if valid else 0, 2 if valid else 0, 0.4, DEFAULT, 1.0
            ),
        },
        core=CoreParams(correct_ocr_misreads=False, max_edits=6),
    )


@dataclass
class DedupConfig:
    """Document near-dup pipeline config (north-rule generalization).

    Defaults follow standard web-dedup practice (Broder 1997 MinHash with
    128 permutations; Gyawali et al. banding) and the reference's
    normalization (fuzzy_matcher_core/normalize.go:9-15) applied to
    *derived* columns only — the ``text`` column is never rewritten
    (input_hint invariant).
    """

    # shingling
    shingle_mode: str = "word"  # "word" | "char"
    shingle_size: int = 5
    # MinHash
    num_perm: int = 128
    seed: int = 42
    # LSH banding: num_perm == bands * rows_per_band
    bands: int = 16
    rows_per_band: int = 8
    # verification: estimated Jaccard from signature agreement
    jaccard_threshold: float = 0.8
    # skew control: band buckets larger than this emit a sorted chain of
    # consecutive pairs (preserves connectivity, O(n) not O(n^2))
    max_band_bucket: int = 64
    # SimHash
    simhash_bits: int = 64
    simhash_hamming_max: int = 3
    simhash_tables: int = 4  # bit-sliced bucket tables
    # suffix-array substring dedup
    min_substring: int = 50
    # connected components
    cc_max_iter: int = 25

    def validate(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows ({self.bands}*{self.rows_per_band}) != num_perm ({self.num_perm})"
            )
