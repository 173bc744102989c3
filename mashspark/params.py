"""Sketch / LSH / pipeline parameter objects.

Mirrors the reference parameter surface (marbl/Mash
``src/mash/Sketch.h:34-106`` ``Parameters``; defaults from
``src/mash/Command.cpp:168,172,178``: k=21, sketchSize=1000, seed=42) as a
frozen dataclass that is cheap to broadcast to executors.

The reference enforces parameter compatibility at sketch-load time
(``Sketch.cpp:133-165``); we enforce it with :meth:`SketchParams.check_compatible`
before any cross-sketch comparison.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class SketchParams:
    """Parameters of the bottom-k MinHash sketch.

    k:        shingle (k-mer) size in characters/bytes (Mash ``kmerSize``).
    s:        sketch size = number of smallest distinct hashes kept
              (Mash ``minHashesPerWindow``, aka ``-s``).
    seed:     murmur3 hash seed (Mash ``hashSeed``, default 42).
    min_cov:  a hash enters the sketch only after being seen this many
              times (Mash ``-m`` reads-mode noise filter,
              ``MinHashHeap.cpp:96-118``). Default 1 = keep all.
    alphabet_size: size of the input alphabet; defines
              ``kmer_space = alphabet_size ** k`` used by p-values
              (``Sketch.cpp:58-61``). For web text we use 256 (bytes).
    """

    k: int = 21
    s: int = 1000
    seed: int = 42
    min_cov: int = 1
    alphabet_size: int = 256

    @property
    def kmer_space(self) -> float:
        # Sketch.cpp kmerSpace = pow(alphabetSize, kmerSize) (double math).
        return float(self.alphabet_size) ** self.k

    def check_compatible(self, other: "SketchParams") -> None:
        """Refuse to compare sketches built under different parameters.

        Reference behavior: mismatched k/seed/alphabet files are skipped at
        load (``Sketch.cpp:133-160``); a larger sketch size is truncated to
        the smaller (``Sketch.cpp:963-968``) — truncation is handled by the
        comparison itself (min(s_a, s_b) rule, ``CommandDistance.cpp:313-315``).
        """
        for f in ("k", "seed", "alphabet_size", "min_cov"):
            if getattr(self, f) != getattr(other, f):
                raise ValueError(
                    f"incompatible sketch params: {f}={getattr(self, f)!r} "
                    f"vs {getattr(other, f)!r}"
                )

    def to_dict(self) -> dict:
        return asdict(self)


@dataclass(frozen=True)
class LSHParams:
    """Banded-LSH candidate-generation parameters.

    We use ``num_perm = bands * rows`` universal-hash permutations of the
    shingle-hash set (the classic banding scheme, same family as Spark
    MLlib's MinHashLSH) rather than slicing the bottom-k sketch into
    positional bands: a single inserted low hash shifts every positional
    band boundary, destroying band agreement, whereas permutation minima
    are shift-free. Candidate recall at Jaccard j is
    ``1 - (1 - j**rows) ** bands``.

    Defaults (bands=64, rows=4, 256 perms) give recall > 0.9998 at j=0.7
    and > 0.984 at j=0.5.

    band_doc_cap: bands whose bucket exceeds this many docs are handled by
    the skew path (salting / capped enumeration with logged drops) —
    see ``lsh.py``.
    """

    bands: int = 64
    rows: int = 4
    band_doc_cap: int = 2000
    perm_seed: int = 7

    @property
    def num_perm(self) -> int:
        return self.bands * self.rows

    def candidate_recall(self, j: float) -> float:
        return 1.0 - (1.0 - j**self.rows) ** self.bands

    def to_dict(self) -> dict:
        return asdict(self)


@dataclass(frozen=True)
class PipelineConfig:
    """End-to-end dedup pipeline configuration."""

    sketch: SketchParams = field(default_factory=SketchParams)
    lsh: LSHParams = field(default_factory=LSHParams)
    # duplicate-edge threshold on the Mash-semantics capped-merge Jaccard
    # estimate (CommandDistance.cpp:336-385). Pairs with jaccard >= this
    # become edges of the clustering graph.
    jaccard_threshold: float = 0.7
    # optional max mash distance / max p-value filters (reference -d / -v,
    # CommandDistance.cpp:409-422); None = disabled (reference defaults).
    max_distance: float | None = None
    max_pvalue: float | None = None
    cc_max_iterations: int = 25

    def to_dict(self) -> dict:
        d = {
            "sketch": self.sketch.to_dict(),
            "lsh": self.lsh.to_dict(),
            "jaccard_threshold": self.jaccard_threshold,
            "max_distance": self.max_distance,
            "max_pvalue": self.max_pvalue,
            "cc_max_iterations": self.cc_max_iterations,
        }
        return d
