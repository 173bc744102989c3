"""Distributed unigram-LM tokenizer training + Viterbi corpus encoding
(Kudo 2018, "Subword Regularization" — the SentencePiece unigram model;
public method, no reference-code analog: a training-data pipeline
operator beyond marbl/Mash, the second trained tokenizer family next
to BPE).

Spark-first shape (mirrors ``bpe.py``'s discipline):

- TRAIN touches the corpus ONCE: the same vocabulary-sized
  (word, count) table BPE uses (map-side partials; ~10^7 rows for web
  text vs 10^12 docs). Everything after runs against that table.
- SEED vocabulary: every substring of every word up to
  ``max_piece_len``, counted with JVM array expressions (one explode
  over sequence/transform — no Python), one small groupBy(sum), top
  ``seed_size`` by (count desc, piece asc). All single characters are
  always kept (coverage guarantee). The seed stage is plain relational
  algebra, so it is DuckDB-oracle-checkable.
- EM rounds: the piece table is tokenizer-sized (<= 10^6 entries — the
  same assumption SentencePiece itself makes), so the model rides a
  broadcast while the E-step runs as ONE Arrow pass over the word
  table: per-word forward-backward over all segmentations, expected
  piece counts weighted by word frequency. Expected counts are emitted
  as FIXED-POINT micro-counts (int64 of 1e-6 units): the M-step
  aggregation is integer addition, hence associative, hence
  bit-deterministic under any partitioning — the float-sum
  order-dependence that normally makes distributed EM runs drift is
  designed out.
- PRUNE between rounds: drop the lowest-expected-count pieces (never
  single chars) by a ``shrink_factor`` until ``vocab_size`` remains —
  the standard from-scratch approximation of Kudo's loss-based pruning
  (the exact loss needs a second per-piece Viterbi; expected-count
  ordering agrees with it except near ties).
- ENCODE is map-only: broadcast (piece -> logp), per-word Viterbi DP
  (deterministic tie-break: at equal score prefer the LONGER last
  piece, then lexicographically smaller) memoized per executor, one
  pandas UDF over Arrow batches — the only full-corpus pass.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .bpe import word_frequencies

_MICRO = 1_000_000  # fixed-point scale for expected counts


def seed_substring_counts(words: DataFrame, max_piece_len: int = 6) -> DataFrame:
    """(piece, total) — weighted occurrence counts of every substring of
    length <= max_piece_len across the (word, count) table. Pure JVM
    array exprs: per word of length L this explodes <= L*max_piece_len
    rows; the groupBy collapses them with map-side partials."""
    L = F.length("word")
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L),  # 1-based start
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), L - i + 1),
                ),
                lambda n: F.substring(F.col("word"), i.cast("int"), n.cast("int")),
            ),
        )
    )
    return (
        words.select(F.explode(pieces).alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").alias("total"))
    )


def select_seed_vocab(
    words: DataFrame, seed_size: int, max_piece_len: int = 6
) -> dict[str, int]:
    """Top ``seed_size`` substrings by (total desc, piece asc), plus all
    single characters regardless of rank -> {piece: weighted count}.
    Driver-sized by construction (seed_size caps it)."""
    counts = seed_substring_counts(words, max_piece_len)
    top = counts.orderBy(F.desc("total"), F.asc("piece")).limit(seed_size).collect()
    chars = counts.filter(F.length("piece") == 1).collect()
    vocab = {r["piece"]: int(r["total"]) for r in top}
    for r in chars:
        vocab.setdefault(r["piece"], int(r["total"]))
    return vocab


def _normalize_logprobs(micro_counts: dict[str, int]) -> dict[str, float]:
    total = sum(micro_counts.values())
    if total <= 0:
        raise ValueError("empty model: no expected counts")
    # floor: a piece EM zeroed out still needs a finite logp while it
    # remains in the vocab (single chars are never pruned)
    floor = math.log(0.5 / total)
    out = {}
    for p, c in micro_counts.items():
        out[p] = math.log(c / total) if c > 0 else floor
    return out


def expected_counts_word(
    word: str, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward over all segmentations of one word: expected
    number of times each piece is used, under the current unigram model.
    Pure-Python reference kernel — the Arrow E-step calls this per
    distinct word, and tests pin the Spark aggregate against it."""
    n = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (n + 1)
    beta = [NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = NEG
        for i in range(max(0, j - max_piece_len), j):
            lp = logp.get(word[i:j])
            if lp is None or alpha[i] == NEG:
                continue
            v = alpha[i] + lp
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        alpha[j] = acc
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == NEG:
                continue
            v = beta[j] + lp
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        beta[i] = acc
    z = alpha[n]
    if z == NEG:  # unsegmentable (cannot happen while chars are kept)
        return {}
    out: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or beta[j] == NEG:
                continue
            out[piece] = out.get(piece, 0.0) + math.exp(alpha[i] + lp + beta[j] - z)
    return out


def _e_step(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One distributed E-step: Arrow pass over the (word, count) table
    with the broadcast model; per-batch local Counter, micro-count
    (int64) rows out, integer groupBy(sum) in — bit-deterministic."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast((logp, max_piece_len))

    def run(batches):
        model, mpl = bc.value
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, count in zip(pdf["word"], pdf["count"]):
                exp_counts = expected_counts_word(str(word), model, mpl)
                for piece, v in exp_counts.items():
                    acc[piece] = acc.get(piece, 0) + int(round(v * count * _MICRO))
            yield pd.DataFrame(
                {"piece": list(acc.keys()),
                 "micro": pd.array(list(acc.values()), dtype="int64")}
            )

    rows = (
        words.mapInPandas(run, "piece string, micro long")
        .groupBy("piece")
        .agg(F.sum("micro").alias("micro"))
        .collect()
    )
    out = {r["piece"]: int(r["micro"]) for r in rows}
    bc.unpersist()
    return out


def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_size: int | None = None,
    shrink_factor: float = 0.75,
    em_rounds_per_prune: int = 2,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary -> {piece: logprob}.

    Seeds at ``seed_size`` (default 4x the target), alternates
    ``em_rounds_per_prune`` EM rounds with expected-count pruning by
    ``shrink_factor`` until the vocab reaches ``vocab_size``, then runs
    one final EM round. Single characters are never pruned (any string
    stays encodable). Deterministic end to end: integer seed counts,
    fixed-point E-step aggregation, (count desc, piece asc) prune order.
    """
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    spark = docs.sparkSession
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    before = {int(k) for k in jmap.keySet().toArray()}
    words = word_frequencies(docs, text_col).localCheckpoint(eager=True)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    ckpt_ids = {int(k) for k in jmap.keySet().toArray()} - before
    try:
        if seed_size is None:
            seed_size = 4 * vocab_size
        seed = select_seed_vocab(words, seed_size, max_piece_len)
        micro = {p: c * _MICRO for p, c in seed.items()}
        while True:
            logp = _normalize_logprobs(micro)
            for _ in range(em_rounds_per_prune):
                new = _e_step(words, logp, max_piece_len)
                # keep every vocab entry alive in the table (chars with
                # zero expectation must survive normalization)
                micro = {p: new.get(p, 0) for p in logp}
                logp = _normalize_logprobs(micro)
            n_prunable = sum(1 for p in micro if len(p) > 1)
            n_chars = len(micro) - n_prunable
            if len(micro) <= max(vocab_size, n_chars):
                break
            keep_target = max(vocab_size, n_chars,
                              int(len(micro) * shrink_factor))
            multi = sorted(
                ((p, c) for p, c in micro.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            kept = dict(multi[: keep_target - n_chars])
            micro = {p: c for p, c in micro.items()
                     if len(p) == 1 or p in kept}
        final = _e_step(words, _normalize_logprobs(micro), max_piece_len)
        micro = {p: final.get(p, 0) for p in micro}
        return _normalize_logprobs(micro)
    finally:
        # localCheckpoint blocks are only released via the JVM registry
        # (a plain df.rdd.unpersist() is a no-op for them — see bpe.py)
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in ckpt_ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist()


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> list[str]:
    """Best segmentation under the model. Tie-break at equal score:
    prefer the longer last piece, then the lexicographically smaller —
    fully deterministic, reimplementable from this docstring."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_piece_len), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None or best[i] == NEG:
                continue
            v = best[i] + lp
            cur = back[j]
            if (
                v > best[j]
                or (v == best[j] and cur is not None
                    and (len(piece), _neg_str(piece))
                    > (len(cur[1]), _neg_str(cur[1])))
            ):
                best[j] = v
                back[j] = (i, piece)
    if back[n] is None:
        # unsegmentable char (not in vocab): fall back to single chars
        return list(word)
    out: list[str] = []
    j = n
    while j > 0:
        entry = back[j]
        if entry is None:
            out.append(word[j - 1])
            j -= 1
            continue
        i, piece = entry
        out.append(piece)
        j = i
    return out[::-1]


class _neg_str(str):
    """Inverts string comparison so (len, _neg_str(s)) maximization
    prefers longer pieces and then lexicographically SMALLER ones."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)


def encode_unigram(
    docs: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """-> (doc_id, pieces array<string>, n_pieces). Map-only Viterbi:
    the model rides a broadcast-sized closure; each distinct spelling is
    segmented once per executor (Zipf memo, same as BPE encode)."""

    @pandas_udf("array<string>")
    def encode(text: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in text:
            toks: list[str] = []
            for w in (t or "").split():
                enc = cache.get(w)
                if enc is None:
                    enc = viterbi_segment(w, logp, max_piece_len)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        encode(F.col(text_col)).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("long"))
