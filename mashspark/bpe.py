"""Distributed BPE tokenizer training + corpus encoding (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword Units"
— public method; no reference-code analog, this is a training-data
pipeline operator beyond marbl/Mash).

Why it belongs in a 100 TB curation engine: token counts, packing
layouts, and length filters all depend on the production tokenizer;
training one from the corpus itself — and encoding the corpus with it —
is a standard pipeline stage.

Spark-first shape:

- TRAIN never iterates over the corpus. ONE corpus pass aggregates the
  (word, count) frequency table (map-side partials; the table is
  vocabulary-sized — ~10^7 rows for web text, 5-6 orders of magnitude
  smaller than the corpus). Each merge round then runs entirely on that
  table: adjacent symbol pairs are exploded with JVM array expressions
  weighted by word count, one small groupBy(pair).sum picks the winner
  (driver argmax, deterministic tie-break: count desc, then pair asc),
  and a vectorized Arrow pass rewrites only the words containing the
  pair. The table is localCheckpoint-ed every round: each round's input
  is a materialized row block, so lineage (and Catalyst plan depth)
  stays O(1) across hundreds of merges — the same discipline cc.py uses
  for iterative star rounds.
- At full web scale you train on a deterministic hash-sample
  (``sampling.split_assign`` / ``stratified_sample``) — BPE statistics
  converge far below 100 TB — and ENCODE is the map-only full-corpus
  pass.
- ENCODE broadcasts the ordered merge list (driver-sized by
  construction: n_merges entries) and applies it greedily per word in
  one pandas UDF over Arrow batches, memoizing per-word encodings in
  the executor (Zipf: a 10^5-entry cache covers almost all tokens).

End-of-word handling follows the original recipe: every word gets a
terminal ``</w>`` symbol, so word-final subwords are distinct tokens
and decoding can restore word boundaries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EOW = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — whitespace tokens, case kept
    (BPE is conventionally case-sensitive). The ONLY corpus-scale pass
    in training; map-side partials bound the shuffle by distinct words
    per task."""
    w = F.explode(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).alias("word")
    return docs.select(w).groupBy("word").agg(F.count("*").alias("count"))


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word -> its character symbols + the terminal </w> marker."""
    chars = F.filter(F.split(F.col("word"), ""), lambda x: x != "")
    return words.select(
        F.concat(chars, F.array(F.lit(_EOW))).alias("syms"),
        F.col("count"),
    )


def _pair_counts(symtab: DataFrame) -> DataFrame:
    """(left, right, total): adjacent-pair frequencies over the symbol
    table, weighted by word count — JVM array exprs + one small agg."""
    n = F.size(F.col("syms"))
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.element_at(F.col("syms"), (i + 1).cast("int")).alias("left"),
                F.element_at(F.col("syms"), (i + 2).cast("int")).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        symtab.select(F.explode(pairs).alias("p"), "count")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("count").alias("total"))
    )


def _merge_pairs_udf(pairs: list[tuple[str, str]]):
    """Apply a BATCH of symbol-disjoint merges in one Arrow pass, in
    order. Because a batch is only ever formed from pairwise
    symbol-disjoint pairs (see train_bpe), in-word application order
    cannot matter — but we still apply sequentially so the pass is
    byte-identical to running the single-pair rounds back to back."""
    plist = [(a, b, a + b) for a, b in pairs]

    @pandas_udf("array<string>")
    def merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            for left, right, merged in plist:
                # cheap reject: most words don't contain the pair at all
                if left not in s or right not in s:
                    continue
                res, i, n = [], 0, len(s)
                while i < n:
                    if i + 1 < n and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                s = res
            out.append(s)
        return pd.Series(out)

    return merge


def _parity_safe_batch(top_rows, want: int, min_frequency: int
                       ) -> tuple[list[tuple[str, str]], bool]:
    """The maximal prefix of the (count desc, left asc, right asc)-sorted
    pair table that sequential single-merge training provably picks in
    this exact order, so applying it as one batch is parity-exact:

    * accepted pairs must be pairwise SYMBOL-DISJOINT — merging a pair
      only touches adjacencies involving its symbols, so disjoint pairs'
      counts are invariant under each other's application;
    * every pair CREATED or CHANGED by an accepted merge shares a symbol
      with it, and a created pair's count is bounded by its parent's
      current count — so the scan stops at the FIRST candidate sharing a
      symbol with the accepted set (``cstop`` = its count), and accepted
      pairs must beat cstop STRICTLY (a created pair tying an accepted
      one could win the lexicographic tie-break in sequential order);
    * if the scan exhausts the fetched window without a sharing
      candidate, unseen pairs (and thus all created-pair parents) are
      bounded by the last fetched count, which becomes cstop.

    Returns (batch, done) — done=True when the best pair is already
    below ``min_frequency`` (sequential training's stop condition).
    """
    if not top_rows or top_rows[0]["total"] < min_frequency:
        return [], True
    accepted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    cstop = None
    for r in top_rows:
        if r["total"] < min_frequency:
            # everything below the floor (created parents included) is
            # strictly under any accepted count that survives the floor
            cstop = min_frequency - 1
            break
        left, right = r["left"], r["right"]
        if left in used or right in used:
            cstop = r["total"]
            break
        accepted.append((left, right, r["total"]))
        used.update((left, right, left + right))
    if cstop is None:
        # window exhausted without a sharing candidate: unseen counts
        # (and thus created-pair parents) are bounded by the last row
        cstop = top_rows[-1]["total"]
    batch = [(a, b) for a, b, c in accepted if c > cstop][:want]
    if not batch:
        # the provable prefix is empty only when #2 ties/shares with #1:
        # fall back to the plain single best merge (always parity-exact)
        batch = [(top_rows[0]["left"], top_rows[0]["right"])]
    return batch, False


def _disjoint_batch(top_rows, want: int, min_frequency: int
                    ) -> tuple[list[tuple[str, str]], bool]:
    """The relaxed batch (strict_parity=False): every pairwise
    symbol-disjoint pair in window order, sharers SKIPPED (not stopped
    at), up to ``want``. See train_bpe for the parity caveat."""
    if not top_rows or top_rows[0]["total"] < min_frequency:
        return [], True
    batch: list[tuple[str, str]] = []
    used: set[str] = set()
    for r in top_rows:
        if r["total"] < min_frequency or len(batch) >= want:
            break
        left, right = r["left"], r["right"]
        if left in used or right in used:
            continue
        batch.append((left, right))
        used.update((left, right, left + right))
    return batch, False


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_frequency: int = 2,
    batch_top: int = 64,
    strict_parity: bool = True,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...]. Stops early when the best
    remaining pair occurs fewer than ``min_frequency`` times. Ties
    break deterministically: highest total, then lexicographically
    smallest (left, right) — any reimplementation with the same rule
    reproduces the identical merge sequence.

    Round batching (the fix for one-Spark-job-per-merge at production
    vocab sizes): each round fetches the top ``batch_top`` pairs and
    applies several merges in one rewrite pass.

    * ``strict_parity=True`` (default): only the PROVABLY-sequential
      prefix of symbol-disjoint winners is batched
      (``_parity_safe_batch``) — the merge sequence is bit-identical to
      single-merge rounds. NOTE the folk claim "non-overlapping merges
      preserve parity" is NOT quite true: merging (a,b) creates pairs
      like (x, ab) whose count — bounded by the old (x,a) count — can
      outrank a pending disjoint winner, so the safe prefix must also
      beat the first symbol-sharing candidate strictly. On natural text
      the top pairs share letters constantly, so strict mode batches
      only occasionally (measured ~1.1x on the fixture corpus).
    * ``strict_parity=False``: the standard parallel-BPE relaxation —
      apply ALL pairwise symbol-disjoint pairs from the window (skipping
      sharers), up to the remaining quota. Rounds drop ~batch-size-fold;
      the merge SEQUENCE may deviate from strict sequential order in
      exactly the created-pair corner above (the merge SET is a valid
      BPE vocabulary either way). Use for big-vocab production training;
      parity-pinned paths (tests, contract oracles) use the default.

    The round count is exposed for tests as ``train_bpe.last_rounds``.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    spark = docs.sparkSession

    def _ids() -> set[int]:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    def _release(ids: set[int]) -> None:
        # a plain df.rdd.unpersist() is a no-op for localCheckpoint
        # blocks — the JVM persistent-RDD registry is the only handle
        # (same discipline as pipeline.DedupResult.release)
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist()

    def _ckpt(df: DataFrame) -> tuple[DataFrame, set[int]]:
        before = _ids()
        out = df.localCheckpoint(eager=True)
        return out, _ids() - before

    prev, prev_ids = _ckpt(_initial_symbols(word_frequencies(docs, text_col)))
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        top = (
            _pair_counts(prev)
            .orderBy(F.desc("total"), F.asc("left"), F.asc("right"))
            .limit(max(1, int(batch_top)))
            .collect()
        )
        rounds += 1
        if strict_parity:
            batch, done = _parity_safe_batch(
                top, n_merges - len(merges), min_frequency)
        else:
            batch, done = _disjoint_batch(
                top, n_merges - len(merges), min_frequency)
        if done:
            break
        merges.extend(batch)
        if len(merges) >= n_merges:
            break
        nxt, nxt_ids = _ckpt(prev.select(
            _merge_pairs_udf(batch)(F.col("syms")).alias("syms"),
            "count",
        ))
        _release(prev_ids)
        prev, prev_ids = nxt, nxt_ids
    _release(prev_ids)
    train_bpe.last_rounds = rounds
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair —
    exactly reproduces applying the training merges in order."""
    syms = [c for c in word] + [_EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge ALL occurrences of the chosen pair (training semantics)
        left, right = syms[best_i], syms[best_i + 1]
        res, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, bpe_tokens array<string>, n_bpe_tokens). Map-only:
    the merge table rides the closure (driver-sized), words are encoded
    once per distinct spelling per executor via the memo cache."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(text: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in text:
            toks: list[str] = []
            for w in (t or "").split():
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col).alias("doc_id"),
        encode(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long"))
