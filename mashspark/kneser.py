"""Interpolated Kneser-Ney bigram language model — the KenLM-family
smoothing (Kneser & Ney 1995; Chen & Goodman 1999) behind CCNet's
perplexity filter, trained and applied distributed. Completes the LM
quality-signal ladder: add-one unigram/bigram (`lm.py`) → Stupid
Backoff (`backoff.py`) → Kneser-Ney (here, the principled smoother).

    P(w|u) = max(c(u,w) - D, 0)/c(u) + D * N1+(u.)/c(u) * Pcont(w)
    Pcont(w) = (N1+(.w) + 1) / (B + V)        # +1/+V = the OOV floor
    D = n1 / (n1 + 2*n2)                      # Ney et al. count-of-counts

where c(u,w) are bigram counts, c(u) context totals, N1+(u.) distinct
continuations of context u, N1+(.w) distinct left-contexts of w, B
total distinct bigrams, V vocabulary size, and n1/n2 the number of
bigrams seen exactly once/twice. An unseen context u backs off to
Pcont(w) alone. The add-one on Pcont is the one departure from
textbook KN: it gives OOV words a proper probability floor instead of
log(0), and is documented rather than silently assumed.

Scale shape (the whole point):

- TRAIN is one corpus pass: explode bigram pairs -> ONE map-side-
  partial groupBy to the (u, w, c) table. Every derived table —
  context totals, continuation counts, left-context counts, the
  count-of-counts for D — is an aggregate over that vocabulary²-bounded
  (in practice Zipf-tiny) bigram relation, NEVER over the corpus.
- SCORE pre-aggregates per-doc bigram multiplicities ((doc, u, w) —
  map-side partial, bounded by each doc's distinct bigrams), then
  takes three left equi-joins against the model tables (broadcast when
  the model fits an executor, the common case; shuffle+AQE-skew
  otherwise) and one per-doc rollup. No per-row Python anywhere.

Integer surfaces (n_bigrams, n_hit_bigrams, n_known_ctx, sum_c_uw) are
exact and order-independent — the oracle-checked contract; the float
``logprob_per_bigram`` is pytest-verified against an independent
pure-Python KN implementation (float sums are order-dependent across
engines, same policy as `lm.score_documents`).

Reference scope note: the reference engine (marbl/Mash) has no LM;
this operator comes from the task brief's training-data axis (CCNet,
Wenzek et al. 2019, filters Common Crawl on KenLM perplexity).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text_col):
    return F.filter(F.split(F.lower(text_col), " "), lambda x: x != "")


def _bigram_pairs(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """One row per bigram occurrence: (*keep, u, w). JVM array
    transform over the whitespace split — map-only, no Python."""
    ws = _words(F.col(text_col))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - 2),
            lambda i: F.struct(
                F.element_at(ws, (i + 1).cast("int")).alias("u"),
                F.element_at(ws, (i + 2).cast("int")).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,w:string>>"))
    return df.select(*keep, F.explode(pairs).alias("_p")).select(
        *keep, F.col("_p.u").alias("u"), F.col("_p.w").alias("w")
    )


@dataclass
class KNModel:
    """Trained model: three tokenizer-sized DataFrames + the scalars.

    bigrams:  (u, w, c_uw)
    contexts: (u, c_u, n_cont)   — total count and N1+(u.) per context
    words:    (w, n_ctx)         — N1+(.w) per word
    """

    bigrams: DataFrame
    contexts: DataFrame
    words: DataFrame
    discount: float
    b_total: int   # distinct bigrams B
    v_size: int    # vocabulary size V


def train_kn(docs: DataFrame, text_col: str = "text") -> KNModel:
    """ONE pass over the corpus to the bigram count table; everything
    else is derived from that (Zipf-small) relation. The scalar
    aggregates (D's count-of-counts, B, V) collect exactly one row."""
    bigrams = (
        _bigram_pairs(docs.select(text_col), text_col, [])
        .groupBy("u", "w")
        .agg(F.count("*").alias("c_uw"))
    )
    contexts = bigrams.groupBy("u").agg(
        F.sum("c_uw").alias("c_u"), F.count("*").alias("n_cont")
    )
    words = bigrams.groupBy("w").agg(F.count("*").alias("n_ctx"))
    stats = bigrams.agg(
        F.count("*").alias("b"),
        F.sum(F.when(F.col("c_uw") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("c_uw") == 2, 1).otherwise(0)).alias("n2"),
    ).collect()[0]
    # V counts every token (a word only ever seen as the last token of
    # its docs still belongs to the vocabulary): distinct over u UNION w,
    # still a bigram-table-sized job
    v_size = (
        bigrams.select(F.col("u").alias("t"))
        .unionByName(bigrams.select(F.col("w").alias("t")))
        .distinct()
        .count()
    )
    n1, n2 = int(stats.n1 or 0), int(stats.n2 or 0)
    discount = n1 / (n1 + 2.0 * n2) if (n1 + 2 * n2) > 0 else 0.5
    return KNModel(bigrams, contexts, words, discount,
                   int(stats.b or 0), v_size)


def score_kn(
    docs: DataFrame,
    model: KNModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc KN log-likelihood. Returns (id, n_bigrams,
    n_hit_bigrams, n_known_ctx, sum_c_uw, logprob_per_bigram); docs
    with fewer than 2 tokens emit no bigrams and are absent (callers
    left-join if they need all-docs output). Higher logprob = closer
    to the training register."""
    bi = model.bigrams
    ctx = model.contexts
    wd = model.words
    if broadcast_model:
        bi, ctx, wd = F.broadcast(bi), F.broadcast(ctx), F.broadcast(wd)
    d = float(model.discount)
    denom = float(model.b_total + model.v_size)
    per = (
        _bigram_pairs(docs.select(id_col, text_col), text_col, [id_col])
        .groupBy(id_col, "u", "w")
        .agg(F.count("*").alias("occ"))
        .join(bi, ["u", "w"], "left")
        .join(ctx, ["u"], "left")
        .join(wd, ["w"], "left")
    )
    pcont = (F.coalesce(F.col("n_ctx"), F.lit(0)) + 1) / denom
    lam = F.lit(d) * F.col("n_cont") / F.col("c_u")
    seen = (
        F.greatest(F.coalesce(F.col("c_uw"), F.lit(0.0)) - d, F.lit(0.0))
        / F.col("c_u")
        + lam * pcont
    )
    p = F.when(F.col("c_u").isNotNull(), seen).otherwise(pcont)
    return per.groupBy(id_col).agg(
        F.sum("occ").alias("n_bigrams"),
        F.sum(F.when(F.col("c_uw").isNotNull(), F.col("occ"))
              .otherwise(0)).alias("n_hit_bigrams"),
        F.sum(F.when(F.col("c_u").isNotNull(), F.col("occ"))
              .otherwise(0)).alias("n_known_ctx"),
        F.sum(F.coalesce(F.col("c_uw"), F.lit(0)) * F.col("occ"))
        .alias("sum_c_uw"),
        (F.sum(F.log(p) * F.col("occ")) / F.sum("occ"))
        .alias("logprob_per_bigram"),
    )
