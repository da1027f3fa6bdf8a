"""N-gram language-model quality scoring — the CCNet-style perplexity
filter of a training-data pipeline (beyond the reference; public
method: Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", and the Gopher/C4 quality-filter
families).

Two passes, both relational:

  1. TRAIN — token counts over a training slice → add-one-smoothed
     unigram log-probabilities.  One explode + one groupBy (map-side
     partial aggregation); the corpus-level totals (N tokens, V vocab)
     ride along via a 1-row cross join, never a driver collect.
  2. SCORE — every document's mean negative log-probability
     (cross-entropy, nats).  Tokens join the LM table; unseen tokens
     take the OOV probability 1/(N+V+1).

Scale design — the vocabulary join is Zipf-skewed (the head tokens hit
millions of rows while the tail is cold), the classic skew-join case:
``unigram_logprob`` splits the LM at the top-``head_k`` tokens by
count, BROADCASTS the hot head, and shuffle-joins only the cold tail —
each side a clean equi-join, no salting needed because the broadcast
removes the hot keys from the shuffle entirely.  At 100 TB the head
easily fits any executor (it is ``head_k`` rows) while the tail
shuffle sees near-uniform keys.

Numeric parity: per-token ln() agrees across engines to ~1 ulp; sums
accumulate as DECIMAL(38, 15) so partition order cannot move the 9-dp
rounded result.  Perplexity = exp(H) is exposed in the API but kept
OUT of the oracle-checked projection: exp amplifies a 1e-13 H
difference to ~1e-9 at H≈8, right at the comparator's resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load, spread


def explode_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, tok), whitespace tokens (the corpus is
    single-space separated; same convention as token_counts)."""
    return docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )


def train_unigram(train_docs: DataFrame) -> DataFrame:
    """→ (tok, n, logp) with add-one smoothing: p = (n+1)/(N+V+1).
    The +1 in the denominator funds the single OOV pseudo-token."""
    counts = explode_tokens(spread(train_docs)).groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("v_total")
    )
    denom = F.col("n_total") + F.col("v_total") + 1.0
    return counts.crossJoin(F.broadcast(totals)).select(
        "tok", "n",
        F.log((F.col("n") + 1.0) / denom).alias("logp"),
        F.log(1.0 / denom).alias("oov_logp"),
    )


def unigram_logprob(toks: DataFrame, lm: DataFrame, head_k: int = 1024) -> DataFrame:
    """(doc_id, tok) ⟕ LM with the skew split: broadcast the
    ``head_k`` most frequent tokens, shuffle-join the tail."""
    head = F.broadcast(lm.orderBy(F.desc("n"), "tok").limit(head_k))
    hit = toks.join(head, "tok", "left").select(
        "doc_id", "tok", "logp", "oov_logp"
    )
    resolved = hit.filter(F.col("logp").isNotNull())
    tail = hit.filter(F.col("logp").isNull()).drop("logp", "oov_logp").join(
        lm, "tok", "left"
    ).select("doc_id", "tok", "logp", "oov_logp")
    return resolved.unionByName(tail)


def doc_cross_entropy(docs: DataFrame, lm: DataFrame, head_k: int = 1024) -> DataFrame:
    """→ (doc_id, n_tokens, n_oov, cross_entropy, perplexity); the
    entropy is mean −ln p per token in nats, OOV tokens scored at the
    smoothing floor."""
    # every scored doc needs the corpus totals even if all tokens are
    # OOV; carry oov_logp from any LM row via a 1-row broadcast
    oov = F.broadcast(lm.agg(F.min("oov_logp").alias("oov_logp_all")))
    scored = unigram_logprob(explode_tokens(spread(docs)), lm, head_k)
    per_doc = scored.crossJoin(oov).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("logp").isNull(), 1).otherwise(0)).alias("n_oov"),
        (-F.sum(
            F.coalesce(F.col("logp"), F.col("oov_logp_all")).cast("decimal(38,15)")
        ).cast("double")).alias("nll"),
    )
    h = F.col("nll") / F.col("n_tokens")
    return per_doc.select(
        "doc_id", "n_tokens", "n_oov",
        h.alias("cross_entropy"),
        F.exp(h).alias("perplexity"),
    )


# ------------------------------------------------------------------ check

_LM_ORACLE = """
    WITH train_toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 2 = 0
    ),
    lm AS (
        SELECT tok, COUNT(*) AS n FROM train_toks GROUP BY tok
    ),
    totals AS (
        SELECT SUM(n) AS n_total, COUNT(*) AS v_total FROM lm
    ),
    probs AS (
        SELECT tok, ln((n + 1.0) / (n_total + v_total + 1.0)) AS logp FROM lm, totals
    ),
    score_toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    scored AS (
        SELECT s.doc_id,
               COALESCE(p.logp, (SELECT ln(1.0 / (n_total + v_total + 1.0)) FROM totals)) AS lp,
               CASE WHEN p.logp IS NULL THEN 1 ELSE 0 END AS oov
        FROM score_toks s LEFT JOIN probs p ON s.tok = p.tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           ROUND(CAST(-SUM(CAST(lp AS DECIMAL(38,15))) AS DOUBLE) / COUNT(*), 9)
               AS cross_entropy
    FROM scored GROUP BY doc_id ORDER BY doc_id"""


@check("lm_doc_perplexity", oracle=_LM_ORACLE)
def q_lm_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the smoothed unigram LM on the even-doc_id half of the
    corpus, score EVERY document (odd docs exercise real OOV tokens) —
    the quality-filter signal a CCNet-style pipeline thresholds on."""
    docs = load(spark, sf_dir, "documents")
    lm = train_unigram(docs.filter(F.col("doc_id") % 2 == 0))
    return (
        doc_cross_entropy(docs, lm)
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.round("cross_entropy", 9).alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )
