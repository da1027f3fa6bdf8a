"""BPE vocabulary induction — learning a byte-pair-encoding tokenizer
from the corpus (beyond the reference; public method: Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", the
GPT-2/tiktoken family's training step).

Scale shape — the insight that makes corpus-scale BPE cheap: after ONE
corpus pass builds the (word, freq) table, every training iteration
runs on the DISTINCT-WORD table (≈100k rows for any natural-language
corpus, regardless of whether the corpus is 1 GB or 100 TB).  Each
iteration is: explode adjacent symbol pairs weighted by word freq →
one groupBy → argmax (count desc, then lexicographic — deterministic)
→ a ONE-ROW collect (the merge rule; k merges = k scalars through the
driver, the same budget as IVF centroids) → apply the merge with a
JVM-side array fold (``aggregate`` over the symbol array: merge
greedy-left, no UDF).  The fold's greedy-left semantics equal
sequential non-overlapping string replace, which is how the oracle
states one merge in SQL.

Encoding new text with a learned merge list chains the same fold once
per rank for small vocabularies (oracle-able), and drops to one
Arrow-batched trie pass (``mapInPandas``) when ranks are many — the
production path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load, spread

END = "</w>"


def word_freqs(docs: DataFrame) -> DataFrame:
    """One corpus pass → (word, freq): the table every BPE iteration
    works on."""
    return (
        spread(docs)
        .select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def init_symbols(words: DataFrame) -> DataFrame:
    """word → its character symbols + the end-of-word marker."""
    return words.select(
        "word", "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )


def pair_counts(symtab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the weighted word table."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
        F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        symtab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def top_pair(symtab: DataFrame) -> tuple[str, str, int] | None:
    """The next merge rule: highest count, ties by (a, b) ascending —
    deterministic across cluster sizes."""
    rows = (
        pair_counts(symtab)
        .orderBy(F.desc("n"), "a", "b")
        .limit(1)
        .collect()
    )
    if not rows:
        return None
    return (rows[0]["a"], rows[0]["b"], rows[0]["n"])


def _merge_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy-left merge of adjacent (a, b) → a||b inside a symbol
    array, as a JVM fold: acc ends with `a` and the next symbol is `b`
    ⇒ replace the tail with the merged symbol."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def apply_merge(symtab: DataFrame, a: str, b: str) -> DataFrame:
    return symtab.withColumn("syms", _merge_expr(F.col("syms"), a, b))


def learn_bpe(docs: DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """The training loop: ``n_merges`` iterations over the distinct-word
    table.  The symbol table is cached per iteration (it is vocabulary-
    sized, not corpus-sized) so iteration i never recomputes i-1 plans."""
    symtab = init_symbols(word_freqs(docs)).persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            t = top_pair(symtab)
            if t is None or t[2] < 2:
                break
            a, b, _n = t
            nxt = apply_merge(symtab, a, b).persist()
            symtab.unpersist()
            symtab = nxt
            merges.append((a, b))
    finally:
        symtab.unpersist()
    return merges


def encode_words(words: DataFrame, merges: list[tuple[str, str]],
                 expr_max: int = 48) -> DataFrame:
    """(word, ...) → + ``tokens`` array under the learned merges.
    ≤ ``expr_max`` ranks chain the fold expression (whole-stage
    codegen); above that, one Arrow pass applies all ranks per batch."""
    if len(merges) <= expr_max:
        col = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
        for a, b in merges:
            col = _merge_expr(col, a, b)
        return words.withColumn("tokens", col)

    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches):
        for pdf in batches:
            toks = []
            for w in pdf["word"]:
                syms = list(w) + [END]
                while len(syms) > 1:
                    best, bi = None, -1
                    for i in range(len(syms) - 1):
                        r = ranks.get((syms[i], syms[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, bi = r, i
                    if best is None:
                        break
                    syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
                toks.append(syms)
            pdf = pdf.copy()
            pdf["tokens"] = toks
            yield pdf

    import pyspark.sql.types as T

    schema = T.StructType(
        list(words.schema.fields) + [T.StructField("tokens", T.ArrayType(T.StringType()))]
    )
    return words.mapInPandas(run, schema=schema)


# ------------------------------------------------------------------ check


@check(
    "bpe_first_merge",
    oracle=f"""
        WITH words AS (
            SELECT word, COUNT(*) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' GROUP BY word
        ),
        syms AS (
            SELECT word, freq,
                   ' ' || array_to_string(
                       list_append(string_split_regex(word, ''), '{END}'), ' ')
                   || ' ' AS s
            FROM words
        ),
        pairs AS (
            SELECT p[1] AS a, p[2] AS b, SUM(freq) AS n
            FROM (
                SELECT freq,
                       unnest(list_zip(
                           list_slice(sy, 1, len(sy) - 1),
                           list_slice(sy, 2, len(sy)))) AS p
                FROM (SELECT freq,
                             list_append(string_split_regex(word, ''), '{END}') AS sy
                      FROM words)
            ) t(freq, p)
            GROUP BY p[1], p[2]
        ),
        best AS (
            SELECT a, b FROM pairs ORDER BY n DESC, a, b LIMIT 1
        )
        SELECT w.word, CAST(w.freq AS BIGINT) AS freq,
               trim(replace(s.s, ' ' || best.a || ' ' || best.b || ' ',
                            ' ' || best.a || best.b || ' ')) AS merged
        FROM words w JOIN syms s USING (word) CROSS JOIN best
        ORDER BY w.word""",
)
def q_bpe_first_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full BPE training iteration, value-checked: the weighted
    pair argmax (deterministic tiebreak) and the greedy-left merge fold
    — stated in SQL as sequential non-overlapping string replace, which
    the fold provably equals.  Later iterations repeat this exact
    algebra (pytest covers the loop)."""
    docs = load(spark, sf_dir, "documents")
    symtab = init_symbols(word_freqs(docs))
    a, b, _ = top_pair(symtab)
    return (
        apply_merge(symtab, a, b)
        .select(
            "word", "freq",
            F.array_join("syms", " ").alias("merged"),
        )
        .orderBy("word")
    )
