"""Trained subword tokenization: classic whitespace-pretokenized BPE
(Sennrich et al. 2016) as a train/apply pair — the tokenizer-artifact
stage of a training-data pipeline (the regex spelling in
:mod:`pdtable_spark.operators.text` counts tokens; this LEARNS the
vocabulary and measures real fertility under it).

100 TB design:

- **Training needs only the word-frequency table** — for whitespace-
  pretokenized BPE the (word, count) table is a sufficient statistic, so
  the corpus-sized work is ONE map-side-combinable word count (shuffle is
  word-domain-sized, the :func:`~pdtable_spark.operators.text.top_vocab`
  shape), truncated to the ``max_words`` head as a bounded driver
  artifact (the IVF-centroid collect policy; the dropped tail are
  hapax-like words that cannot win a merge vote anyway at any realistic
  ``max_words``).  The merge loop itself is driver-side over that
  bounded table — O(max_words · num_merges), seconds, no cluster.
- **Encoding is scan-local** — merge ranks broadcast inside an
  Arrow-batched ``mapInPandas`` closure, with a per-batch word→length
  memo (natural-language word reuse makes the amortized per-token cost
  ~dict-lookup).  No shuffle, no UDF-per-row.

Determinism: merge selection breaks frequency ties lexicographically on
the pair, so the learned merges — and every downstream fertility number
— are a pure function of the corpus.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdtable_spark.operators.text import tokens

#: End-of-word marker (Sennrich's convention): merges cannot cross word
#: boundaries and a word-final subword is distinct from a word-internal one.
EOW = "</w>"


def bpe_train(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus's word-frequency
    table (bounded to the ``max_words`` most frequent words, count-desc
    word-asc deterministic boundary).  Returns the ordered merge list —
    the tokenizer artifact; persist it like any model file and feed it
    to :func:`bpe_encode` / :func:`bpe_fertility`.
    """
    if num_merges < 0:
        raise ValueError("bpe_train: num_merges must be >= 0")
    rows = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    vocab = {tuple(list(r["w"]) + [EOW]): r["c"] for r in rows}
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt: dict = {}
        for syms, c in vocab.items():
            s = list(syms)
            i = 0
            while i < len(s) - 1:
                if (s[i], s[i + 1]) == best:
                    s[i : i + 2] = [s[i] + s[i + 1]]
                else:
                    i += 1
            nxt[tuple(s)] = c  # words stay distinct under merging
        vocab = nxt
    return merges


def bpe_apply_word(word: str, ranks: dict) -> List[str]:
    """Greedy lowest-rank-first BPE segmentation of one word (the
    standard apply): repeatedly merge the adjacent pair with the best
    (lowest) learned rank until none applies."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    return_tokens: bool = False,
    passthrough: Tuple[str, ...] = (),
) -> DataFrame:
    """Segment every document under a trained merge list: (id, n_words,
    n_tokens[, bpe_tokens]) — ``n_tokens`` is the real subword count and
    ``n_tokens / n_words`` the tokenizer's fertility on that doc (the
    budget number :func:`bpe_fertility` aggregates; high-fertility docs
    are exactly the out-of-domain text the OOV/coverage signals flag).

    NULL text is zero words/tokens; whitespace splitting mirrors
    :func:`~pdtable_spark.operators.text.tokens` (trim, split ``\\s+``;
    an empty text is one empty word segmenting to just the end-of-word
    marker — pinned by the parity test).  ``return_tokens=True`` adds the
    per-doc subword array (corpus-sized output — keep it off for
    stats-only passes so the scan stays narrow).
    """
    import re as _re

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    passthrough = tuple(c for c in passthrough if c not in (id_col, text_col))
    src = df.select(F.col(id_col).alias("__id"), text_col, *passthrough)
    fields = [
        # the id field mirrors the INPUT id column's type — hardcoding
        # LongType broke string doc ids at Arrow conversion (ADVICE r8)
        T.StructField(
            "__id", src.schema["__id"].dataType, src.schema["__id"].nullable
        ),
        *[src.schema[c] for c in passthrough],
        T.StructField("n_words", T.LongType(), True),
        T.StructField("n_tokens", T.LongType(), True),
    ]
    if return_tokens:
        fields.append(T.StructField("bpe_tokens", T.ArrayType(T.StringType()), True))
    schema = T.StructType(fields)

    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        memo: dict = {}

        def segs(word: str) -> List[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = bpe_apply_word(word, ranks)
            return got

        for pdf in it:
            out = {"__id": pdf["__id"]}
            for c in passthrough:
                out[c] = pdf[c]
            out["n_words"], out["n_tokens"] = [], []
            if return_tokens:
                out["bpe_tokens"] = []
            for text in pdf[text_col]:
                if text is None:
                    out["n_words"].append(0)
                    out["n_tokens"].append(0)
                    if return_tokens:
                        out["bpe_tokens"].append([])
                    continue
                words = _re.split(r"\s+", text.strip())
                toks: List[str] = []
                n_tok = 0
                for w in words:
                    s = segs(w)
                    n_tok += len(s)
                    if return_tokens:
                        toks.extend(s)
                out["n_words"].append(len(words))
                out["n_tokens"].append(n_tok)
                if return_tokens:
                    out["bpe_tokens"].append(toks)
            yield pd.DataFrame(out)

    return src.mapInPandas(batches, schema=schema).withColumnRenamed("__id", id_col)


def bpe_fertility(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """Per-group tokenizer fertility under a trained merge list:
    (by, n_docs, n_words, n_tokens, fertility = tokens/word) — the
    domain-shift dashboard for a FROZEN tokenizer (rising fertility on a
    new source means the vocabulary no longer fits the data; compose
    with :func:`~pdtable_spark.operators.text.vocab_coverage`).  One
    encode scan + one map-side-combinable aggregate — the group column
    rides THROUGH the encode batches (no doc-keyed join back)."""
    enc = bpe_encode(df, merges, text_col, id_col, passthrough=(by,))
    n_w, n_t = F.sum("n_words").cast("long"), F.sum("n_tokens").cast("long")
    return (
        enc.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_w.alias("n_words"),
            n_t.alias("n_tokens"),
            F.when(n_w > 0, n_t.cast("double") / n_w.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("fertility"),
        )
    )
