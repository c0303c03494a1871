"""Worked end-to-end LLM training-data curation pipeline.

One function composes the operator families this engine provides into the
standard public curation recipe (the C4/CCNet/RefinedWeb shape):

1. heuristic pre-filters  — token counts / quality score / language ID
   (pure column expressions, zero shuffle)
2. model-based filter     — linear classifier scored via the zero-shuffle
   map-literal path (weights from ``train_quality_classifier`` or a dict)
3. exact dedup            — digest group-by, keep-first
4. fuzzy dedup            — MinHash-LSH with exact-Jaccard verification;
   survivors keep the lowest id per verified duplicate pair
5. decontamination        — drop training docs containing a benchmark doc
6. mixture + split        — per-source target shares, content-stable hash
   train/val split
7. packing                — token-budget sequence packing for the trainer

Every stage is lazy (one DataFrame in, one out); the composition is a
single Spark plan until the final write.  At 100 TB the only shuffles are
the dedup group-bys/joins and the packing range partition — the filters
ride along inside the scans.

This is a demo of COMPOSITION — each stage's operator has its own
oracle-checked suite query; run the pipeline end-to-end on the testdata
with ``python -m pdtable_spark.demo.curation_pipeline``.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdtable_spark.operators import dedup, sampling, text


def curate(
    docs: DataFrame,
    *,
    clf_weights: Optional[Dict[str, float]] = None,
    clf_bias: float = 0.0,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    languages=("en",),
    jaccard_threshold: float = 0.8,
    bench_pred: Optional[Column] = None,
    mixture: Optional[Dict[str, float]] = None,
    train_pct: int = 95,
    pack_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run the full curation recipe; returns packed training sequences
    with (split, pack_id) columns — the frame a trainer shards and reads."""
    t = F.col(text_col)

    # 1. heuristic pre-filters (scan-resident; no shuffle)
    d = (
        docs.withColumn("__n_tok", text.token_count(t))
        .withColumn("__quality", text.quality_score(t))
        .withColumn("__lang", text.lang_id(t))
        .filter(
            (F.col("__n_tok") >= min_tokens)
            & (F.col("__n_tok") <= max_tokens)
            & (F.col("__quality") >= min_quality)
            & F.col("__lang").isin(*languages)
        )
    )

    # 2. model-based filter (zero-shuffle map-literal scoring)
    if clf_weights:
        d = text.classifier_score(d, clf_weights, bias=clf_bias,
                                  text_col=text_col, id_col=id_col)
        d = d.filter(F.col("clf_score") >= 0).drop("clf_score", "clf_prob")

    # 3. exact dedup (digest-only shuffle)
    d = dedup.exact_dedup_keep_first(d, text_col=text_col, id_col=id_col)

    # 4. fuzzy dedup: drop the higher id of every verified near-dup pair
    pairs = dedup.minhash_dedup(
        d, text_col=text_col, id_col=id_col, jaccard_threshold=jaccard_threshold
    )
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    d = d.join(drops, id_col, "left_anti")

    # 5. decontamination against a benchmark subset
    if bench_pred is not None:
        contaminated = dedup.contamination_report(
            docs, bench_pred, min_containment=0.8
        ).select(F.col("train_id").alias(id_col)).distinct()
        d = d.join(contaminated, id_col, "left_anti").filter(~bench_pred)

    # 6. mixture materialization + leakage-free-ish split (hash test)
    if mixture:
        d = sampling.apply_mixture(d, mixture, id_col=id_col)
    d = text.hash_split(d, train_pct=train_pct, id_col=id_col)

    # 7. token-budget packing per split (contiguous ~pack_tokens packs)
    d = d.withColumn("__n_tok", text.token_count(t))
    return text.pack_budget(
        d,
        capacity=pack_tokens,
        n_tokens_col="__n_tok",
        order_cols=(id_col,),
        partition_cols=("split",),
    )


def main():  # pragma: no cover - smoke entry
    from pdtable_spark.session import get_session

    spark = get_session("curation-demo", master="local[4]", shuffle_partitions=4)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = curate(
        docs,
        clf_weights={"the": 1 / 64, "and": 1 / 64},
        bench_pred=F.col("source") == "src0",
        mixture={f"src{i}": 1 / 19 for i in range(1, 20)},
    )
    out.groupBy("split").agg(
        F.countDistinct("pack_id").alias("n_packs"), F.count(F.lit(1)).alias("n_docs")
    ).show()


if __name__ == "__main__":
    main()
