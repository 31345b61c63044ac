"""Reproduce the LSH-recall measurements behind the round-4 oracle upgrades.

The catalog queries ``dedup_minhash_pairs`` and ``embedding_near_dups``
carry full exact-pair SQL oracles (see their docstrings in
``interlinked_spark/catalog.py``); that is only sound because LSH
banding recall is 100% at the shipped parameters on the test corpora.
This script re-measures that claim:

* MinHash (32 hashes, 16 bands of 2 rows) vs the exact trigram-Jaccard
  pair set at threshold 0.2 — the hash family is deterministic
  (blake2b + splitmix64, no Spark seeds), so a re-run reproduces the
  driver's exact output.
* Random-projection LSH (12 hash tables) vs the exact brute-force
  all-pairs cosine set at threshold 0.3 — projections are seeded, so
  deterministic across runs.

Run with ``SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01`` (driver
correctness SF) or sf0.001; both were measured at 100% recall in
round 4.  Expected output: ``missed=0`` on both lines.
"""
import os

import pyspark.sql.functions as F

from interlinked_spark.llm.dedup import minhash_near_dup_pairs, ngram_jaccard_pairs
from interlinked_spark.llm.similarity import cosine_similarity, embedding_near_dup_pairs
from interlinked_spark.session import get_spark


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("verify-lsh-recall")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    exact = {
        (r.left_id, r.right_id)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
    }
    mh = {
        (r.left_id, r.right_id)
        for r in minhash_near_dup_pairs(
            docs, jaccard_threshold=0.2, num_hashes=32, bands=16
        ).collect()
    }
    print(
        f"minhash bands=16: exact={len(exact)} mh={len(mh)} "
        f"missed={len(exact - mh)} extra={len(mh - exact)}"
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("left_id"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("right_id"), F.col("embedding").alias("vb"))
    exact_e = {
        (r.left_id, r.right_id)
        for r in a.join(b, F.col("left_id") < F.col("right_id"))
        .withColumn("cos", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= 0.3)
        .select("left_id", "right_id")
        .collect()
    }
    lsh = {
        (r.left_id, r.right_id)
        for r in embedding_near_dup_pairs(
            emb, cosine_threshold=0.3, num_hash_tables=12
        ).collect()
    }
    print(
        f"emb nht=12: exact={len(exact_e)} lsh={len(lsh)} "
        f"missed={len(exact_e - lsh)} extra={len(lsh - exact_e)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
