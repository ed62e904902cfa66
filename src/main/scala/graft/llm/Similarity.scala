package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; queries broadcast, corpus
  * streamed — linear in |corpus| × |queries|, no corpus shuffle).
  * Scale path: IVF-style coarse quantization — assign corpus vectors to
  * the nearest of `nCells` deterministic centroids once, search only the
  * query's `nProbe` nearest cells. At 100 TB the corpus is
  * hash-partitioned by cell id, so a query touches nProbe/nCells of the
  * data.
  */
object Similarity {

  /** Cosine similarity between two array<double> columns — pure Catalyst
    * higher-order functions (zip_with/aggregate), codegen-friendly. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (s, v) => s + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force top-k: for each query vector, the k most cosine-
    * similar corpus vectors (self-match excluded). Queries are broadcast;
    * ranking is a window partitioned by query id (k small, queries few —
    * the per-query partitions are the only shuffle). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
                          asDouble(col(vecCol)).as("cvec"))
    val q = queries.select(col(idCol).as("query_id"),
                           asDouble(col(vecCol)).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
              cosine(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("rank"),
              round(col("cos"), 4).as("cos"))
  }

  /** Deterministic pseudo-random unit-ish centroid for IVF cells:
    * Rademacher ±1 per (cell, dim) from xxhash64. */
  private def centroid(cell: Int, dims: Column): Column =
    transform(sequence(lit(0), dims - 1), d =>
      when(xxhash64(lit(cell * 7919), d) % 2 === 0, lit(1.0))
        .otherwise(lit(-1.0)))

  /** IVF cell assignment: nearest centroid by dot product. */
  def ivfCell(vec: Column, nCells: Int): Column = {
    val v = asDouble(vec)
    val dots = (0 until nCells).map { c =>
      struct(aggregate(zip_with(v, centroid(c, size(vec)), (x, w) => x * w),
                       lit(0.0), (s, x) => s + x).as("dot"),
             lit(c).as("cell"))
    }
    array_max(array(dots: _*)).getField("cell")
  }

  /** IVF approximate top-k: corpus pre-bucketed by cell; each query
    * searches its own cell only (nProbe=1 variant). Approximate — recall
    * depends on cell granularity; exactness is NOT claimed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, nCells: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
                          asDouble(col(vecCol)).as("cvec"),
                          ivfCell(col(vecCol), nCells).as("cell"))
    val q = queries.select(col(idCol).as("query_id"),
                           asDouble(col(vecCol)).as("qvec"),
                           ivfCell(col(vecCol), nCells).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
              cosine(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("rank"),
              round(col("cos"), 4).as("cos"))
  }
}
