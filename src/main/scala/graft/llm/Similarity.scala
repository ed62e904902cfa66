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

  /** Deterministic Rademacher (±1) hyperplanes from xxhash64-style
    * mixing — row-independent, so callers embed them as literals. */
  def rademacherPlanes(planes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dims).map { d =>
        val h = scala.util.hashing.MurmurHash3
          .productHash((p, d))
        if ((h & 1) == 0) 1.0 else -1.0
      }
    }

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

  /** IVF cell assignment: the `nProbe` nearest coarse centroids by dot
    * product. `vec` must be a staged array<double> attribute; centroids
    * are deterministic Rademacher literals. Returns array<int>, nearest
    * first. */
  def ivfCells(vec: Column, nCells: Int, dims: Int,
               nProbe: Int): Column = {
    val cents = rademacherPlanes(nCells, dims)
    val dots = cents.zipWithIndex.map { case (c, i) =>
      struct(aggregate(zip_with(vec, typedlit(c), (x, w) => x * w),
                       lit(0.0), (s, x) => s + x).as("dot"),
             lit(i).as("cell"))
    }
    transform(
      slice(reverse(array_sort(array(dots: _*))), lit(1), lit(nProbe)),
      _.getField("cell"))
  }

  /** Single nearest cell (corpus assignment). */
  def ivfCell(vec: Column, nCells: Int, dims: Int): Column =
    ivfCells(vec, nCells, dims, 1).getItem(0)

  /** IVF approximate top-k: corpus pre-bucketed by nearest cell; each
    * query probes its `nProbe` nearest cells. At scale the corpus is
    * hash-partitioned by cell, so a query touches nProbe/nCells of the
    * data. Approximate — recall grows with nProbe; exactness is NOT
    * claimed. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, nCells: Int = 8,
              nProbe: Int = 2): DataFrame = {
    val dims = corpus.select(size(col(vecCol))).first().getInt(0)
    val c = corpus
      .select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cell", ivfCell(col("cvec"), nCells, dims))
    val q = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qvec"))
      .withColumn("cell",
        explode(ivfCells(col("qvec"), nCells, dims, nProbe)))
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
