package graft

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.agg.Aggregators
import graft.sql.GraftFunctions

/** SQL-surface registration of the native expressions/aggregates
  * (graft.sql.GraftFunctions / GraftExtensions): every SQL-callable form
  * must be bit-identical to its Column-API twin, and the
  * `spark.sql.extensions` injection path must resolve the functions in
  * a freshly-built session. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = { GraftFunctions.register(TestSpark.spark); TestSpark.spark }

  private def fixture(): Unit = {
    import spark.implicits._
    Seq(
      ("a", "the quick brown fox jumps over the lazy dog end"),
      ("a", "pack my box with five dozen liquor jugs right now"),
      ("b", "the quick brown fox jumps over the lazy dog end"),
      ("b", "")
    ).toDF("grp", "txt").createOrReplaceTempView("ext_docs")
  }

  test("graft_simhash64 via SQL equals the Column-API SimHash64") {
    fixture()
    val viaSql = spark.sql(
      "SELECT grp, txt, graft_simhash64(split(txt, ' ')) AS h FROM ext_docs")
    val viaCol = spark.table("ext_docs").withColumn("h",
      GraftBridge.column(graft.functions.SimHash64(
        GraftBridge.expression(split(col("txt"), " ")))))
    assert(viaSql.orderBy("grp", "txt").collect().toSeq ===
      viaCol.orderBy("grp", "txt").collect().toSeq)
  }

  test("graft_nfc via SQL equals the Column-API form and composes " +
       "decomposed sequences") {
    fixture()
    import spark.implicits._
    // explicit escapes: (1) decomposed e + U+0301, (2) U+212B angstrom
    val odd = Seq((1L, "cafe\u0301"), (2L, "\u212b"), (3L, "plain"),
      (4L, null.asInstanceOf[String])).toDF("id", "txt")
    odd.createOrReplaceTempView("ext_nfc")
    val viaSql = spark.sql(
      "SELECT id, graft_nfc(txt) AS n FROM ext_nfc")
    val viaCol = odd.select($"id",
      graft.llm.Dedup.nfcNormalize($"txt").as("n"))
    assert(viaSql.orderBy("id").collect().toSeq ===
      viaCol.orderBy("id").collect().toSeq)
    val got = viaCol.orderBy("id").as[(Long, Option[String])].collect()
    assert(got(0)._2.contains("caf\u00e9")) // composes to precomposed e-acute
    assert(got(1)._2.contains("\u00c5"))    // U+212B -> U+00C5
    assert(got(2)._2.contains("plain"))      // identity fast path
    assert(got(3)._2.isEmpty)                // null propagates
  }

  test("graft_dot via SQL equals the Column-API fastDot and the HOF " +
       "cosine numerator") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (2L, Array(0.0, 0.0), Array(1.0, 1.0)))
      .toDF("id", "a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql("SELECT id, graft_dot(a, b) AS d FROM ext_vecs")
      .orderBy("id").as[(Long, Double)].collect()
    val viaCol = vecs.select($"id",
        graft.llm.Similarity.fastDot($"a", $"b").as("d"))
      .orderBy("id").as[(Long, Double)].collect()
    val viaHof = vecs.select($"id",
        aggregate(zip_with($"a", $"b", (p, q) => p * q), lit(0.0),
          (s, v) => s + v).as("d"))
      .orderBy("id").as[(Long, Double)].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaCol.toSeq == viaHof.toSeq) // bit-identical left fold
    assert(viaCol(0)._2 == 32.0 && viaCol(1)._2 == 0.0)
    // ragged arrays: native and HOF forms agree on NULL (the length
    // contract in DotProduct's scaladoc), no silent prefix dot
    val ragged = Seq((1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
      .toDF("id", "a", "b")
    val nat = ragged.select(
      graft.llm.Similarity.fastDot($"a", $"b")).first()
    val hof = ragged.select(
      aggregate(zip_with($"a", $"b", (p, q) => p * q), lit(0.0),
        (s, v) => s + v)).first()
    assert(nat.isNullAt(0) && hof.isNullAt(0))
  }

  test("graft_minhash_sig via SQL equals the Column-API MinHashSig") {
    fixture()
    val hashes = transform(split(col("txt"), " "), w => xxhash64(w))
    val viaCol = spark.table("ext_docs")
      .select(col("txt"), GraftBridge.column(graft.functions.MinHashSig(
        GraftBridge.expression(hashes), 8)).as("sig"))
    val viaSql = spark.sql(
      """SELECT txt, graft_minhash_sig(
           transform(split(txt, ' '), w -> xxhash64(w)), 8) AS sig
         FROM ext_docs""")
    assert(viaSql.orderBy("txt").collect().toSeq ===
      viaCol.orderBy("txt").collect().toSeq)
  }

  test("minhash_sig matches the composed array_min form on arrays " +
       "WITH null elements (seed-as-candidate parity)") {
    fixture()
    // Spark's xxhash64 skips a null child, leaving the seed itself as
    // that element's hash — a null contributes a candidate minimum,
    // not a skipped element; the kernel must agree bit-for-bit
    val k = 8
    val hs = expr("array(xxhash64('a'), CAST(NULL AS BIGINT), " +
      "xxhash64('b'))")
    val composed = array((0 until k).map(i =>
      array_min(transform(hs, h => xxhash64(lit(i), h)))): _*)
    val rows = spark.range(1)
      .select(GraftBridge.column(graft.functions.MinHashSig(
        GraftBridge.expression(hs), k)).as("native"),
        composed.as("composed"))
      .selectExpr("native = composed AS eq")
      .collect()
    assert(rows.head.getBoolean(0),
      "native kernel must equal the composed form on null elements")
  }

  test("graft_collect_kv via SQL equals the Column-API aggregate") {
    fixture()
    val viaSql = spark.sql(
      """SELECT grp, graft_collect_kv(txt, CAST(length(txt) AS STRING)) AS m
         FROM ext_docs GROUP BY grp""")
    val viaCol = spark.table("ext_docs").groupBy("grp")
      .agg(Aggregators.collectKv(col("txt"),
        length(col("txt")).cast("string")).as("m"))
    assert(viaSql.orderBy("grp").collect().toSeq ===
      viaCol.orderBy("grp").collect().toSeq)
  }

  test("graft_str_max/graft_str_min via SQL equal the Column-API " +
      "raw extrema and the built-in max/min") {
    fixture()
    val viaSql = spark.sql(
      """SELECT grp, graft_str_max(txt) AS mx, graft_str_min(txt) AS mn
         FROM ext_docs GROUP BY grp""")
    val viaCol = spark.table("ext_docs").groupBy("grp")
      .agg(Aggregators.strMaxRaw(col("txt")).as("mx"),
           Aggregators.strMinRaw(col("txt")).as("mn"))
    val builtin = spark.table("ext_docs").groupBy("grp")
      .agg(max(col("txt")).as("mx"), min(col("txt")).as("mn"))
    assert(viaSql.orderBy("grp").collect().toSeq ===
      viaCol.orderBy("grp").collect().toSeq)
    assert(viaSql.orderBy("grp").collect().toSeq ===
      builtin.orderBy("grp").collect().toSeq)
  }

  test("graft_str_max over a numeric column fails at analysis time " +
      "instead of silently returning the lexicographic extremum") {
    fixture()
    // '9' > '10' lexicographically — an implicit numeric→string cast
    // here would be a silently-wrong answer, so the contract is to
    // reject non-string input outright (ExpectsInputTypes, round-7).
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_str_max(length(txt)) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("DATATYPE_MISMATCH") ||
      e.getMessage.toLowerCase.contains("type"))
    // the explicit-cast spelling stays available for callers who do
    // want lexicographic semantics over numbers
    val explicitCast = spark.sql(
      """SELECT graft_str_max(CAST(length(txt) AS STRING)) AS mx
         FROM ext_docs""").collect().head.getString(0)
    assert(explicitCast != null)
    // a bare NULL literal stays accepted and yields NULL, matching the
    // built-in max/min (only genuinely-typed non-strings are rejected)
    val nullRes = spark.sql("SELECT graft_str_max(NULL) FROM ext_docs")
      .collect().head
    assert(nullRes.isNullAt(0))
  }

  test("graft_tr_dimension_metrics via SQL equals the Column-API aggregate") {
    fixture()
    val dims = array(lit("seg"), col("grp"))
    val mets = map(lit("len"), length(col("txt")).cast("string"))
    val viaCol = spark.table("ext_docs").groupBy("grp")
      .agg(Aggregators.trDimensionMetrics(dims, mets).as("j"))
    val viaSql = spark.sql(
      """SELECT grp, graft_tr_dimension_metrics(
           array('seg', grp), map('len', CAST(length(txt) AS STRING))) AS j
         FROM ext_docs GROUP BY grp""")
    assert(viaSql.orderBy("grp").collect().toSeq ===
      viaCol.orderBy("grp").collect().toSeq)
  }

  test("graft_shingles table function yields word 3-grams") {
    val got = spark.sql(
      "SELECT col FROM graft_shingles('a b c d e')")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("a b c", "b c d", "c d e"))
    // short text → the whole normalized text as one shingle
    val short = spark.sql("SELECT col FROM graft_shingles('only two')")
      .collect().map(_.getString(0)).toSeq
    assert(short === Seq("only two"))
    // injection path: fresh session resolves it too
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT col FROM graft_shingles('x y z w')")
      .count() === 2)
  }

  test("bad arity and non-literal k are rejected at analysis") {
    fixture()
    assertThrows[Exception](spark.sql("SELECT graft_simhash64()").collect())
    assertThrows[Exception](spark.sql(
      // k must be a foldable INT literal
      "SELECT graft_minhash_sig(array(1L), length(txt)) FROM ext_docs")
      .collect())
  }

  test("spark.sql.extensions injection registers functions in a new session") {
    // TestSpark sets spark.sql.extensions=graft.sql.GraftExtensions.
    // newSession() builds a FRESH SessionState that register() never
    // touched — the functions can only resolve via the injection path.
    val fresh = spark.newSession()
    val h = fresh.sql(
      "SELECT graft_simhash64(array('a', 'b')) AS h").first().getLong(0)
    val expected = spark.sql(
      "SELECT graft_simhash64(array('a', 'b')) AS h").first().getLong(0)
    assert(h === expected)
  }
}
