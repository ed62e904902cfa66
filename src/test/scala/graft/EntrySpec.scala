package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the driver contract: flagship entry plus a sample
  * of registered queries against the sf0.001 tables. (Full oracle
  * verification runs via graft.Verify + the driver's DuckDB compare.) */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns report rows") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("seg", "report"))
    assert(df.count() > 0)
  }

  test("every registered query has distinct output column names") {
    // duplicate column names would break the driver's column-sorted hash
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, dir).columns.toSeq
      assert(cols.distinct.size == cols.size,
        s"$name has duplicate columns: $cols")
    }
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("no query registration key is duplicated at the SOURCE level " +
       "(a duplicate inside one Map literal silently shadows the " +
       "earlier entry — r14 lost an operator's query to this)") {
    import scala.jdk.CollectionConverters._
    val re = java.util.regex.Pattern
      .compile("\"([a-z0-9_]+)\"\\s*->\\s*\\(\\(s")
    val walk = java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/main/scala/graft"))
    val keys =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { f =>
          val txt = new String(java.nio.file.Files.readAllBytes(f))
          val m = re.matcher(txt)
          Iterator.continually(m).takeWhile(_.find()).map(_.group(1))
            .toList
        }.toList
      finally walk.close()
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query registrations: $dups")
    // the scan must actually see the registrations (a moved tree or a
    // changed registration idiom would silently neuter this tripwire)
    assert(keys.size >= SparkEntry.queries.size,
      s"source scan found ${keys.size} registrations but the registry " +
        s"holds ${SparkEntry.queries.size} — pattern out of date")
  }

  test("every bench canary query stays registered (a silent rename " +
       "would null the host factor instead of failing loudly)") {
    val missing = Bench.canaryPinned.map(_._1)
      .filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"canary queries not registered: $missing")
  }

  test("sample queries return rows at sf0.001") {
    Seq("q1_agg", "sliding_scores", "report_shape", "dedup_minhash",
        "embedding_cosine_topk", "row_num_surrogate").foreach { q =>
      assert(SparkEntry.queries(q)(spark, dir).count() > 0, q)
    }
  }
}
