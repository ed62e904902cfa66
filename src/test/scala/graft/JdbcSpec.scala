package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** JDBC tap parity (reference trgx.clj:96-108): `-`→`_` rewrite,
  * all-String boundary, executeUpdate DDL + range-delete — round-tripped
  * against embedded Derby (on the Spark classpath, offline-safe). */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val url =
    s"jdbc:derby:${graft.core.Tables.tmpDir}/derby_spec;create=true"

  test("round-trip preserves values through the -/_ all-String tap") {
    import spark.implicits._
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_rt")
    Jdbc.createTableIf(url, "t_rt", Seq(
      "dw_dt" -> "VARCHAR(10)", "dw_id" -> "VARCHAR(20)",
      "score_val" -> "VARCHAR(20)"))
    val df = Seq(("2024-01-31", 1L, 3.5), ("2024-02-29", 2L, 4.25))
      .toDF("dw-dt", "dw-id", "score-val")
    Jdbc.writeTable(df, url, "t_rt")
    val back = Jdbc.readTable(spark, url, "t_rt",
      Seq("dw-dt", "dw-id", "score-val"))
    assert(back.columns.toSeq == Seq("dw-dt", "dw-id", "score-val"))
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = back.orderBy(back.col("dw-id")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(rows == Seq(("2024-01-31", "1", "3.5"),
                       ("2024-02-29", "2", "4.25")))
  }

  test("streaming AvailableNow micro-batches land in the JDBC sink " +
       "with _rng bookkeeping (EP-1's streaming form)") {
    import spark.implicits._
    import java.nio.file.Files
    val base = TestSpark.tmpPath("stream_jdbc")
    val in = base.resolve("in").toString
    val rng = base.resolve("rng").toString
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_stream")
    Jdbc.createTableIf(url, "t_stream", Seq(
      "dw_dt" -> "VARCHAR(10)", "score_val" -> "VARCHAR(20)"))
    val batch = Seq(("2024-03-01", 1.5), ("2024-03-15", 2.5))
      .toDF("dw-dt", "score-val")
    batch.write.parquet(in)
    val stream = graft.streaming.StreamOps.readTableStream(
      spark, in, batch.schema)
    graft.streaming.StreamOps.availableNowWithRng(stream, "dw-dt", rng) {
      b => Jdbc.writeTable(b, url, "t_stream")
    }
    val back = Jdbc.readTable(spark, url, "t_stream",
      Seq("dw-dt", "score-val"))
    assert(back.count() === 2)
    assert(spark.read.parquet(rng).agg(sum($"dw_ld_cnt")).first()
      .getLong(0) === 2L)
  }

  test("RefCatalog round-trips a reference table through the tap") {
    import spark.implicits._
    import graft.types.RefCatalog
    // the report sink — the table every reference job writes
    val cols = RefCatalog.tables("ms.report")
    assert(cols.head == "dw-dt" && cols.last == "dimension-metrics")
    assert(RefCatalog.schemaOf("ms.report").fields
      .forall(_.dataType.typeName == "string"))
    Jdbc.executeUpdateSilent(url, "DROP TABLE ms_report")
    Jdbc.createTableIf(url, "ms_report",
      cols.map(c => c.replace('-', '_') -> "VARCHAR(64)"))
    val row = Seq(("9999-12-31", "cocacola", "score", "overall",
        "[\"bg=x\"]", "", "{\"m\":1}"))
      .toDF(cols: _*)
    Jdbc.writeTable(row, url, "ms_report")
    val back = RefCatalog.readRef(spark, url, "ms.report", "ms_report")
    assert(back.columns.toSeq == cols)
    assert(back.count() === 1)
    assert(back.select(back.col("dimension-metrics")).first()
      .getString(0) === "{\"m\":1}")
  }

  test("createTableIf is idempotent; deleteRange removes the dated rows") {
    import spark.implicits._
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_del")
    val specs = Seq("dw_dt" -> "VARCHAR(10)", "report" -> "VARCHAR(20)")
    Jdbc.createTableIf(url, "t_del", specs)
    Jdbc.createTableIf(url, "t_del", specs) // second call must not throw
    val df = Seq(("2024-01-31", "a"), ("2024-02-29", "a"),
                 ("2024-03-31", "b")).toDF("dw-dt", "report")
    Jdbc.writeTable(df, url, "t_del")
    // detele-report! shape: selector predicate + dt range
    Jdbc.deleteRange(url, "t_del", "dw_dt", "2024-01-01", "2024-02-29",
      Some("report = 'a'"))
    val left = Jdbc.readTable(spark, url, "t_del", Seq("dw-dt", "report"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(left == Seq(("2024-03-31", "b")))
  }

  test("deleteRange parenthesizes a disjunctive selector: OR cannot " +
       "escape the date bounds") {
    import spark.implicits._
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_del_or")
    Jdbc.createTableIf(url, "t_del_or",
      Seq("dw_dt" -> "VARCHAR(10)", "report" -> "VARCHAR(20)"))
    Jdbc.writeTable(Seq(
      ("2024-01-31", "a"), ("2024-05-31", "a"),
      ("2024-01-15", "b"), ("2024-05-15", "c"))
      .toDF("dw-dt", "report"), url, "t_del_or")
    // unparenthesized, AND binds tighter than OR and this would delete
    // EVERY report='a' row regardless of date (the May 'a' row too)
    Jdbc.deleteRange(url, "t_del_or", "dw_dt", "2024-01-01", "2024-01-31",
      Some("report = 'a' OR report = 'b'"))
    val left = Jdbc.readTable(spark, url, "t_del_or",
        Seq("dw-dt", "report"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(left == Set(("2024-05-31", "a"), ("2024-05-15", "c")),
      s"the out-of-range 'a' row must survive a disjunctive selector: $left")
  }

  test("EP-1 report job over the JDBC sink: resume range, append, " +
       "re-run picks up after MAX(dw-dt)") {
    import spark.implicits._
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_report")
    Jdbc.createTableIf(url, "t_report", Seq(
      "dw_dt" -> "VARCHAR(10)", "report" -> "VARCHAR(20)",
      "payload" -> "VARCHAR(40)"))
    val allDates = Seq("2024-01-31", "2024-02-29")
    def build(rng: (String, String)) =
      allDates.filter(d => d >= rng._1 && d <= rng._2)
        .map(d => (d, "overall", s"p$d"))
        .toDF("dw-dt", "report", "payload")
    val r1 = graft.etl.Pipelines.runReportJob(spark, url, "t_report",
      "overall", "1970-01-01", "2024-02-01", build)
    assert(r1 == (("1970-01-01", "2024-02-01")))
    val r2 = graft.etl.Pipelines.runReportJob(spark, url, "t_report",
      "overall", "1970-01-01", "2024-12-31", build)
    assert(r2 == (("2024-02-01", "2024-12-31")),
      "second run must resume from MAX(dw-dt)+1")
    val rows = Jdbc.readTable(spark, url, "t_report",
        Seq("dw-dt", "report", "payload"))
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq.sorted
    assert(rows == Seq(("2024-01-31", "p2024-01-31"),
                       ("2024-02-29", "p2024-02-29")),
      "each date appended exactly once across the two runs")
  }

  test("connection options forward to the JDBC source; pgSslOptions " +
       "builds the reference tap's SSL posture") {
    import spark.implicits._
    // a quote in a date BOUND must not break the prepared delete
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_opt")
    Jdbc.createTableIf(url, "t_opt", Seq("dw_dt" -> "VARCHAR(12)"))
    val df = Seq("2024-01-31").toDF("dw-dt")
    Jdbc.writeTable(df, url, "t_opt",
      options = Map("batchsize" -> "500", "isolationLevel" -> "NONE"))
    val back = Jdbc.readTable(spark, url, "t_opt", Seq("dw-dt"),
      options = Map("fetchsize" -> "7"))
    assert(back.collect().map(_.getString(0)).toSeq == Seq("2024-01-31"))
    assert(Jdbc.deleteRange(url, "t_opt", "dw_dt",
      "9999-01-01' OR '1'='1", "9999-12-31") == 0,
      "a quote in the bound must bind as a literal (no match), not " +
        "splice into the statement (which would delete every row)")
    assert(back.count() == 1)
    val ssl = Jdbc.pgSslOptions(
      sslCert = Some("/c.pem"), sslKey = Some("/k.pk8"),
      sslRootCert = Some("/root.pem"))
    assert(ssl == Map("ssl" -> "true", "sslmode" -> "require",
      "stringtype" -> "unspecified", "sslcert" -> "/c.pem",
      "sslkey" -> "/k.pk8", "sslrootcert" -> "/root.pem"))
  }

  test("deleteRange/createTableIf reject non-identifier table/column " +
       "names before any SQL is built") {
    intercept[IllegalArgumentException] {
      Jdbc.deleteRange(url, "t_del; DROP TABLE t_del", "dw_dt",
        "2024-01-01", "2024-01-31")
    }
    intercept[IllegalArgumentException] {
      Jdbc.deleteRange(url, "t_del", "dw_dt OR 1=1",
        "2024-01-01", "2024-01-31")
    }
    intercept[IllegalArgumentException] {
      Jdbc.createTableIf(url, "x", Seq("a b" -> "VARCHAR(1)"))
    }
    // the TYPE half of the spec tuple is guarded the same way
    intercept[IllegalArgumentException] {
      Jdbc.createTableIf(url, "x",
        Seq("c" -> "VARCHAR(1)); DROP TABLE reports;--"))
    }
    // schema-qualified names and multi-word/parameterized types remain
    // accepted — including words AFTER the precision group (Derby's
    // CHAR(8) FOR BIT DATA / BLOB(2M), constraint suffixes)
    Jdbc.createTableIf(url, "APP.t_qual",
      Seq("k" -> "BIGINT", "p" -> "DECIMAL(10,2)",
          "d" -> "DOUBLE PRECISION", "b" -> "CHAR(8) FOR BIT DATA",
          "l" -> "BLOB(2M)", "n" -> "VARCHAR(10) NOT NULL"))
    Jdbc.executeUpdateSilent(url, "DROP TABLE APP.t_qual")
  }

  test("partitioned read fans out over numPartitions JDBC slices") {
    import spark.implicits._
    Jdbc.executeUpdateSilent(url, "DROP TABLE t_part")
    Jdbc.createTableIf(url, "t_part", Seq(
      "k" -> "BIGINT", "v" -> "VARCHAR(20)"))
    (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.format("jdbc").option("url", url)
      .option("dbtable", "t_part").mode("append").save()
    val part = Jdbc.readTable(spark, url, "t_part", Seq("k", "v"),
      Some(Jdbc.PartitionSpec("k", 1L, 101L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 100)
    assert(part.agg(sum(col("k").cast("long"))).first().getLong(0)
      == 5050L)
  }
}
