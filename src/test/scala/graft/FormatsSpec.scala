package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val payloadSchema = StructType(Seq(
    StructField("txt", StringType),
    StructField("n", LongType)))

  // adversarial payloads: null field, empty string, CRLF, tab, JSON
  // metacharacters, astral plane, dotted-İ — everything the JSON
  // encoding must escape or carry through a Hadoop Text
  private val rows = Seq(
    (1L, "plain", 10L),
    (2L, null.asInstanceOf[String], 20L),
    (3L, "", 30L),
    (4L, "line1\r\nline2\tend", 40L),
    (5L, "quote\" back\\slash {json}", 50L),
    (6L, "astral 😀 and İstanbul", 60L))

  test("SequenceFile round-trip is exact, including null / CRLF / " +
       "astral payloads, and write is rerun-safe") {
    val df = rows.toDF("id", "txt", "n")
    val path = graft.core.Tables.tmpDir + "/seqfile_spec"
    Formats.writeSequenceFile(df, "id", path)
    // rerun-safety: second write must replace, not fail or append
    Formats.writeSequenceFile(df, "id", path)
    val back = Formats.readSequenceFile(spark, path, "id", payloadSchema)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == rows.map(r => (r._1, r._2, r._3)))
  }

  test("SequenceFile write fails FAST and LOUD on a null key (a " +
       "LongWritable has no null; silent drop/zero would corrupt)") {
    val df = Seq((java.lang.Long.valueOf(1L), "a", 1L),
        (null.asInstanceOf[java.lang.Long], "b", 2L))
      .toDF("id", "txt", "n")
    val path = graft.core.Tables.tmpDir + "/seqfile_spec_nullkey"
    val e = intercept[Exception] {
      Formats.writeSequenceFile(df, "id", path)
    }
    // the require's message must survive somewhere in the cause chain
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null key")), msgs(e).mkString(" | "))
  }

  test("SequenceFile round-trip with block compression (DefaultCodec) " +
       "is byte-identical to the uncompressed read") {
    val df = rows.toDF("id", "txt", "n")
    val path = graft.core.Tables.tmpDir + "/seqfile_spec_gz"
    Formats.writeSequenceFile(df, "id", path,
      Some(classOf[org.apache.hadoop.io.compress.DefaultCodec]))
    val back = Formats.readSequenceFile(spark, path, "id", payloadSchema)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.toSeq == rows.map(r => (r._1, r._2, r._3)))
  }
}
