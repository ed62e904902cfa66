package graft

import org.apache.spark.sql.functions._

/** Throwaway scale probe: native kernels vs retained HOF baselines at
  * 1×/8×/16× sf0.1 (run manually via Test/runMain; numbers recorded in
  * PLANS.md). */
object KernelScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; System.gc(); (System.nanoTime - t0) / 1e9
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text", $"source", $"lang")
    for (mult <- Seq(16, 64, 256)) {
      val d = (0 until mult).map(i => docs.select(
          ($"doc_id" + lit(i.toLong * 10000000L)).as("doc_id"),
          $"text", $"source", $"lang")).reduce(_ unionByName _)
      val url = concat(
        when($"doc_id" % 3 === 0, lit("HTTP")).otherwise(lit("HTTPS")),
        lit("://"),
        when($"doc_id" % 2 === 0, lit("WWW.")).otherwise(lit("")),
        upper($"source"), lit(".Example.COM"),
        when($"doc_id" % 3 === 0, lit(":8080")).otherwise(lit("")),
        lit("/"), $"lang", lit("/doc/"), $"doc_id".cast("string"),
        when($"doc_id" % 2 === 1,
          lit("?utm_source=feed&z=9&ref=home&a=1&gclid=g1"))
          .otherwise(lit("?b=2&a=1&utm_campaign=x")))
      val u = d.select($"doc_id", url.as("url"))
      u.limit(1000).select(
        graft.functions.UrlNorm.urlNormalize($"url")).count()
      val tN = time(u.select(
          graft.functions.UrlNorm.urlNormalize($"url").as("n"),
          graft.functions.UrlNorm.urlDomain($"url").as("d"),
          graft.functions.UrlNorm.urlKeptQuery($"url").as("k"))
        .agg(count($"n"), count($"d"), count($"k")).collect())
      val tH = time(u.select(
          graft.functions.UrlNorm.urlNormalizeHof($"url").as("n"),
          graft.functions.UrlNorm.urlDomainHof($"url").as("d"),
          graft.functions.UrlNorm.urlKeptQueryHof($"url").as("k"))
        .agg(count($"n"), count($"d"), count($"k")).collect())
      val rows = u.count()
      println(f"URL mult=$mult rows=$rows native=$tN%.2f hof=$tH%.2f " +
        f"ratio=${tH / tN}%.1f")
      val tCN = time(graft.llm.Corpus
        .chunkDocuments(d, "doc_id", "text", 32, 24)
        .agg(sum($"n_tokens")).collect())
      val tCH = time(graft.llm.Corpus
        .chunkDocumentsHof(d, "doc_id", "text", 32, 24)
        .agg(sum($"n_tokens")).collect())
      println(f"CHUNK mult=$mult native=$tCN%.2f hof=$tCH%.2f " +
        f"ratio=${tCH / tCN}%.1f")
      // html extraction: kernel (one pass) vs the 10-stage regex
      // pipeline over synthesized pages — the crawl-ingest hot path
      val pages = d.select($"doc_id",
        graft.llm.HtmlText.wrapPage($"doc_id".cast("string"),
          graft.llm.HtmlText.escapeHtml(coalesce($"text", lit(""))))
          .as("html"))
      val tXN = time(pages.select(
          graft.llm.HtmlText.htmlToText($"html").as("t"))
        .agg(sum(length($"t"))).collect())
      val tXH = time(pages.select(
          graft.llm.HtmlText.htmlToTextHof($"html").as("t"))
        .agg(sum(length($"t"))).collect())
      println(f"HTML mult=$mult native=$tXN%.2f hof=$tXH%.2f " +
        f"ratio=${tXH / tXN}%.1f")
      if (mult <= 64) {
        val planted = d.select($"doc_id",
          concat($"text", lit("\nshared boilerplate line"),
            lit("\nanother body line")).as("text"))
        val tLN = time(graft.llm.Dedup
          .dedupLinesAcrossDocs(planted, "text", "doc_id")
          .agg(sum(length($"text")), sum($"n_removed")).collect())
        println(f"DEDUPLINES mult=$mult native=$tLN%.2f")
      }
    }
  }
}
