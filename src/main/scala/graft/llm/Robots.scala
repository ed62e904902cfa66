package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots-exclusion matching — the retroactive politeness filter a
  * crawl pipeline applies before training on fetched pages (the fetch
  * already happened; the filter drops what the site's policy excludes).
  */
object Robots {

  /** Classify each URL against a robots rules table using the
    * simplified Robots Exclusion Protocol semantics crawlers
    * standardize on: the LONGEST matching path prefix for the URL's
    * host decides, an Allow and a Disallow of equal length tie-break
    * to Allow, and a URL with no matching rule is allowed.
    *
    * `urls` needs (idCol, host, path); `rules` is (host,
    * allow: Boolean, prefix) — one row per Allow/Disallow line,
    * already grouped for the crawler's user-agent. The empty prefix
    * matches everything (a disallow-all line), at the weakest
    * precedence.
    *
    * Scale shape: rules are config-sized (a robots file is KBs) →
    * BROADCAST prefix join; the election is ONE integer per match —
    * score = 2·len(prefix) + allow — whose per-URL max carries both
    * the longest-match and the tie-break in its parity. One hash
    * aggregation on the URL key; the corpus never shuffles twice.
    *
    * `urls` is referenced twice (the score aggregation and the
    * host/path rejoin) — stage it first if its lineage is expensive
    * (graft.core.Tables.staged). A null host or path never matches a
    * rule, so such rows surface as allowed — the permissive default,
    * same as an unlisted host.
    *
    * Output: idCol, host, path, allowed. */
  def robotsFilter(urls: DataFrame, idCol: String,
                   rules: DataFrame): DataFrame = {
    val r = broadcast(rules.select(col("host").as("__rh"),
      col("allow").cast("boolean").as("__ra"),
      col("prefix").as("__rp")))
    val u = urls.select(col(idCol), col("host"), col("path"))
    // the election aggregates ONLY the Long score: any string column
    // in the aggregation buffer (max(host), even first(host)) forces
    // SortAggregate — a per-partition sort of the URL table (the
    // str_max_min trap); host/path rejoin by key instead
    val scores = u
      .join(r, col("host") === col("__rh") &&
        col("path").startsWith(col("__rp")), "left")
      .groupBy(idCol).agg(
        max(when(col("__rp").isNotNull,
          length(col("__rp")) * 2 +
            when(col("__ra"), 1).otherwise(0))).as("__s"))
    u.join(scores, Seq(idCol))
      .select(col(idCol), col("host"), col("path"),
        coalesce(col("__s") % 2 === 1, lit(true)).as("allowed"))
  }
}
