package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC table source/sink with the reference tap's semantics
  * (src/common/trgx.clj:96-108 `pg-tap`):
  *
  *   - logical field names use `-`, physical columns use `_` — the tap
  *     rewrites on the way in and out (trgx.clj:104);
  *   - every column crosses the boundary as String (the JDBCScheme
  *     declares all fields String; `stringtype=unspecified` lets the
  *     database cast server-side);
  *   - DDL and range-deletes go through raw `executeUpdate` on the tap
  *     (trgx.clj:110-127 `detele-report!` / `create-table-if`).
  *
  * Scale: reads accept a partition spec (`partitionColumn`/bounds/`n`)
  * so a large table fans out over n concurrent connections instead of
  * one executor streaming the whole table; writes ride Spark's
  * per-partition batched inserts.
  *
  * TEST BOUNDARY: the JDBC transport is verified against embedded
  * Derby (JdbcSpec) — the only JDBC engine the JVM can reach here (a
  * Postgres 15 SERVER exists in the sandbox, but no pgjdbc driver jar
  * is on disk and the environment has no egress to fetch one —
  * checked, not assumed). The SQL this module EMITS, however, is
  * verified against that live PostgreSQL out-of-JVM: PgSmokeSpec
  * boots a throwaway cluster and runs [[createTableSql]] /
  * [[deleteRangeSql]] (PREPAREd) plus the all-String insert posture
  * through psql, pinning the reference DDL grammar
  * (CHAR/TEXT/NUMERIC(18,3)), the 42P07 duplicate-table state
  * [[createTableIf]] relies on, and server-side string→typed casts.
  * Still unexercised: the pgjdbc driver itself — SSL handshake and
  * driver-level type mapping ([[pgSslOptions]] forwards verbatim to
  * Spark's JDBC source, so enabling SSL needs no code change).
  */
object Jdbc {

  /** Logical (`-`) → physical (`_`) column rewrite. */
  def physical(name: String): String = name.replace("-", "_")

  /** Identifiers that get interpolated into raw DDL/DML must be plain
    * (optionally schema-qualified) SQL names — rejecting anything else
    * turns a misrouted user-derived string into a loud error instead of
    * an injection path. Quoted/exotic identifiers are out of scope (the
    * reference's config names are all plain). */
  private val IdentifierRx = "[A-Za-z_][A-Za-z0-9_$]*(\\.[A-Za-z_][A-Za-z0-9_$]*)*".r
  private def requireIdentifier(kind: String, name: String): Unit =
    require(IdentifierRx.matches(name),
      s"$kind must be a plain SQL identifier, got: $name")

  /** Column TYPE strings interpolate into CREATE TABLE just like the
    * names do, so they get the same loud-error treatment: a word, an
    * optional numeric precision/scale group (`2M`-style size suffixes
    * allowed), then optional trailing words — `VARCHAR(10)`,
    * `DECIMAL(10,2)`, `DOUBLE PRECISION`, `TIMESTAMP(3) WITH TIME
    * ZONE`, `CHAR(8) FOR BIT DATA`, `BLOB(2M)`, `VARCHAR(10) NOT
    * NULL`. Anything with quotes/semicolons/subexpressions is
    * rejected. */
  private val TypeRx =
    ("[A-Za-z][A-Za-z0-9_]*( *\\( *\\d+[KMG]? *(, *\\d+ *)?\\))?" +
     "( +[A-Za-z][A-Za-z0-9_]*)*").r
  private def requireSqlType(tpe: String): Unit =
    require(TypeRx.matches(tpe),
      s"column type must be a plain SQL type, got: $tpe")

  /** The reference tap's Postgres SSL connection posture
    * (trgx.clj:81-98: ssl + sslmode=require + client cert/key/root
    * paths + unspecified stringtype) as a Spark JDBC option map —
    * URL-independent, pass as `options` to [[readTable]] /
    * [[writeTable]]. Option names per the PostgreSQL JDBC driver. */
  def pgSslOptions(sslMode: String = "require",
                   sslCert: Option[String] = None,
                   sslKey: Option[String] = None,
                   sslRootCert: Option[String] = None): Map[String, String] =
    Map("ssl" -> "true", "sslmode" -> sslMode,
        "stringtype" -> "unspecified") ++
      sslCert.map("sslcert" -> _) ++ sslKey.map("sslkey" -> _) ++
      sslRootCert.map("sslrootcert" -> _)

  /** Optional parallel-read spec: (physical column, lower, upper,
    * numPartitions). */
  final case class PartitionSpec(column: String, lower: Long, upper: Long,
                                 numPartitions: Int)

  /** Read `table`, projecting `header` (logical names): each physical
    * `_` column is cast to String and surfaced under its logical `-`
    * name — the all-String scheme of the reference tap. */
  def readTable(spark: SparkSession, url: String, table: String,
                header: Seq[String],
                partition: Option[PartitionSpec] = None,
                options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .options(options)
      .option("url", url)
      .option("dbtable", table)
    val reader = partition.fold(base) { p =>
      base.option("partitionColumn", p.column)
        .option("lowerBound", p.lower)
        .option("upperBound", p.upper)
        .option("numPartitions", p.numPartitions)
    }
    reader.load()
      .select(header.map(h =>
        col(physical(h)).cast("string").as(h)): _*)
  }

  /** Append `df` to `table`: logical `-` names rewritten to physical
    * `_`, every column cast to String. */
  def writeTable(df: DataFrame, url: String, table: String,
                 options: Map[String, String] = Map.empty): Unit = {
    // same guard as deleteRange/createTableIf: Spark's JDBC writer
    // interpolates this name into its generated INSERT statement
    requireIdentifier("table", table)
    df.select(df.columns.map(c =>
        df.col(c).cast("string").as(physical(c))): _*)
      .write.format("jdbc")
      .options(options)
      .option("url", url)
      .option("dbtable", table)
      .mode("append")
      .save()
  }

  /** Raw DDL/DML on the tap connection (trgx.clj:110 executeUpdate). */
  def executeUpdate(url: String, sql: String): Int = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(sql) finally st.close()
    } finally conn.close()
  }

  /** executeUpdate that swallows failures (drop-if-exists shims for
    * engines without IF EXISTS, e.g. Derby). Returns true on success. */
  def executeUpdateSilent(url: String, sql: String): Boolean =
    try { executeUpdate(url, sql); true }
    catch { case _: java.sql.SQLException => false }

  /** The exact CREATE TABLE text [[createTableIf]] executes, after
    * identifier/type validation — exposed so the statement grammar can
    * be verified against engines the JVM cannot reach (PgSmokeSpec runs
    * this string on a live PostgreSQL via psql). */
  def createTableSql(table: String, specs: Seq[(String, String)]): String = {
    requireIdentifier("table", table)
    specs.foreach { case (c, t) =>
      requireIdentifier("column", c); requireSqlType(t)
    }
    val cols = specs.map { case (c, t) => s"$c $t" }.mkString(", ")
    s"CREATE TABLE $table ($cols)"
  }

  /** `replace-into-ods` (trgx.clj:188-193): the EP-3 transactional
    * publish — a staged build in `public` replaces the live ods table
    * by DROP + SET SCHEMA + RENAME, the reference's verbatim three
    * statements:
    *   1. SET search_path=ods;    DROP TABLE IF EXISTS <ods> CASCADE
    *   2. SET search_path=public; ALTER TABLE <tmp> SET SCHEMA ods
    *   3. SET search_path=ods;    ALTER TABLE <tmp> RENAME TO <ods>
    * The reference runs them as three autocommit executeUpdates — a
    * reader between 1 and 3 sees NO table. PostgreSQL DDL is
    * transactional, so run the returned statements inside ONE
    * transaction for an atomic publish: readers hold the old table
    * until commit, and a mid-swap failure rolls the whole publish
    * back (PgSmokeSpec drives both properties on live PG 15).
    * Identifiers are validated before interpolation. */
  def replaceIntoOdsSql(odsTable: String, tmpTable: String): Seq[String] = {
    requireIdentifier("odsTable", odsTable)
    requireIdentifier("tmpTable", tmpTable)
    Seq(
      s"SET search_path=ods; DROP TABLE IF EXISTS $odsTable CASCADE",
      s"SET search_path=public; ALTER TABLE $tmpTable SET SCHEMA ods",
      s"SET search_path=ods; ALTER TABLE $tmpTable RENAME TO $odsTable")
  }

  /** [[replaceIntoOdsSql]] executed over JDBC as one transaction (the
    * atomic form) — for JDBC-reachable targets; the psql-driven smoke
    * covers the no-driver sandbox. */
  def replaceIntoOds(url: String, odsTable: String,
                     tmpTable: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        replaceIntoOdsSql(odsTable, tmpTable).foreach(st.executeUpdate)
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    } finally conn.close()
  }

  /** create-table-if (trgx.clj:122-127): specs are (physical column,
    * SQL type) pairs. Engines without CREATE TABLE IF NOT EXISTS
    * (Derby) surface "already exists" as an SQLException — ONLY that
    * condition is treated as success (Derby SQLState X0Y32, Postgres
    * 42P07); any other DDL failure propagates. */
  def createTableIf(url: String, table: String,
                    specs: Seq[(String, String)]): Unit = {
    try executeUpdate(url, createTableSql(table, specs))
    catch {
      case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" || e.getSQLState == "42P07" ||
            (e.getMessage != null &&
              e.getMessage.toLowerCase.contains("already exists")) =>
        () // table exists — the "if" of create-table-if
    }
  }

  /** detele-report! shape (trgx.clj:118-120): range-delete by date
    * column plus fixed selector predicates.
    *
    * `table` and `dtCol` are VALIDATED against a plain-identifier
    * grammar before interpolation (a non-identifier throws, it never
    * reaches the statement). `extraWhere` remains a TRUSTED SQL
    * fragment from job config (the reference interpolates its selector
    * predicates identically) — never pass user-derived content. The
    * date BOUNDS are data and bind through a PreparedStatement, so a
    * quote in a date value cannot break or repurpose the statement. */
  /** The exact parameterized DELETE text [[deleteRange]] prepares
    * (bounds as `?` placeholders), after identifier validation —
    * exposed for the same out-of-JVM grammar verification as
    * [[createTableSql]] (PgSmokeSpec PREPAREs it, `?`→`$n`, on live
    * PostgreSQL). */
  def deleteRangeSql(table: String, dtCol: String,
                     extraWhere: Option[String] = None): String = {
    requireIdentifier("table", table)
    requireIdentifier("dtCol", dtCol)
    // extraWhere is PARENTHESIZED: AND binds tighter than OR, so an
    // unwrapped disjunctive selector ("store='a' OR store='b'") would
    // escape the date bounds entirely — DELETE of every store='a' row
    // in the table regardless of date. Mass data loss from a
    // legitimate config fragment.
    val extra = extraWhere.map(w => s"($w) AND ").getOrElse("")
    s"DELETE FROM $table WHERE $extra$dtCol BETWEEN ? AND ?"
  }

  def deleteRange(url: String, table: String, dtCol: String,
                  startDt: String, endDt: String,
                  extraWhere: Option[String] = None): Int = {
    val sql = deleteRangeSql(table, dtCol, extraWhere)
    val conn = DriverManager.getConnection(url)
    try {
      val ps = conn.prepareStatement(sql)
      try {
        ps.setString(1, startDt); ps.setString(2, endDt)
        ps.executeUpdate()
      } finally ps.close()
    } finally conn.close()
  }
}
