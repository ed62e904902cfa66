package graft

import java.io.File
import java.nio.file.{Files, Path}

import scala.sys.process._

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc
import graft.types.RefCatalog

/** Live-PostgreSQL smoke of the SQL this engine EMITS (the round-4
  * verdict's environment-gated item: the sandbox now ships Postgres 15
  * server binaries, though still no pgjdbc jar — so the JDBC transport
  * stays Derby-tested in JdbcSpec while the STATEMENTS are verified
  * here against the reference's real target engine through psql).
  *
  * What this pins that Derby could not:
  *   - the reference DDL grammar (CHAR(10) dates, CHAR(24) timestamps,
  *     INT, TEXT, NUMERIC(18,3) — trgx.clj:121-127) parses on PG 15;
  *   - duplicate CREATE TABLE raises SQLSTATE 42P07 — the exact state
  *     [[Jdbc.createTableIf]] treats as "already exists";
  *   - all-String INSERTs cast server-side into typed columns — the
  *     mechanism `stringtype=unspecified` (pgSslOptions) relies on:
  *     both an untyped 'literal' and an unspecified-type parameter
  *     resolve through the same PG coercion path;
  *   - [[Jdbc.deleteRangeSql]]'s parameterized text PREPAREs and
  *     executes (`?`→`$n` is the driver's own wire translation), with
  *     NULL-dt rows surviving BETWEEN — the cross-backend contract
  *     [[graft.etl.TableOps.deleteRange]] documents;
  *   - every RefCatalog table's rewritten identifiers and schema
  *     qualification are valid PG DDL.
  *
  * GATE: cancels (not fails) unless the Postgres binaries, a
  * `postgres` system user, and root (for `su`) are all present and a
  * cluster actually boots — the suite is a no-op on machines without
  * the server.
  */
class PgSmokeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var dir: Path = _
  private var port: Int = 0
  private var ready = false
  private var whyNot = "postgres environment not probed"

  private def sh(cmd: Seq[String], cwd: File): (Int, String) = {
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'),
                               l => out.append(l).append('\n'))
    val rc = Process(cmd, cwd) ! logger
    (rc, out.toString)
  }

  /** Run `cmd` as the postgres system user (the server refuses root). */
  private def asPg(cmd: String): (Int, String) =
    sh(Seq("su", "-s", "/bin/sh", "postgres", "-c", cmd), dir.toFile)

  private val psqlSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** psql with ON_ERROR_STOP + verbose errors (verbose puts the
    * SQLSTATE in the message, so tests can assert on 42P07). Each
    * statement in `sqls` runs as its own -c in ONE session. Output goes
    * through a FILE, not the JVM pipe: under full-suite parallel load
    * the pipe intermittently delivered SIGPIPE to psql (rc 141 with the
    * statements already executed), flaking the suite. */
  private def psql(sqls: String*): (Int, String) = {
    val cs = sqls.map(s => s"-c ${shQuote(s)}").mkString(" ")
    val outFile = s"$dir/psql_out_${psqlSeq.incrementAndGet()}"
    val (rc, _) = asPg(s"psql -X -v ON_ERROR_STOP=1 -v VERBOSITY=verbose " +
      s"-h $dir -p $port -d postgres -A -t $cs > $outFile 2>&1")
    val out =
      try new String(Files.readAllBytes(java.nio.file.Paths.get(outFile)))
      catch { case scala.util.control.NonFatal(_) => "" }
    (rc, out)
  }

  private def shQuote(s: String): String =
    "'" + s.replace("'", "'\\''") + "'"

  override def beforeAll(): Unit = {
    val haveBins = Seq("initdb", "pg_ctl", "psql")
      .forall(b => sh(Seq("sh", "-c", s"command -v $b"), new File("/tmp"))._1 == 0)
    val havePgUser = sh(Seq("id", "-u", "postgres"), new File("/tmp"))._1 == 0
    val amRoot = System.getProperty("user.name") == "root"
    if (!haveBins) { whyNot = "no postgres binaries on PATH"; return }
    if (!havePgUser) { whyNot = "no `postgres` system user"; return }
    if (!amRoot) { whyNot = "not root (cannot su to postgres)"; return }
    dir = Files.createTempDirectory("graft_pgsmoke")
    port = 54330 + (ProcessHandle.current.pid % 100).toInt
    sh(Seq("chown", "postgres:postgres", dir.toString), dir.toFile)
    val (rcInit, initOut) = asPg(s"initdb -D $dir/data -A trust")
    if (rcInit != 0) { whyNot = s"initdb failed: ${initOut.take(200)}"; return }
    // unix-socket only (listen_addresses='') — nothing opens a TCP port
    val (rcStart, startOut) = asPg(
      s"pg_ctl -D $dir/data -o '-k $dir -p $port -c listen_addresses=' " +
        s"-l $dir/pg.log -w start")
    if (rcStart != 0) { whyNot = s"server start failed: ${startOut.take(200)}"; return }
    ready = psql("SELECT 1")._1 == 0
    if (!ready) whyNot = "server started but psql cannot connect"
  }

  override def afterAll(): Unit = {
    if (dir != null) {
      asPg(s"pg_ctl -D $dir/data -m immediate -w stop")
      sh(Seq("rm", "-rf", dir.toString), new File("/tmp"))
    }
  }

  // the reference report table's declared storage types, verbatim
  // (trgx.clj:121-127 create-table-if grammar)
  private val reportSpecs = Seq(
    "dw_dt" -> "CHAR(10)", "dw_ld_ts" -> "CHAR(24)",
    "report" -> "TEXT", "rank_no" -> "INT",
    "score_val" -> "NUMERIC(18,3)")

  /** Per-test fixture: (re)create graft_smoke from scratch, optionally
    * populated. Every test calls this instead of inheriting a previous
    * test's table — so `-z` single-test runs and mid-suite failures
    * can't cascade (round-6 advice). */
  private def freshSmoke(populated: Boolean): Unit = {
    val stmts = Seq("DROP TABLE IF EXISTS graft_smoke",
      Jdbc.createTableSql("graft_smoke", reportSpecs)) ++
      (if (populated) Seq(
        "INSERT INTO graft_smoke VALUES " +
          "('2024-01-31','2024-01-31T09:00:00+0800','a','1','3.500')," +
          "('2024-02-29','2024-02-29T09:00:00+0800','a','2','4.250')," +
          "(NULL,'2024-03-01T09:00:00+0800','b','3','0.125')")
      else Nil)
    val (rc, out) = psql(stmts: _*)
    assert(rc == 0, s"smoke fixture setup failed: $out")
  }

  test("reference DDL executes; duplicate CREATE raises 42P07 " +
       "(createTableIf's PG already-exists state)") {
    assume(ready, whyNot)
    freshSmoke(populated = false)
    val ddl = Jdbc.createTableSql("graft_smoke", reportSpecs)
    val (rc2, out2) = psql(ddl)
    assert(rc2 != 0, "duplicate CREATE TABLE must fail")
    assert(out2.contains("42P07"),
      s"expected SQLSTATE 42P07 (what createTableIf matches), got: $out2")
  }

  test("all-String inserts cast server-side into typed columns " +
       "(the stringtype=unspecified posture)") {
    assume(ready, whyNot)
    // every value a quoted string — INT, NUMERIC and CHAR targets all
    // coerce server-side, like unspecified-type driver parameters
    freshSmoke(populated = true)
    val (rcQ, outQ) = psql(
      "SELECT sum(score_val), max(rank_no) FROM graft_smoke")
    assert(rcQ == 0)
    assert(outQ.trim.startsWith("7.875|3"),
      s"typed arithmetic over string-inserted values, got: $outQ")
  }

  test("deleteRangeSql PREPAREs and executes on PG; null-dt rows " +
       "survive BETWEEN (TableOps.deleteRange's cross-backend contract)") {
    assume(ready, whyNot)
    freshSmoke(populated = true)
    // ?→$n is exactly the translation the PG wire protocol sees from
    // a driver-prepared statement
    val parts = Jdbc.deleteRangeSql("graft_smoke", "dw_dt",
      Some("report = 'a'")).split("\\?", -1)
    val numbered = parts.head + parts.tail.zipWithIndex
      .map { case (p, i) => s"$$${i + 1}$p" }.mkString
    // DEALLOCATE-by-recreate: the prepared name is session-scoped and
    // each psql() call is its own session, so no collision is possible
    val (rc, out) = psql(
      s"PREPARE graft_del AS $numbered",
      "EXECUTE graft_del('2024-01-01','2024-01-31')",
      "SELECT count(*), count(dw_dt) FROM graft_smoke")
    assert(rc == 0, s"prepared delete failed on PG: $out")
    // 3 rows - 1 deleted ('2024-01-31'/'a') = 2 left, one with NULL dt
    assert(out.trim.endsWith("2|1"),
      s"expected 2 survivors incl. the NULL-dt row, got: $out")
  }

  test("every RefCatalog table's rewritten DDL is valid PG " +
       "(schemas, -/_ identifiers, all-String columns)") {
    assume(ready, whyNot)
    val schemas = RefCatalog.tables.keys.map(_.split("\\.")(0)).toSeq
      .distinct.sorted
    // drop-cascade first: CREATE TABLE below is deliberately the plain
    // (non-IF-EXISTS) form the engine emits, so a rerun would 42P07
    val drops = schemas.map(s => s"DROP SCHEMA IF EXISTS $s CASCADE")
    val ddls = schemas.map(s => s"CREATE SCHEMA IF NOT EXISTS $s") ++
      RefCatalog.tables.toSeq.sortBy(_._1).map { case (tab, cols) =>
        Jdbc.createTableSql(Jdbc.physical(tab),
          cols.map(c => Jdbc.physical(c) -> "TEXT"))
      }
    val (rc, out) = psql(drops ++ ddls: _*)
    assert(rc == 0,
      s"a catalog table's DDL was rejected by live PG: $out")
    val (rcQ, outQ) = psql(
      "SELECT count(*) FROM information_schema.tables WHERE " +
        "table_schema IN ('" + schemas.mkString("','") + "')")
    assert(rcQ == 0 && outQ.trim == RefCatalog.tables.size.toString,
      s"expected ${RefCatalog.tables.size} catalog tables, got: $outQ")
  }

  /** Stage a public build + a live ods table: `graft_rpt_tmp` holds
    * the NEW rows, `ods.graft_rpt` the OLD row the publish must
    * replace. */
  private def freshPublishFixture(): Unit = {
    val (rc, out) = psql(
      "DROP SCHEMA IF EXISTS ods CASCADE",
      "CREATE SCHEMA ods",
      "DROP TABLE IF EXISTS graft_rpt_tmp",
      Jdbc.createTableSql("graft_rpt_tmp", reportSpecs),
      "INSERT INTO graft_rpt_tmp VALUES " +
        "('2024-03-31','2024-03-31T09:00:00+0800','a','1','5.000')," +
        "('2024-03-31','2024-03-31T09:00:00+0800','b','2','6.500')",
      "CREATE TABLE ods.graft_rpt (dw_dt CHAR(10), dw_ld_ts CHAR(24), " +
        "report TEXT, rank_no INT, score_val NUMERIC(18,3))",
      "INSERT INTO ods.graft_rpt VALUES " +
        "('2024-02-29','2024-02-29T09:00:00+0800','old','9','1.000')")
    assert(rc == 0, s"publish fixture setup failed: $out")
  }

  test("EP-3 replace-into-ods publish end-to-end: staged table swaps " +
       "into ods in one transaction (trgx.clj:188-193)") {
    assume(ready, whyNot)
    freshPublishFixture()
    // the three reference statements, ONE implicit transaction (a
    // single psql -c) — write → swap → read back
    val (rc, out) = psql(
      Jdbc.replaceIntoOdsSql("graft_rpt", "graft_rpt_tmp")
        .mkString("; "))
    assert(rc == 0, s"swap failed: $out")
    val (rcQ, outQ) = psql(
      "SELECT count(*), min(report), max(score_val) FROM ods.graft_rpt")
    assert(rcQ == 0 && outQ.trim.startsWith("2|a|6.500"),
      s"published ods table must hold exactly the staged rows: $outQ")
    val (_, outGone) = psql(
      "SELECT count(*) FROM information_schema.tables WHERE " +
        "table_schema='public' AND table_name='graft_rpt_tmp'")
    assert(outGone.trim == "0", s"staged table must be gone: $outGone")
  }

  test("EP-3 publish is atomic: a mid-swap failure rolls the whole " +
       "publish back, the live ods table survives") {
    assume(ready, whyNot)
    freshPublishFixture()
    // plant a conflict so statement 2 (SET SCHEMA ods) fails AFTER
    // statement 1 dropped the live table inside the transaction
    val (rcPlant, _) = psql(
      "CREATE TABLE ods.graft_rpt_tmp (x INT)")
    assert(rcPlant == 0)
    val (rcSwap, outSwap) = psql(
      Jdbc.replaceIntoOdsSql("graft_rpt", "graft_rpt_tmp")
        .mkString("; "))
    assert(rcSwap != 0, "conflicting swap must fail")
    assert(outSwap.contains("42P07") ||
      outSwap.toLowerCase.contains("already exists"), outSwap)
    // the DROP in statement 1 must have rolled back with everything
    // else: the OLD live table is still there, so is the staged build
    val (rcQ, outQ) = psql(
      "SELECT count(*), min(report) FROM ods.graft_rpt",
      "SELECT count(*) FROM graft_rpt_tmp")
    assert(rcQ == 0 && outQ.trim == "1|old\n2",
      s"failed publish must leave old live + staged intact: $outQ")
  }
}
