package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** Single-job execution: the port of `execJob` + `writeResults`
  * (`internal/core/core.go:450-572`).
  *
  * A job runs inside its own Spark *session* (shared SparkContext, isolated
  * temp-view catalog) so concurrent jobs against different named sources
  * can't see each other's table registrations. The executing thread tags all
  * Spark jobs with the job ID as the job group with `interruptOnCancel=true`
  * — `sparkContext.cancelJobGroup(jobId)` is then the 1:1 port of the
  * reference's per-job `context.CancelFunc` (`core.go:457-468`), and strictly
  * stronger: it kills every stage of the plan, not just the driver-side wait.
  *
  * Materialization (`writeResults`, core.go:511-572): pick a random result
  * backend, cast the result to the canonical 6-type schema (§1.2), and write
  * `results_<jobID>` parquet with overwrite — the atomic per-directory commit
  * replaces the reference's DROP TABLE + CREATE + tx (`sqldb.go:159-217`).
  * The returned row count is stored as the job result (`core.go:436`).
  */
object Executor {

  final case class ExecResult(count: Long, resultDir: String, sourceName: String)

  def resultDir(backendDir: String, jobId: String): String =
    s"$backendDir/results_$jobId"

  /** `results_%s` table-name template (sqldb.go:77-81). */
  def resultTable(jobId: String): String = s"results_$jobId"

  /** Dialect-quoted form for use as a JDBC dbtable (job IDs may contain `-`;
    * the reference quotes with the backend's dialect, sqldb.go:307-314:
    * backticks on MySQL, double quotes elsewhere; ClickHouse takes backticks
    * like MySQL). */
  def quotedResultTable(url: String, jobId: String): String = {
    val q = if (url.startsWith("jdbc:mysql:") ||
      ClickHouseDialect.canHandle(url)) "`" else "\""
    q + resultTable(jobId) + q
  }

  /** Build the job's DataFrame without materializing (shared by run()).
    *
    * A source is either a parquet directory or a `jdbc:` URL — the latter is
    * the direct analog of the reference's external source databases
    * (`dbpool.go`): each table the task SQL references becomes a
    * `spark.read.jdbc` relation, and Catalyst pushes filters + column
    * pruning down into the remote DB exactly the way the reference delegates
    * whole queries to it.
    */
  def buildFrame(session: SparkSession, sourceDir: String, task: Task, args: Seq[String]): DataFrame = {
    val sql = ArgBinder.bind(task.raw, args)
    graft.functions.GraftFunctions.registerAll(session) // custom fns for task SQL
    ClickHouseDialect.ensureRegistered() // no-op after first call
    if (sourceDir.startsWith("jdbc:")) jdbcFrame(session, sourceDir, sql)
    else {
      // register only the tables the statement references: creating a
      // DataFrame reads parquet footers eagerly, so a job touching one
      // table must not pay a schema read per fixture table (the per-job
      // overhead is what a job server multiplies)
      val (cteNames, tables) = collectRelations(session, sql)
      val referenced = tables.collect {
        case parts if parts.size == 1 && !cteNames.contains(parts.head.toLowerCase) =>
          parts.head.toLowerCase
      }.toSet
      Tables.registerReferenced(session, sourceDir, referenced)
      session.sql(sql)
    }
  }

  /** CTE names + referenced relations of a statement (shared by the parquet
    * and JDBC source paths). CTE bodies live in `UnresolvedWith.cteRelations`
    * (inner children, not traversed by `collect`) — walked explicitly so
    * tables referenced inside a CTE count, while CTE names themselves don't. */
  private def collectRelations(session: SparkSession, sql: String): (Set[String], Vector[Seq[String]]) = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    var cteNames = Set.empty[String]
    var tables = Vector.empty[Seq[String]]
    var work = List[LogicalPlan](parsed)
    while (work.nonEmpty) {
      val p = work.head
      work = work.tail
      p.foreach { node =>
        node.subqueries.foreach(sq => work = sq :: work) // IN/EXISTS/scalar subqueries
        node match {
          case w: UnresolvedWith =>
            cteNames ++= w.cteRelations.map(_._1.toLowerCase)
            work = w.cteRelations.map(_._2: LogicalPlan).toList ++ work
          case r: UnresolvedRelation => tables :+= r.multipartIdentifier
          case _ => ()
        }
      }
    }
    (cteNames, tables)
  }

  /** Build the frame for a jdbc: source: register a JDBC relation for every
    * table the statement references — excluding CTE-defined names, which are
    * not remote tables — and rewrite the parsed plan to point at the
    * registered views. Schema-qualified names (`public.users`) are invalid as
    * temp-view names, so each goes under a sanitized alias and the plan's
    * `UnresolvedRelation`s are substituted (the reference delegates such SQL
    * verbatim to the source DB; here the qualified name travels in `dbtable`).
    */
  private def jdbcFrame(session: SparkSession, url: String, sql: String): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    val (cteNames, tables) = collectRelations(session, sql)
    def isCte(parts: Seq[String]): Boolean =
      parts.size == 1 && cteNames.contains(parts.head.toLowerCase)
    // key case-insensitively (Spark resolution default) but keep the
    // original-case name for `dbtable` — the remote DB may be case-sensitive
    val remote: Map[Seq[String], Seq[String]] = tables.filterNot(isCte)
      .map(parts => parts.map(_.toLowerCase) -> parts).toMap
    // single-part names keep their own name as the view; qualified names get
    // a sanitized alias (`public.users` → `graft_jdbc_public_users_<hash>`;
    // the hash disambiguates names that sanitize to the same string)
    val alias: Map[Seq[String], String] = remote.map { case (key, parts) =>
      val v =
        if (parts.size == 1) parts.head
        else {
          val joined = parts.mkString(".")
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
          "graft_jdbc_" + joined.replaceAll("[^A-Za-z0-9_]", "_") + "_" + h
        }
      key -> v
    }
    alias.foreach { case (key, view) =>
      session.read.format("jdbc")
        .option("url", url)
        .option("dbtable", remote(key).mkString("."))
        .load()
        .createOrReplaceTempView(view)
    }
    def rewrite(p: LogicalPlan): LogicalPlan = p.transformDownWithSubqueries {
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, s, o) =>
          (n, rewrite(s).asInstanceOf[SubqueryAlias], o)
        })
      case r: UnresolvedRelation if r.multipartIdentifier.size > 1 =>
        alias.get(r.multipartIdentifier.map(_.toLowerCase)) match {
          case Some(view) => r.copy(multipartIdentifier = Seq(view))
          case None       => r
        }
    }
    GraftColumnShim.ofRows(session, rewrite(parsed))
  }

  /** Execute one job end-to-end on the calling thread. */
  def run(spark: SparkSession, job: Job, task: Task, rnd: Random = Random): ExecResult = {
    val session = spark.newSession()
    val sc = session.sparkContext
    sc.setJobGroup(job.id, s"graft task=${task.name} job=${job.id}", interruptOnCancel = true)
    try {
      // named DB else random pick (core.go:483-492)
      val (srcName, srcDir) = job.db match {
        case Some(name) => (name, task.dbs.get(name))
        case None       => task.dbs.getRandom(rnd)
      }
      val (_, backendDir) = task.resultBackends.getRandom(rnd) // core.go:515
      val df = buildFrame(session, srcDir, task, job.args)
      val out = CanonicalTypes.castToCanonical(df)
      if (backendDir.startsWith("jdbc:")) {
        // external result DB, like the reference's MySQL/PG backends:
        // overwrite = DROP TABLE IF EXISTS + CREATE (sqldb.go:159-188)
        ClickHouseDialect.ensureRegistered()
        val table = quotedResultTable(backendDir, job.id)
        val writer = out.write.mode("overwrite")
        // ClickHouse CREATE TABLE requires an engine clause
        (if (ClickHouseDialect.canHandle(backendDir))
          writer.option("createTableOptions", ClickHouseDialect.resultTableEngine)
        else writer)
          .jdbc(backendDir, table, new java.util.Properties)
        ResultClock.touch(backendDir, resultTable(job.id)) // refresh sweeper TTL
        val count = session.read.jdbc(backendDir, table, new java.util.Properties).count()
        ExecResult(count, s"$backendDir#${resultTable(job.id)}", srcName)
      } else {
        val dest = resultDir(backendDir, job.id)
        out.write.mode("overwrite").parquet(dest)
        // count from the committed files' footers (metadata-only, no rescan)
        val count = session.read.parquet(dest).count()
        ExecResult(count, dest, srcName)
      }
    } finally sc.clearJobGroup()
  }
}
