package graft

import graft.catalog.SparkCatalogClient
import graft.config.{ConfigError, JobConfig}
import graft.sources.{IncrementalSource, JdbcSource, ParquetSource}
import graft.state.FileBookmarkStore
import org.apache.spark.sql.SparkSession

/** CLI entry point — the engine-side equivalent of the reference job's
  * argument surface (`utils.get_job_args`, jdbc_incremental.py:238-306),
  * minus the AWS-isms. `--key value` pairs:
  *
  * required: --job-name --source (dir:PATH | jdbc:URL) --table-config JSON
  *           --target-location --target-database --target-format
  * optional: --target-table-prefix --source-table-prefix
  *           --job-index N --num-jobs N       (D1 md5 sharding)
  *           --hashfield COL --hashpartitions N (parallel JDBC read)
  *           --bookmarks PATH (default <target-location>/_bookmarks.json)
  */
object Main {

  def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0, "arguments must be --key value pairs")
    args.grouped(2).map {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
      case other => throw new ConfigError(s"bad argument pair: ${other.mkString(" ")}")
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    def req(k: String): String =
      a.getOrElse(k, throw new ConfigError(s"missing required argument --$k"))

    val config = JobConfig(
      jobName = req("job-name"),
      sourceTablePrefix = a.getOrElse("source-table-prefix", ""),
      targetLocation = req("target-location"),
      targetDatabase = req("target-database"),
      targetFormat = req("target-format"),
      tables = JobConfig.parseTableConfig {
        val tc = req("table-config")
        // @path reads the JSON from a file (shells and launchers mangle
        // inline quotes)
        if (tc.startsWith("@"))
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tc.drop(1))))
        else tc
      },
      targetTablePrefix = a.getOrElse("target-table-prefix", ""),
      jobIndex = a.getOrElse("job-index", "0").toInt,
      numJobs = a.getOrElse("num-jobs", "1").toInt,
      hashField = a.get("hashfield"),
      hashPartitions = a.get("hashpartitions").map(_.toInt))

    val builder = SparkSession.builder()
      .appName(config.jobName)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // normalizeTs/rawTsCol's NTZ→LTZ cast is value-identity only under
      // UTC — same pin as every other session builder in the repo
      .config("spark.sql.session.timeZone", "UTC")
    // Spark's 100-entry default whole-stage-codegen class cache is
    // smaller than one incremental-index pipeline, so long-lived
    // drivers/executors running many tables re-pay janino compilation
    // per run (measured: SCALE_r12 "driftprobe"; d54 21.7s → 14.9s
    // steady). Applied only when no operator-provided value exists —
    // checked against a defaults-loaded SparkConf, not bare sys.props,
    // so a spark-defaults.conf value that reached the driver as a conf
    // (not a system property) is respected rather than clobbered.
    if (!new org.apache.spark.SparkConf(true)
        .contains("spark.sql.codegen.cache.maxEntries"))
      builder.config("spark.sql.codegen.cache.maxEntries", "8192")
    // Second half of the same tax, attributed round 13 (SCALE_r13
    // "stcodegen"): the codegen cache keys on (source, classloader),
    // and session-artifact isolation gives every newSession/clone a
    // fresh executor-side classloader — a per-SESSION recompile of
    // every pipeline unit (~160 units/run for the streaming ingests)
    // even when the source text is cached. This driver adds no
    // session-scoped artifacts, so isolation buys nothing; disable it
    // unless the operator configured it, and keep generated class
    // names free of the run-order-dependent codegen-stage id so the
    // source text itself stays cache-stable.
    if (!new org.apache.spark.SparkConf(true)
        .contains("spark.sql.artifact.isolation.enabled"))
      builder.config("spark.sql.artifact.isolation.enabled", "false")
    if (!new org.apache.spark.SparkConf(true)
        .contains("spark.sql.codegen.useIdInClassName"))
      builder.config("spark.sql.codegen.useIdInClassName", "false")
    // spark-submit provides spark.master; standalone runs default to local
    if (!sys.props.contains("spark.master"))
      builder.master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
    val spark = builder.getOrCreate()

    val source: IncrementalSource = req("source") match {
      case s if s.startsWith("dir:")  => new ParquetSource(s.drop(4))
      case s if s.startsWith("jdbc:") =>
        new JdbcSource(s, Map.empty, config.hashField, config.hashPartitions.getOrElse(1))
      case other => throw new ConfigError(s"source must be dir:PATH or jdbc:URL, got $other")
    }

    val catalog = new SparkCatalogClient(spark)
    catalog.ensureDatabase(config.targetDatabase)
    val bookmarks = new FileBookmarkStore(
      a.getOrElse("bookmarks", s"${config.targetLocation.stripSuffix("/")}/_bookmarks.json"))

    val results = new Driver(spark, config, source, catalog, bookmarks).run()
    results.foreach { r =>
      println(s"[graft] ${r.table}: rows=${r.rowsWritten} skipped=${r.skippedEmpty}")
    }
    spark.stop()
  }
}
