package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Correctness-gate marker (ADVICE r18 #1): queries with production
    // knobs whose DuckDB oracle hardcodes the default (e.g.
    // graft.media.phash.occcutoff) REFUSE a non-default setting when this
    // flag is up, so a stray conf can never silently desync the gate —
    // the run fails loudly instead of hash-mismatching.
    spark.conf.set("graft.gate", "true")
    // A/B and deployment-shape verification (r22): the same env hooks as
    // PlanSnap, so the oracle gate can run against the off-shapes
    // (GRAFT_R21=0 / GRAFT_R22=0) and the cluster shapes
    // (GRAFT_SCALE_CLUSTER=1) — "oracle green both ways" is the
    // adjudication bar for every shape switch. Unset = driver defaults.
    Seq("GRAFT_R21" -> "graft.r21", "GRAFT_R22" -> "graft.r22",
        "GRAFT_SCALE_CLUSTER" -> "graft.scale.cluster").foreach {
      case (env, key) => sys.env.get(env).foreach(spark.conf.set(key, _))
    }
    new java.io.File(outDir).mkdirs()
    // comma-separated allowlist for single-query dumps (local iteration);
    // unset = all, which is what the driver runs
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // A failed query must be LOUD in the artifact itself: round 12 lost 24
    // queries to a schema drift and the correctness file silently shrank.
    // Record every failure in _errors.json alongside the dumps.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.forall(_.contains(name)))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        }
        finally spark.catalog.clearCache() // queries may cache() internally
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ${failures.size} queries FAILED: ${failures.keys.mkString(", ")}")
    spark.stop()
  }
}
