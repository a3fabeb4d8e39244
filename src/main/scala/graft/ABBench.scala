package graft

import org.apache.spark.sql.SparkSession

/** Alternating A/B adjudication harness (optimization rounds): runs each
  * named query with the `graft.r21` optimization flag ON and OFF in tight
  * alternation inside ONE session, so slow-varying host contention (this
  * box measures up to 50% CPU steal in bad windows) hits both variants
  * equally and the min/median ratio is trustworthy where two separate
  * bench runs are not. Usage:
  *   runMain graft.ABBench q1,q2 [pairs=6]
  */
object ABBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_scan_parquet").split(",").map(_.trim).toSeq
    val pairs = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r22: the flag the on/off alternation flips — defaults to graft.r21
    // (the r21 protocol); GRAFT_AB_KEY=graft.r22 adjudicates this round's
    // shapes without also reverting last round's.
    val abKey = sys.env.getOrElse("GRAFT_AB_KEY", "graft.r21")
    // optional session-conf experiment: GRAFT_AB_CONF="key=onVal|offVal"
    // (comma-separated pairs) — the ON variant sets onVal, OFF offVal
    val abConf: Seq[(String, String, String)] =
      sys.env.get("GRAFT_AB_CONF").toSeq.flatMap(_.split(",")).map { p =>
        val Array(k, vs) = p.split("=", 2)
        val Array(onV, offV) = vs.split("\\|", 2)
        (k, onV, offV)
      }
    def once(name: String, flag: String): Double = {
      spark.conf.set(abKey, flag)
      abConf.foreach { case (k, onV, offV) =>
        spark.conf.set(k, if (flag == "1") onV else offV)
      }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      // one throwaway warmup per variant (JIT, prebuilt index memo)
      once(name, "0"); once(name, "1")
      val on = scala.collection.mutable.ArrayBuffer[Double]()
      val off = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 1 to pairs) {
        // alternate order each pair so drift inside a pair cancels too
        if (i % 2 == 1) { off += once(name, "0"); on += once(name, "1") }
        else { on += once(name, "1"); off += once(name, "0") }
      }
      def stats(xs: Seq[Double]) = {
        val s = xs.sorted
        (s.head, s(s.size / 2))
      }
      val (minOff, medOff) = stats(off.toSeq)
      val (minOn, medOn) = stats(on.toSeq)
      println(f"[ab] $name%-34s off(min=$minOff%.3f med=$medOff%.3f)  " +
        f"on(min=$minOn%.3f med=$medOn%.3f)  ratio(min)=${minOn / minOff}%.3f " +
        f"ratio(med)=${medOn / medOff}%.3f")
    }
    spark.stop()
  }
}
