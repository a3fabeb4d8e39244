package graft

/** Toggle for the r21 optimization shapes, read at query-construction
  * time — exists so [[ABBench]] can adjudicate each change with tightly
  * alternating on/off runs in one session (host CPU steal on this box
  * reaches 50% in bad windows, making separate before/after bench runs
  * untrustworthy). Default ON: the declared queries always run the
  * optimized shape unless a session explicitly sets graft.r21=0.
  */
object Opt {
  def on(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.get("graft.r21", "1") == "1"
  def on: Boolean = on(org.apache.spark.sql.SparkSession.active)
}
