object PlanProbe extends App {
  val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[8]").config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val df = graft.SparkEntry.queries("q_similarity_ivfpq_indexed")(spark, "/root/testdata/sf0.01")
  val plan = df.queryExecution.executedPlan.toString
  println("HAS_DPP=" + plan.contains("dynamicpruning"))
  println(plan.split("\n").filter(s => s.contains("PartitionFilters") || s.contains("Scan parquet")).take(6).mkString("\n"))
  spark.stop()
}
