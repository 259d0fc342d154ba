package graft


/** Dev tool: print the executed plan + wall time for named queries.
  *
  * Usage: runMain graft.PlanAudit <sfDir> <queryName> [<queryName>...]
  * Prints the formatted physical plan (after AQE final plan when the
  * query is executed) and two timed runs, so exchange reuse, pushed
  * filters, pruned schemas, and codegen spans can be audited per query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name : initial plan =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      // drive the Dataset's OWN queryExecution (df.count() would plan a
      // fresh execution and leave this one's AQE plan non-final)
      val t0 = System.nanoTime()
      val n = df.queryExecution.executedPlan.execute().count()
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan.execute().count()
      val t2 = System.nanoTime()
      println(s"===== $name : final adaptive plan =====")
      println(df.queryExecution.executedPlan.toString)
      println(f"===== $name rows=$n cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs =====")
    }
    spark.stop()
  }
}
