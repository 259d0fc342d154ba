package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Dev tool: skew-join stress probe. Builds a zipf-skewed fact table
  * (one key owns ~50% of all rows, tail uniform over 100k keys), joins
  * it to a key-dimension with broadcast DISABLED so the planner must
  * shuffle both sides — the canonical 100 TB skew hazard: one reducer
  * gets the hot key's entire partition. Runs the join twice, with
  * AQE's skew-join split on and off, and reports the heaviest-task /
  * median-task duration ratio of the heaviest stage plus whether the
  * final plan shows `skew=true` AQE shuffle reads.
  *
  * Expectation (recorded in SURVEY §4a): with the split ON the
  * heaviest task stays within ~2x the median; OFF it is bounded only
  * by the hot key's share (~50% of the data in one task).
  *
  * Usage: runMain graft.SkewProbe [rows]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = GraftSession.local()

    // per-stage task durations, collected off the listener bus
    val durs = collection.concurrent.TrieMap[Int, Vector[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        durs.updateWith(t.stageId)(o =>
          Some(o.getOrElse(Vector.empty) :+ t.taskInfo.duration))
    })

    // zipf-ish fact: ~half of all rows on key 0, rest uniform over 100k
    val fact = spark.range(rows).select(
      when(pmod(hash(col("id")), lit(100)) < 50, 0L)
        .otherwise(pmod(hash(col("id"), lit(7)), lit(100000))).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    val dim = spark.range(100000).select(col("id").as("k"),
      (col("id") % 97).cast("double").as("w"))

    def run(skewSplit: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      // force a shuffled join: a 100k-row dim would broadcast and hide
      // the skew entirely (which IS the first-choice fix — this probe
      // exercises the case where both sides are too big to broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // local-scale stand-ins for the cluster defaults (256m threshold,
      // 64m advisory): the probe's hot partition is ~100 MB, which at
      // cluster data volumes would be multi-GB — scale the knobs so the
      // 5x-median + absolute-size trigger fires the same way
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      durs.clear()
      val df = fact.join(dim, Seq("k"))
        .agg(sum(col("v") * col("w")).as("s"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val skewReads = "skew=true".r.findAllIn(plan).length
      // the join stage dominates total task time — attribute to it
      val stage = durs.values.filter(_.length > 1).maxBy(_.sum)
      val sorted = stage.sorted
      val median = sorted(sorted.length / 2).max(1L)
      println(f"[skewprobe] split=$skewSplit rows=$rows " +
        f"skewReads=$skewReads tasks=${sorted.length} " +
        f"maxTaskMs=${sorted.last} medianTaskMs=$median " +
        f"maxOverMedian=${sorted.last.toDouble / median}%.1f")
    }

    run(skewSplit = false)
    run(skewSplit = true)
    spark.stop()
  }
}
