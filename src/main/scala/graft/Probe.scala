package graft

import org.apache.spark.sql.SparkSession

/** Dev probe runner (tooling, like [[Bench]]/[[GenScale]]): run named
  * gate queries against an arbitrary data dir, fully materialize
  * through the noop sink, and print wall time + result row count —
  * the single-query harness scale probes use when the full Bench
  * protocol (warm-up, min-of-three, disk floor) is not the question.
  *
  * Usage: runMain graft.Probe <sfDir> <gate1> [gate2 ...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = fn(spark, dir).count()
      println(f"[probe] $n wall=$wall%.2f s rows=$rows")
    }
    spark.stop()
  }
}
