package graft

import graft.queries.Registry
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are fully
  * materialized through the noop sink (a bare .count() lets Spark skip
  * column materialization for scan-shaped queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition override for scale probes: at 10x+ data the
    // cpus-sized default makes heavy shuffles (wedge frames, band
    // buckets) spill; a real cluster sizes this to data volume, not
    // cores, so the probe should too.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      // Let AQE SIZE each shuffle instead of pinning it to the core
      // count: every exchange starts at initialPartitionNum and AQE
      // coalesces down to advisory-size partitions, so a small agg still
      // runs ~cpus-wide while a wedge/band-bucket shuffle at 10x data
      // keeps enough partitions to stay in memory (the sf1 probe measured
      // g1_triangles at 388s with 32 pinned partitions vs 72s sized —
      // pure spill). This is what a real cluster config does with
      // data-volume-sized shuffles.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_ONLY=name1,name2 restricts the set (dev iteration).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val benchDefs = Registry.all.filter(q =>
      only.map(_.contains(q.name)).getOrElse(q.bench))
    // SPARK_GRAFT_BENCH_RUNS=1 + SPARK_GRAFT_BENCH_WARMUP=0: single-shot
    // protocol for the large-SF scale probe, where a 4x pass at 10x data
    // costs half an hour and linear-vs-superlinear is the question, not
    // ±25% noise. The official sf0.1 record keeps the default protocol.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3)
    val warmup = sys.env.get("SPARK_GRAFT_BENCH_WARMUP").forall(_ != "0")
    // One warm-up pass (JIT + codegen cache + file-footer cache), then the
    // minimum of three timed runs per query: single-shot timings on a
    // shared box swing ±25% from GC/JIT noise — and the round-5 official
    // record was 63% inflated by CONCURRENT test load — so min-of-N is
    // the estimator of achievable latency, and the bench must run with
    // nothing else executing on the box (SURVEY "Bench protocol").
    if (warmup) benchDefs.foreach { q =>
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = benchDefs.map { q =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
