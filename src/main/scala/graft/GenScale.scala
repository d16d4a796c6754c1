package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator (dev tooling, like [[Bench]]/[[Verify]]):
  * replicates a driver-generated testdata dir N× with key remapping, so
  * the bench set can be probed at ~10× the largest provided SF and a
  * super-linear surprise (skew, AQE misfire, candidate blow-up) shows up
  * before a real cluster finds it.
  *
  * Referential integrity is preserved per key domain: copy `i` shifts
  * every key by `i × (max(key)+1)` consistently across fact and
  * dimension (orders.o_custkey moves with customer.c_custkey, lineitem
  * moves with orders/part/supplier). region/nation are fixed-size TPC-H
  * dims and are copied once. events shift event_id/user_id so the
  * session/graph workloads scale as independent subgraphs — exactly how
  * 10× more users would look. documents shift doc_id AND rotate a
  * 10-letter alphabet per copy (lengths, token shapes, and within-copy
  * near-dup structure preserved; cross-copy shingle Jaccard ~0), so the
  * LSH dedup workloads scale by corpus size instead of drowning in
  * artificial cross-copy duplicate buckets. embeddings shift vec_id only
  * (the benched ANN queries are capacity-bounded top-k — duplicate
  * vectors across copies cannot blow them up).
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> <copies>
  */
object GenScale {

  /** 10 rotations of a 10-letter alphabet: copy i translates letter j to
    * letter (j+i)%10 — identity for copy 0. */
  private val alphabet = "aeiousnrtl"

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, copiesStr) = args
    val copies = copiesStr.toInt
    require(copies >= 1 && copies <= alphabet.length,
      s"copies must be 1..${alphabet.length} (distinct text rotations)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val custOff = off(tbl("customer"), "c_custkey")
    val suppOff = off(tbl("supplier"), "s_suppkey")
    val partOff = off(tbl("part"), "p_partkey")
    val ordOff  = off(tbl("orders"), "o_orderkey")
    val evOff   = off(tbl("events"), "event_id")
    val userOff = off(tbl("events"), "user_id")
    val docOff  = off(tbl("documents"), "doc_id")
    val vecOff  = off(tbl("embeddings"), "vec_id")

    /** Union `copies` shifted replicas; `shift` maps (df, copyIndex). */
    def replicate(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val src = tbl(name)
      val out = (0 until copies).map(i => shift(src, i))
        .reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[genscale] $name x$copies written")
    }

    // fixed-size dims: one copy
    Seq("region", "nation").foreach { n =>
      tbl(n).write.mode("overwrite").parquet(s"$outDir/$n.parquet")
      println(s"[genscale] $n copied")
    }
    replicate("customer")((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custOff)))
    replicate("supplier")((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppOff)))
    replicate("part")((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partOff)))
    replicate("orders")((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * ordOff))
      .withColumn("o_custkey", col("o_custkey") + lit(i * custOff)))
    replicate("lineitem")((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * ordOff))
      .withColumn("l_partkey", col("l_partkey") + lit(i * partOff))
      .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppOff)))
    // ts stays a raw nanos long: Tables.events floor-divides it the same
    // way whether the column arrived annotated TIMESTAMP(NANOS) or plain
    // INT64, so the probe dir is read by the identical code path.
    replicate("events")((df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * evOff))
      .withColumn("user_id", col("user_id") + lit(i * userOff)))
    replicate("documents")((df, i) => df
      .withColumn("doc_id", col("doc_id") + lit(i * docOff))
      .withColumn("text", translate(col("text"),
        alphabet, alphabet.drop(i) + alphabet.take(i))))
    replicate("embeddings")((df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecOff)))

    spark.stop()
  }
}
