package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's time travel over plain parquet — the snapshot/versioning
  * slice of what the reference's Delta sink COULD offer but never uses
  * (box_ingest.py only ever `mode("append").saveAsTable`s; no Delta
  * jars ship in this environment, SURVEY §7). Layout:
  *
  *   <root>/v1/part-*.parquet + _SUCCESS
  *   <root>/v2/...
  *
  * A version is COMMITTED iff Spark's `_SUCCESS` marker exists — there
  * is no pointer file to update, so there is no pointer to corrupt: a
  * crashed writer leaves an uncommitted directory that every reader
  * ignores, and readers of version N see immutable, fully-committed
  * files forever (snapshot isolation by construction). Concurrent
  * writers race on `errorifexists` of the same next directory — one
  * wins, one gets a clean failure (optimistic concurrency).
  *
  * Scale notes: version resolution is ONE directory listing of `root`
  * (children named `v<N>` — never a recursive scan); data files are
  * written once and never rewritten or moved, so time travel costs
  * nothing at write time; old versions are reclaimed by deleting their
  * directory (a `retain(k)` sweep) — the same mechanics as table-format
  * snapshot expiry.
  */
object VersionedTable {

  private val VersionRe = "^v([0-9]+)$".r

  private def fileSystem(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** All claimed version directories, committed or not. */
  private def claimed(spark: SparkSession, root: String): Seq[(Int, Boolean)] = {
    val fs = fileSystem(spark, root)
    val dir = new Path(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case VersionRe(n) =>
          Some((n.toInt, fs.exists(new Path(st.getPath, "_SUCCESS"))))
        case _ => None
      })
      .sortBy(_._1)
  }

  /** Committed version numbers, ascending (uncommitted = no _SUCCESS). */
  def versions(spark: SparkSession, root: String): Seq[Int] =
    claimed(spark, root).collect { case (v, true) => v }

  def latestVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  /** Write `df` as the next version; returns its number. The version
    * counter advances past every CLAIMED directory — committed or the
    * debris of a crashed writer — so an abandoned claim never blocks
    * the table; the directory itself is claimed with `errorifexists`,
    * so two concurrent writers racing for the same number cannot both
    * commit it. */
  def write(df: DataFrame, root: String): Int = {
    val next = claimed(df.sparkSession, root)
      .lastOption.map(_._1).getOrElse(0) + 1
    df.write.mode("errorifexists").parquet(s"$root/v$next")
    next
  }

  /** Read a committed version; `version = -1` (default) reads latest. */
  def read(spark: SparkSession, root: String, version: Int = -1): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no committed versions under $root")
    val v = if (version == -1) vs.last else version
    require(vs.contains(v),
      s"version $v not committed under $root (have: ${vs.mkString(", ")})")
    spark.read.parquet(s"$root/v$v")
  }

  /** Expire all but the newest `k` committed versions (snapshot expiry).
    * Returns the versions removed. */
  def retain(spark: SparkSession, root: String, k: Int): Seq[Int] = {
    require(k >= 1, s"k=$k")
    val fs = fileSystem(spark, root)
    val drop = versions(spark, root).dropRight(k)
    drop.foreach(v => fs.delete(new Path(s"$root/v$v"), true))
    drop
  }
}
