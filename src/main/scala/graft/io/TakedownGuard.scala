package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Enforces the takedown small-list premise the persisted indexes serve
  * under ([[graft.ext.AnnIndex.deleteFromIvfPq]],
  * [[graft.ext.Dedup.deleteFromMinHashIndex]],
  * [[graft.ext.Bm25Index.delete]]): delete markers are anti-joined
  * BROADCAST on every serve, which is only sound while the marker table
  * stays small relative to the corpus. "A deletion set that stops being
  * small is a rebuild, not a marker list" was a scaladoc'd rule with
  * nothing enforcing it — a takedown cadence that quietly outgrew the
  * premise would degrade every serve instead of surfacing a decision.
  * This guard turns that silent perf cliff into a loud error at marker
  * READ time.
  *
  * The check is one driver-side FS metadata call (content summary of the
  * marker dir — no Spark job, no scan), paid only when a marker table
  * exists, so the no-deletions serve plan stays byte-identical (the
  * PlanSpec pins). Threshold: `graft.takedown.maxMarkerBytes` session
  * conf (bytes; <= 0 disables), default 64 MB — roughly 10^6..10^7
  * marked ids depending on encoding, far past where a rebuild/compact is
  * the right call and still far under broadcast limits, so the guard
  * fires before the serve degrades rather than after.
  */
object TakedownGuard {
  val confKey = "graft.takedown.maxMarkerBytes"
  val defaultMaxBytes: Long = 64L << 20

  /** Opt-in PASS cache (ms). Default 0 = re-measure on every serve
    * (exact semantics). On an object store the content summary is a
    * LIST per serve plan — a deployment building thousands of plans/s
    * sets this to its takedown cadence (say 60000) and accepts the
    * bounded staleness: a marker table can outgrow the limit unseen
    * for at most this window. Only PASSES are cached (a failure always
    * re-measures AND evicts the entry, so compacting immediately
    * un-bricks serving without waiting out the window), and only while
    * the threshold conf is unchanged (a tightened limit invalidates
    * prior passes). Same-path-reuse caveat: the cache keys on the dir
    * PATH, so an index torn down and rebuilt at the same path inherits
    * the old index's PASS for up to the window — the same bounded
    * staleness the window already grants, stated explicitly. Expired
    * and failed entries are evicted as they are seen, and the map is
    * cleared outright past a size backstop, so a long-lived JVM
    * serving many distinct index dirs cannot grow it unboundedly. */
  val cacheConfKey = "graft.takedown.guardCacheMs"

  /** Size backstop for the PASS cache: far above any real count of
    * concurrently-served index dirs; clearing (rather than LRU) keeps
    * the degenerate case trivial and only costs re-measures. */
  private val maxCacheEntries = 4096

  /** markerDir -> (pass time nanos, threshold the pass was against). */
  private val passed =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()

  /** Throw if the on-disk marker table under `markerDir` exceeds the
    * configured threshold. Callers invoke this AFTER establishing the
    * dir exists (the common no-deletions case pays nothing). `what`
    * names the index family for the error message. */
  def check(spark: SparkSession, markerDir: Path, what: String): Unit = {
    val max = spark.conf.get(confKey, defaultMaxBytes.toString).toLong
    if (max <= 0L) return
    val cacheMs = spark.conf.get(cacheConfKey, "0").toLong
    val key = markerDir.toString
    if (cacheMs > 0L) Option(passed.get(key)).foreach { case (t, m) =>
      if (m == max && System.nanoTime() - t < cacheMs * 1000000L) return
      passed.remove(key) // expired, or the threshold conf changed
    }
    val fs = markerDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(markerDir).getLength
    if (bytes > max) {
      passed.remove(key) // a failed dir must never serve a stale PASS
      throw new IllegalStateException(
        s"$what: takedown marker table $markerDir is $bytes bytes " +
          s"(> $max): a deletion set this large is a compact/rebuild, " +
          "not a broadcast marker list — run the index's compact to make " +
          s"the removals physical (or raise $confKey)")
    }
    if (cacheMs > 0L) {
      if (passed.size > maxCacheEntries) passed.clear()
      passed.put(key, (System.nanoTime(), max))
    }
  }
}
