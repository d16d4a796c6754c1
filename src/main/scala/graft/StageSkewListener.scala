package graft

/** Per-stage task-duration skew collector shared by the measurement
  * mains ([[Bench]], [[Probe]], [[DecontamProbe]]): max/median task
  * millis of the most skewed ≥8-task stage (max ≥200 ms) seen since
  * the last reset. A ratio near 1 means balanced partitions; >>1 is
  * the straggler signature a Zipfian key produces when a plan
  * co-locates a hot key. One class so a threshold tweak reaches every
  * probe protocol at once. */
private[graft] final class StageSkewListener
    extends org.apache.spark.scheduler.SparkListener {
  private val stages = new java.util.concurrent.ConcurrentHashMap[
    Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()

  override def onTaskEnd(
      t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    if (t.taskInfo != null && t.taskInfo.successful) {
      stages.computeIfAbsent(t.stageId,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
        .add(t.taskInfo.duration)
    }

  def reset(): Unit = stages.clear()

  /** (maxTaskMs, medianTaskMs, ratio) of the worst qualifying stage. */
  def worst(): Option[(Long, Long, Double)] = {
    import scala.jdk.CollectionConverters._
    stages.values.asScala.toSeq
      .map(q => q.asScala.toSeq.sorted)
      .filter(ds => ds.size >= 8 && ds.last >= 200)
      .map { ds =>
        val med = math.max(ds(ds.size / 2), 1L)
        (ds.last, med, ds.last.toDouble / med)
      }
      .sortBy(-_._3).headOption
  }
}
