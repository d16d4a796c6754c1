package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe multi-table swap for persisted-index compaction
  * ([[graft.ext.AnnIndex.compactIvfPq]],
  * [[graft.ext.Dedup.compactMinHashIndex]],
  * [[graft.ext.Decontam.compactIndex]]): replace the live tables under
  * `root` with freshly-staged copies WITHOUT ever holding zero copies of
  * any table.
  *
  * The naive delete-then-rename swap has two failure modes this helper
  * exists to close: (a) a rename that fails AFTER the delete destroys
  * both the old and the new copy of that table, leaving the index
  * unrecoverable; (b) dropping the staging dir on a failed swap throws
  * away the only surviving good copy. Protocol instead:
  *
  *   1. every live table is renamed ASIDE to a dot-hidden backup
  *      (`.old-<tag>-<table>`) — never deleted first;
  *   2. each staged table renames into place;
  *   3. only after ALL tables swapped are the backups (and the
  *      then-empty staging dir) removed;
  *   4. on ANY failure, tables already swapped are rolled back from
  *      their backups, and the staging dir is KEPT on disk so the
  *      operator can recover by hand — the thrown error names it.
  *
  * Still single-writer and NOT atomic across tables against concurrent
  * READERS mid-swap (the plain-parquet contract of every sink here —
  * wrap the root in [[graft.sink.VersionedTable]] for snapshot
  * isolation); what it guarantees is that a crash or rename failure at
  * any step leaves a complete, consistent copy of every table on disk.
  */
object StagedSwap {

  /** Swap `tables` from under `staging` into `root`. Every table must
    * exist under `staging`; a table missing under `root` (first
    * materialization) is swapped in without a backup. */
  def swapIn(fs: FileSystem, root: String, staging: String,
      tables: Seq[String]): Unit = {
    val tag = java.util.UUID.randomUUID().toString
    def live(t: String) = new Path(s"$root/$t")
    def staged(t: String) = new Path(s"$staging/$t")
    def backup(t: String) = new Path(s"$root/.old-$tag-$t")

    val swapped = scala.collection.mutable.ListBuffer.empty[String]
    try {
      tables.foreach { t =>
        require(fs.exists(staged(t)),
          s"StagedSwap: staged table $t missing under $staging")
        if (fs.exists(live(t)))
          require(fs.rename(live(t), backup(t)),
            s"StagedSwap: renaming live $t aside failed")
        require(fs.rename(staged(t), live(t)),
          s"StagedSwap: renaming staged $t into place failed")
        swapped += t
      }
    } catch {
      case e: Throwable =>
        // Roll back what already swapped so the live index stays the OLD
        // one; keep the staging dir (and any stuck backup) for manual
        // recovery — deleting here is exactly the data-loss bug this
        // helper replaces.
        swapped.reverse.foreach { t =>
          if (fs.exists(backup(t))) {
            // return the already-swapped staged copy to the staging dir
            // (it is part of the recovery copy we promise to keep), then
            // restore the old table from its backup
            if (fs.exists(live(t)) && !fs.rename(live(t), staged(t)))
              fs.delete(live(t), true)
            fs.rename(backup(t), live(t))
          }
        }
        throw new IllegalStateException(
          s"StagedSwap: swap into $root failed and was rolled back; " +
            s"the staged copy is KEPT at $staging for recovery", e)
    }
    tables.foreach(t => fs.delete(backup(t), true))
    fs.delete(new Path(staging), true)
  }
}
