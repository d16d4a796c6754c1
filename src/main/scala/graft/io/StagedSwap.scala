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
  *   4. on ANY failure, every table whose live copy moved aside — the
  *      fully-swapped ones AND the in-flight one whose staged rename
  *      failed — is restored from its backup, a first-materialization
  *      table's new copy returns to staging (the root holds exactly the
  *      OLD index, never a mixed-version one), and the staging dir is
  *      KEPT on disk so the operator can recover by hand — the thrown
  *      error names it.
  *
  * Still single-writer and NOT atomic across tables against concurrent
  * READERS mid-swap (the plain-parquet contract of every sink here —
  * wrap the root in [[graft.sink.VersionedTable]] for snapshot
  * isolation); what it guarantees is that a crash or rename failure at
  * any step leaves a complete, consistent copy of every table on disk.
  */
object StagedSwap {

  /** Detect a TORN swap: `.old-<tag>-*` backups under `root` exist only
    * (a) during the seconds-long swap window — when concurrent reads
    * are documented unsafe anyway — or (b) after a mid-swap process
    * crash, when some tables are new and others old and every read
    * would silently combine them. Index `open()` paths call this so a
    * torn state fails LOUDLY with the recovery pointer instead of
    * serving wrong answers (a dot-hidden `.compact-*` staging dir
    * alone is NOT flagged: it exists for the whole harmless build
    * phase, and a rolled-back swap keeps it on purpose while the live
    * tables are consistent). One driver-side listStatus. */
  def assertNotTorn(fs: FileSystem, root: String, what: String): Unit = {
    val r = new Path(root)
    if (!fs.exists(r)) return
    val backups = fs.listStatus(r)
      .map(_.getPath.getName).filter(_.startsWith(".old-"))
    if (backups.nonEmpty)
      throw new IllegalStateException(
        s"$what: $root holds swap backups (${backups.mkString(", ")}) — " +
          "a compact crashed MID-SWAP and the live tables may mix old " +
          "and new copies; restore by hand from the backups and the " +
          "kept .compact-* staging dir before serving")
  }

  /** Swap `tables` from under `staging` into `root`. Every table must
    * exist under `staging`; a table missing under `root` (first
    * materialization) is swapped in without a backup. */
  def swapIn(fs: FileSystem, root: String, staging: String,
      tables: Seq[String]): Unit = {
    val tag = java.util.UUID.randomUUID().toString
    def live(t: String) = new Path(s"$root/$t")
    def staged(t: String) = new Path(s"$staging/$t")
    def backup(t: String) = new Path(s"$root/.old-$tag-$t")

    // Two per-table facts tracked SEPARATELY (a table can have done the
    // first and not the second — the in-flight table of a mid-swap
    // failure, whose backup the rollback must still restore):
    //   aside  — the live copy was renamed to its backup
    //   placed — the staged copy was renamed into the live slot
    val aside = scala.collection.mutable.Set.empty[String]
    val placed = scala.collection.mutable.Set.empty[String]
    try {
      tables.foreach { t =>
        require(fs.exists(staged(t)),
          s"StagedSwap: staged table $t missing under $staging")
        if (fs.exists(live(t))) {
          require(fs.rename(live(t), backup(t)),
            s"StagedSwap: renaming live $t aside failed")
          aside += t
        }
        require(fs.rename(staged(t), live(t)),
          s"StagedSwap: renaming staged $t into place failed")
        placed += t
      }
    } catch {
      case e: Throwable =>
        // Roll back so the live root is the complete OLD index again;
        // keep the staging dir (and any stuck backup) for manual
        // recovery — deleting here is exactly the data-loss bug this
        // helper replaces. Per table, in reverse: first vacate the live
        // slot if the NEW copy landed there (back to staging — it is
        // part of the recovery copy we promise to keep; a table that
        // had no old copy ends absent, matching the old root), then
        // restore the backup if one was taken (including the in-flight
        // table whose staged rename failed AFTER its live copy moved
        // aside — the case a placed-only rollback misses).
        val sacrificed = scala.collection.mutable.ListBuffer.empty[String]
        val unrestored = scala.collection.mutable.ListBuffer.empty[String]
        tables.reverse.foreach { t =>
          if (placed(t) && fs.exists(live(t))) {
            // never delete a staged copy to make room: fall back to a
            // third name under staging, and only if even that rename
            // fails sacrifice it (recorded in the thrown message) so the
            // OLD table can still be restored
            val returned = fs.rename(live(t), staged(t)) ||
              fs.rename(live(t), new Path(s"$staging/.rollback-$tag-$t"))
            if (!returned) {
              sacrificed += t
              fs.delete(live(t), true)
            }
          }
          // a failed RESTORE leaves the live slot empty — the message
          // must say so and name the backup, not claim a clean rollback
          if (aside(t) && fs.exists(backup(t)) &&
              !fs.rename(backup(t), live(t)))
            unrestored += s"$t (backup kept at ${backup(t)})"
        }
        val lost = if (sacrificed.isEmpty) ""
          else s"; staged cop${if (sacrificed.size == 1) "y" else "ies"} of " +
            s"${sacrificed.mkString(", ")} could not be returned to " +
            "staging and were sacrificed to restore the old index"
        val partial = if (unrestored.isEmpty) ""
          else s"; ROLLBACK INCOMPLETE — restore by hand: " +
            unrestored.mkString(", ")
        throw new IllegalStateException(
          s"StagedSwap: swap into $root failed and was rolled back; " +
            s"the staged copy is KEPT at $staging for recovery$lost$partial",
          e)
    }
    tables.foreach(t => fs.delete(backup(t), true))
    fs.delete(new Path(staging), true)
  }
}
