package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Checked filesystem primitives for the atomic generation swap shared
  * by [[StreamingCdc]] and [[StreamingProfile]] (write `.next` fully,
  * park live as `.old`, promote, drop `.old`).
  *
  * Hadoop's `FileSystem.rename`/`delete` signal failure by RETURNING
  * FALSE (dest exists, src missing, concurrent writer), not by
  * throwing. An unchecked false here is the worst kind of failure: the
  * old generation stays live while `foreachBatch` completes, the
  * stream checkpoint advances past the batch, and its changes are lost
  * with no error anywhere. These wrappers turn every false into an
  * IOException so the swap either completes or the batch retries.
  */
private[graft] object GenerationSwap {

  def deleteIfExists(fs: FileSystem, p: Path): Unit =
    if (fs.exists(p) && !fs.delete(p, true))
      throw new java.io.IOException(s"generation swap: delete failed for $p")

  def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"generation swap: rename failed: $src -> $dst")

  /** Replace the live dir with a FULLY-WRITTEN sibling via the
    * rename-aside choreography (park live as `.old`, promote the
    * sibling, drop `.old`) — the one definition of the crash contract
    * that StreamingQuota/StreamingNearDup's compact AND legacy-layout
    * migrations all share (their `recoverCompact` adopts whichever
    * sibling survives a crash at any step). The sibling must be
    * complete before calling: every crash point then leaves either
    * the old live dir or a complete replacement. */
  def replaceLive(fs: FileSystem, liveDir: String, tmpDir: String): Unit = {
    val live = new Path(liveDir)
    val old = new Path(liveDir + ".old")
    renameOrThrow(fs, live, old)
    renameOrThrow(fs, new Path(tmpDir), live)
    deleteIfExists(fs, old)
  }

  /** Promote a fully-written `<stateDir>.next` to live. Ordering makes
    * every crash point recoverable by adopt-last-complete:
    * pre-promotion crashes leave live (or `.old`) intact; a crash
    * after the final rename leaves only a stale `.old` to sweep. */
  def promote(fs: FileSystem, stateDir: String): Unit = {
    val live = new Path(stateDir)
    val next = new Path(stateDir + ".next")
    val old = new Path(stateDir + ".old")
    deleteIfExists(fs, old)
    if (fs.exists(live)) renameOrThrow(fs, live, old)
    renameOrThrow(fs, next, live)
    deleteIfExists(fs, old)
  }
}
