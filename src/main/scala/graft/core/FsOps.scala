package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Checked Hadoop filesystem moves shared by every persisted-state
  * swap (index meta staging, streamed relation swaps): Hadoop
  * `FileSystem.rename`/`delete` signal failure by RETURNING false
  * (unlike the java.nio moves they replaced, which threw) — a
  * silently-failed swap leaves an index meta-less or a state dir
  * missing with no error until a later read. Fail loudly instead.
  */
private[graft] object FsOps {

  def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Recursive delete tolerating an already-absent path (delete
    * returns false for missing paths too — that case is benign).
    */
  def deleteOrThrow(fs: FileSystem, p: Path): Unit =
    if (!fs.delete(p, true) && fs.exists(p))
      throw new java.io.IOException(s"delete failed: $p")

  /** Staging→live swap shared by every persisted-store compaction.
    *
    * NOT atomic as a unit — it is two renames (live→__retired,
    * staging→live), and the stores assume the SINGLE-WRITER /
    * NO-CONCURRENT-READER discipline every compaction already
    * documents: a reader racing the window between the renames sees
    * a missing live path and fails loudly (never reads a half-state),
    * and two concurrent compactions would race the staging dir. What
    * IS guaranteed is crash recoverability: a crash between the
    * renames strands the data under `__retired`, and the next
    * [[recoverRetired]] (every compaction calls it before reading)
    * restores it — either the old or the new relation always survives
    * on disk, never neither.
    */
  def swapInDir(fs: FileSystem, live: Path, staging: Path): Unit = {
    val retired = new Path(live.toString + "__retired")
    deleteOrThrow(fs, retired) // leftover from a prior completed swap
    renameOrThrow(fs, live, retired)
    renameOrThrow(fs, staging, live)
    deleteOrThrow(fs, retired)
  }

  /** Crash recovery for [[swapInDir]]: if a prior compaction died
    * between its two renames, the live dir is missing and the data
    * sits under `__retired` — restore it. A no-op in every healthy
    * state (live present, or neither present).
    */
  def recoverRetired(fs: FileSystem, live: Path): Unit = {
    val retired = new Path(live.toString + "__retired")
    if (!fs.exists(live) && fs.exists(retired))
      renameOrThrow(fs, retired, live)
  }
}
