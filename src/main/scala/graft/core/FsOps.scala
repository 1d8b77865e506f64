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
}
