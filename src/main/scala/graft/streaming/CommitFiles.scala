package graft.streaming

import java.nio.file.{FileAlreadyExistsException, FileSystemException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Shared exactly-once plumbing for the foreachBatch parquet sinks
  * ([[StreamMerge]], [[StreamCurate]]): the atomic commit-pointer file
  * and the checkpoint-lineage brand. Both sinks key idempotence on
  * batchId, which is only meaningful for ONE checkpoint lineage — the
  * brand is what turns "restarted with a fresh checkpoint against an
  * existing output dir" from silent data loss into a loud failure. */
private[streaming] object CommitFiles {

  /** Committed pointer value, if any batch has flipped it. */
  def readPointer(p: Path): Option[Long] =
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None

  /** Pointer flip via temp-file + ATOMIC_MOVE: readers see either the
    * old value or the new one, never a torn write. */
  def atomicWrite(path: Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.createDirectories(path.getParent)
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The lineage identity of a checkpoint: its QUERY ID (the uuid Spark
    * writes to `<checkpoint>/metadata`, stable across restarts of one
    * lineage but regenerated when a checkpoint is wiped) — branding on
    * the PATH alone would pass after a wipe-and-recreate at the same
    * path, and the restarted batchIds would then short-circuit on the
    * committed version and silently drop every batch. Path (normalized:
    * scheme prefix and trailing slashes stripped, so equivalent
    * spellings can't false-positive) is the fallback when metadata is
    * unreadable. */
  def lineageId(ck: String): String = {
    def norm(p: String) = p.replaceFirst("^file:(//)?", "").stripSuffix("/")
    val meta = Paths.get(norm(ck), "metadata")
    if (Files.exists(meta)) Files.readString(meta).trim else norm(ck)
  }

  /** Claim brand file `b` for lineage `ck`, or assert it already carries
    * exactly that lineage. `who` prefixes the failure messages (e.g.
    * "stream_merge"). */
  def claimOrAssert(b: Path, ck: String, who: String): Unit = {
    def assertBranded(): Unit = {
      // a CREATE_NEW-fallback claimant's bytes land one write after the
      // open — tolerate a transiently empty brand before declaring a
      // mismatch (the hard-link path never exposes this window)
      var branded = Files.readString(b).trim
      var spins = 0
      while (branded.isEmpty && spins < 100) {
        Thread.sleep(10)
        branded = Files.readString(b).trim
        spins += 1
      }
      // an empty brand after the spin is not a lineage mismatch: a
      // CREATE_NEW-fallback claimant crashed between opening the brand
      // file and writing its bytes — name the actual remedy instead of
      // the generic wipe-everything one
      if (branded.isEmpty) throw new IllegalStateException(
        s"$who: brand file $b is empty — a previous claimant " +
          "likely crashed between creating and writing it; delete that " +
          "file (only it) to let the next query re-claim the output dir")
      if (branded != ck) throw new IllegalStateException(
        s"$who: output dir ${b.getParent} belongs to checkpoint lineage " +
          s"'$branded' but this query runs from '$ck' — batchIds would " +
          "collide with the committed versions and silently drop data; " +
          "wipe the output dir together with its checkpoint")
    }
    if (Files.exists(b)) assertBranded()
    else {
      // claim the brand atomically IN CONTENT as well as existence:
      // write a unique temp file, then hard-LINK it to the brand path —
      // link(2) fails if the target exists and the link carries the
      // complete content the instant it appears. A plain CREATE_NEW
      // write would let the loser read the winner's file before its
      // bytes land and die on a spurious ""-lineage mismatch, and
      // ATOMIC_MOVE is rename(2) on POSIX, which silently REPLACES.
      // Filesystems without link(2) (CIFS/FAT/object-store mounts)
      // fall back to CREATE_NEW — existence-atomic, with the reader
      // spin in assertBranded covering the open-to-write gap.
      Files.createDirectories(b.getParent)
      // a crash between the tmp write and the finally leaks the tmp;
      // sweep stale ones (old enough to not belong to a live claimant)
      val listing = Files.list(b.getParent)
      try listing.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(s"${b.getFileName}.") && n.endsWith(".tmp") &&
          Files.getLastModifiedTime(p).toMillis <
            System.currentTimeMillis() - 3600000L)
          Files.deleteIfExists(p)
      } finally listing.close()
      val tmp = b.resolveSibling(
        s"${b.getFileName}.${java.util.UUID.randomUUID()}.tmp")
      Files.writeString(tmp, ck)
      try Files.createLink(b, tmp)
      catch {
        case _: FileAlreadyExistsException => assertBranded()
        case _: UnsupportedOperationException | _: FileSystemException =>
          try Files.write(b, ck.getBytes("UTF-8"),
            StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
          catch { case _: FileAlreadyExistsException => assertBranded() }
      }
      finally Files.deleteIfExists(tmp)
    }
  }
}
