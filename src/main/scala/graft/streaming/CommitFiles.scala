package graft.streaming

import java.nio.file.{FileAlreadyExistsException, FileSystemException, Files, Path, Paths, StandardCopyOption, StandardOpenOption}

/** Shared exactly-once plumbing for the parquet table layouts
  * ([[StreamMerge]], [[StreamCurate]], `llm.IvfIndex`): the atomic
  * commit-pointer file, the checkpoint-lineage brand, and the
  * staged-directory swap compactions use. The brand is what turns
  * "restarted with a fresh checkpoint against an existing output dir"
  * from silent data loss into a loud failure; the swap machinery is
  * what keeps a crashed compaction from being sticky. */
private[graft] object CommitFiles {

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

  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete()
  }

  /** The parquet part-file set under `p` — the cheap fingerprint a
    * compaction takes before its read and re-checks before its swap to
    * detect a concurrent writer. */
  def partSet(p: Path): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(p.toFile).map(_.getPath).filter(_.endsWith(".parquet")).toSet
  }

  private def retiring(live: Path) =
    live.resolveSibling(live.getFileName.toString + "_retiring")

  /** The staging sibling a compaction writes into before [[swapDir]]. */
  def staging(live: Path): Path =
    live.resolveSibling(live.getFileName.toString + "_compacting")

  /** Heal the on-disk state a crashed [[swapDir]] can leave behind: a
    * swap interrupted between its two renames (live missing, the
    * retiring copy present) is rolled back, and leftover retiring /
    * staging directories from a crash after the swap are deleted. Run
    * at the start of every compaction, so no crash state is sticky. */
  def healSwap(live: Path): Unit = {
    val old = retiring(live)
    if (!Files.exists(live) && Files.exists(old)) Files.move(old, live)
    if (Files.exists(old)) rmTree(old.toFile)
    if (Files.exists(staging(live))) rmTree(staging(live).toFile)
  }

  /** Swap the fully-written [[staging]] directory in for `live` via two
    * renames and delete the retired copy. A reader BETWEEN the renames
    * can observe `live` missing — the documented maintenance window of
    * this plain-filesystem layout; a crash anywhere leaves a state the
    * next [[healSwap]] repairs. */
  def swapDir(live: Path): Unit = {
    val old = retiring(live)
    Files.move(live, old)
    Files.move(staging(live), live)
    rmTree(old.toFile)
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
