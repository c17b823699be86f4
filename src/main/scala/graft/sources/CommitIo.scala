package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The THREE storage primitives the whole commit protocol assumes
  * atomic — factored behind one seam so the assumption is explicit,
  * swappable, and fault-testable (reference deployment is GCS through
  * the Hadoop connector, gcs_bronze_to_silver.py:55-61, where rename is
  * copy+delete and create-if-absent needs a conditional PUT):
  *
  *  1. [[swapPointer]] — replace a small pointer file's content (the
  *     root/table `_current` swap, THE commit point).
  *  2. [[claimSlot]] — move a COMPLETE staged dir/file into a
  *     numbered slot exactly once (version dirs, root-manifest slots,
  *     delete-file slots); false = slot taken, the caller renumbers.
  *  3. [[createExclusive]] — create-if-absent (the writer lease CAS).
  *
  * Every implementation must keep the TORN-STATE CONTRACT the readers
  * are built against: a crash at ANY point inside a primitive leaves
  * the store in a state that is either INVISIBLE (an unpublished slot
  * without `_SUCCESS`, cold staging debris for the reaper) or LOUD
  * (a lease that refuses the next writer until its TTL) — never a
  * partially-visible commit.
  *
  * == Object-store mapping (GCS / S3) ==
  *
  * | seam | local FS (default impl) | GCS | S3 |
  * |------|------|-----|----|
  * | swapPointer | tmp sibling write → delete → rename (reader mid-gap falls back to newest complete slot) | single PUT — per-object atomic; CAS via `x-goog-if-generation-match` | single PUT — atomic; CAS via conditional writes (`If-Match`) |
  * | claimSlot | atomic dir rename (POSIX) | NO dir rename: CAS-create a `.claim` marker with `if-generation-match: 0`, then server-side copy objects, `_SUCCESS` last — [[CommitIo.MarkerClaim]] is this strategy runnable on any Hadoop FS | same via `If-None-Match: *` conditional create |
  * | createExclusive | `create(overwrite=false)` (check-then-create on local FS — the documented trade; the in-JVM CAS in [[graft.operators.Upsert]] covers same-process races) | `if-generation-match: 0` PUT — truly atomic | `If-None-Match: *` PUT — truly atomic |
  *
  * Note the inversion at the bottom row: the lease CAS is the one
  * primitive that gets STRONGER on an object store than on the local
  * FS, while claimSlot gets weaker (no rename) — which is exactly why
  * the claim strategy leans on the marker CAS rather than rename.
  * An external catalog CAS (the Iceberg answer) slots in as a fourth
  * implementation with all three primitives served by one conditional
  * table-pointer update. */
trait CommitIo {

  /** Atomically replace `pointer`'s content with `bytes`: a concurrent
    * reader sees the old content, the new content, or (local-FS
    * rename-gap only) no file — never a partial write. */
  def swapPointer(fs: FileSystem, pointer: Path, bytes: Array[Byte]): Unit

  /** Claim `target` by moving the COMPLETE staged `staged` onto it.
    * True = this caller owns the slot; false = the slot is taken (the
    * caller renumbers and retries with a fresh target). The caller
    * publishes the slot afterwards (`_SUCCESS` / pointer swap), so a
    * crash anywhere inside leaves an unpublished slot readers skip. */
  def claimSlot(fs: FileSystem, staged: Path, target: Path): Boolean

  /** Create `path` with `bytes` iff it does not exist; true on the win.
    * The writer-lease CAS. */
  def createExclusive(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean
}

object CommitIo {

  /** The process-wide implementation (tests swap in fault-injecting or
    * object-store-semantics implementations through [[withIo]]). */
  @volatile private var impl: CommitIo = LocalFs

  def current: CommitIo = impl

  /** Run `body` with `io` installed — test-only scoping (the engine is
    * single-process per the writer-lease contract, so a global holder
    * matches the deployment shape). */
  private[graft] def withIo[T](io: CommitIo)(body: => T): T = {
    val prev = impl
    impl = io
    try body finally { impl = prev }
  }

  /** Today's default: POSIX/HDFS rename-based atomicity (what the
    * local[32] sandbox and an HDFS deployment provide). */
  object LocalFs extends CommitIo {
    override def swapPointer(fs: FileSystem, pointer: Path,
                             bytes: Array[Byte]): Unit = {
      // dot-prefixed tmp: every directory listing in the engine filters
      // hidden names, so the sibling can never be mistaken for a live
      // pointer/ref by a racing reader
      val tmp = new Path(pointer.getParent, "." + pointer.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      fs.delete(pointer, false)
      if (!fs.rename(tmp, pointer))
        throw new IllegalStateException(
          s"pointer swap failed at $pointer")
    }

    override def claimSlot(fs: FileSystem, staged: Path,
                           target: Path): Boolean =
      fs.rename(staged, target)

    override def createExclusive(fs: FileSystem, path: Path,
                                 bytes: Array[Byte]): Boolean =
      try {
        val out = fs.create(path, false)
        try out.write(bytes) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
  }

  /** Object-store SEMANTICS on any Hadoop FS — no rename anywhere:
    * claimSlot CAS-creates a `.claim` marker in the target slot (the
    * conditional-PUT win), COPIES the staged objects file by file, and
    * deletes the staged dir last; swapPointer is one overwrite PUT.
    * Runnable (and fault-injectable) on the local FS, where the marker
    * create is check-then-create — on a real object store it is the
    * `if-generation-match: 0` PUT, strictly stronger. Torn states map
    * exactly onto the reader contract: crash before/during copy = an
    * unpublished slot without `_SUCCESS` (invisible) plus warm staging
    * debris (reaped cold); crash after copy before the staged delete =
    * a published-able slot plus debris; the pointer PUT has no torn
    * state at all. */
  object MarkerClaim extends CommitIo {
    val ClaimMarker = ".claim"

    override def swapPointer(fs: FileSystem, pointer: Path,
                             bytes: Array[Byte]): Unit = {
      // one PUT: atomic replace on an object store. (On the local FS a
      // truncate-rewrite is NOT atomic — this impl models the STORE's
      // semantics for the fault spec; production local deployments use
      // [[LocalFs]].)
      val out = fs.create(pointer, true)
      try out.write(bytes) finally out.close()
    }

    override def claimSlot(fs: FileSystem, staged: Path,
                           target: Path): Boolean = {
      fs.mkdirs(target.getParent)
      if (fs.isFile(staged)) {
        // single-object claim (delete-file slots): the conditional
        // create of the TARGET object itself is the claim
        if (fs.exists(target)) return false
        val in = fs.open(staged)
        val data = try in.readAllBytes() finally in.close()
        if (!LocalFs.createExclusive(fs, target, data)) return false
        fs.delete(staged, false)
        return true
      }
      fs.mkdirs(target)
      if (!LocalFs.createExclusive(fs, new Path(target, ClaimMarker),
          Array.emptyByteArray))
        return false // slot already claimed — renumber
      copyTree(fs, staged, target)
      fs.delete(staged, true)
      true
    }

    override def createExclusive(fs: FileSystem, path: Path,
                                 bytes: Array[Byte]): Boolean =
      LocalFs.createExclusive(fs, path, bytes)

    /** Copy with `_SUCCESS` strictly LAST: a staged Spark write carries
      * its own `_SUCCESS`, and readers treat its presence as "this slot
      * is complete" — copying it before the data files would make a
      * mid-copy crash VISIBLE as a partial version. */
    private def copyTree(fs: FileSystem, from: Path, to: Path): Unit = {
      val (success, rest) = fs.listStatus(from).toSeq
        .partition(st => st.isFile && st.getPath.getName == "_SUCCESS")
      (rest ++ success).foreach { st =>
        val dest = new Path(to, st.getPath.getName)
        if (st.isDirectory) { fs.mkdirs(dest); copyTree(fs, st.getPath, dest) }
        else {
          val in = fs.open(st.getPath)
          val data = try in.readAllBytes() finally in.close()
          val out = fs.create(dest, true)
          try out.write(data) finally out.close()
        }
      }
    }
  }
}
