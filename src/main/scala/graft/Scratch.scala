package graft

/** Scratch-space allocator for harness-ephemeral data: streaming
  * replay chunks and checkpoints, lake-layout round-trip dirs, DSv2
  * connector round-trips. On hosts with a writable /dev/shm (and
  * headroom — below) the scratch lives on tmpfs; otherwise it falls
  * back to the JVM's original java.io.tmpdir.
  *
  * Why: every completion-harness micro-batch pays sink + checkpoint
  * + RocksDB commit IO, and the io_* layout queries pay manifest and
  * listing IO — all of it ephemeral-by-construction (the harness
  * deletes these dirs at query end). Paying disk fsync latency for
  * data that never needs durability both slows the suite (~20
  * streaming queries x several micro-batches each) and couples
  * benchmark numbers to host disk silicon (the r16 cross-VM
  * io_skipping/io_compaction residual). At deployment scale these
  * locations are object-store/NVMe paths chosen by the operator, so
  * the medium is a harness concern, not an engine semantic.
  *
  * What deliberately does NOT ride tmpfs: shuffle spill. Spill
  * exists to relieve memory pressure; spilling INTO RAM-backed tmpfs
  * consumes the memory it was relieving (and /dev/shm is commonly
  * capped at 50% of RAM — ENOSPC mid-run). [[redirectTmpdir]]
  * therefore pins `spark.local.dir` (the shuffle/block-manager
  * scratch, which otherwise follows java.io.tmpdir) to the ORIGINAL
  * disk tmpdir before moving java.io.tmpdir to tmpfs, and the
  * redirect itself is gated on tmpfs headroom. Bulk fixtures (e.g.
  * the scale probe's Nx parquet copies) use [[diskDir]], never the
  * tmpfs root.
  *
  * Stale-entry sweep: each JVM owns one `run-<pid>` subdirectory and
  * only ever allocates inside it. At first use, sibling run dirs are
  * removed iff their owning process is DEAD (`/proc/<pid>` gone) —
  * liveness, not mtime, so a concurrent run that has been going
  * longer than any age cutoff (a long scale probe) can never have
  * its live scratch swept out from under it. Unparseable leftovers
  * (a pre-run-dir layout, a crashed mkdir) fall back to a 6 h age
  * gate.
  */
object Scratch {

  /** The JVM's tmpdir as it was BEFORE any redirect — the disk
    * location for spill and bulk fixtures.
    */
  private[graft] val originalTmpdir: String =
    System.getProperty("java.io.tmpdir", "/tmp")

  private val RunDir = raw"run-(\d+)".r

  private def pidAlive(pid: Long): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"/proc/$pid"))

  private def sweepStale(root: java.io.File): Unit = {
    val ageCutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case RunDir(pid) => if (!pidAlive(pid.toLong)) deleteRec(f)
        case _ => if (f.lastModified() < ageCutoff) deleteRec(f)
      }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  /** Require this much usable tmpfs before pointing ephemeral IO at
    * it: the harness working set (replay chunks + chunk cache +
    * streaming checkpoints + RocksDB working dirs) stays well under
    * 1 GiB at sf0.1, so 4 GiB of headroom means the redirect can
    * never be the thing that fills /dev/shm.
    */
  private val MinTmpfsBytes = 4L << 30

  /** This run's scratch root: tmpfs-backed if /dev/shm is writable
    * with headroom, else the original disk tmpdir. Always a per-pid
    * subdirectory (the liveness unit the sweep keys on).
    */
  /** `<parent>/graft-scratch`, created and liveness-swept — or None
    * if it can't be created. Both the tmpfs and the disk-fallback
    * paths go through here so dead runs' scratch (replay chunks,
    * RocksDB checkpoints — GBs at probe scale) is swept on EITHER
    * medium, and the per-pid run dirs never sit unscoped in a shared
    * tmpdir root. The sweep only ever runs inside a graft-scratch
    * dir we own, never on the bare system tmpdir.
    */
  private[graft] def scopedRoot(parent: java.io.File): Option[java.io.File] = {
    val d = new java.io.File(parent, "graft-scratch")
    if (d.isDirectory || d.mkdirs()) { sweepStale(d); Some(d) }
    else None
  }

  lazy val base: java.nio.file.Path = {
    val shm = new java.io.File("/dev/shm")
    val tmpfsRoot =
      if (shm.isDirectory && shm.canWrite &&
          shm.getUsableSpace >= MinTmpfsBytes) scopedRoot(shm)
      else None
    val root = tmpfsRoot
      .orElse(scopedRoot(new java.io.File(originalTmpdir)))
      // Last resort (unwritable tmpdir root is already fatal for
      // Spark itself): unscoped and unswept by design — sweeping a
      // shared system tmpdir would delete files we don't own.
      .getOrElse(new java.io.File(originalTmpdir))
    val mine = new java.io.File(root,
      s"run-${ProcessHandle.current().pid()}")
    mine.mkdirs()
    mine.toPath
  }

  /** A fresh scratch directory under [[base]] — the drop-in for
    * `Files.createTempDirectory(prefix)` at every harness site.
    */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)

  /** A fresh DISK-backed temp directory (the original tmpdir), for
    * bulk data that must not compete with RAM: scale-probe fixture
    * copies, anything multi-GB.
    */
  def diskDir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(originalTmpdir), prefix)

  /** Point the JVM's java.io.tmpdir at the tmpfs scratch root, so
    * the IMPLICIT ephemeral paths follow too: Spark's auto-created
    * temporary streaming checkpoints and RocksDB state-store working
    * dirs. Shuffle spill does NOT follow: `spark.local.dir` is pinned
    * first (via system property, read by SparkConf at session build)
    * to the original disk tmpdir — see the class doc for why spill
    * must stay off RAM. Called by the Bench and Verify mains BEFORE
    * the session is built; a library user's JVM is never touched.
    */
  def redirectTmpdir(): Unit =
    if (base.toString.startsWith("/dev/shm")) {
      if (System.getProperty("spark.local.dir") == null)
        System.setProperty("spark.local.dir", originalTmpdir): Unit
      System.setProperty("java.io.tmpdir", base.toString): Unit
    }
}
