package graft

/** Scratch-space allocator for harness-ephemeral data: streaming
  * replay chunks and checkpoints, lake-layout round-trip dirs, DSv2
  * connector round-trips. On hosts with a writable /dev/shm the
  * scratch lives on tmpfs; otherwise it falls back to java.io.tmpdir.
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
  * Stale entries (a crashed run's leftovers) are swept best-effort
  * at first use, age-gated at 6 h so concurrent runs can't collide.
  */
object Scratch {

  private def sweepStale(root: java.io.File): Unit = {
    val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
    Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.lastModified() < cutoff) deleteRec(f)
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  /** tmpfs-backed scratch root if available, else java.io.tmpdir. */
  lazy val base: java.nio.file.Path = {
    val shm = new java.io.File("/dev/shm")
    val root =
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft-scratch")
        if (d.isDirectory || d.mkdirs()) { sweepStale(d); d }
        else new java.io.File(System.getProperty("java.io.tmpdir"))
      } else new java.io.File(System.getProperty("java.io.tmpdir"))
    root.toPath
  }

  /** A fresh scratch directory under [[base]] — the drop-in for
    * `Files.createTempDirectory(prefix)` at every harness site.
    */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(base, prefix)

  /** Point the JVM's java.io.tmpdir at the tmpfs scratch root, so
    * the IMPLICIT ephemeral paths follow too: Spark's auto-created
    * temporary streaming checkpoints, RocksDB state-store working
    * dirs, and the spark.local.dir default (shuffle scratch). Called
    * by the Bench and Verify mains BEFORE the session is built; a
    * library user's JVM is never touched.
    */
  def redirectTmpdir(): Unit =
    if (base.toString.startsWith("/dev/shm"))
      System.setProperty("java.io.tmpdir", base.toString): Unit
}
