package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** Ramdisk-backed checkpoint directories for FINITE streaming replays.
  *
  * A micro-batch's fixed cost is dominated by checkpoint file IO: offset/
  * commit WAL writes plus one delta file per state-store partition per
  * batch, each with create+rename barriers. For a bounded AvailableNow
  * replay the checkpoint has no durability value — the query drains once
  * and the directory is discarded — so paying disk latency for it is waste.
  * Checkpoints land on `/dev/shm` (tmpfs) when present and writable, else
  * fall back to `java.io.tmpdir`; sizes are state-cardinality-bounded
  * (KBs-MBs per query here).
  *
  * PRODUCTION streams must keep checkpoints on durable shared storage —
  * that is the recovery contract. This helper is only reachable from the
  * `run*` replay entry points and the bench/spec harnesses; unbounded
  * pipelines built from the raw operators pass their own
  * `checkpointLocation`.
  *
  * All directories live under one session-scoped root, deleted on JVM
  * exit (a crash leaks at most one root in tmpfs, gone at reboot). */
object Ckpt {

  private lazy val base: Path = {
    val shm = Paths.get("/dev/shm")
    val root =
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
      else Paths.get(sys.props("java.io.tmpdir"))
    val d = Files.createTempDirectory(root, "graft-ckpt-")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rm))
        p.delete(); ()
      }
      rm(d.toFile)
    }
    d
  }

  /** A fresh unique checkpoint dir for one replay query. */
  def fresh(tag: String): String =
    Files.createTempDirectory(base, tag + "-").toString
}
