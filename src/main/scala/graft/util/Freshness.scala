package graft.util

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Stale-artifact guard for the Verify/Bench entry points (VERDICT r8 §8:
  * the driver once measured a jar one commit older than the sources).
  * Compares the newest `.scala` mtime under `src/main/scala` against the
  * mtime of the code source the entry class actually loaded from (the
  * classes dir under sbt `runMain`, or the packaged jar) and prints ONE
  * machine-greppable line to stderr:
  *
  * {{{ [freshness] OK|STALE classes=<iso> newest-source=<iso> (<file>) }}}
  *
  * Deliberately non-fatal: a STALE line in the run log is the signal the
  * round's numbers came from old bytecode — the run itself still
  * completes so a misconfigured dev checkout can't zero a round.
  */
object Freshness {

  private def newestUnder(root: Path, suffix: String): Option[(Path, Long)] =
    if (!Files.isDirectory(root)) None
    else {
      val s = Files.walk(root)
      try {
        s.iterator.asScala
          .filter(p => p.toString.endsWith(suffix) && Files.isRegularFile(p))
          .map(p => p -> Files.getLastModifiedTime(p).toMillis)
          .foldLeft(Option.empty[(Path, Long)]) {
            case (acc, cur) if acc.forall(_._2 < cur._2) => Some(cur)
            case (acc, _)                                => acc
          }
      } finally s.close()
    }

  def check(entry: Class[_]): Unit = try {
    val src = newestUnder(Paths.get("src/main/scala"), ".scala")
    val loc = Option(entry.getProtectionDomain.getCodeSource)
      .map(cs => Paths.get(cs.getLocation.toURI))
    val bin = loc.flatMap { p =>
      if (Files.isDirectory(p)) newestUnder(p, ".class")
      else if (Files.isRegularFile(p))
        Some(p -> Files.getLastModifiedTime(p).toMillis)
      else None
    }
    (src, bin) match {
      case (Some((sp, st)), Some((bp, bt))) =>
        val verdict = if (st > bt) "STALE" else "OK"
        System.err.println(
          s"[freshness] $verdict classes=${java.time.Instant.ofEpochMilli(bt)}" +
            s" ($bp) newest-source=${java.time.Instant.ofEpochMilli(st)} ($sp)")
      case _ =>
        System.err.println("[freshness] SKIP (no src/ or code source visible)")
    }
  } catch {
    case e: Throwable =>
      System.err.println(s"[freshness] SKIP (${e.getMessage})")
  }
}
