package graft

/** Freezes the heavy-query plan signatures (VERDICT r6 ask #3): the
  * committed PLANS_r{N}.txt artifact (written by `runMain graft.Explain
  * --plans PLANS_r{N}.txt`) carries one PLAN_SUMMARY line per
  * bench-heavy query — join strategy + exchange/window/agg counts. This
  * spec recomputes those lines live under the SAME session configs and
  * sfDir and diffs them, so a broadcast flipping to sort-merge or an
  * exchange sneaking into a heavy plan fails CI with a one-line cause
  * instead of surfacing as an unexplained seconds-level bench drift a
  * round later. After an INTENTIONAL plan change, regenerate the
  * artifact and commit it — the diff in review then documents the flip.
  */
class PlanDiffSpec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  private def latestArtifact: java.nio.file.Path = {
    val dir = java.nio.file.Paths.get(".")
    val re = "\\./PLANS_r(\\d+)\\.txt".r
    // Sort by the PARSED round number, not lexicographically (ADVICE r7):
    // string order would pick PLANS_r9.txt over PLANS_r10.txt if an
    // unpadded artifact ever slipped in, and breaks again at r99→r100
    // even with the zero-padding convention.
    val all = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .flatMap { p => re.findFirstMatchIn(p).map(m => m.group(1).toInt -> p) }
      .sortBy(_._1).map(_._2)
    assert(all.nonEmpty,
      "no PLANS_r{N}.txt artifact committed — run `sbt \"runMain graft.Explain --plans PLANS_rN.txt\"`")
    java.nio.file.Paths.get(all.last)
  }

  test("heavy-query join strategies and exchange counts match the committed artifact") {
    val artifact = latestArtifact
    val committed = java.nio.file.Files.readAllLines(artifact).toArray
      .map(_.toString).filter(_.startsWith("PLAN_SUMMARY "))
      .map { l => l.split(" ", 3)(1) -> l }.toMap
    assert(committed.keySet == PlanAudit.heavyQueries.toSet,
      s"artifact $artifact covers ${committed.keySet} but PlanAudit.heavyQueries is " +
        s"${PlanAudit.heavyQueries.toSet} — regenerate the artifact")
    val mismatches = PlanAudit.heavyQueries.flatMap { name =>
      val live = PlanAudit.summaryFor(spark, sf01, name)
      if (live == committed(name)) None
      else Some(s"$name\n  committed: ${committed(name)}\n  live:      $live")
    }
    assert(mismatches.isEmpty,
      s"heavy-query plan signature drifted from $artifact — if intentional, " +
        s"regenerate with `sbt \"runMain graft.Explain --plans <file>\"`:\n" +
        mismatches.mkString("\n"))
  }
}
