package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Source-level lints for scale anti-patterns Catalyst cannot see.
  *
  * The one that has now recurred twice (q_quantiles round 10,
  * sample_quantile_eval/events_rfm/funnel_time round 11): Spark's
  * built-in `percentile` aggregate is exact but merges every
  * partition's value→count map in ONE final-agg task. Over a column
  * whose distinct-value count grows with the data (order keys, cents,
  * delays), that single task holds the full value census and OOMs at
  * 100 TB. `graft.operators.ExactQuantile` is the distributed
  * replacement (bit-identical interpolation); new quantile work must
  * route through it unless the value domain is provably bounded
  * (per-group over an enumerated column, or a pre-aggregated tiny
  * table). This lint pins every surviving `percentile(` call site
  * with its justification — adding one elsewhere fails the build
  * until it is either migrated or pinned with a domain bound. */
class SourceLintSpec extends AnyFunSuite {

  private def mainSources: Seq[(String, String)] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => root.relativize(p).toString ->
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .toSeq
  }

  /** Code lines only: scaladoc/comment bodies stripped (the docs
    * legitimately DISCUSS `percentile()`). */
  private def codeOnly(src: String): String =
    src.linesIterator
      .map(l => l.replaceAll("//.*$", ""))
      .filterNot(l => l.trim.startsWith("*") || l.trim.startsWith("/*"))
      .mkString("\n")

  test("built-in percentile() only at pinned, domain-bounded sites") {
    // file → (pinned call count, the domain bound that justifies it)
    val pinned: Map[String, (Int, String)] = Map(
      "graft/operators/ExactQuantile.scala" -> (2,
        "the single- and multi-column dispatch fast paths themselves — " +
          "both guarded by DistributedThresholdRows"),
      "graft/queries/Stats.scala" -> (2,
        "momentsQuantile + winsorize: per-event_type holistic state; " +
          "scaladocs pin the 100 TB swap to approx_percentile"),
      "graft/queries/Relational.scala" -> (1,
        "qQuantilesGroup: per-l_returnflag (enumerated flag domain); " +
          "scaladoc pins the 100 TB swap to approx_percentile"),
      "graft/queries/Events.scala" -> (2,
        "eventsMad medians: over the (type × hours) table — state " +
          "bounded by hours-per-type, not events"))
    // match `percentile(` as a function call; `approx_percentile(`
    // (mergeable t-digest state) and `percentilesOf(` do not match
    val call = """(^|[^\w.])percentile\s*\(""".r
    val found = mainSources
      .map { case (f, src) => f -> call.findAllIn(codeOnly(src)).size }
      .filter(_._2 > 0).toMap
    val offenders =
      found.toSeq.sortBy(_._1).flatMap { case (f, n) =>
        pinned.get(f) match {
          case Some((p, _)) if n == p => None
          case Some((p, _)) => Some(s"$f: $n percentile() call(s) but the lint " +
            s"pins $p — a new value census needs ExactQuantile or its own pin")
          case None => Some(s"$f: unpinned percentile() call(s) — route through " +
            "ExactQuantile.percentilesOf or pin with a domain bound")
        }
      } ++ pinned.collect {
        case (f, (p, _)) if found.getOrElse(f, 0) < p =>
          s"$f: lint pins $p site(s) but only ${found.getOrElse(f, 0)} found — tighten the pin"
      }
    assert(offenders.isEmpty, "percentile census lint:\n" + offenders.mkString("\n"))
  }
}
