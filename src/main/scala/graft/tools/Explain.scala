package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dump formatted physical plans for EVERY SparkEntry query — the
  * ".explain and iterate" artifact: broadcast placement, pushed filters,
  * codegen spans and exchange counts are all visible per round.
  *
  * Inclusion rule: the list is derived from `SparkEntry.queries` itself
  * (every query, numeric order, no curation), so a new query cannot
  * silently ship without a plan dump — the hand-curated headline list
  * this replaced had drifted to 121 of 153 queries by round 10.
  * Streaming rows (q105/q106/q131/q135–q137/q149) execute their
  * micro-batch engine inside the closure and land in a memory sink, so
  * their dump shows the post-landing projection plan; the in-flight
  * streaming operator shape is pinned by their specs instead.
  * Usage: runMain graft.tools.Explain [sfDir] [outFile] */
object Explain {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = SparkEntry.queries.keys.toSeq
      .sortBy(q => ("""\d+""".r.findFirstIn(q).get.toInt, q))
    val sb = new StringBuilder
    sb.append(s"# Physical plans (formatted) — $sfDir\n\n")
    sb.append("Covers every `SparkEntry.queries` entry (list derived " +
      "from the map itself — see graft.tools.Explain's inclusion rule; " +
      "streaming rows show the post-landing projection plan).\n")
    all.foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $q\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[explain] wrote ${all.size} plans to $out")
    spark.stop()
  }
}
