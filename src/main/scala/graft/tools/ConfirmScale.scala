package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.FingerprintIndex

/** Once-per-round evidence for the exact tier's INDEXED confirm
  * (VERDICT r17 #1): per-trigger confirm cost must stay FLAT as the
  * prior corpus grows 3x — the property the
  * [[graft.operators.FingerprintIndex]] probe (driver-routed partition
  * pruning + per-partition binary search) provides and the old
  * merge-join confirm (linear scan of every candidate-bearing cached
  * partition) could not. Measures, at corpus sizes P and 3P:
  *  - build wall (one-off prologue cost, allowed to grow with P);
  *  - min-over-N probe wall for a fixed micro-batch-sized candidate
  *    set (half present, half absent — the bloom-positive sliver
  *    shape), which must NOT grow with P;
  *  - correctness in-run: hits == exactly the planted present set.
  * Writes a small JSON the round doc quotes. Deliberately not a bench
  * row (same rationale as the other tools/ harnesses).
  * Usage: runMain graft.tools.ConfirmScale [P] [candidates] [out]
  */
object ConfirmScale {
  def main(args: Array[String]): Unit = {
    val p = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nCand = args.lift(1).map(_.toInt).getOrElse(1000)
    val out = args.lift(2).getOrElse("plans/r18/confirm_scale.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.driver.memory", "16g")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def leg(n: Long): (Double, Double, Int) = {
      val fps = spark.range(n)
        .select(md5(concat(lit("f"), col("id"))).as("__pfp"))
      val t0 = System.nanoTime()
      val ix = FingerprintIndex.build(fps, 32)
      val buildS = (System.nanoTime() - t0) / 1e9
      require(ix.count == n, s"index count ${ix.count} != $n")
      try {
        // candidate sliver: half planted present, half absent
        val present = (0 until nCand / 2).map(i =>
          md5str(s"f${i.toLong * (n / (nCand / 2))}"))
        val absent = (0 until nCand / 2).map(i => md5str(s"x$i"))
        val cands = (present ++ absent).toArray
        val hits = ix.hits(cands).toSet
        require(hits == present.toSet,
          s"hits ${hits.size} != planted ${present.size}")
        val probeS = (1 to 7).map { _ =>
          val t = System.nanoTime()
          ix.hits(cands)
          (System.nanoTime() - t) / 1e9
        }.min
        (buildS, probeS, nCand)
      } finally ix.release()
    }

    def md5str(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    val (b1, p1, _) = leg(p)
    val (b3, p3, _) = leg(3 * p)
    val json =
      f"""{"recipe":"FingerprintIndex probe cost at corpus P vs 3P: """ +
      f"""build once, min-over-7 probes of a $nCand-candidate """ +
      f"""micro-batch sliver (half present), hits set-verified in-run",""" +
      f""""p":$p,"build_s_p":$b1%.3f,"probe_s_p":$p1%.4f,""" +
      f""""p3":${3 * p},"build_s_p3":$b3%.3f,"probe_s_p3":$p3%.4f,""" +
      f""""probe_ratio_3x":${p3 / p1}%.3f}""" + "\n"
    Option(Paths.get(out).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(out), json)
    println(s"[confirmscale] $json")
    spark.stop()
  }
}
