package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query executed END-TO-END via a noop
  * sink (a count would let Catalyst prune unreferenced projections, making
  * map-only queries look free). Failures are recorded and surfaced, never
  * folded into a fast-looking timing. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up FS metadata, codegen and JIT once so the alphabetically-first
    // query doesn't absorb all fixed startup cost; run in sorted order so
    // per-query numbers are comparable across rounds
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(e.toString.take(200)) }
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, Some(err)) =>
      s"\"" + k + "\":\"" + err.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    if (results.exists(_._3.isDefined)) System.err.println(
      s"[bench] ${results.count(_._3.isDefined)} queries FAILED")
    spark.stop()
  }
}
