package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Bpe

/** Dev tool: train the committed BPE vocab from the fixture corpus and
  * print it as the Scala literal for [[graft.functions.BpeVocab]], plus
  * the corpus fingerprint the spec uses to guard its retrain-equality
  * assertion. Deterministic: all docs, doc_id order, fixed merge count.
  * Usage: runMain graft.tools.BpeTrain [docsParquet] [nMerges] */
object BpeTrain {
  /** The deterministic training input: every document, doc_id order. */
  def corpus(spark: SparkSession, docsParquet: String): Seq[String] = {
    import spark.implicits._
    spark.read.parquet(docsParquet)
      .select("doc_id", "text").orderBy("doc_id")
      .as[(Long, String)].collect().map(_._2).toSeq
  }

  /** Order-sensitive corpus fingerprint (the trainer itself is order-free,
    * but the fingerprint pins the exact bytes the vocab came from). */
  def fingerprint(texts: Seq[String]): Long =
    texts.foldLeft(17L) { (h, t) =>
      val th = if (t == null) 0L else t.foldLeft(1125899906842597L) {
        (a, c) => a * 31 + c }
      h * 1000003 + th
    }

  def main(args: Array[String]): Unit = {
    val docs = if (args.length > 0) args(0)
      else "/root/testdata/sf0.001/documents.parquet"
    val nMerges = if (args.length > 1) args(1).toInt else 48
    // third arg "bytes" = the production byte-level tier (BpeByteVocab)
    val byteLevel = args.length > 2 && args(2) == "bytes"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = corpus(spark, docs)
    val merges =
      if (byteLevel) Bpe.trainBytes(texts, nMerges)
      else Bpe.train(texts, nMerges)
    println(s"// trained on $docs (${texts.size} docs, " +
      s"fingerprint ${fingerprint(texts)}L), nMerges=$nMerges" +
      (if (byteLevel) " (byte-level)" else ""))
    println("  val merges: Seq[(String, String)] = " +
      Bpe.toScalaLiteral(merges))
    spark.stop()
  }
}
