package graft

/** The README Quickstart example, compiled and executed verbatim — the
  * doc test that keeps the user-facing entry-point map honest: if a
  * signature in the example drifts, this spec stops compiling, and the
  * README is known stale. Keep the body in sync with README.md's
  * "Quickstart" code block (only the `spark`/`data`/`out`/`benchmark`
  * bindings and the final assertions live outside the quoted block). */
class QuickstartSpec extends SparkSpec {

  test("the README quickstart example runs end-to-end on the fixtures") {
    val data = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$data/documents.parquet").exists(),
      s"fixture corpus missing under $data")
    val outDir = java.nio.file.Files.createTempDirectory("graft_qs_")
    val out = outDir.toString
    val benchmark = spark.read.parquet(s"$data/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 3)
    try {
      // ---- README.md "Quickstart" block, verbatim ----
      import org.apache.spark.sql.functions._
      import graft.operators.{Curate, Dedup, Similarity}
      import graft.functions.{Bpe, BpeByteVocab}
      import graft.streaming.ShardSink

      val docs = spark.read.parquet(s"$data/documents.parquet")
        .filter(col("text").isNotNull)
      // 1. curate: exact dedup, then drop benchmark-contaminated docs
      val deduped = Dedup.exact(docs, "text", "doc_id")
      val cleaned = Dedup.ngramDecontaminate(deduped, benchmark,
          "text", "doc_id", n = 5, minMatches = 2)
        .filter(!col("contaminated")).drop("n_matched", "contaminated")
      // 2. tokenize with the trained byte-BPE; pack 2048-token shards into
      //    a versioned store (append more drops later; read(asOf) snapshots)
      val tokenized = cleaned.withColumn("ids",
        Bpe.byteTokenIds(col("text"), BpeByteVocab.merges))
      ShardSink.append(spark, tokenized, "ids", "doc_id",
        budget = 2048, shardCol = "source", storeDir = s"$out/shards")
      val shards = ShardSink.read(spark, s"$out/shards") // latest-wins view
      // 3. build and probe an IVF-PQ ANN index over an embeddings table
      val emb = spark.read.parquet(s"$data/embeddings.parquet")
      val index = Similarity.ivfPqBuild(emb, nLists = 8, m = 4,
        kCodes = 16, iterations = 2)
      val neighbors = Similarity.ivfPqQueryRefined(index, emb,
        emb.limit(4), k = 5, nProbe = 2, refine = 10)
      // ---- end README block ----
      val _ = Curate // referenced by the README import line
      assert(cleaned.count() > 0 && cleaned.count() < docs.count())
      assert(shards.count() > 0)
      assert(shards.agg(max(col("n_tokens"))).head.getInt(0) <= 2048)
      assert(neighbors.select("probe_id").distinct().count() == 4)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(outDir).sorted(
          java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("the README correctness-count sentence matches the real query " +
      "surface (oracled / total / no-oracle) — counts cannot drift") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))
    val m = """(\d+) of the (\d+) `SparkEntry`\s*\nqueries \(the (\d+)"""
      .r.findFirstMatchIn(readme)
      .getOrElse(fail("README correctness sentence not found"))
    val total = SparkEntry.queries.size
    val oracled = SparkEntry.queries.keySet
      .count(SparkEntry.oracleSql.contains)
    assert(m.group(2).toInt == total,
      s"README says ${m.group(2)} queries; SparkEntry has $total")
    assert(m.group(1).toInt == oracled,
      s"README says ${m.group(1)} oracled; SparkEntry has $oracled")
    assert(m.group(3).toInt == total - oracled,
      s"README says ${m.group(3)} exceptions; real ${total - oracled}")
  }
}
