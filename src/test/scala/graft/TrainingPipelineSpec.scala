package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curate, Dedup}

/** North-star end-to-end: raw documents -> curation (exact-dup / language /
  * quality) -> near-dup pruning (MinHash LSH pairs) -> deterministic
  * stratified sampling, composed purely from engine operators on one wire —
  * the standard training-corpus preparation pipeline. Every stage is the
  * same operator the oracled queries run (q43, q26, q42). */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus pipeline: curate -> near-dup prune -> stratified sample") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the field", "web"),
      (2L, "THE  quick  brown fox jumps over the lazy dog in the field", "web"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog in the barn", "web"),   // near dup of 1
      (4L, "der hund und die katze das ist von mit haus und garten", "web"),    // wrong lang
      (5L, "the ?!?! ;;;; ,,,, .... ---- ???? !!!!", "web"),                    // junk
      (6L, "a completely original document about the history of analytics", "books"),
      (7L, "statistics is the grammar of science and of modern analytics", "books"))
      .toDF("doc_id", "text", "source")

    // stage 1: curation — exact dup, language, quality all drop here
    val curated = Curate.curate(docs, "text", "doc_id",
      keepLangs = Seq("en"), minQuality = 0.3)
    val curatedIds = curated.select("doc_id").as[Long].collect().toSet
    assert(curatedIds == Set(1L, 3L, 6L, 7L))

    // stage 2: near-dup pruning — MinHash pairs over the curated survivors,
    // keep the lower-id representative of each pair
    val pairs = Dedup.minhashPairs(curated, "text", "doc_id",
      numHashes = 64, bands = 16, threshold = 0.6, shingleN = 1)
    val dupIds = pairs.select(col("b")).as[Long].collect().toSet
    assert(dupIds.contains(3L))   // near dup of 1 caught post-curation
    assert(!dupIds.contains(6L) && !dupIds.contains(7L))
    val pruned = curated.join(pairs.select(col("b").as("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(pruned.select("doc_id").as[Long].collect().toSet == Set(1L, 6L, 7L))

    // stage 3: deterministic stratified sampling — books kept fully, the
    // sampled set is reproducible run to run
    val sampled = Curate.stratifiedSample(pruned, "source", "doc_id",
      rates = Map("books" -> 1.0), defaultRate = 0.5)
    val s1 = sampled.select("doc_id").as[Long].collect().toSet
    val s2 = Curate.stratifiedSample(pruned, "source", "doc_id",
        rates = Map("books" -> 1.0), defaultRate = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)                      // deterministic
    assert(Set(6L, 7L).subsetOf(s1))      // books stratum kept fully
  }
}
