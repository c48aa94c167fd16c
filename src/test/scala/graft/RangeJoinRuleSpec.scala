package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.{GraftExtensions, RangeJoinRule}

/** The auto-rewrite rule: inequality joins become bucketized equi-joins
  * exactly when the conf is set and the pattern matches, with identical
  * results. Uses its own session (extensions are session-scoped) on the
  * shared SparkContext. */
class RangeJoinRuleSpec extends SparkSpec {

  private lazy val ext: SparkSession = {
    val base = spark // force shared session/context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // the shared spark stays default for the other (lazily-run) suites
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def frames(s: SparkSession) = {
    import s.implicits._
    val pts = Seq(1L, 2L, 4L, 6L, 25L, 199L).toDF("p")
    val ivs = Seq(("A", 2L, 4L), ("B", 4L, 6L), ("C", 20L, 30L),
      ("M", 9L, 7L)).toDF("iv", "s", "e")
    (pts, ivs)
  }
  private val expected = Set((2L, "A"), (4L, "A"), (4L, "B"), (6L, "B"),
    (25L, "C"))

  test("rule fires when conf set: no nested-loop/cartesian, same results") {
    val (pts, ivs) = frames(ext)
    ext.conf.set(RangeJoinRule.WidthConf, "10")
    try {
      val j = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_ib"), s"rule did not fire:\n$plan")
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"still a loop join:\n$plan")
      val rows = j.select("p", "iv").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSet == expected && rows.length == expected.size)
    } finally ext.conf.unset(RangeJoinRule.WidthConf)
  }

  test("strict bounds and reversed operand order still match") {
    val (pts, ivs) = frames(ext)
    ext.conf.set(RangeJoinRule.WidthConf, "7")
    try {
      // s < p AND e > p  (interval side on the left of each comparison)
      val j = pts.join(ivs, col("s") < col("p") && col("e") > col("p"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("__graft_ib"), s"rule did not fire:\n$plan")
      // strict bounds: 2/4/6 sit exactly on interval borders and drop;
      // only 25 lies strictly inside (20, 30)
      val got = j.select("p", "iv").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((25L, "C")), s"got $got")
    } finally ext.conf.unset(RangeJoinRule.WidthConf)
  }

  test("rule stays inactive without the conf, and never touches equi or " +
      "outer joins") {
    val (pts, ivs) = frames(ext)
    val noConf = pts.join(ivs, col("p") >= col("s") && col("p") <= col("e"))
    assert(!noConf.queryExecution.executedPlan.toString
      .contains("__graft_ib"))
    assert(noConf.select("p", "iv").collect().length == expected.size)
    ext.conf.set(RangeJoinRule.WidthConf, "10")
    try {
      import ext.implicits._
      val pts2 = Seq((1L, "k1"), (25L, "k2")).toDF("p", "k")
      val ivs2 = Seq(("k2", 20L, 30L), ("k1", 5L, 9L)).toDF("k", "s", "e")
      val equi = pts2.join(ivs2, pts2("k") === ivs2("k") &&
        col("p") >= col("s") && col("p") <= col("e"))
      assert(!equi.queryExecution.executedPlan.toString
        .contains("__graft_ib"), "rule must not touch equi joins")
      assert(equi.count() == 1)
      val outer = frames(ext)._1.join(ivs,
        col("p") >= col("s") && col("p") <= col("e"), "left")
      assert(!outer.queryExecution.executedPlan.toString
        .contains("__graft_ib"), "rule must not touch outer joins")
    } finally ext.conf.unset(RangeJoinRule.WidthConf)
  }
  test("extension SQL functions: graft_cosine / frequent_items / bottomk") {
    val cos = ext.sql(
      """SELECT graft_cosine(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
                             CAST(array(1.0, 0.0) AS ARRAY<FLOAT>))""")
      .head.getDouble(0)
    assert(cos == 1.0)
    val hh = ext.sql(
      """SELECT graft_frequent_items(v, 8) AS s
         FROM VALUES ('a'), ('a'), ('b'), ('a') AS t(v)""")
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(hh.head.getString(0) == "a" && hh.head.getLong(1) == 3L)
    val bk = ext.sql(
      """SELECT g, graft_bottomk_sample(v, 2) AS s
         FROM VALUES ('x', 'p'), ('x', 'q'), ('x', 'r'), ('y', 'z')
           AS t(g, v) GROUP BY g ORDER BY g""")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet)
    assert(bk.map(_._2.size).toSeq == Seq(2, 1))
    // deterministic: the SQL form agrees with the Scala operator
    val viaApi = graft.operators.Curate.groupSample(
      { import ext.implicits._
        Seq(("x", "p"), ("x", "q"), ("x", "r"), ("y", "z")).toDF("g", "v") },
      Seq("g"), "v", k = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(bk.toMap == viaApi)
    // state-sizing args must be literals
    intercept[Exception] {
      ext.sql("SELECT graft_frequent_items(v, length(v)) FROM VALUES ('a') t(v)")
        .collect() }
  }

  test("extension SQL functions: graft_langid / graft_simhash / " +
      "graft_minhash agree with the DataFrame forms") {
    import org.apache.spark.sql.functions.col
    val docs = { import ext.implicits._
      Seq((1L, "the quick brown fox and the lazy dog of the farm"),
          (2L, "el perro y el gato de la casa que en los campos"))
        .toDF("id", "text") }
    docs.createOrReplaceTempView("sqlfn_docs")
    val viaSql = ext.sql(
      """SELECT id, graft_langid(text) AS lang, graft_simhash(text) AS sh,
           graft_minhash(text, 3, 16) AS mh
         FROM sqlfn_docs ORDER BY id""").collect()
    val viaApi = docs.select(col("id"),
        graft.functions.TextFunctions.langId(col("text")).as("lang"),
        graft.operators.Dedup.minhashSignatureCol(col("text"), 16, 3,
          graft.operators.Dedup.Fast).as("mh"))
      .join(graft.operators.Dedup.simhash(docs, "text", "id")
        .withColumnRenamed("simhash", "sh"), Seq("id"))
      .select(col("id"), col("lang"), col("sh"), col("mh"))
      .orderBy("id").collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      assert(s.getString(1) == a.getString(1))
      assert(s.getLong(2) == a.getLong(2))
      assert(s.getSeq[Long](3) == a.getSeq[Long](3))
    }
    assert(viaSql(0).getString(1) == "en" && viaSql(1).getString(1) == "es")
  }
}
