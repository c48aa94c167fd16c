package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Optimizer rule that rewrites an inequality-only point-in-interval join
  * into the bucketized equi-join of [[graft.operators.Joins.rangeJoin]].
  *
  * Spark plans `points JOIN intervals ON p BETWEEN s AND e` (no equality
  * conjunct) as BroadcastNestedLoopJoin — or a cartesian product when
  * neither side broadcasts: the |points| x |intervals| plan that falls
  * over at scale. Users writing plain SQL hit this silently. With this
  * rule registered ([[GraftExtensions]]) and
  * `spark.graft.rangeJoin.bucketWidth` set, the join becomes: intervals
  * exploded to the fixed-width buckets they overlap, points hashed to
  * their one bucket, an EQUI join on the bucket, and the ORIGINAL range
  * predicate kept as the join filter — so the rewrite is semantics-
  * preserving for strict and non-strict bounds alike (the bucket range
  * over-covers; the filter decides).
  *
  * Scope guards: inner joins only; triggers only when a lower and an
  * upper bound exist on the SAME numeric point expression from one side,
  * both bounds from the other side; never fires when any equality
  * conjunct already exists (Spark's hash joins handle those); inactive
  * unless the conf is set (opt-in, like AQE skew-join thresholds).
  * Malformed intervals (end < start) explode to zero buckets. The
  * rewritten join contains a bucket equality, so the rule cannot match
  * its own output (idempotent under re-optimization/AQE). Unlike the
  * explicit [[graft.operators.Joins.rangeJoin]] API there is no
  * max-replication guard here — a conf-driven rewrite must not turn a
  * previously-running query into an error; size the width to the data. */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private case class BoundOn(point: Expression, bound: Expression,
                             lower: Boolean, pointOnLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "")
    if (width.isEmpty) plan
    else {
      val w = width.toLong
      require(w > 0, s"$WidthConf must be positive: $w")
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) =>
          rewrite(j, w).getOrElse(j)
      }
    }
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val Join(l, r, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    // which side does an expression read from — entirely left, entirely
    // right, or neither/both (disqualifying)
    def side(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(l.outputSet)) Some(true)
      else if (refs.subsetOf(r.outputSet)) Some(false)
      else None
    }
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
      case EqualNullSafe(a, b) => side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
      case _ => false
    }
    if (hasEqui) return None

    // normalize each comparison into "point bounded by other side's
    // expression"; every comparison offers both readings (a as point, b
    // as point)
    def views(a: Expression, b: Expression, aLower: Boolean): Seq[BoundOn] =
      (side(a), side(b)) match {
        case (Some(sa), Some(sb)) if sa != sb &&
            a.dataType.isInstanceOf[NumericType] &&
            b.dataType.isInstanceOf[NumericType] &&
            a.deterministic && b.deterministic =>
          Seq(BoundOn(a, b, aLower, sa), BoundOn(b, a, !aLower, sb))
        case _ => Nil
      }
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => views(a, b, aLower = true)
      case GreaterThan(a, b)        => views(a, b, aLower = true)
      case LessThanOrEqual(a, b)    => views(a, b, aLower = false)
      case LessThan(a, b)           => views(a, b, aLower = false)
      case _ => Nil
    }
    val pair = (for {
      lo <- bounds if lo.lower
      hi <- bounds if !hi.lower
      if lo.pointOnLeft == hi.pointOnLeft &&
        lo.point.semanticEquals(hi.point)
    } yield (lo, hi)).headOption
    pair.map { case (lo, hi) =>
      val pointIsLeft = lo.pointOnLeft
      val (pointPlan, ivPlan) = if (pointIsLeft) (l, r) else (r, l)
      def bucketOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Cast(Literal(w), DoubleType)))
      // point side: one projected bucket column
      val pAlias = Alias(bucketOf(lo.point), "__graft_pb")()
      val pPlan = Project(pointPlan.output :+ pAlias, pointPlan)
      // interval side: explode the covered bucket range; end < start
      // (malformed) yields zero buckets instead of a Sequence error
      val bLo = bucketOf(lo.bound)
      val bHi = bucketOf(hi.bound)
      val emptyArr = Literal.create(new GenericArrayData(Array.empty[Any]),
        ArrayType(LongType, containsNull = false))
      val seq = If(LessThanOrEqual(bLo, bHi),
        Sequence(bLo, bHi, Some(Literal(1L)),
          Some(conf.sessionLocalTimeZone)),
        emptyArr)
      val bAttr = AttributeReference("__graft_ib", LongType,
        nullable = false)()
      val iPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bAttr),
        child = ivPlan)
      val newCond = And(EqualTo(pAlias.toAttribute, bAttr), cond)
      val (nl, nr) =
        if (pointIsLeft) (pPlan: LogicalPlan, iPlan: LogicalPlan)
        else (iPlan: LogicalPlan, pPlan: LogicalPlan)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}

/** Session extension registering [[RangeJoinRule]] plus the engine's
  * custom expressions/aggregates as plain SQL functions — so `spark.sql`
  * users get the codegen cosine and the bounded-state sketches without
  * touching the Scala API:
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  *  - `graft_cosine(a, b)` — codegen cosine over array<float>
  *  - `graft_frequent_items(item, capacity)` — Misra-Gries heavy hitters
  *  - `graft_bottomk_sample(item, k[, salt])` — deterministic bottom-k
  *    by the portable sampling hash
  * Sizing arguments must be integer literals (they parameterize operator
  * STATE, not per-row inputs). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression,
    ExpressionInfo, Literal}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private def litInt(args: Seq[Expression], i: Int, fn: String): Int =
    args(i) match {
      case Literal(v: Int, IntegerType) => v
      case Literal(v: Long, LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal, got $other")
    }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRule)
    e.injectFunction((new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(
        classOf[graft.functions.CosineSimilarityExpr].getName,
        "graft_cosine"),
      (args: Seq[Expression]) => {
        require(args.size == 2, "graft_cosine(a, b) takes 2 arguments")
        graft.functions.CosineSimilarityExpr(args(0), args(1))
      }))
    e.injectFunction((new FunctionIdentifier("graft_frequent_items"),
      new ExpressionInfo(
        classOf[graft.functions.FrequentItemsAgg].getName,
        "graft_frequent_items"),
      (args: Seq[Expression]) => {
        require(args.size == 2,
          "graft_frequent_items(item, capacity) takes 2 arguments")
        graft.functions.FrequentItemsAgg(args.head,
          litInt(args, 1, "graft_frequent_items"))
      }))
    e.injectFunction((new FunctionIdentifier("graft_langid"),
      new ExpressionInfo(
        classOf[graft.functions.LangIdExpr].getName, "graft_langid"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_langid(text) takes 1 argument")
        graft.functions.LangIdExpr(args.head)
      }))
    // the sketch expressions consume split(normalized(text)) token arrays;
    // the SQL forms take raw text and prepend the same normalize+split
    // chain the DataFrame operators use, so signatures JOIN across APIs
    def tokenized(text: Expression): Expression = {
      import org.apache.spark.sql.catalyst.expressions.{Lower, RegExpReplace,
        StringSplit, StringTrim}
      StringSplit(
        Lower(StringTrim(RegExpReplace(text,
          Literal(UTF8String.fromString("\\s+"), StringType),
          Literal(UTF8String.fromString(" "), StringType)))),
        Literal(UTF8String.fromString("\\s+"), StringType),
        Literal(-1, IntegerType))
    }
    e.injectFunction((new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(
        classOf[graft.functions.SimHashExpr].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "graft_simhash(text) takes 1 argument")
        graft.functions.SimHashExpr(tokenized(args.head), portable = false)
      }))
    e.injectFunction((new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[graft.functions.MinHashSignatureExpr].getName,
        "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "graft_minhash(text, shingleN, numHashes) takes 3 arguments")
        // same seed-mix derivation as Dedup.minhashSignatureCol(Fast)
        val mix = graft.operators.Dedup.mixConstants(
          litInt(args, 2, "graft_minhash"))
        graft.functions.MinHashSignatureExpr(tokenized(args.head),
          litInt(args, 1, "graft_minhash"),
          mix.map(_._1).toArray, mix.map(_._2).toArray)
      }))
    e.injectFunction((new FunctionIdentifier("graft_bottomk_sample"),
      new ExpressionInfo(
        classOf[graft.functions.BottomKSampleAgg].getName,
        "graft_bottomk_sample"),
      (args: Seq[Expression]) => {
        require(args.size == 2 || args.size == 3,
          "graft_bottomk_sample(item, k[, salt]) takes 2 or 3 arguments")
        val salt = if (args.size < 3) "graft" else args(2) match {
          case Literal(s: UTF8String, StringType) => s.toString
          case other => throw new IllegalArgumentException(
            s"graft_bottomk_sample: salt must be a string literal: $other")
        }
        graft.functions.BottomKSampleAgg(args.head,
          litInt(args, 1, "graft_bottomk_sample"), salt)
      }))
  }
}
