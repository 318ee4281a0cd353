package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Attribute, CaseWhen, Cast, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Pmod, Remainder}
import org.apache.spark.sql.catalyst.plans.logical._

/** Plan-shape audit over the whole declared query surface: flags the
  * patterns that do not survive a 100 TB scale-up — single-partition
  * exchanges, cartesian products (other than deliberate broadcasts of
  * 1-row scalar frames), and scans with no pushed filters where the
  * query filters on a scanned column. Run:
  *   tools/spark-run.sh graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {

  /** A broadcast-hinted subtree is "provably bounded" iff its ROOT is
    * certified: a grouping-free (1-row) aggregate, an aggregate whose
    * every key has a STRUCTURALLY bounded integer range (modulo by a
    * small literal, quantile-bucket sums — see [[boundedKey]]; the
    * column name proves nothing), an explicit limit, a literal `range(...)`, a
    * filter with a top-level conjunct pinning an id under an integer
    * literal (fixed query/seed/benchmark prefixes), or a scan of a
    * fixed-size dimension table (region/nation) — with boundedness
    * propagated bottom-up through row-preserving unary nodes, joins
    * (both sides bounded), and unions (all children bounded). Judging
    * at the root, not by the existence of any bounded descendant,
    * keeps `broadcast(corpus.join(tiny))` from passing; row-EXPANDING
    * nodes (Generate) never propagate. A hint on anything else — e.g.
    * a per-document aggregate over the whole corpus — forces an
    * unbounded driver collect at scale and is flagged.
    */
  def provablyBounded(p: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // foldable, not Literal: analysis wraps int literals compared to
    // long ids in a Cast, which is still a constant bound
    def bounding(e: Expression): Boolean = e match {
      case LessThan(_: Attribute, bound) => bound.foldable
      case LessThanOrEqual(_: Attribute, bound) => bound.foldable
      case GreaterThan(bound, _: Attribute) => bound.foldable
      case GreaterThanOrEqual(bound, _: Attribute) => bound.foldable
      case _ => false
    }
    p match {
      case a: Aggregate if a.groupingExpressions.isEmpty => true
      case a: Aggregate if a.groupingExpressions.nonEmpty &&
        a.groupingExpressions.forall {
          case attr: Attribute => boundedKey(a.child, attr)
          case e => cardBound(e).exists(_ <= MaxKeyCard)
        } => true
      case a: Aggregate => provablyBounded(a.child) // never adds rows
      case _: GlobalLimit => true
      case _: Range => true
      case f: Filter if conjuncts(f.condition).exists(bounding) => true
      case j: Join => provablyBounded(j.left) && provablyBounded(j.right)
      case u: Union => u.children.forall(provablyBounded)
      case _: Generate => false // row-expanding
      case l: LeafNode =>
        val s = l.toString
        s.contains("nation") || s.contains("region")
      case u: UnaryNode => provablyBounded(u.child)
      case _ => false
    }
  }

  /** A broadcastable grouping key can carry at most this many
    * distinct values — a modulo by a huge literal (`key % 1e9`) is
    * structurally a modulo but practically unbounded, so the divisor
    * magnitude is part of the certificate, not just its shape.
    */
  private val MaxKeyCard = 1000000L

  /** |divisor| when the expression folds to a nonzero number small
    * enough to reason about, else None.
    */
  private def litAbs(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.eval() match {
      case n: java.lang.Number if n.longValue() != 0L =>
        Some(math.abs(n.longValue()))
      case d: org.apache.spark.sql.types.Decimal if d.toLong != 0L =>
        Some(math.abs(d.toLong))
      case _ => None
    }

  /** Conservative integer-range analysis: Some((lo, hi)) when the
    * expression provably takes integral values within [lo, hi].
    * Covers exactly the shapes the engine builds bounded keys from:
    * literals, casts, modulo by a literal, and sums of
    * literal-branched CASE WHENs (OrderedRank's quantile-bucket id is
    * `0 + Σ when(key > boundᵢ, 1, 0)` — range [0, #bounds]).
    */
  private def intRange(e: Expression): Option[(Long, Long)] = e match {
    case Literal(null, _) => Some((0L, 0L)) // one NULL group
    case Literal(n: java.lang.Number, org.apache.spark.sql.types.ByteType |
        org.apache.spark.sql.types.ShortType |
        org.apache.spark.sql.types.IntegerType |
        org.apache.spark.sql.types.LongType) =>
      Some((n.longValue(), n.longValue()))
    case c: Cast => intRange(c.child)
    case al: Alias => intRange(al.child)
    case cw: CaseWhen =>
      val arms = cw.branches.map(_._2) ++ cw.elseValue.toSeq
      val rs = arms.map(intRange)
      if (rs.nonEmpty && rs.forall(_.isDefined)) {
        val rr = rs.flatten
        Some((rr.map(_._1).min, rr.map(_._2).max))
      } else None
    case a: Add =>
      for ((l1, h1) <- intRange(a.left); (l2, h2) <- intRange(a.right))
        yield (math.addExact(l1, l2), math.addExact(h1, h2))
    case p: Pmod => litAbs(p.right).map(k => (0L, k - 1))
    case r: Remainder => litAbs(r.right).map(k => (-(k - 1), k - 1))
    case _ => None
  }

  /** Distinct-value bound for an expression, from its integer range. */
  private def cardBound(e: Expression): Option[Long] =
    intRange(e).map { case (lo, hi) => math.subtractExact(hi, lo) + 1 }

  /** STRUCTURAL bounded-key certificate: every defining Alias of the
    * grouping attribute (anywhere under `child`) has a provably
    * bounded integer range — cardinality follows from the arithmetic
    * (`hash % K`, quantile-bucket sums), never from the column NAME.
    * An `__`-prefixed rename of an unbounded key certifies nothing.
    */
  private def boundedKey(child: LogicalPlan, attr: Attribute): Boolean = {
    // A Union reuses its FIRST child's exprIds for the output
    // attributes, so a bounded Alias found under one branch says
    // nothing about the values the other branches feed into the same
    // attribute — refuse to certify through any Union rather than
    // reason about branch provenance.
    val hasUnion = child.collectFirst { case u: Union => u }.nonEmpty
    val defining = child.collect {
      case p: Project => p.projectList.collect {
        case al: Alias if al.exprId == attr.exprId => al.child
      }
    }.flatten
    !hasUnion && defining.nonEmpty &&
      defining.forall(e => cardBound(e).exists(_ <= MaxKeyCard))
  }

  /** Broadcast hints whose side has no boundedness certificate. */
  def unboundedBroadcasts(plan: LogicalPlan): Seq[LogicalPlan] =
    plan.collect {
      case h: ResolvedHint
          if h.hints.strategy.contains(BROADCAST) &&
            !provablyBounded(h.child) => h.child
    }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    // Audited-and-deliberate shapes: a global scalar aggregate's final
    // reduce is a SinglePartition exchange carrying one row per
    // upstream partition, and broadcasting that 1-row (or few-row)
    // frame back is a BroadcastNestedLoopJoin by construction. These
    // are the *correct* 100 TB shapes (the alternative — a shuffle
    // keyed on nothing — doesn't exist); everything else must stay
    // clean.
    val allow: Map[String, Set[String]] = Map(
      "q12_metrics" -> Set("SinglePartition", "BNLJoin"), // 1-row scale/sd scalars
      "q13_metric_means" -> Set("SinglePartition", "BNLJoin"), // global means
      // 1-row average-balance scalar subquery (TPC-H Q22 shape)
      "q22_scalar_subquery" -> Set("SinglePartition", "BNLJoin"),
      "x23_tfidf" -> Set("SinglePartition", "BNLJoin"), // 1-row corpus count N
      "x41_lm_perplexity" -> Set("SinglePartition", "BNLJoin"), // 1-row (N, V)
      "x42_dsir_weights" -> Set("SinglePartition", "BNLJoin"), // 1-row (Nt, Nr)
      "x44_heavy_hitters" -> Set("SinglePartition", "BNLJoin"), // 1-row n
      // |sources|-row allocation table: dimension-sized window + 1-row scalars
      "x45_temperature_mix" -> Set("SinglePartition", "BNLJoin"),
      "x05_cosine_topk" -> Set("BNLJoin"), // 5 broadcast query vectors
      "x49_hard_negatives" -> Set("BNLJoin"), // 5 broadcast anchor vectors
      // inherits x41's 1-row (N, V) LM scalar shapes
      "x51_ppl_buckets" -> Set("SinglePartition", "BNLJoin"),
      // 1-row bloom-filter map aggregate (≤bits/64 rows into the
      // scalar reduce) broadcast back across the fact keys
      "x52_bloom_prune" -> Set("SinglePartition", "BNLJoin"),
      "x18_ivf_topk" -> Set("BNLJoin"), // broadcast probe lists
      "x36_kmeans_refine" -> Set("BNLJoin"), // k broadcast centroids
      // 1-row codebook aggregate (ksub·m bounded rows into the scalar
      // reduce) + nQueries-row ADC tables, both certified broadcasts
      "x46_pq_topk" -> Set("SinglePartition", "BNLJoin"),
      // OrderedLag's helper fan-out joins the per-bucket tails to the
      // ≤32-row broadcast target list on an inequality — bounded by
      // construction (buckets·maxLag rows)
      "d07_fitted_residuals" -> Set("BNLJoin"),
      "x32_rolling_sum" -> Set("BNLJoin"),
      // k broadcast centroids (pmod-certified seed frame, cf. x36)
      "x57_semantic_dedup" -> Set("BNLJoin"),
      // 1-row (nb, nt) corpus totals into the PMI projection
      "x58_pmi_collocations" -> Set("SinglePartition", "BNLJoin"),
      // 1-row global sketch-grid aggregate (one depth·width long
      // array into the scalar reduce)
      "x61_cm_estimates" -> Set("SinglePartition"),
      // 1-row corpus token-total scalar into the cumulative fraction
      "x64_zipf_curve" -> Set("SinglePartition", "BNLJoin"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sf).queryExecution
        val plan = qe.executedPlan.toString
        val issues = Seq(
          "SinglePartition" -> plan.contains("SinglePartition"),
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          // BroadcastNestedLoopJoin is fine only against tiny frames;
          // flag it so each use stays a conscious decision
          "BNLJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          // a hard broadcast() hint must sit on a provably bounded
          // relation — anything O(input) would kill the driver at scale
          "UnboundedBroadcastHint" ->
            unboundedBroadcasts(qe.analyzed).nonEmpty)
          .collect { case (tag, true) => tag }
          .filterNot(allow.getOrElse(name, Set.empty))
        if (issues.nonEmpty) {
          flagged += 1
          println(s"FLAG  $name: ${issues.mkString(", ")}")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"ERR   $name: ${e.getMessage.take(100)}")
      }
    }
    println(s"== $flagged flagged of ${graft.SparkEntry.queries.size} ==")
    spark.stop()
  }
}
