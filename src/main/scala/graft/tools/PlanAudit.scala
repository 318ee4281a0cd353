package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Pmod, Remainder}
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
    * certified: a grouping-free (1-row) aggregate, an aggregate keyed
    * only on internal `__bucket`-style keys (cardinality = the literal
    * bucket count), an explicit limit, a literal `range(...)`, a
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
          case attr: Attribute =>
            attr.name.startsWith("__") || boundedModKey(a.child, attr)
          case _ => false
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

  /** STRUCTURAL bounded-key certificate: the grouping attribute's
    * defining Alias (anywhere under `child`) is a modulo by a
    * foldable divisor — cardinality ≤ the literal, whatever the name.
    * This is the proof the `__`-prefix convention gestures at; a
    * rename alone certifies nothing, so `hash % K`-shaped keys (shard
    * ids, bucket ids) are certified here by their arithmetic instead.
    */
  private def boundedModKey(child: LogicalPlan, attr: Attribute): Boolean = {
    def stripCasts(e: Expression): Expression = e match {
      case c: org.apache.spark.sql.catalyst.expressions.Cast =>
        stripCasts(c.child)
      case other => other
    }
    // A Union reuses its FIRST child's exprIds for the output
    // attributes, so a modulo Alias found under one branch says
    // nothing about the values the other branches feed into the same
    // attribute — refuse to certify through any Union rather than
    // reason about branch provenance.
    val hasUnion = child.collectFirst { case u: Union => u }.nonEmpty
    val defining = child.collect {
      case p: Project => p.projectList.collect {
        case al: Alias if al.exprId == attr.exprId => al.child
      }
    }.flatten
    !hasUnion && defining.nonEmpty && defining.forall(e =>
      stripCasts(e) match {
        case Pmod(_, r, _) => r.foldable
        case Remainder(_, r, _) => r.foldable
        case _ => false
      })
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
      "x32_rolling_sum" -> Set("BNLJoin"))
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
