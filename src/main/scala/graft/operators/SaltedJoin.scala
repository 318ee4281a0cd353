package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join — the manual remedy when one join key is so
  * hot that a single reducer drowns (AQE's skew-join split handles
  * sort-merge joins it can see; salting is the portable form that
  * also covers aggregate-build sides and pre-AQE engines, and its
  * spread is deterministic rather than runtime-detected).
  *
  * Shape: every probe-side row gets a deterministic salt in
  * [0, salts) from a row-identity hash (engine-portable md5-nibble
  * arithmetic — NOT `rand()`, so retries, resumes, and the oracle
  * all see the same plan input); the build side is replicated
  * `salts`× with a literal explode; the join keys become
  * (key, salt). A key with N rows spreads over min(salts, N)
  * reducers instead of one. The salt never escapes the operator and
  * every probe row meets exactly one replica of its build row, so
  * the result multiset is IDENTICAL to the plain join — which is
  * what makes the whole transformation oracle-checkable against the
  * unsalted SQL.
  *
  * Cost: the build side shuffles `salts`× its size — the standard
  * trade (salting suits a medium build side; a tiny one should just
  * broadcast, a same-size one should not be replicated).
  */
object SaltedJoin {

  def join(fact: DataFrame, dim: DataFrame, key: String,
      saltKeyExpr: String, salts: Int): DataFrame = {
    require(salts > 0)
    // fast one-md5 hash: the salt runs per-row on the LARGE side, and
    // nothing downstream needs the oracle-portable nibble form (the
    // oracle is the unsalted SQL — salts never appear in results)
    val salted = fact.withColumn("__salt",
      expr(s"(${graft.llm.Dedup.hash16FastExpr(saltKeyExpr)} % $salts)"))
    val replicated = dim.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
