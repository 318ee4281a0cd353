package graft

import org.scalatest.funsuite.AnyFunSuite

/** The durable-materialization knob (graft.tools.Materialize): every
  * pinned intermediate must produce identical results whether pinned
  * via localCheckpoint (default, single-JVM fast path) or via
  * reliable checkpoint (durable=true — the fault-tolerant setting a
  * 100 TB cluster run would use, where blocks live in the checkpoint
  * store so a lost executor cannot kill the job).
  */
class MaterializeSpec extends AnyFunSuite {
  import SparkTestSession._

  // one query per swapped pin site: OrderedRank's internal pin under
  // an expensive upstream (x51), the connected-components iteration
  // (x33), the BPE per-round vocab (x47), the jaccard bucket table
  // (x04), the prefix-sum pin (x38), the PMI bigram/unigram pins
  // (x58), and OrderedLag's boundary pool (x32)
  private val probes = Seq("x51_ppl_buckets", "x33_dedup_clusters",
    "x47_bpe_encode", "x04_ngram_jaccard", "x38_seq_pack",
    "x58_pmi_collocations", "x32_rolling_sum")

  test("durable checkpoint mode is bit-identical to localCheckpoint") {
    val baseline = probes.map { q =>
      q -> SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
    }.toMap
    spark.conf.set(graft.tools.Materialize.DurableKey, "true")
    try {
      probes.foreach { q =>
        val durable =
          SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
        assert(durable == baseline(q), s"$q diverges under durable mode")
      }
    } finally {
      spark.conf.set(graft.tools.Materialize.DurableKey, "false")
      spark.catalog.clearCache()
    }
  }
}
