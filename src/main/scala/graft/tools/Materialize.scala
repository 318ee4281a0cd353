package graft.tools

import org.apache.spark.sql.DataFrame

/** The ONE materialization point for every multi-read intermediate in
  * the engine (OrderedRank's triple-read input, dedup bucket tables,
  * per-round iteration state). Two modes behind a runtime conf:
  *
  *  - default (local): `localCheckpoint()` — eager, truncates lineage,
  *    stores blocks on executors. The fastest pin for a single-JVM /
  *    healthy-cluster run, but NOT fault-tolerant: a lost executor
  *    loses blocks AND the lineage to rebuild them.
  *  - durable (`spark.graft.materialize.durable=true`): reliable
  *    `checkpoint()` to the SparkContext checkpoint dir (set it to a
  *    DFS path on a cluster; a temp dir is provisioned if unset so
  *    the knob works out of the box). Same lineage truncation — which
  *    iterative call sites REQUIRE: `persist` alone was measured to
  *    OOM the driver on connected components because each round's
  *    plan string grows with the kept lineage — but blocks live in
  *    the checkpoint store, so one lost executor cannot kill a 100 TB
  *    job mid-pipeline.
  *
  * Both modes are eager on purpose: every call site follows the pin
  * with ≥2 consumers (or an iteration), so paying the materialization
  * immediately is the point.
  *
  * Disk growth in durable mode: reliable checkpoints are only GC'd
  * when `spark.cleaner.referenceTracking.cleanCheckpoints=true` is
  * set AT SparkContext CREATION (the ContextCleaner reads it once) —
  * iterative call sites (connected components: ~25 rounds × full
  * label+edge tables) otherwise accumulate one checkpoint copy per
  * round until the session ends. Set that conf in the session builder
  * for long-lived durable clusters; the temp-dir fallback's growth is
  * bounded by the (local-only, see below) session lifetime.
  */
object Materialize {

  /** Runtime conf key: set "true" for fault-tolerant materialization. */
  val DurableKey = "spark.graft.materialize.durable"

  def apply(df: DataFrame): DataFrame = {
    val durable = df.sparkSession.conf
      .getOption(DurableKey).exists(_.trim.equalsIgnoreCase("true"))
    if (durable) {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        // A driver-local temp dir only delivers the durability
        // promise in single-JVM mode: on a real cluster executors
        // would write "reliable" checkpoints to their OWN local
        // disks and never find each other's blocks. Fail fast there
        // instead of silently degrading; a DFS checkpoint dir is the
        // caller's one mandatory cluster setting.
        if (!sc.master.startsWith("local"))
          throw new IllegalStateException(
            s"$DurableKey=true on master '${sc.master}' requires " +
              "sparkContext.setCheckpointDir(<DFS path>): a " +
              "driver-local temp fallback is not fault-tolerant " +
              "off local mode")
        sc.setCheckpointDir(
          java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      }
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
