package graft.tools

import org.apache.spark.sql.DataFrame

/** Train-once / serve-many: persist a trained model artifact (the PQ
  * codebook — same pattern serves k-means centroids, classifier
  * weights, or a BPE merge table) as a parquet model table on FIRST
  * use and read it back on every subsequent one, so serving cost is
  * decoupled from training cost. In-query training (x46's Lloyd loop)
  * re-pays the full training scan on every execution; at 100 TB the
  * artifact is written by one scheduled training job and thousands of
  * serve queries read the few-KB table — this is that split, with the
  * parquet round-trip's bit-parity proven by the serve query hashing
  * identically to the in-query-trained oracle.
  *
  * The write is a tmp-dir + atomic-rename: a concurrently-arriving
  * reader either sees no model (and trains its own tmp copy — the
  * training is deterministic, so last-rename-wins is harmless) or a
  * complete one; it can never read a half-written table.
  */
object ModelStore {

  /** Root for persisted models; override with SPARK_GRAFT_MODEL_DIR. */
  def modelRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_MODEL_DIR", "spark-warehouse/models")

  /** Deterministic model path: kind + hyperparameter key + a
    * discriminator of the corpus location AND its file-level
    * fingerprint (names, lengths, mtimes — metadata only, no data
    * scan), so models trained at different scale factors or test temp
    * dirs never collide, and a REGENERATED corpus at the same path
    * silently retrains instead of serving a stale artifact against a
    * changed table (which would fail the oracle's recomputed hash).
    */
  def pathFor(kind: String, corpusDir: String, key: String,
      table: String = "embeddings"): String = {
    val root = new java.io.File(s"$corpusDir/$table.parquet")
    // the corpus table may be a single parquet file or a directory of
    // part files — fingerprint whichever exists
    val files = Option(root.listFiles()).map(_.toSeq)
      .getOrElse(if (root.exists()) Seq(root) else Seq.empty)
    val fp = files.sortBy(_.getName).foldLeft(corpusDir.hashCode.toLong) {
      (h, f) => h * 1000003L + f.getName.hashCode +
        31L * f.length() + f.lastModified()
    }
    s"$modelRoot/${kind}_${key}_" + java.lang.Long.toHexString(fp)
  }

  /** The artifact at `path`, training and persisting it first iff
    * absent. `train` is by-name: the training plan is never built
    * when the model table already exists.
    */
  def ensure(path: String, train: => DataFrame): DataFrame = {
    val dir = new java.io.File(path)
    if (!dir.exists()) {
      val trained = train
      val tmp = path + ".tmp-" + java.util.UUID.randomUUID().toString
      trained.coalesce(1).write.mode("overwrite").parquet(tmp)
      if (!new java.io.File(tmp).renameTo(dir)) {
        // a concurrent trainer won the rename; its artifact is
        // byte-equivalent (deterministic training) — drop ours
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(tmp))
      }
      trained.sparkSession.read.parquet(path)
    } else {
      // serve path: no training plan, just the few-KB model table scan
      org.apache.spark.sql.SparkSession.active.read.parquet(path)
    }
  }
}
