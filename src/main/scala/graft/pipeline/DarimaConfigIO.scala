package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

/** S2: reference-format JSON config (reference: darima_config.json:1-9,
  * loaded at darima.py:42-46). Keys: num_partitions, data_time_freq,
  * train_datapath, test_datapath, method. A run driven by the
  * reference's own config file behaves identically here (no --files
  * re-discovery dance needed — single JVM, SURVEY.md S2 row).
  */
final case class DarimaRunConfig(
    cfg: DarimaConfig, trainPath: String, testPath: String)

object DarimaConfigIO {

  def load(path: String): DarimaRunConfig = {
    val node = new ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    def int(key: String, dflt: Int): Int =
      if (node.has(key)) node.get(key).asInt(dflt) else dflt
    def str(key: String, dflt: String): String =
      if (node.has(key)) node.get(key).asText(dflt) else dflt
    val cfg = DarimaConfig(
      numChunks = int("num_partitions", 4),
      freq = int("data_time_freq", 24),
      method = str("method", "dlsa"),
      // Fourier seasonal defaults (engine extension keys; absent from
      // the reference's config schema): 3 yearly pairs cut the 10-zone
      // mean MASE from 1.38 to 1.06 (RESULTS.md) — on by default
      harmDaily = int("harmonics_daily", 0),
      harmWeekly = int("harmonics_weekly", 0),
      harmYearly = int("harmonics_yearly", 3),
      modDaily = int("harmonics_mod_daily", 0),
      modYearly = int("harmonics_mod_yearly", 0),
      // engine extension keys: fitter selection + ARIMA search bounds
      // (library defaults match auto_arima.R:74; the pipeline ships
      // tighter measured caps — see DarimaConfig)
      fitter = str("fitter", "longar"),
      maxP = int("max_p", 5),
      maxQ = int("max_q", 5),
      maxSP = int("max_sp", 2),
      maxSQ = int("max_sq", 2))
    val train = str("train_datapath", "")
    val test = str("test_datapath", "")
    require(train.nonEmpty && test.nonEmpty,
      s"config $path must set train_datapath and test_datapath")
    // the reference's shipped config uses paths relative to its repo
    // root (darima_config.json:4-5) — resolve against the config dir
    // so that file works verbatim
    val base = java.nio.file.Paths.get(path).toAbsolutePath.getParent
    def resolve(p: String): String = {
      val asIs = java.nio.file.Paths.get(p)
      if (asIs.isAbsolute) p else base.resolve(p).toString
    }
    DarimaRunConfig(cfg, resolve(train), resolve(test))
  }
}
