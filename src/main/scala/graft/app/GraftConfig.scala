package graft.app

/** The reference's `config.yml` (/root/reference/config.yml) as engine
  * configuration — previously these knobs were hardcoded defaults scattered
  * through [[ClickhubCli]].
  *
  * Key mapping (reference → here):
  *   - `data_cache` (config.yml:9)        → [[GraftConfig.dataCache]] — where
  *     cloned repos / git-import TSVs live; the default TSV root for workers
  *   - `max_queue_length` (config.yml:11) → [[GraftConfig.maxQueueLength]]
  *   - `task_table` / `clone_table` (config.yml:13,15) → queue names; our
  *     queues are directories under [[GraftConfig.queueDir]]
  *   - `sleep_time` (config.yml:17)       → [[GraftConfig.sleepTimeMs]]
  *     (seconds in the reference; stored as ms here)
  *   - `repo_lookup_table` (config.yml:19) → [[GraftConfig.repoLookupTable]]
  *     — the table the HTTP dup-probe queries (app.py:48-50)
  *   - `host`/`port`/credentials (config.yml:2-7) are ClickHouse server
  *     coordinates; the engine analog is the warehouse root + Spark master,
  *     so those two take their place.
  *
  * The file format is the YAML subset the reference actually uses: flat
  * `key: value` lines, `#` comments, optional single quotes — parsed here
  * without a YAML dependency (build.sbt's dependency set is closed).
  */
final case class GraftConfig(
    warehouse: String = "/tmp/graft-warehouse",
    sparkMaster: String = "local[4]",
    queueDir: String = "/tmp/graft-queue",
    dataCache: String = "/opt/git_cache",
    maxQueueLength: Int = 10000,
    sleepTimeMs: Long = 10000L,
    taskTable: String = "work_queue",
    cloneTable: String = "new_queue",
    repoLookupTable: String = "commits",
    // ANN index knobs (extension surface, not in the reference's config.yml):
    // cells in the IVF coarse quantizer and cells probed per query — the
    // recall/scan-fraction trade (`ivf_ncells` / `ivf_nprobe` in the file).
    // Defaults match graft.operators.Similarity's documented contract.
    ivfNCells: Int = 16,
    ivfNProbe: Int = 4)

object GraftConfig {

  /** Parse the flat `key: value` YAML subset (comments, blank lines, quoted
    * strings). Unknown keys are ignored (the reference carries ClickHouse
    * connection keys we have no use for); missing keys keep their defaults.
    */
  def parse(text: String): GraftConfig = {
    val kv = text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split(":", 2) match {
          case Array(k, v) =>
            // quoted values keep everything inside the quotes; bare values
            // stop at a ` #` comment — YAML comments need whitespace (or
            // value start) before the '#', so `/opt/cache#1` survives while
            // `500  # cap` parses as 500 and `key: # unset` as absent
            val raw = v.trim
            val cleaned = raw.headOption match {
              case Some(q @ ('\'' | '"')) =>
                val end = raw.indexOf(q, 1)
                if (end > 0) raw.substring(1, end) else raw.drop(1)
              case Some('#') => ""
              case _ => raw.split("\\s#", 2)(0).trim
            }
            if (cleaned.isEmpty) None else Some(k.trim -> cleaned)
          case _ => None
        }
      }
      .toMap
    def num(key: String): Option[Long] =
      kv.get(key).flatMap(v => scala.util.Try(v.toLong).toOption)
    val d = GraftConfig()
    GraftConfig(
      warehouse = kv.getOrElse("warehouse", d.warehouse),
      sparkMaster = kv.getOrElse("spark_master", d.sparkMaster),
      queueDir = kv.getOrElse("queue_dir", d.queueDir),
      dataCache = kv.getOrElse("data_cache", d.dataCache),
      maxQueueLength = num("max_queue_length").map(_.toInt).getOrElse(d.maxQueueLength),
      sleepTimeMs = num("sleep_time").map(_ * 1000L).getOrElse(d.sleepTimeMs),
      taskTable = kv.getOrElse("task_table", d.taskTable).split('.').last,
      cloneTable = kv.getOrElse("clone_table", d.cloneTable).split('.').last,
      repoLookupTable = kv.getOrElse("repo_lookup_table", d.repoLookupTable).split('.').last,
      ivfNCells = num("ivf_ncells").map(_.toInt).getOrElse(d.ivfNCells),
      ivfNProbe = num("ivf_nprobe").map(_.toInt).getOrElse(d.ivfNProbe))
  }

  def load(path: String): GraftConfig =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
