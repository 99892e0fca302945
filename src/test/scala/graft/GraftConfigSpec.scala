package graft

import graft.app.{ClickhubCli, GraftConfig}

/** config.yml analog (/root/reference/config.yml): the flat-YAML parser and
  * its wiring into the CLI env.
  */
class GraftConfigSpec extends SparkSpecBase {

  test("parses the reference's own config.yml shape: comments, quotes, table names") {
    val cfg = GraftConfig.parse(
      """# clickhouse details
        |host: ''
        |port: 8443
        |# location to clone repos
        |data_cache: '/opt/git_cache'
        |# queue details
        |max_queue_length: 10000
        |task_table: 'git.work_queue'
        |clone_table: 'git.new_queue'
        |sleep_time: 10
        |repo_lookup_table: 'git.commits'
        |""".stripMargin)
    cfg.dataCache shouldBe "/opt/git_cache"
    cfg.maxQueueLength shouldBe 10000
    cfg.sleepTimeMs shouldBe 10000L  // seconds in the file, ms in the engine
    cfg.taskTable shouldBe "work_queue"     // db-qualified name → table name
    cfg.cloneTable shouldBe "new_queue"
    cfg.repoLookupTable shouldBe "commits"
  }

  test("missing keys keep defaults; unknown keys are ignored") {
    val cfg = GraftConfig.parse("sleep_time: 3\nsome_future_key: x\n")
    cfg.sleepTimeMs shouldBe 3000L
    cfg.maxQueueLength shouldBe GraftConfig().maxQueueLength
    cfg.warehouse shouldBe GraftConfig().warehouse
  }

  test("the shipped deploy/config.yml parses cleanly") {
    val cfg = GraftConfig.load("deploy/config.yml")
    cfg.warehouse shouldBe "/data/graft-warehouse"
    cfg.maxQueueLength shouldBe 10000
    cfg.sleepTimeMs shouldBe 10000L
    cfg.taskTable shouldBe "work_queue"
    cfg.ivfNCells shouldBe 16
  }

  test("IVF knobs parse and default to the documented contract values") {
    GraftConfig().ivfNCells shouldBe 16
    GraftConfig().ivfNProbe shouldBe 4
    val cfg = GraftConfig.parse("ivf_ncells: 64\nivf_nprobe: 8\n")
    cfg.ivfNCells shouldBe 64
    cfg.ivfNProbe shouldBe 8
  }

  test("trailing comments and quoted values with hashes parse correctly") {
    val cfg = GraftConfig.parse(
      """max_queue_length: 500  # cap
        |data_cache: '/opt/cache#1'  # path with a hash inside quotes
        |sleep_time: 2 # seconds
        |""".stripMargin)
    cfg.maxQueueLength shouldBe 500
    cfg.dataCache shouldBe "/opt/cache#1"
    cfg.sleepTimeMs shouldBe 2000L
  }

  test("bare values keep mid-token hashes; empty or malformed values fall back") {
    val cfg = GraftConfig.parse(
      """data_cache: /opt/cache#1
        |max_queue_length: # unset
        |sleep_time: fast
        |""".stripMargin)
    // YAML comments need whitespace before '#': an unquoted path keeps it
    cfg.dataCache shouldBe "/opt/cache#1"
    // a commented-out or non-numeric value keeps the default, never throws
    cfg.maxQueueLength shouldBe GraftConfig().maxQueueLength
    cfg.sleepTimeMs shouldBe GraftConfig().sleepTimeMs
  }

  test("task_table and clone_table map to distinct queue instances (create_db.py:36-65)") {
    // the reference's two KeeperMap queues (work_queue / new_queue) are
    // selected per-invocation via --task_table; here each is its own dir
    val base = tmpDir("cfg-q2")
    val cfg = GraftConfig(warehouse = tmpDir("cfg-wh2"), queueDir = base)
    val work = ClickhubCli.env(cfg)
    val clone = ClickhubCli.env(cfg.copy(taskTable = cfg.cloneTable))
    ClickhubCli.schedule(work, "acme/x").isRight shouldBe true
    // same repo schedules independently on the clone queue — separate keyspaces
    ClickhubCli.schedule(clone, "acme/x").isRight shouldBe true
    work.queue.length shouldBe 1
    clone.queue.length shouldBe 1
  }

  test("env(cfg) wires queue length through to the scheduler guard") {
    val cfg = GraftConfig(
      warehouse = tmpDir("cfg-wh"),
      queueDir = tmpDir("cfg-q"),
      maxQueueLength = 1)
    val e = ClickhubCli.env(cfg)
    ClickhubCli.schedule(e, "a/1").isRight shouldBe true
    ClickhubCli.schedule(e, "a/2") shouldBe Left("QUEUE IS FULL")
  }
}
