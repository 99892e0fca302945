package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import graft.app.{ClickhubCli, HttpApp}
import graft.queue.WorkQueue
import graft.sources.GitImporter

/** The application surface: CLI entrypoints (clickhub.py analog) and the
  * HTTP enqueue API (app.py analog, including the reference's own
  * end-to-end test shapes from test.py:22-43).
  */
class AppSpec extends SparkSpecBase {

  private def commitRow(hash: String, time: String): String =
    (Seq(hash, "alice", time, s"msg $hash") ++ Seq.fill(9)("1")).mkString("\t")

  private def newEnv(maxQueue: Int = 10000): ClickhubCli.Env =
    ClickhubCli.Env(spark, new GitImporter(spark, tmpDir("wh")),
      new WorkQueue(Files.createTempDirectory("q"), maxQueue))

  private def writeRepoTsv(root: String, repo: String, rows: Seq[String]): String = {
    val dir = Paths.get(root, repo)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("commits.tsv"), rows.mkString("", "\n", "\n"))
    dir.toString
  }

  test("worker drains the queue: claim → import → release") {
    val e = newEnv()
    val root = tmpDir("tsv")
    writeRepoTsv(root, "acme/one", Seq(commitRow("a", "2024-01-01 10:00:00")))
    writeRepoTsv(root, "acme/two", Seq(commitRow("b", "2024-02-01 10:00:00")))
    ClickhubCli.schedule(e, "acme/one").isRight shouldBe true
    ClickhubCli.schedule(e, "acme/two", priority = 5).isRight shouldBe true
    val done = ClickhubCli.worker(e, "w1", r => s"$root/$r", maxPolls = 3, sleepMs = 1)
    done shouldBe Seq("acme/two", "acme/one") // priority order
    e.queue.length shouldBe 0
    e.importer.catalog.read("commits").count() shouldBe 2
  }

  test("start_workers: N workers drain one queue concurrently, disjointly (start_workers.sh)") {
    val e = newEnv()
    val root = tmpDir("tsv")
    val repos = (1 to 6).map(i => s"acme/r$i")
    repos.zipWithIndex.foreach { case (r, i) =>
      writeRepoTsv(root, r, Seq(commitRow(s"h$i", f"2024-01-01 10:00:${i}%02d")))
      ClickhubCli.schedule(e, r).isRight shouldBe true
    }
    val done = ClickhubCli.startWorkers(e, nWorkers = 3, r => s"$root/$r",
      maxPolls = 4, sleepMs = 1)
    // every repo processed exactly once across the pool — the claim CAS's
    // one-winner invariant extended from 2 claimants (QueueSpec) to a pool
    val all = done.values.flatten.toSeq
    all.sorted shouldBe repos.sorted
    all.distinct.size shouldBe all.size
    e.queue.length shouldBe 0
    e.importer.catalog.read("commits").count() shouldBe 6
  }

  test("start_workers over the object-store queue: disjoint drain + crashed-winner repair") {
    // the conditional-PUT substrate under REAL worker-pool interleaving,
    // not just QueueSpec's protocol-level races: N threads drive
    // GitImporter.workOnce against one LocalCondPutStore, with a
    // pre-seeded pending+claimed pair — a winner that crashed between its
    // claim CAS and the pending delete (ObjectStoreQueue's repair path)
    val storeDir = Files.createTempDirectory("osq-pool")
    val store = new graft.queue.LocalCondPutStore(storeDir)
    val q = new graft.queue.ObjectStoreQueue(store)
    val e = ClickhubCli.Env(spark, new GitImporter(spark, tmpDir("wh")), q)
    val root = tmpDir("tsv")
    val repos = (1 to 6).map(i => s"acme/r$i")
    repos.zipWithIndex.foreach { case (r, i) =>
      writeRepoTsv(root, r, Seq(commitRow(s"h$i", f"2024-01-01 10:00:${i}%02d")))
      q.schedule(r).isRight shouldBe true
    }
    // crashed winner: pending marker still present, claimed object already
    // committed by a worker that died before its delete (same key layout
    // as ObjectStoreQueue: base64url(repo) + state suffix, TSV row)
    def key(repo: String, state: String) =
      java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(repo.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + state
    q.schedule("acme/crashed").isRight shouldBe true
    store.putIfAbsent(key("acme/crashed", ".claimed"),
      "acme/crashed\t1\t0\tdead-worker\t42") shouldBe true

    val done = ClickhubCli.startWorkers(e, nWorkers = 3, r => s"$root/$r",
      maxPolls = 5, sleepMs = 1)
    val all = done.values.flatten.toSeq
    // every live repo processed exactly once; the crashed repo's claimed
    // object is authoritative, so NO worker re-claims (re-imports) it
    all.sorted shouldBe repos.sorted
    all.distinct.size shouldBe all.size
    e.importer.catalog.read("commits").count() shouldBe 6
    // the stale pending marker was lazily repaired by claim scans...
    store.get(key("acme/crashed", ".pending")) shouldBe None
    // ...while the dead worker's claim survives for its supervisor to
    // complete() or re-schedule — the queue still counts it
    store.get(key("acme/crashed", ".claimed")) should not be None
    q.length shouldBe 1
    q.complete("acme/crashed")
    q.length shouldBe 0
  }

  test("start_workers fails loudly when a worker dies mid-import") {
    val e = newEnv()
    val root = tmpDir("tsv")
    writeRepoTsv(root, "acme/bad", Seq(commitRow("h", "not-a-timestamp")))
    ClickhubCli.schedule(e, "acme/bad").isRight shouldBe true
    // the bad timestamp rejects the ingest cast; the pool must surface the
    // dead worker, not report success with dropped jobs
    val ex = intercept[RuntimeException] {
      ClickhubCli.startWorkers(e, nWorkers = 2, r => s"$root/$r",
        maxPolls = 2, sleepMs = 1)
    }
    ex.getMessage should include("workers failed")
  }

  test("update_all_repos enqueues stalest ingested repos not already queued") {
    val e = newEnv()
    val root = tmpDir("tsv")
    writeRepoTsv(root, "acme/old", Seq(commitRow("a", "2024-01-01 10:00:00")))
    ClickhubCli.importRepo(e, "acme/old", s"$root/acme/old")
    Thread.sleep(1100) // second-granular updated_at: ensure distinct staleness
    writeRepoTsv(root, "acme/new", Seq(commitRow("b", "2024-02-01 10:00:00")))
    ClickhubCli.importRepo(e, "acme/new", s"$root/acme/new")
    e.queue.schedule("acme/new") // already queued → must be excluded (J1)
    val scheduled = ClickhubCli.updateAllRepos(e, limit = 10)
    scheduled shouldBe Seq("acme/old")
  }

  test("bulk_schedule skips duplicates") {
    val e = newEnv()
    val ok = ClickhubCli.bulkSchedule(e, Seq("a/1", "a/2", "a/1"))
    ok shouldBe Seq("a/1", "a/2")
  }

  // --- the reference's own HTTP test shapes (test.py) ---

  private def withApp(e: ClickhubCli.Env)(f: (HttpClient, Int) => Unit): Unit = {
    // the shipped default probe shells `git ls-remote` against github.com
    // (GitRemoteProbe.default) — inject a pure predicate here so queue/dup
    // tests don't depend on the network; the real probe has its own test
    val app = new HttpApp(e, 0, remoteValid = _ => true)
    app.start()
    try f(HttpClient.newHttpClient(), app.boundPort)
    finally app.stop()
  }

  private def get(c: HttpClient, port: Int, repo: String): HttpResponse[String] =
    c.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port/add_new_repo?repo=$repo")).build(),
      HttpResponse.BodyHandlers.ofString())

  test("http: invalid repo → 400 (test.py:22-24)") {
    withApp(newEnv()) { (c, p) =>
      get(c, p, "testing_repo").statusCode() shouldBe 400
    }
  }

  test("http: well-formed but nonexistent repo → 400 via the remote-validity probe (app.py:45)") {
    // the reference probes `git ls-remote` (importer.py:77-83); here the
    // probe is injected — this one knows only one real repo
    val app = new HttpApp(newEnv(), 0, remoteValid = _ == "acme/real")
    app.start()
    try {
      val c = HttpClient.newHttpClient()
      val bad = get(c, app.boundPort, "acme/does-not-exist")
      bad.statusCode() shouldBe 400
      bad.body() shouldBe "INVALID REPOSITORY"
      get(c, app.boundPort, "acme/real").body() shouldBe "SCHEDULED"
    } finally app.stop()
  }

  test("http: real `git ls-remote` probe — live fixture scheduled, missing remote → 400 (importer.py:77-83)") {
    // end-to-end through the REAL subprocess probe: `git ls-remote` accepts
    // a plain directory as the remote, so a local `git init` fixture stands
    // in for a live GitHub repo and a nonexistent path for a dead one
    val root = tmpDir("remotes")
    val fixture = Paths.get(root, "acme", "live")
    Files.createDirectories(fixture)
    new ProcessBuilder("git", "init", "--quiet", fixture.toString)
      .start().waitFor() shouldBe 0
    val app = new HttpApp(newEnv(), 0,
      remoteValid = graft.sources.GitRemoteProbe.lsRemote(r => s"$root/$r"))
    app.start()
    try {
      val c = HttpClient.newHttpClient()
      get(c, app.boundPort, "acme/live").body() shouldBe "SCHEDULED"
      val dead = get(c, app.boundPort, "acme/ghost")
      dead.statusCode() shouldBe 400
      dead.body() shouldBe "INVALID REPOSITORY"
    } finally app.stop()
  }

  test("http: already-ingested repo → 200 ALREADY_PROCESSED (test.py:26-31, intended semantics)") {
    val e = newEnv()
    val root = tmpDir("tsv")
    writeRepoTsv(root, "acme/repo", Seq(commitRow("a", "2024-01-01 10:00:00")))
    ClickhubCli.importRepo(e, "acme/repo", s"$root/acme/repo")
    withApp(e) { (c, p) =>
      val r = get(c, p, "acme/repo")
      r.statusCode() shouldBe 200
      r.body() shouldBe "ALREADY_PROCESSED"
    }
  }

  test("http: queued repo → 200 ALREADY_PROCESSING; new repo → SCHEDULED (test.py:33-43)") {
    val e = newEnv()
    withApp(e) { (c, p) =>
      get(c, p, "acme/fresh").body() shouldBe "SCHEDULED"
      get(c, p, "acme/fresh").body() shouldBe "ALREADY_PROCESSING"
      e.queue.complete("acme/fresh")
      get(c, p, "acme/fresh").body() shouldBe "SCHEDULED"
    }
  }

  test("http: full queue → 403 QUEUE IS FULL (app.py:56-59)") {
    val e = newEnv(maxQueue = 1)
    withApp(e) { (c, p) =>
      get(c, p, "a/1").statusCode() shouldBe 200
      val r = get(c, p, "a/2")
      r.statusCode() shouldBe 403
      r.body() shouldBe "QUEUE IS FULL"
    }
  }
}
