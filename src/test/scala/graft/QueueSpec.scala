package graft

import java.nio.file.Files
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.queue.WorkQueue

/** The KeeperMap queue protocol (SURVEY.md §3.2-3.3): enqueue guards,
  * priority-ordered claiming, and the CAS one-winner invariant
  * (/root/reference/repo/importer.py:136-158).
  */
class QueueSpec extends AnyFunSuite with Matchers {

  private def newQueue(max: Int = 10000) =
    new WorkQueue(Files.createTempDirectory("queue"), max)

  test("schedule: duplicate repo is ALREADY_PROCESSING (Node-exists race)") {
    val q = newQueue()
    q.schedule("acme/repo").isRight shouldBe true
    q.schedule("acme/repo") shouldBe Left("ALREADY_PROCESSING")
  }

  test("schedule: queue-length guard (schedule.py:44)") {
    val q = newQueue(max = 2)
    q.schedule("a/1").isRight shouldBe true
    q.schedule("a/2").isRight shouldBe true
    q.schedule("a/3") shouldBe Left("QUEUE IS FULL")
  }

  test("claim: priority DESC then scheduled ASC ordering (importer.py:138-139)") {
    val q = newQueue()
    q.schedule("low/old", priority = 0, now = 100)
    q.schedule("high/new", priority = 9, now = 300)
    q.schedule("high/old", priority = 9, now = 200)
    q.claim("w1").map(_.repoName) shouldBe Some("high/old")
    q.claim("w2").map(_.repoName) shouldBe Some("high/new")
    q.claim("w3").map(_.repoName) shouldBe Some("low/old")
    q.claim("w4") shouldBe None
  }

  test("claim is CAS: N concurrent claimants on one job → exactly one winner") {
    val q = newQueue()
    q.schedule("acme/contested")
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val attempts = Future.sequence((1 to 16).map(i => Future(q.claim(s"w$i"))))
    val results = Await.result(attempts, 30.seconds)
    pool.shutdown()
    results.flatten.size shouldBe 1
    results.flatten.head.repoName shouldBe "acme/contested"
    results.flatten.head.workerId should startWith("w")
  }

  test("claimed job row carries worker_id + started_time (M1 update shape)") {
    val q = newQueue()
    q.schedule("acme/repo", priority = 3, now = 111)
    val job = q.claim("worker-7", now = 222).get
    job.workerId shouldBe "worker-7"
    job.startedTime shouldBe 222
    job.priority shouldBe 3
    q.snapshot().head.workerId shouldBe "worker-7" // M2 verify read
  }

  test("bulk enqueue is O(1) per call: 10k repos schedule in seconds") {
    // the reference's bulk path (bulk_schedule over a 128k seed list,
    // repo/schedule.py:84-95) — dup/length guards must not read every job
    // file per enqueue, or 10k enqueues against a deepening queue do ~10⁸
    // content reads. Existence probes + name counts keep this linear.
    val q = newQueue(max = 20000)
    val t0 = System.nanoTime()
    (1 to 10000).foreach(i => q.schedule(s"org/repo-$i").isRight shouldBe true)
    val secs = (System.nanoTime() - t0) / 1e9
    q.length shouldBe 10000
    q.contains("org/repo-1") shouldBe true
    q.contains("org/none") shouldBe false
    secs should be < 20.0 // generous CI bound; O(queue)-per-call took ~minutes
  }

  test("contains sees claimed jobs too (dup guard covers in-flight repos)") {
    val q = newQueue()
    q.schedule("acme/inflight")
    q.claim("w1").map(_.repoName) shouldBe Some("acme/inflight")
    q.contains("acme/inflight") shouldBe true // claimed, not pending
    q.schedule("acme/inflight") shouldBe Left("ALREADY_PROCESSING")
  }

  test("random op interleavings keep length/contains/snapshot consistent") {
    // exercises the O(1) guards' bookkeeping (cached counter, suffix-only
    // name counting, two-probe contains) against the ground truth the old
    // read-everything implementation embodied: after ANY sequence of
    // schedule/claim/complete, length == snapshot().size and contains(r)
    // matches snapshot membership
    val q = newQueue()
    val rnd = new scala.util.Random(11)
    val repos = (1 to 30).map(i => s"org/r$i")
    (1 to 300).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 => q.schedule(repos(rnd.nextInt(repos.size)))
        case 1 => q.claim(s"w${rnd.nextInt(4)}")
        case 2 => q.complete(repos(rnd.nextInt(repos.size)))
      }
      q.length shouldBe q.snapshot().size
    }
    repos.foreach(r =>
      q.contains(r) shouldBe q.snapshot().exists(_.repoName == r))
  }

  test("complete removes the job in any state (M3, unconditional release)") {
    val q = newQueue()
    q.schedule("a/pending"); q.schedule("a/claimed")
    q.claim("w1") // claims one of them
    q.complete("a/pending"); q.complete("a/claimed")
    q.length shouldBe 0
    q.claim("w2") shouldBe None
  }

  test("object-store substrate: conditional-PUT claim has exactly one winner") {
    // same protocol invariant as the rename CAS, over the call set an
    // S3-class store actually offers (PUT If-None-Match / GET / DELETE /
    // LIST — no rename anywhere in ObjectStoreQueue)
    val q = new graft.queue.ObjectStoreQueue(
      new graft.queue.LocalCondPutStore(Files.createTempDirectory("osq")))
    q.schedule("acme/contested").isRight shouldBe true
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val attempts = Future.sequence((1 to 16).map(i => Future(q.claim(s"w$i"))))
    val results = Await.result(attempts, 30.seconds)
    pool.shutdown()
    results.flatten.size shouldBe 1
    results.flatten.head.workerId should startWith("w")
    // duplicate enqueue of an in-flight repo still guarded
    q.schedule("acme/contested") shouldBe Left("ALREADY_PROCESSING")
    q.complete("acme/contested")
    q.length shouldBe 0
  }

  test("object-store substrate: crashed claim (pending+claimed pair) is repaired, never double-claimed") {
    val store = new graft.queue.LocalCondPutStore(Files.createTempDirectory("osq2"))
    val q = new graft.queue.ObjectStoreQueue(store)
    q.schedule("acme/crash", now = 100)
    // simulate a winner that created the claimed object then died before
    // deleting the pending marker
    val key = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("acme/crash".getBytes("UTF-8"))
    store.putIfAbsent(s"$key.claimed",
      Seq("acme/crash", 100, 0, "dead-worker", 111).mkString("\t")) shouldBe true
    // the claim scan must not hand the repo out again, and repairs the
    // stale pending marker
    q.claim("w-next") shouldBe None
    store.get(s"$key.pending") shouldBe None
    q.contains("acme/crash") shouldBe true // still in flight until released
    q.complete("acme/crash")
    q.contains("acme/crash") shouldBe false
  }
}
