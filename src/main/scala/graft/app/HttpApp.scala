package graft.app

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions.col

/** The reference's Flask API (/root/reference/app.py:41-61) on the JDK's
  * built-in HTTP server — `GET /add_new_repo?repo=owner/name`.
  *
  * Response contract mirrors app.py:
  *   - 400 INVALID REPOSITORY    — malformed name, or the remote probe
  *     rejects it. The reference shells out to `git ls-remote`
  *     (/root/reference/repo/importer.py:77-83, app.py:45); the shipped
  *     default [[graft.sources.GitRemoteProbe.default]] does exactly that
  *     against `https://github.com/{name}`. Tests inject a probe over
  *     local fixture paths (`git ls-remote` takes plain directories) or a
  *     pure predicate.
  *   - 200 ALREADY_PROCESSED     — repo already ingested in commits
  *     (NOTE: app.py:51's `>= 0` makes this branch always taken in the
  *     reference — a recorded bug (SURVEY.md §0) we do NOT replicate;
  *     we use the intended `> 0`)
  *   - 200 ALREADY_PROCESSING    — already queued
  *   - 403 QUEUE IS FULL         — length guard
  *   - 200 SCHEDULED             — enqueued
  */
final class HttpApp(env: ClickhubCli.Env, port: Int,
                    remoteValid: String => Boolean = graft.sources.GitRemoteProbe.default,
                    lookupTable: String = "commits") {

  private val repoShape = "^[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+$".r

  // `repo_lookup_table` (config.yml:19): which table the dup-probe queries
  private[app] def addNewRepo(repo: String): (Int, String) =
    if (repo == null || repoShape.findFirstIn(repo).isEmpty || !remoteValid(repo))
      (400, "INVALID REPOSITORY")
    else if (env.importer.catalog.exists(lookupTable) &&
      env.importer.catalog.readRaw(lookupTable)
        .filter(col("repo_name") === repo).limit(1).count() > 0)
      (200, "ALREADY_PROCESSED")
    else env.queue.schedule(repo) match {
      case Right(_) => (200, "SCHEDULED")
      case Left("QUEUE IS FULL") => (403, "QUEUE IS FULL")
      case Left(reason) => (200, reason)
    }

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/add_new_repo", (ex: HttpExchange) => {
      val repo = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split("&").collectFirst { case kv if kv.startsWith("repo=") => kv.drop(5) })
        .orNull
      val (code, body) = addNewRepo(repo)
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    s
  }

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort
}
