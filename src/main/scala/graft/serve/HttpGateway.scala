package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.graph.ModelGraph

/** Loopback HTTP adapter over [[PipelineRuns]] — the REST boundary the
  * reference frontend drives (`Frontend/app.py:313-374`): unpause via
  * `PATCH /api/v1/dags/{id}` with `{"is_paused": false}`, trigger via
  * `POST /api/v1/dags/{id}/dagRuns` with a `{"conf": {...}}` payload
  * (returns `dag_run_id` + `state`), then poll
  * `GET /api/v1/dags/{id}/dagRuns/{run_id}` until `state` is
  * `success`/`failed`, all under basic auth (`admin`/`admin` in the
  * reference; configurable here). `GET .../dagRuns` lists runs newest
  * first — the dagRuns listing the Airflow UI shows.
  *
  * The transport is the JDK's `com.sun.net.httpserver` on a loopback
  * socket — ZERO new dependencies, and the server is a thin translation
  * layer: every behavior (run states, per-model task states, conf echo,
  * retention) lives in [[PipelineRuns]], so the HTTP layer adds only
  * routing, auth, pause bookkeeping, and JSON framing. Airflow semantics
  * preserved: a dag starts PAUSED and a trigger against a paused dag is
  * refused (409), which is exactly why the reference PATCHes first.
  *
  * Scale/ops shape: the handler thread only ENQUEUES work —
  * [[PipelineRuns.trigger]] submits to its daemon pool and returns the run
  * id immediately — so a slow pipeline never blocks the socket; polls are
  * registry lookups, never Spark actions.
  */
final class HttpGateway(runs: PipelineRuns,
                        user: String = "admin", password: String = "admin")
                       (implicit spark: SparkSession) {
  import HttpGateway._

  /** One triggerable pipeline: its model DAG, sources, and pause flag. */
  private final case class Dag(graph: ModelGraph,
                               sources: Map[String, DataFrame],
                               var paused: Boolean)

  private val dags = new ConcurrentHashMap[String, Dag]()
  /** run id → owning dag id (run ids are global in [[PipelineRuns]]). */
  private val runOwner = new ConcurrentHashMap[String, String]()
  private var server: HttpServer = _

  /** Register a triggerable dag; starts paused like an Airflow deploy. */
  def register(dagId: String, graph: ModelGraph,
               sources: Map[String, DataFrame]): Unit =
    dags.put(dagId, Dag(graph, sources, paused = true))

  /** Bind and start on loopback; `port` 0 picks an ephemeral port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api/v1/dags", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // single dispatcher: handlers only enqueue
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(ex: HttpExchange): Unit =
    try {
      if (!authorized(ex)) {
        ex.getResponseHeaders.add("WWW-Authenticate", "Basic realm=\"graft\"")
        respond(ex, 401, obj("detail" -> "Unauthorized"))
      } else route(ex)
    } catch {
      case e: Throwable => respond(ex, 500, obj("detail" -> e.toString))
    } finally ex.close()

  private def authorized(ex: HttpExchange): Boolean = {
    val expect = "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes(StandardCharsets.UTF_8))
    Option(ex.getRequestHeaders.getFirst("Authorization")).contains(expect)
  }

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val method = ex.getRequestMethod
    (method, path) match {
      case ("PATCH", DagPath(dagId)) => patchDag(ex, dagId)
      case ("POST", RunsPath(dagId)) => postRun(ex, dagId)
      case ("GET", RunsPath(dagId)) => listRuns(ex, dagId)
      case ("GET", RunPath(dagId, runId)) => getRun(ex, dagId, runId)
      case _ => respond(ex, 404, obj("detail" -> s"no route: $method $path"))
    }
  }

  /** `PATCH /api/v1/dags/{id}` `{"is_paused": bool}` — the unpause call. */
  private def patchDag(ex: HttpExchange, dagId: String): Unit =
    Option(dags.get(dagId)) match {
      case None => respond(ex, 404, obj("detail" -> s"unknown dag $dagId"))
      case Some(dag) =>
        MiniJson.parse(body(ex)) match {
          case Some(m: Map[String @unchecked, _]) =>
            m.get("is_paused") match {
              case Some(b: Boolean) =>
                dag.paused = b
                respond(ex, 200,
                  obj("dag_id" -> dagId, "is_paused" -> dag.paused))
              case _ =>
                respond(ex, 400, obj("detail" -> "is_paused (bool) required"))
            }
          case _ => respond(ex, 400, obj("detail" -> "invalid JSON body"))
        }
    }

  /** `POST /api/v1/dags/{id}/dagRuns` `{"conf": {...}}` — the trigger. */
  private def postRun(ex: HttpExchange, dagId: String): Unit =
    Option(dags.get(dagId)) match {
      case None => respond(ex, 404, obj("detail" -> s"unknown dag $dagId"))
      case Some(dag) if dag.paused =>
        // Airflow queues runs on paused dags indefinitely; the reference
        // unpauses first BECAUSE a paused dag never executes. Refusing
        // outright keeps "202-but-never-runs" states out of the registry.
        respond(ex, 409, obj("detail" -> s"dag $dagId is paused"))
      case Some(dag) =>
        val conf = MiniJson.parse(body(ex)) match {
          case Some(m: Map[String @unchecked, _]) =>
            m.get("conf") match {
              case Some(c: Map[String @unchecked, _]) =>
                c.map { case (k, v) => k -> MiniJson.asString(v) }
              case _ => Map.empty[String, String]
            }
          case _ => Map.empty[String, String]
        }
        val runId = runs.trigger(dag.graph, dag.sources, conf)
        runOwner.put(runId, dagId)
        val st = runs.status(runId).get
        respond(ex, 200, obj(
          "dag_run_id" -> runId, "dag_id" -> dagId,
          "state" -> st.state, "conf" -> conf))
    }

  /** `GET /api/v1/dags/{id}/dagRuns/{runId}` — the poll. */
  private def getRun(ex: HttpExchange, dagId: String, runId: String): Unit =
    runs.status(runId).filter(_ => runOwner.get(runId) == dagId) match {
      case None =>
        respond(ex, 404, obj("detail" -> s"unknown run $runId for $dagId"))
      case Some(st) => respond(ex, 200, runJson(dagId, st))
    }

  /** `GET /api/v1/dags/{id}/dagRuns` — newest-first listing. */
  private def listRuns(ex: HttpExchange, dagId: String): Unit =
    if (!dags.containsKey(dagId))
      respond(ex, 404, obj("detail" -> s"unknown dag $dagId"))
    else {
      val mine = runs.list().filter(s => runOwner.get(s.runId) == dagId)
      respond(ex, 200, obj(
        "dag_runs" -> mine.map(runJson(dagId, _)),
        "total_entries" -> mine.size))
    }

  private def runJson(dagId: String, st: PipelineRuns.RunStatus): Map[String, Any] =
    obj("dag_run_id" -> st.runId, "dag_id" -> dagId, "state" -> st.state,
      "conf" -> st.conf, "tasks" -> st.models,
      "error" -> st.error.orNull)

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, code: Int, payload: Map[String, Any]): Unit = {
    val bytes = MiniJson.render(payload).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}

object HttpGateway {
  private val DagPath = "/api/v1/dags/([^/]+)".r
  private val RunsPath = "/api/v1/dags/([^/]+)/dagRuns".r
  private val RunPath = "/api/v1/dags/([^/]+)/dagRuns/([^/]+)".r

  private def obj(kv: (String, Any)*): Map[String, Any] = kv.toMap

  /** Minimal JSON in/out for the gateway's flat payloads — the build is
    * zero-dependency by design, and the frames here are tiny control
    * messages, never data rows (results flow through the engine, not HTTP).
    */
  private[graft] object MiniJson {
    def parse(s: String): Option[Any] = {
      val p = new P(s)
      try {
        val v = p.value()
        p.ws()
        if (p.done) Some(v) else None
      } catch { case _: Exception => None }
    }

    /** Conf values arrive as JSON scalars; Airflow confs are stringly. */
    def asString(v: Any): String = v match {
      case null => "null"
      case s: String => s
      case d: Double if d == d.floor && !d.isInfinite => d.toLong.toString
      case other => other.toString
    }

    private final class P(s: String) {
      private var i = 0
      def done: Boolean = i >= s.length
      def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
      private def expect(c: Char): Unit = {
        if (done || s.charAt(i) != c) fail(s"expected $c")
        i += 1
      }
      private def fail(m: String) = throw new IllegalArgumentException(s"$m at $i")
      def value(): Any = {
        ws()
        if (done) fail("eof")
        s.charAt(i) match {
          case '{' => objValue()
          case '[' => arrValue()
          case '"' => strValue()
          case 't' => lit("true", true)
          case 'f' => lit("false", false)
          case 'n' => lit("null", null)
          case _ => numValue()
        }
      }
      private def lit(word: String, v: Any): Any = {
        if (!s.startsWith(word, i)) fail(s"expected $word")
        i += word.length; v
      }
      private def objValue(): Map[String, Any] = {
        expect('{'); ws()
        val b = Map.newBuilder[String, Any]
        if (!done && s.charAt(i) == '}') { i += 1; return b.result() }
        while (true) {
          ws(); val k = strValue(); ws(); expect(':')
          b += k -> value(); ws()
          if (done) fail("eof in object")
          s.charAt(i) match {
            case ',' => i += 1
            case '}' => i += 1; return b.result()
            case _ => fail("expected , or }")
          }
        }
        b.result()
      }
      private def arrValue(): Vector[Any] = {
        expect('['); ws()
        val b = Vector.newBuilder[Any]
        if (!done && s.charAt(i) == ']') { i += 1; return b.result() }
        while (true) {
          b += value(); ws()
          if (done) fail("eof in array")
          s.charAt(i) match {
            case ',' => i += 1
            case ']' => i += 1; return b.result()
            case _ => fail("expected , or ]")
          }
        }
        b.result()
      }
      private def strValue(): String = {
        expect('"')
        val sb = new StringBuilder
        while (!done && s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\') {
            i += 1
            if (done) fail("eof in escape")
            s.charAt(i) match {
              case '"' => sb += '"'
              case '\\' => sb += '\\'
              case '/' => sb += '/'
              case 'b' => sb += '\b'
              case 'f' => sb += '\f'
              case 'n' => sb += '\n'
              case 'r' => sb += '\r'
              case 't' => sb += '\t'
              case 'u' =>
                if (i + 4 >= s.length) fail("short unicode escape")
                sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case other => fail(s"bad escape \\$other")
            }
          } else sb += c
          i += 1
        }
        expect('"')
        sb.result()
      }
      private def numValue(): Double = {
        val start = i
        while (!done && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
        if (i == start) fail("expected value")
        s.substring(start, i).toDouble
      }
    }

    def render(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Double => if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString
      case s: String => graft.Bench.jsonQuote(s)
      case m: Map[_, _] =>
        m.map { case (k, x) => s"${graft.Bench.jsonQuote(k.toString)}:${render(x)}" }
          .mkString("{", ",", "}")
      case xs: Iterable[_] => xs.map(render).mkString("[", ",", "]")
      case other => graft.Bench.jsonQuote(other.toString)
    }
  }
}
