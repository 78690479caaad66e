package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.util.MiniJson
import graft.util.MiniJson.JObj

/** The reference's HTTP control surface (C10, `internal/scheduler/api.go:10-41`)
  * on the JDK's built-in server — same routes, same stop-type contract:
  *
  *   POST /v1/post_task          — create + start a task (C1)
  *   GET  /v1/task               — live task list (C2)
  *   POST /v1/stop_task          — {task_id, stop_type: stop|recovery_v1|recovery_v2} (C3)
  *   POST /v1/update_task        — live filter swap (C4)
  *   ANY  /v1/delete_task/:id    — stop + forget (C5)
  *   ANY  /v1/restoration_task/:id — bounce + resume (C6)
  *   GET  /metrics               — Prometheus text format (C11)
  *
  * Responses are `{"code":200,"message":…}` JSON like the reference's gin
  * handlers.
  */
final class TaskHttpServer(service: TaskService, spark: SparkSession,
    port: Int = 0,
    bindAddress: java.net.InetAddress = java.net.InetAddress.getLoopbackAddress) {

  private val metrics = new QueryMetricsListener
  spark.streams.addListener(metrics)

  // loopback by default: the control plane can make the Spark process
  // read/write arbitrary configured paths, so it must not listen on the
  // wildcard address; pass bindAddress to expose it deliberately
  private val server = HttpServer.create(
    new InetSocketAddress(bindAddress, port), 0)
  server.createContext("/v1/post_task", exchange(postTask))
  server.createContext("/v1/task", exchange(listTasks))
  server.createContext("/v1/stop_task", exchange(stopTask))
  server.createContext("/v1/update_task", exchange(updateTask))
  server.createContext("/v1/delete_task/", exchange(deleteTask))
  server.createContext("/v1/restoration_task/", exchange(restorationTask))
  server.createContext("/metrics", exchange(metricsText))
  server.createContext("/debug/runtime", exchange(debugRuntime))
  server.setExecutor(null)

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = {
    server.stop(0)
    spark.streams.removeListener(metrics)
  }
  def boundPort: Int = server.getAddress.getPort

  // ------------------------------------------------------------- handlers

  private def postTask(ex: HttpExchange): (Int, String) =
    TaskConfig.parse(body(ex)) match {
      case Left(err) => (400, errJson(err))
      case Right(cfg) =>
        service.postTask(cfg) match {
          case Left(err) => (400, errJson(err))
          case Right(id) => (200, MiniJson.render(JObj.of(
            "code" -> MiniJson.num(200L),
            "task_id" -> MiniJson.str(id),
            "position_name" -> MiniJson.str(cfg.sourceDir),
            "position_pos" -> MiniJson.num(0L))))
        }
    }

  private def listTasks(ex: HttpExchange): (Int, String) = {
    val items = service.list().map { case (id, active) =>
      JObj.of("task_id" -> MiniJson.str(id), "active" -> MiniJson.bool(active))
    }
    (200, MiniJson.render(JObj.of(
      "code" -> MiniJson.num(200L),
      "count" -> MiniJson.num(items.size.toLong),
      "tasks" -> MiniJson.arr(items))))
  }

  private def stopTask(ex: HttpExchange): (Int, String) = {
    val v = MiniJson.parse(body(ex)).getOrElse(MiniJson.JNull)
    val id = (v \ "task_id").flatMap(_.asString).getOrElse("")
    val mode = (v \ "stop_type").flatMap(_.asString).getOrElse("stop")
    respond(service.stopTask(id, mode))
  }

  private def updateTask(ex: HttpExchange): (Int, String) = {
    val v = MiniJson.parse(body(ex)).getOrElse(MiniJson.JNull)
    val id = (v \ "task_id").flatMap(_.asString).getOrElse("")
    respond(service.updateTask(id, v.strings("database"), v.strings("tables"),
      v.strings("exclude_table")))
  }

  private def deleteTask(ex: HttpExchange): (Int, String) =
    respond(service.deleteTask(pathId(ex, "/v1/delete_task/")))

  private def restorationTask(ex: HttpExchange): (Int, String) =
    respond(service.restorationTask(pathId(ex, "/v1/restoration_task/")))

  private def metricsText(ex: HttpExchange): (Int, String) =
    (200, metrics.render())

  /** The reference's statsviz debug endpoint (`internal/scheduler/
    * api.go:29-40`) re-expressed as a JSON runtime snapshot: heap, GC,
    * threads, uptime, and the Spark app id. (Runtime charting belongs to
    * the Spark UI on a real deployment; this keeps the route parity and
    * the machine-readable signal.)
    */
  private def debugRuntime(ex: HttpExchange): (Int, String) = {
    val rt = Runtime.getRuntime
    val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => b.getCollectionCount.max(0L)).sum
    val up = java.lang.management.ManagementFactory.getRuntimeMXBean.getUptime
    (200, MiniJson.render(JObj.of(
      "code" -> MiniJson.num(200L),
      "app_id" -> MiniJson.str(spark.sparkContext.applicationId),
      "heap_used_bytes" -> MiniJson.num(rt.totalMemory() - rt.freeMemory()),
      "heap_max_bytes" -> MiniJson.num(rt.maxMemory()),
      "gc_collections" -> MiniJson.num(gc),
      "live_threads" -> MiniJson.num(java.lang.management.ManagementFactory
        .getThreadMXBean.getThreadCount.toLong),
      "uptime_ms" -> MiniJson.num(up))))
  }

  // -------------------------------------------------------------- plumbing

  private def pathId(ex: HttpExchange, prefix: String): String =
    ex.getRequestURI.getPath.stripPrefix(prefix).takeWhile(_ != '/')

  private def respond(r: Either[String, String]): (Int, String) = r match {
    case Left(err) => (400, errJson(err))
    case Right(msg) => (200, MiniJson.render(JObj.of(
      "code" -> MiniJson.num(200L), "message" -> MiniJson.str(msg))))
  }

  private def errJson(msg: String): String =
    MiniJson.render(JObj.of(
      "code" -> MiniJson.num(400L), "message" -> MiniJson.str(msg)))

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def exchange(f: HttpExchange => (Int, String)): com.sun.net.httpserver.HttpHandler =
    (ex: HttpExchange) => {
      val (status, payload) =
        try f(ex)
        catch { case e: Exception => (500, errJson(String.valueOf(e.getMessage))) }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        if (payload.startsWith("{")) "application/json" else "text/plain")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
}

/** C11: `StreamingQueryListener` → Prometheus text exposition — the analog
  * of the reference's prometheus registry (`internal/prometheus/
  * prometheus.go:8-16`), with real per-query counters instead of its
  * placeholder gauge.
  */
final class QueryMetricsListener extends StreamingQueryListener {
  final case class Counters(batches: Long, rows: Long)
  private val byName = new ConcurrentHashMap[String, Counters]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    // unnamed queries have a null name — key by id so they still show up
    byName.putIfAbsent(Option(e.name).getOrElse(e.id.toString), Counters(0L, 0L))

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = Option(e.progress.name).getOrElse(e.progress.id.toString)
    byName.merge(name, Counters(1L, e.progress.numInputRows),
      (a, b) => Counters(a.batches + b.batches, a.rows + b.rows))
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def render(): String = {
    val sb = new StringBuilder
    sb ++= "# TYPE graft_query_batches_total counter\n"
    sb ++= "# TYPE graft_query_input_rows_total counter\n"
    byName.asScala.toSeq.sortBy(_._1).foreach { case (name, c) =>
      sb ++= s"""graft_query_batches_total{query="$name"} ${c.batches}\n"""
      sb ++= s"""graft_query_input_rows_total{query="$name"} ${c.rows}\n"""
    }
    sb.toString
  }
}
