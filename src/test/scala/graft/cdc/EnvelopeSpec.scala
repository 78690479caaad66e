package graft.cdc

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.DataStreamWriter

import graft.SparkSpec
import graft.model.{EventHeader, MQEvent}

/** P5/P6 wire frame + the K1 writer configuration. No broker exists in
  * this sandbox, so the Kafka test pins the WRITER BUILDER (format +
  * producer options) via reflection on `DataStreamWriter`'s internal
  * state — the transport is the only thing left untested, matching
  * SURVEY.md §7.4's parity boundary.
  */
class EnvelopeSpec extends SparkSpec {

  private def frame = {
    import spark.implicits._
    Envelope.toKafkaFrame(Seq(
      MQEvent("shop", "orders", "insert",
        before = Map.empty, after = Map("id" -> "1"),
        orgRow = Seq(Seq("1")), eventHeader = EventHeader(1000L, 42L))
    ).toDS(), taskId = "t9")
  }

  test("frame carries per-row topic routing + db.table key") {
    val r = frame.collect().head
    assert(r.getAs[String]("topic") == "t9.shop.orders")
    assert(r.getAs[String]("key") == "shop.orders")
    assert(r.getAs[String]("value").contains("\"action\":\"insert\""))
  }

  test("K1 kafka writer builds with acks=all, retries=5 and per-row topics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.model.RawBinlogEvent]
    val streamingFrame = Envelope.toKafkaFrame(
      Projector.project(stream.toDS(), Map("shop.orders" -> Seq("id"))), "t9")
    assert(streamingFrame.isStreaming)
    val w = Envelope.kafkaWriter(streamingFrame,
      bootstrapServers = "broker:9092", checkpointDir = "/tmp/ck-k1")

    def field(name: String): Any = {
      // walk the runtime class hierarchy (Spark 4 implements the abstract
      // sql-api writer in org.apache.spark.sql.classic)
      val classes = Iterator.iterate[Class[_]](w.getClass)(_.getSuperclass)
        .takeWhile(_ != null).toSeq
      val f = classes.flatMap(_.getDeclaredFields)
        .find(_.getName.contains(name))
        .getOrElse(fail(s"DataStreamWriter field '$name' not found among " +
          classes.flatMap(_.getDeclaredFields).map(_.getName).mkString(",")))
      f.setAccessible(true)
      f.get(w)
    }
    assert(field("source").toString == "kafka")
    // normalize keys: the writer stores options in a CaseInsensitiveMap
    val opts: Map[String, String] = (field("extraOptions") match {
      case m: Map[_, _] => m.map { case (k, v) => k.toString -> v.toString }
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> v.toString }.toMap
      case o => fail(s"unexpected extraOptions shape: ${o.getClass}")
    }).map { case (k, v) => k.toLowerCase -> v }
    assert(opts.get("kafka.bootstrap.servers").contains("broker:9092"))
    assert(opts.get("kafka.acks").contains("all"))
    assert(opts.get("kafka.retries").contains("5"))
    assert(opts.get("checkpointlocation").contains("/tmp/ck-k1"))
    // topic column present in the frame ⇒ no static topic option needed
    assert(!opts.contains("topic"))
  }
}
