package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ApacheErrorLog, ApacheLog, NginxErrorLog}
import graft.sources.Envelopes
import graft.streaming.LogPipeline

/** Apache error_log battery + container-envelope readers (the two wire
  * shapes the reference ships besides bare access lines).
  */
class EnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val accessLine =
    """46.99.153.40 - - [29/Jul/2021:15:32:33 +0000] "GET / HTTP/1.1" 200 173 "-" "curl/7.68.0""""
  // the classic format documented in Apache's error-log docs
  val errorLine =
    "[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] client denied by server configuration: /export/home/live/ap/htdocs/test"

  test("error_log parse extracts ts/level/client/msg") {
    val r = Seq(errorLine).toDF("line")
      .select(ApacheErrorLog.parsed(col("line")).as("p")).select("p.*")
      .collect().head
    assert(r.getAs[String]("level") == "error")
    assert(r.getAs[String]("client_ip") == "127.0.0.1")
    assert(r.getAs[String]("msg").startsWith("client denied"))
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant.toString == "2000-10-11T14:32:52Z")
  }

  test("format dispatch: error lines become typed rows, not DLQ entries") {
    val raw = Seq(accessLine, errorLine, "garbage ###").toDF("value")
      .withColumn("source", lit("ec2"))
    val out = LogPipeline.transformed(raw).collect()
    val byLine = out.map(r => r.getAs[String]("line") -> r).toMap
    val acc = byLine(accessLine)
    assert(acc.getAs[Boolean]("valid") && acc.getAs[String]("format") == "access")
    assert(acc.getAs[Long]("status") == 200L)
    val err = byLine(errorLine)
    assert(err.getAs[Boolean]("valid") && err.getAs[String]("format") == "error")
    assert(err.getAs[String]("level") == "error")
    assert(err.getAs[String]("ip") == "127.0.0.1")
    assert(err.getAs[java.sql.Timestamp]("ts") != null)
    assert(err.isNullAt(err.fieldIndex("status")))
    val bad = byLine("garbage ###")
    assert(!bad.getAs[Boolean]("valid") && bad.isNullAt(bad.fieldIndex("format")))
  }

  test("stream transform unwraps ECS/EKS envelopes before format dispatch") {
    val env = Seq(accessLine).toDF("l").select(
      to_json(struct(
        lit("abc").as("container_id"), lit("web").as("container_name"),
        lit("prod").as("ecs_cluster"), lit("t1").as("ecs_task_arn"),
        lit("stdout").as("source"), col("l").as("log"))).as("value"))
      .withColumn("source", lit("ecs"))
    val bare = Seq(errorLine).toDF("value").withColumn("source", lit("ec2"))
    val out = LogPipeline.transformed(env.unionByName(bare)).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val ecs = out("ecs")
    assert(ecs.getAs[Boolean]("valid") && ecs.getAs[String]("format") == "access")
    assert(ecs.getAs[String]("container") == "web")
    assert(ecs.getAs[String]("stream") == "stdout")
    assert(ecs.getAs[Long]("status") == 200L)
    // DLQ keeps the FULL envelope payload, not the inner line
    assert(ecs.getAs[String]("line").startsWith("{\"container_id\""))
    val ec2 = out("ec2")
    assert(ec2.getAs[String]("format") == "error")
    assert(ec2.isNullAt(ec2.fieldIndex("container")))
  }

  // the grammar NGINX's error logger emits (EKS runs NGINX in the
  // reference: lib/computes/eks/nginx-service.ts)
  val nginxLine =
    "2026/08/12 10:00:01 [error] 31#31: *1021 open() \"/usr/share/nginx/html/x\" " +
      "failed (2: No such file or directory), client: 10.1.2.3, server: localhost"

  test("nginx error_log parse extracts ts/level/pid/conn/client/msg") {
    val r = Seq(nginxLine).toDF("line")
      .select(NginxErrorLog.parsed(col("line")).as("p")).select("p.*")
      .collect().head
    assert(r.getAs[String]("level") == "error")
    assert(r.getAs[Long]("pid") == 31L)
    assert(r.getAs[Long]("conn") == 1021L)
    assert(r.getAs[String]("client_ip") == "10.1.2.3")
    assert(r.getAs[String]("msg") ==
      "open() \"/usr/share/nginx/html/x\" failed (2: No such file or directory)")
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant.toString == "2026-08-12T10:00:01Z")
    // a message with no trailing client/server context keeps the full remainder
    val bare = "2026/08/12 10:00:02 [notice] 1#1: *7 signal process started"
    val b = Seq(bare).toDF("line")
      .select(NginxErrorLog.parsed(col("line")).as("p")).select("p.*")
      .collect().head
    assert(b.getAs[String]("msg") == "signal process started")
    assert(b.getAs[String]("client_ip") == "")
  }

  test("dispatch routes EKS nginx error lines to typed rows, not the DLQ") {
    val env = Seq(nginxLine).toDF("l").select(
      to_json(struct(
        col("l").as("log"), lit("stderr").as("stream"),
        struct(lit("nginx-7f9").as("pod_name"), lit("default").as("namespace_name"),
          lit("nginx").as("container_name"), lit("ip-10-0-1-2").as("host"))
          .as("kubernetes"))).as("value"))
      .withColumn("source", lit("eks"))
    val r = LogPipeline.transformed(env).collect().head
    assert(r.getAs[Boolean]("valid") && r.getAs[String]("format") == "nginx_error")
    assert(r.getAs[String]("level") == "error")
    assert(r.getAs[String]("ip") == "10.1.2.3")
    assert(r.getAs[String]("container") == "nginx")
    assert(r.getAs[String]("msg").startsWith("open()"))
    assert(r.isNullAt(r.fieldIndex("status")))
  }

  test("FireLens envelope unwraps to container metadata + parseable inner line") {
    // the shape the FireLens log driver emits for ECS stdout; built via
    // to_json so the embedded quoted access line is escaped correctly
    val wrapped = Seq(accessLine).toDF("l").select(
      to_json(struct(
        lit("abc123").as("container_id"), lit("app").as("container_name"),
        lit("prod").as("ecs_cluster"), lit("arn:aws:ecs:task/1").as("ecs_task_arn"),
        lit("stdout").as("source"), col("l").as("log"))).as("value"))
    val out = Envelopes.unwrapFirelens(wrapped, "value")
    val r = out.select(col("container_name"), col("stream"),
      ApacheLog.status(col("line")).as("status")).collect().head
    assert(r.getAs[String]("container_name") == "app")
    assert(r.getAs[String]("stream") == "stdout")
    assert(r.getAs[Long]("status") == 200L)
  }

  test("Fluent Bit (EKS) envelope unwraps kubernetes metadata + inner line") {
    val env =
      """{"log":"[Wed Oct 11 14:32:52 2000] [warn] [client 10.0.0.9] retry","stream":"stderr","kubernetes":{"pod_name":"web-7f9","namespace_name":"default","container_name":"httpd","host":"ip-10-0-1-2"}}"""
    val out = Envelopes.unwrapFluentBit(Seq(env).toDF("value"), "value")
    val r = out.select(col("pod_name"), col("namespace_name"), col("stream"),
      ApacheErrorLog.level(col("line")).as("level"),
      ApacheErrorLog.clientIp(col("line")).as("cip")).collect().head
    assert(r.getAs[String]("pod_name") == "web-7f9")
    assert(r.getAs[String]("namespace_name") == "default")
    assert(r.getAs[String]("stream") == "stderr")
    assert(r.getAs[String]("level") == "warn")
    assert(r.getAs[String]("cip") == "10.0.0.9")
  }
}
