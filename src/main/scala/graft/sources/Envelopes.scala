package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Container-log JSON envelopes (SURVEY §2 A6 completeness).
  *
  * ECS stdout does not arrive as bare text: the FireLens log driver
  * (reference: lib/computes/ecs.ts:36 `LogDrivers.firelens`) wraps each
  * line in a Fluent Bit JSON envelope carrying container metadata, and
  * EKS Fargate logging (reference: lib/computes/eks/eks-fargate-logging
  * .ts) wraps lines in the Fluent Bit kubernetes-filter envelope. These
  * readers peel the envelope with an explicit-schema from_json (no
  * inference on the hot path), keep the metadata as typed columns, and
  * hand the inner `log` line to the existing parse batteries — the
  * envelope→line→parse composition the reference's per-source streams
  * imply.
  */
object Envelopes {

  /** FireLens (ECS) envelope: container metadata + the raw line. */
  val firelensSchema: StructType = StructType(Seq(
    StructField("container_id", StringType),
    StructField("container_name", StringType),
    StructField("ecs_cluster", StringType),
    StructField("ecs_task_arn", StringType),
    StructField("source", StringType), // stdout | stderr
    StructField("log", StringType)))

  /** Fluent Bit kubernetes-filter (EKS) envelope. */
  val fluentBitSchema: StructType = StructType(Seq(
    StructField("log", StringType),
    StructField("stream", StringType),
    StructField("kubernetes", StructType(Seq(
      StructField("pod_name", StringType),
      StructField("namespace_name", StringType),
      StructField("container_name", StringType),
      StructField("host", StringType))))))

  def parseFirelens(envelope: Column): Column =
    from_json(envelope, firelensSchema)

  def parseFluentBit(envelope: Column): Column =
    from_json(envelope, fluentBitSchema)

  /** FireLens JSON-line column → metadata columns + inner `line`. */
  def unwrapFirelens(df: DataFrame, envelopeCol: String): DataFrame =
    df.withColumn("_env", parseFirelens(col(envelopeCol)))
      .select(
        df.columns.filter(_ != envelopeCol).map(col).toSeq ++ Seq(
          col("_env.container_id").as("container_id"),
          col("_env.container_name").as("container_name"),
          col("_env.ecs_cluster").as("ecs_cluster"),
          col("_env.ecs_task_arn").as("ecs_task_arn"),
          col("_env.source").as("stream"),
          col("_env.log").as("line")): _*)

  /** Fluent Bit (EKS) JSON-line column → metadata columns + inner `line`. */
  def unwrapFluentBit(df: DataFrame, envelopeCol: String): DataFrame =
    df.withColumn("_env", parseFluentBit(col(envelopeCol)))
      .select(
        df.columns.filter(_ != envelopeCol).map(col).toSeq ++ Seq(
          col("_env.kubernetes.pod_name").as("pod_name"),
          col("_env.kubernetes.namespace_name").as("namespace_name"),
          col("_env.kubernetes.container_name").as("container_name"),
          col("_env.kubernetes.host").as("host"),
          col("_env.stream").as("stream"),
          col("_env.log").as("line")): _*)
}
