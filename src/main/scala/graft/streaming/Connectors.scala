package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink connector surface (SURVEY §2.1).
  *
  * The reference ships Kafka/File/Console connectors plus rate-control and
  * robustness plumbing (§2.9 pipeline stages). Spark's DataSource framework
  * supplies the runtime; these builders expose the same capability knobs:
  *  - GatewayStage rate control  → `maxOffsetsPerTrigger`/`maxFilesPerTrigger`
  *  - bounded mode (IUnifiedSource.IsBounded) → batch `spark.read` vs
  *    `readStream`, or Kafka `endingOffsets`
  *  - checkpointed offsets (KafkaSourceFunction.cs:205-258) → automatic via
  *    `checkpointLocation`.
  */
object FileSource {

  /** FileSourceFunction (Connectors.Sources.File/FileSourceFunction.cs:7-79)
    * reads a file line-by-line with a pluggable deserializer; the format
    * argument subsumes its `ITypeSerializer`.
    */
  def stream(spark: SparkSession, format: String, path: String,
             schema: Option[StructType] = None,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var r = spark.readStream.format(format)
    schema.foreach(s => r = r.schema(s))
    maxFilesPerTrigger.foreach(n => r = r.option("maxFilesPerTrigger", n))
    r.load(path)
  }

  /** Bounded mode: same source, batch scan. */
  def batch(spark: SparkSession, format: String, path: String,
            schema: Option[StructType] = None): DataFrame = {
    var r = spark.read.format(format)
    schema.foreach(s => r = r.schema(s))
    r.load(path)
  }
}

/** Kafka source builder mirroring `KafkaSourceBuilder<T>`
  * (Connectors.Sources.Kafka/KafkaSourceFunction.cs:261-331):
  * BootstrapServers/Topic/GroupId/StartingOffsets/Bounded/Build.
  * Value deserialization (KafkaDeserializers.cs:11-94) is a `select` on the
  * resulting frame: `cast(value as string)` / `from_json`.
  */
final case class KafkaSourceBuilder(
    options: Map[String, String] = Map("startingOffsets" -> "earliest")) {
  def bootstrapServers(servers: String): KafkaSourceBuilder =
    copy(options + ("kafka.bootstrap.servers" -> servers))
  def topic(t: String): KafkaSourceBuilder = copy(options + ("subscribe" -> t))
  def topicPattern(p: String): KafkaSourceBuilder = copy(options + ("subscribePattern" -> p))
  def groupId(g: String): KafkaSourceBuilder = copy(options + ("kafka.group.id" -> g))
  def startingOffsets(o: String): KafkaSourceBuilder = copy(options + ("startingOffsets" -> o))
  /** Bounded consumption (KafkaSourceFunction bounded mode). */
  def bounded(endingOffsets: String = "latest"): KafkaSourceBuilder =
    copy(options + ("endingOffsets" -> endingOffsets))
  /** GatewayStage-style ingress rate control. */
  def maxOffsetsPerTrigger(n: Long): KafkaSourceBuilder =
    copy(options + ("maxOffsetsPerTrigger" -> n.toString))

  def build(spark: SparkSession): DataFrame =
    // bounded mode (endingOffsets set) = batch read; else a stream
    if (options.contains("endingOffsets"))
      spark.read.format("kafka").options(options).load()
    else
      spark.readStream.format("kafka").options(options).load()
}

/** Kafka sink builder (KafkaSinkFunction.cs:165-215). Exactly-once is
  * achieved by idempotent/transactional downstream handling in
  * `ExactlyOnce.foreachBatchIdempotent`, not per-record 2PC.
  */
final case class KafkaSinkBuilder(options: Map[String, String] = Map.empty) {
  def bootstrapServers(servers: String): KafkaSinkBuilder =
    copy(options + ("kafka.bootstrap.servers" -> servers))
  def topic(t: String): KafkaSinkBuilder = copy(options + ("topic" -> t))
  def start(df: DataFrame, checkpointLocation: String) =
    options.foldLeft(df.writeStream.format("kafka"))
      { case (w, (k, v)) => w.option(k, v) }
      .option("checkpointLocation", checkpointLocation)
      .start()
}

/** Kafka value decoding (Connectors.Sources.Kafka/Deserializers/
  * KafkaDeserializers.cs:11-94): the reference's String/Json/Int/Long
  * deserializers as column transforms over the standard kafka frame shape
  * (key binary, value binary, topic, partition, offset, timestamp).
  */
object KafkaRecords {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.StructType

  def valueAsString(df: DataFrame): DataFrame =
    df.withColumn("value", col("value").cast("string"))
  /** Malformed numeric payloads null out (try_cast) rather than failing
    * the stream under ANSI mode — the deserializer contract.
    */
  def valueAsLong(df: DataFrame): DataFrame =
    df.withColumn("value", expr("try_cast(cast(value AS STRING) AS BIGINT)"))
  /** JsonPocoSerializer equivalent: value → typed struct column. */
  def valueFromJson(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("value", from_json(col("value").cast("string"), schema))
}

/** ConsoleSinkFunction (Connectors.Sinks.Console/ConsoleSinkFunction.cs:6-29). */
object ConsoleSink {
  def start(df: DataFrame, mode: String = "append") =
    df.writeStream.format("console").outputMode(mode).start()
}
