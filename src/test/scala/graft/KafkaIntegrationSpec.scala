package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.KafkaPipelines
import graft.streaming.KafkaPipelines.KafkaConfig

/** Gated end-to-end test against a LIVE Kafka broker — the analog of the
  * reference's marquee integration pattern: self-provision the topic, send
  * real messages, run the pipeline, read back, assert received ⊇ sent
  * (`/root/reference/go/integration/integration_test.go:20-62`, with the
  * short-mode skip of `producer_test.go:21-23` re-expressed as an env gate).
  *
  * The sandbox has no broker and no kafka connector jars, so the suite
  * cancels cleanly unless BOTH are present. Run recipe:
  *
  * {{{
  *   # broker at host:port, connector + kafka-clients on the classpath:
  *   GRAFT_KAFKA_BROKER=localhost:9092 sbt -batch \
  *     'set Test/unmanagedJars ++= Seq(file("spark-sql-kafka-0-10_2.13-4.1.2.jar"), ...).classpath' \
  *     "testOnly graft.KafkaIntegrationSpec"
  *   # (or spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2)
  * }}}
  *
  * Topics are provisioned idempotently via Kafka's AdminClient — reached by
  * reflection so this file compiles without kafka-clients on the build
  * classpath (it rides in with the connector at run time). A broker with
  * `auto.create.topics.enable` works even if the admin call is unavailable.
  *
  * Infra blocker, re-verified in the sandbox: no Kafka broker binaries
  * anywhere on the image, no `spark-sql-kafka`/`kafka-clients` jar under
  * /opt/spark/jars, and the resolver runs COURSIER_MODE=offline with zero
  * egress — neither a broker nor the connector can be obtained in-sandbox,
  * so the env gate above is the correct permanent posture here; the recipe
  * block is the exact command for any environment that has both.
  */
class KafkaIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val brokerEnv = "GRAFT_KAFKA_BROKER"
  private def broker: Option[String] = sys.env.get(brokerEnv)

  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  /** R8 analog: dial the broker, create the topic, tolerate "already
    * exists" (integration_test.go:66-91) — via reflection, see class doc. */
  private def ensureTopic(bootstrap: String, topic: String): Unit =
    try {
      val props = new java.util.Properties()
      props.put("bootstrap.servers", bootstrap)
      val adminCls = Class.forName("org.apache.kafka.clients.admin.AdminClient")
      val admin = adminCls.getMethod("create", classOf[java.util.Properties])
        .invoke(null, props)
      try {
        val newTopicCls = Class.forName("org.apache.kafka.clients.admin.NewTopic")
        val newTopic = newTopicCls
          .getConstructor(classOf[String], classOf[Int], classOf[Short])
          .newInstance(topic, Int.box(1), Short.box(1.toShort))
        val result = adminCls.getMethod("createTopics", classOf[java.util.Collection[_]])
          .invoke(admin, java.util.Collections.singleton(newTopic))
        // block for completion via reflective get(): KafkaFuture only
        // implements java.util.concurrent.Future in kafka-clients >= 3.0,
        // so a typed match would MatchError on an older connector-bundled
        // client. TopicExistsException anywhere in the cause chain is
        // success (the reflective invoke wraps it in
        // InvocationTargetException -> ExecutionException).
        val fut = result.getClass.getMethod("all").invoke(result)
        def causes(t: Throwable): Iterator[Throwable] =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        try fut.getClass.getMethod("get").invoke(fut)
        catch {
          case e: Exception if causes(e).exists(
            _.getClass.getSimpleName == "TopicExistsException") => ()
        }
      } finally adminCls.getMethod("close").invoke(admin)
    } catch {
      case _: ClassNotFoundException =>
        info(s"kafka-clients not on classpath; relying on broker auto-create for $topic")
    }

  test("kafka e2e: produce -> windowed word count -> read back, received contains sent") {
    assume(broker.isDefined, s"set $brokerEnv=host:port to run against a live broker")
    assume(connectorPresent, "spark-sql-kafka connector not on classpath")
    val bs = broker.get
    val runId = System.currentTimeMillis()
    val inTopic = s"graft-in-$runId"
    val outTopic = s"graft-out-$runId"
    ensureTopic(bs, inTopic)
    ensureTopic(bs, outTopic)

    // the reference's exact test corpus (integration_test.go:40-44)
    val sent = Seq("hello world", "flink kafka streaming",
      "data processing pipeline")
    sent.toDF("v")
      .select(lit("test-key").cast("binary").as("key"),
        col("v").cast("binary").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", inTopic)
      .save()

    // pipeline: Kafka[in] -> windowed word count -> Kafka[out]; AvailableNow
    // drains what was produced, then terminates
    val cp = Files.createTempDirectory("graft-kafka-it").toString
    val q = KafkaPipelines.wordCountPipeline(spark,
        KafkaConfig(bs, inTopic), KafkaConfig(bs, outTopic), cp)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000L), "pipeline did not drain in 2 minutes")

    // read back (fresh "group" semantics: batch read from earliest)
    val got = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", outTopic)
      .option("startingOffsets", "earliest")
      .load()
      .select(get_json_object(col("value").cast("string"), "$.word").as("word"),
        get_json_object(col("value").cast("string"), "$.count").cast("long").as("cnt"))
      .groupBy("word").agg(max("cnt").as("cnt"))
      .as[(String, Long)].collect().toMap

    val sentCounts = sent.flatMap(_.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    sentCounts.foreach { case (w, n) =>
      assert(got.get(w).exists(_ >= n),
        s"word '$w' (sent $n) missing or undercounted in $got")
    }
  }
}
