package graft.operators

import graft.QueryModule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** SURVEY.md §2.3 H — scalar function families (string / regex / date /
  * math / array / map / json) plus the batch tumbling-window twin
  * q_evt_tumbling (§2.3 I "batch twins").
  *
  * Cross-dialect traps handled here (SURVEY.md §7.3 "dialect drift"):
  *   - Spark regexp_replace replaces ALL matches; DuckDB only the first
  *     unless given the 'g' flag — oracle passes 'g'.
  *   - Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is 0=Sunday..6 —
  *     oracle adds 1.
  *   - ceil/length/year return BIGINT in one engine, INT/DOUBLE in the
  *     other — both sides CAST explicitly.
  *   - float embeddings are cast to DOUBLE before any arithmetic so both
  *     engines promote identically; every float output is ROUND(...,4).
  *   - map lookup results are compared as extracted scalars (DuckDB's map
  *     type round-trips differently through pandas than Spark's — the
  *     oracle verifies the VALUES the map ops must produce).
  *
  * Scale notes: everything here is a per-row scalar expression inside
  * whole-stage codegen — no shuffles except the final deterministic ORDER
  * BY and the grouped tumbling window (one Exchange on the window bucket).
  * No UDFs: all built-ins/HOFs, so the 100 TB path stays codegen'd.
  */
object FunctionQueries extends QueryModule {

  override def queries: Map[String, Q] = Map(
    "q_str_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        substring(col("p_type"), 1, 5).as("t5"),
        length(col("p_name")).cast("int").as("nlen"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        lpad(col("p_size").cast("string"), 4, "0").as("psize4"),
        regexp_replace(col("p_name"), lit("a"), lit("@")).as("rep"),
        trim(concat(lit("  "), col("p_name"), lit(" "))).as("trimmed"))
        .orderBy("p_partkey")),

    "q_str_split" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy("doc_id", "word")),

    "q_str_regex" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "^([a-z-]+)", 1).as("first_word"),
        regexp_replace(col("text"), "data", "DATA").as("replaced"),
        col("text").rlike("pipeline").as("has_pipeline"))
        .orderBy("doc_id")),

    "q_date_funcs" -> ((s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        dayofmonth(col("o_orderdate")).cast("int").as("dom"),
        dayofweek(col("o_orderdate")).cast("int").as("dow"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("int")
          .as("days_since"),
        // DATE-typed outputs diff as datetime.date vs Timestamp through
        // pandas — serialize to ISO string on both sides.
        date_format(date_add(col("o_orderdate").cast("date"), 30),
          "yyyy-MM-dd").as("plus30"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy("o_orderkey")),

    "q_math_funcs" -> ((s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        abs(col("p_size") - 25).as("a"),
        round(col("p_retailprice"), 1).as("r1"),
        ceil(col("p_retailprice")).cast("bigint").as("c"),
        floor(col("p_retailprice")).cast("bigint").as("f"),
        round(sqrt(col("p_retailprice")), 4).as("sq"),
        round(pow(col("p_size"), 2), 4).as("p2"),
        round(log(col("p_retailprice")), 4).as("lg"),
        round(log10(col("p_retailprice")), 4).as("l10"),
        (col("p_size") % 7).as("m7"),
        signum(col("p_size") - 25).cast("int").as("sg"))
        .orderBy("p_partkey")),

    // Array ops + HOFs (transform/filter/aggregate) over the 64-dim float
    // embeddings; everything cast to DOUBLE before math so Spark and the
    // oracle promote identically.
    "q_array_funcs" -> ((s, dir) =>
      t(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dims"),
        // floats can sit exactly on half-ties (odd/32) where native ROUND
        // tie-breaking differs cross-engine — use the portable floor round
        pround4(element_at(col("embedding"), 1).cast("double")).as("e1"),
        round(expr(
          "aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
          4).as("norm2"),
        pround4(array_max(col("embedding")).cast("double")).as("mx"),
        size(expr("filter(embedding, x -> x > 0)")).as("n_pos"),
        round(expr(
          "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (acc, x) -> acc + x)"),
          4).as("sum_e"))
        .orderBy("vec_id")),

    // Map construction + lookup + key listing; oracle checks the values
    // the map round-trip must produce.
    "q_map_funcs" -> ((s, dir) => {
      val m = map_from_arrays(
        array(lit("type"), lit("uid")),
        array(col("event_type"), col("user_id").cast("string")))
      t(s, dir, "events").select(
        col("event_id"),
        element_at(m, "type").as("m_type"),
        element_at(m, "uid").as("m_uid"),
        array_join(map_keys(m), ",").as("m_keys"),
        size(m).as("m_card"))
        .orderBy("event_id")
    }),

    "q_json_funcs" -> ((s, dir) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), schema).getField("k").as("k_int"))
        .orderBy("event_id")
    }),

    // Batch twin of the streaming tumbling-window aggregate (§2.3 I):
    // same logical plan as s_tumbling, DuckDB-checkable because 1-hour
    // tumbling windows are exactly date_trunc('hour') buckets.
    "q_evt_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          // exact decimal accumulation, DOUBLE on the wire (the driver's
          // pandas bridge lowers DuckDB DECIMAL to float64)
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_v"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("cnt"), col("sum_v"))
        .orderBy("ws", "event_type")),

    // Sliding-window batch twin (s_sliding): 2h windows sliding by 1h —
    // every event lands in exactly 2 windows; the oracle reproduces the
    // fan-out by unnesting the two hour-aligned window starts.
    "q_evt_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("ws"), col("event_type"), col("cnt"))
        .orderBy("ws", "event_type")),

    // Session-window batch twin (s_session): classic gaps-and-islands —
    // a >30-minute silence per user starts a new session. Ordered by
    // event_id (unique, time-correlated) so the ns-vs-µs timestamp
    // difference between engines can never reorder rows; gaps compared at
    // whole-second granularity (epoch seconds) for the same reason.
    "q_evt_session" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy("event_id")
      val sessioned = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("es"))
        .withColumn("new_sess",
          when(col("es") - lag(col("es"), 1).over(byUser) > 1800
            || lag(col("es"), 1).over(byUser).isNull, 1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessioned
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          (max(col("es")) - min(col("es"))).as("duration_s"))
        .orderBy("user_id", "sess_id")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey, LOWER(p_name) AS lname, UPPER(p_brand) AS ubrand,
        |  SUBSTRING(p_type, 1, 5) AS t5, CAST(LENGTH(p_name) AS INT) AS nlen,
        |  CONCAT_WS('-', p_brand, p_type) AS bt,
        |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS psize4,
        |  REPLACE(p_name, 'a', '@') AS rep,
        |  TRIM('  ' || p_name || ' ') AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_str_split" ->
      """SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
        |FROM documents ORDER BY doc_id, word""".stripMargin,

    "q_str_regex" ->
      """SELECT doc_id,
        |  REGEXP_EXTRACT(text, '^([a-z-]+)', 1) AS first_word,
        |  REGEXP_REPLACE(text, 'data', 'DATA', 'g') AS replaced,
        |  REGEXP_MATCHES(text, 'pipeline') AS has_pipeline
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS yr,
        |  CAST(MONTH(o_orderdate) AS INT) AS mo,
        |  CAST(DAYOFMONTH(o_orderdate) AS INT) AS dom,
        |  CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mstart,
        |  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
        |  STRFTIME(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS plus30,
        |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_math_funcs" ->
      """SELECT p_partkey,
        |  ABS(p_size - 25) AS a,
        |  ROUND(p_retailprice, 1) AS r1,
        |  CAST(CEIL(p_retailprice) AS BIGINT) AS c,
        |  CAST(FLOOR(p_retailprice) AS BIGINT) AS f,
        |  ROUND(SQRT(p_retailprice), 4) AS sq,
        |  ROUND(POW(p_size, 2), 4) AS p2,
        |  ROUND(LN(p_retailprice), 4) AS lg,
        |  ROUND(LOG10(p_retailprice), 4) AS l10,
        |  p_size % 7 AS m7,
        |  CAST(SIGN(p_size - 25) AS INT) AS sg
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(LEN(embedding) AS INT) AS dims,
        |  FLOOR(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) / 10000 AS e1,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm2,
        |  FLOOR(CAST(LIST_MAX(embedding) AS DOUBLE) * 10000 + 0.5) / 10000 AS mx,
        |  CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_e
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_map_funcs" ->
      """SELECT event_id, event_type AS m_type,
        |  CAST(user_id AS VARCHAR) AS m_uid,
        |  'type,uid' AS m_keys, CAST(2 AS INT) AS m_card
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |  JSON_EXTRACT_STRING(props, '$.k') AS k_str,
        |  CAST(JSON_EXTRACT(props, '$.k') AS INT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,

    "q_evt_tumbling" ->
      """SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS ws,
        |  CAST(DATE_TRUNC('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS we,
        |  event_type, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
        |FROM events
        |GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY ws, event_type""".stripMargin,

    "q_evt_sliding" ->
      """SELECT ws, event_type, COUNT(*) AS cnt FROM (
        |  SELECT event_type,
        |    CAST(UNNEST([DATE_TRUNC('hour', ts),
        |                 DATE_TRUNC('hour', ts) - INTERVAL 1 HOUR]) AS TIMESTAMP) AS ws
        |  FROM events)
        |GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,

    "q_evt_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN es - LAG(es) OVER w > 1800
        |           OR LAG(es) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |sessioned AS (
        |  SELECT user_id, es,
        |    -- DuckDB SUM(INT) yields HUGEINT (→ float64 through pandas);
        |    -- Spark's running SUM(int) is BIGINT — align the types.
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged)
        |SELECT user_id, sess_id, COUNT(*) AS n_events,
        |       MAX(es) - MIN(es) AS duration_s
        |FROM sessioned GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin
  )
}
