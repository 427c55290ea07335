package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension) int8 quantization for embedding columns — the
  * standard 4× memory/IO reduction for ANN at scale: a 100 TB float32
  * embedding store becomes 25 TB with ≤ half-step reconstruction error
  * per dimension, which cosine rankings tolerate.
  *
  * Fit is one distributed pass (posexplode → per-dim min/max → re-packed
  * into a 1-row bounds relation — never collected to the driver);
  * quantize/dequantize are per-row HOF transforms against the
  * broadcast bounds. Codes are 0..255 stored as INT (Spark has no
  * unsigned byte; a production sink would pack to binary).
  */
object VectorQuantizer {

  /** Per-dimension [min, max] bounds of an array column, as ONE row
    * (mins: array<double>, maxs: array<double>), position-ordered. */
  def fit(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(
        array_sort(collect_list(struct(col("pos"), col("mn")))).as("s_mn"),
        array_sort(collect_list(struct(col("pos"), col("mx")))).as("s_mx"))
      .select(
        transform(col("s_mn"), s => s.getField("mn")).as("mins"),
        transform(col("s_mx"), s => s.getField("mx")).as("maxs"))

  /** Quantize `vecCol` to int codes 0..255 using `bounds` (from [[fit]]);
    * constant dimensions map to code 0. Appends `codes`. */
  def quantize(df: DataFrame, vecCol: String, bounds: DataFrame): DataFrame =
    df.crossJoin(broadcast(bounds))
      .withColumn("codes",
        expr(s"""transform($vecCol, (x, i) ->
          |  CAST(IF(maxs[i] = mins[i], 0,
          |    ROUND((CAST(x AS DOUBLE) - mins[i])
          |      / (maxs[i] - mins[i]) * 255)) AS INT))""".stripMargin))
      .drop("mins", "maxs")

  /** Reconstruct approximate doubles from codes + bounds. */
  def dequantize(df: DataFrame, codesCol: String,
                 bounds: DataFrame): DataFrame =
    df.crossJoin(broadcast(bounds))
      .withColumn("approx",
        expr(s"""transform($codesCol, (q, i) ->
          |  mins[i] + CAST(q AS DOUBLE) / 255 * (maxs[i] - mins[i]))"""
          .stripMargin))
      .drop("mins", "maxs")

  /** Worst-case per-dim reconstruction error: half a quantization step. */
  def maxError(bounds: DataFrame): Column =
    expr("array_max(transform(maxs, (mx, i) -> (mx - mins[i]) / 255 / 2))")
}
