package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. DMKD'07):
  * z-normalize a series per key, discretize into an alphabet by the
  * standard-normal quantile breakpoints, and mine the resulting
  * symbol words — the SYMBOLIC face of motif discovery next to the
  * numeric matrix profile (q280): lossy, but words hash/group/join at
  * data-warehouse speed, which is why SAX is the classic pre-filter
  * for pattern search over millions of series.
  *
  * Alphabet a/b/c/d via the N(0,1) quartile breakpoints
  * (±0.6744897501960817, 0) — literals shared with any replaying SQL.
  * μ and σ are one float tree each from exact DECIMAL moments
  * (population σ); each z-score and symbol is a fixed per-row tree.
  * Words join `w` consecutive POSITIONS in series order (calendar
  * gaps close up — the standard SAX-on-observed-points convention,
  * documented rather than imputed).
  *
  * Scale shape: one moment aggregation + a broadcast stats join; the
  * word window runs per key on the PRE-AGGREGATED series (the
  * [[Kendall]] calendar-bounded contract — rows per key are bounded
  * by the calendar, so the per-key window is aggregation-sized).
  * Constant series (σ = 0) drop — no z-score exists.
  */
object Sax {

  private val B = 0.6744897501960817

  /** Top-`topPerKey` most frequent `w`-symbol words per key:
    * `(keyCol, word, n, rk)` ordered by `(key, rk)`; ties break on the
    * word itself.
    */
  def topWords(df: DataFrame, keyCol: String, orderCol: String,
               valueCol: String, w: Int, topPerKey: Int): DataFrame = {
    require(w >= 2, s"word length must be >= 2, got $w")
    val v = df.select(col(keyCol).as("__k"),
        col(orderCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    val stats = v.groupBy(col("__k"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__y").cast("decimal(19,0)")).as("__s"),
        sum((col("__y").cast("decimal(18,0)") *
          col("__y").cast("decimal(18,0)"))).as("__ss"))
      .withColumn("__mu", col("__s").cast("double") / col("__n").cast("double"))
      .withColumn("__sig", sqrt(
        col("__ss").cast("double") / col("__n").cast("double") -
          col("__mu") * col("__mu")))
      .filter(col("__sig") > 0.0)
      .select(col("__k"), col("__mu"), col("__sig"))
    val z = v.join(broadcast(stats), Seq("__k"))
      .withColumn("__z", (col("__y").cast("double") - col("__mu")) / col("__sig"))
      .withColumn("__sym",
        when(col("__z") < -B, "a").when(col("__z") < 0.0, "b")
          .when(col("__z") < B, "c").otherwise("d"))
    val series = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val word = concat((0 until w).map(i =>
      if (i == 0) col("__sym") else lead(col("__sym"), i).over(series)): _*)
    val words = z.withColumn("word", word)
      // a full word needs w symbols — the last w−1 positions have none
      .filter(length(col("word")) === w)
      .groupBy(col("__k"), col("word"))
      .agg(count(lit(1)).as("n"))
    val byN = Window.partitionBy(col("__k"))
      .orderBy(col("n").desc, col("word"))
    words.withColumn("rk", row_number().over(byN).cast("long"))
      .filter(col("rk") <= topPerKey)
      .select(col("__k").as(keyCol), col("word"), col("n"), col("rk"))
      .orderBy(col(keyCol), col("rk"))
  }
}
