package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze & Schmid, TPAMI 2011) —
  * the vector-compression scale path: split each d-dim embedding into
  * `m` subspaces, learn a small per-subspace codebook (spherical
  * k-means, the [[KMeans]] machinery), and store each vector as `m`
  * small codes. Search runs ADC (asymmetric distance computation):
  * the QUERY stays exact, each corpus vector's score is the sum of
  * `m` precomputed query×centroid lookup terms — at 100 TB the corpus
  * side shrinks from d floats to m bytes per row and scoring never
  * touches the original vectors, only the m·k-row lookup table that
  * broadcasts to every executor.
  *
  * Deterministic and engine-reproducible: codebooks inherit
  * [[KMeans.fitCentroids]]'s lowest-id seeding / argmax-cosine /
  * DECIMAL-mean discipline; encoding ties break to the lowest code;
  * ADC terms are rounded to 6 dp and summed in DECIMAL (exact in any
  * order), so an oracle can replay training, encoding, and ranking
  * verbatim.
  */
object ProductQuantization {

  private def dims(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(col(vecCol))).head().getInt(0)

  /** Sequential-fold dot product — the same left-to-right order as
    * DuckDB's `list_dot_product`, so replays agree bit-for-bit.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Per-subspace codebooks `(subspace, cluster_id, centroid)` with
    * subspaces 1..m and cluster ids 1..k, trained on the corpus's
    * sliced subvectors.
    */
  def fitCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                   m: Int, k: Int, iters: Int): DataFrame =
    fitCodebooksD(corpus, idCol, vecCol, m, k, iters,
      dims(corpus, vecCol))

  private def fitCodebooksD(corpus: DataFrame, idCol: String,
                            vecCol: String, m: Int, k: Int, iters: Int,
                            d: Int): DataFrame = {
    require(m >= 1 && d % m == 0, s"m=$m must divide dims=$d")
    val sub = d / m
    (1 to m).map { s =>
      KMeans.fitCentroids(
        corpus.select(col(idCol),
          slice(col(vecCol), (s - 1) * sub + 1, sub).as("__subv")),
        idCol, "__subv", k, iters)
        .withColumn("subspace", lit(s.toLong))
    }.reduce(_ unionByName _)
      .select(col("subspace"), col("cluster_id"), col("centroid"))
  }

  /** `(idCol, codes)` where `codes[s-1]` is the argmax-cosine cluster
    * id of subspace s (ties to the lowest id, zero-norm subvectors to
    * code 1 via the [[KMeans.assign]] −2.0 sentinel). One map-side
    * pass: all m codebooks ship as literals.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             codebooks: DataFrame, m: Int): DataFrame =
    encodeD(corpus, idCol, vecCol, codebooks, m, dims(corpus, vecCol))

  private def encodeD(corpus: DataFrame, idCol: String, vecCol: String,
                      codebooks: DataFrame, m: Int, d: Int): DataFrame = {
    import corpus.sparkSession.implicits._
    val sub = d / m
    val cbs = codebooks.orderBy(col("subspace"), col("cluster_id"))
      .as[(Long, Long, Seq[Double])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val codeCols = (1 to m).map { s =>
      val centArr = array(cbs(s.toLong).map(c => typedlit(c)): _*)
      val sv = transform(
        slice(col(vecCol), (s - 1) * sub + 1, sub), x => x.cast("double"))
      val sims = transform(centArr,
        c => coalesce(Similarity.cosine(sv, c), lit(-2.0)))
      array_position(sims, array_max(sims))
    }
    corpus.select(col(idCol), array(codeCols: _*).as("codes"))
  }

  /** ADC top-k: `(qId, rank, neighborId, score)` per query, ranked by
    * the summed lookup terms (6-dp-rounded per term, DECIMAL-summed),
    * ties to the lowest corpus id. `queries` must be small (the
    * lookup table is |queries|·m·k rows and broadcasts).
    */
  def adcTopK(queries: DataFrame, encoded: DataFrame,
              codebooks: DataFrame, m: Int, d: Int, topK: Int,
              qId: String = "query_id", qVec: String = "query_vec",
              cId: String = "vec_id"): DataFrame = {
    val sub = d / m
    val lut = queries.crossJoin(broadcast(codebooks))
      .select(col(qId), col("subspace"), col("cluster_id"),
        round(dot(transform(
          slice(col(qVec), ((col("subspace") - 1) * sub + 1).cast("int"),
            lit(sub)),
          x => x.cast("double")), col("centroid")), 6)
          .cast("decimal(18,6)").as("term"))
    val scores = encoded
      .select(col(cId), posexplode(col("codes")).as(Seq("__s0", "cluster_id")))
      .select(col(cId), (col("__s0") + 1).cast("long").as("subspace"),
        col("cluster_id"))
      .join(broadcast(lut), Seq("subspace", "cluster_id"))
      .groupBy(col(qId), col(cId))
      .agg(sum(col("term")).cast("double").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qId)).orderBy(col("score").desc, col(cId))
    scores.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(qId), col("rank"), col(cId).as("neighbor_id"),
        col("score"))
  }

  /** End-to-end PQ recall eval vs the exact brute-force yardstick:
    * `(query_id, n_hits, recall_ppm)` — how many of the exact cosine
    * top-k the compressed index recovers, per query, recall as exact
    * integer ppm.
    */
  def pqRecall(queries: DataFrame, corpus: DataFrame, m: Int, k: Int,
               iters: Int, topK: Int,
               qId: String = "query_id", qVec: String = "query_vec",
               cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val d = dims(corpus, cVec)
    val cb = fitCodebooksD(corpus, cId, cVec, m, k, iters, d)
    pqRecallWithIndex(queries, corpus, cb,
      encodeD(corpus, cId, cVec, cb, m, d), m, topK, qId, qVec, cId, cVec)
  }

  /** [[pqRecall]] against a PRE-TRAINED index — `codebooks` and the
    * `encoded` code table come from [[graft.index.IndexStore]] (or any
    * prior [[fitCodebooks]]/[[encode]] run) instead of being retrained
    * inside the query: train once, serve many runs. Output is
    * bit-identical to [[pqRecall]] given the same training inputs,
    * which is what the load-≡-retrain oracle row pins.
    */
  def pqRecallWithIndex(queries: DataFrame, corpus: DataFrame,
                        codebooks: DataFrame, encoded: DataFrame,
                        m: Int, topK: Int,
                        qId: String = "query_id", qVec: String = "query_vec",
                        cId: String = "vec_id", cVec: String = "embedding")
      : DataFrame = {
    val d = dims(corpus, cVec)
    val cb = codebooks
    val enc = encoded
    val approx = adcTopK(queries, enc, cb, m, d, topK, qId, qVec, cId)
      .select(col(qId), col("neighbor_id"))
    val exact = Similarity.bruteForceTopK(queries, corpus, topK,
      qId, qVec, cId, cVec)
      .select(col(qId), col("neighbor_id"))
    val hits = exact.join(approx, Seq(qId, "neighbor_id"))
      .groupBy(col(qId)).agg(count(lit(1)).as("__h"))
    queries.select(col(qId)).distinct()
      .join(hits, Seq(qId), "left")
      .select(col(qId),
        coalesce(col("__h"), lit(0L)).as("n_hits"))
      .withColumn("recall_ppm",
        expr(s"n_hits * 1000000 DIV $topK").cast("long"))
      .orderBy(col(qId))
  }
}
