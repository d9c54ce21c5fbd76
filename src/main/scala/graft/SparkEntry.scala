package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Merge, Ordinals}
import graft.operators.Merge.{DuplicateMode, ImportMode, Key}

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * each with a DuckDB-equivalent oracle in [[SparkEntry.oracleSql]].
  *
  * Parity conventions (so results hash-match the DuckDB oracle):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregations go through explicit DECIMAL casts (FP summation
  *    order differs between engines; decimals are exact and associative);
  *  - raw (non-aggregated) doubles pass through untouched — both engines
  *    read the same parquet bits;
  *  - every result carries a deterministic total ORDER BY.
  */
object SparkEntry {

  import Tables._

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q01ScanAgg(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- q01
  /** Pricing-summary scan+aggregate (filter pushdown + partial aggregation;
    * the "big import with statistics" analog of reference
    * DbImportWorker.java:879-934 run as a query).
    */
  def q01ScanAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---------------------------------------------------------------- q02
  /** Multi-way dimension join + aggregate. nation/region are broadcast by
    * AQE; only orders⨝customer shuffles.
    */
  def q02JoinDims(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA" && col("o_orderdate") >= lit("1995-01-01"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("n_name"))

  // ---------------------------------------------------------------- q03
  /** insertNotExistingItems probe: left-anti join on the merge keys
    * (reference DbImportWorker.java:494 / SURVEY §2.4).
    */
  def q03AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  // ---------------------------------------------------------------- q04
  /** NoSQL existence probe: left-semi join (reference
    * DbNoSqlImportWorker.java:342 / SURVEY §2.4).
    */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  // ---------------------------------------------------------------- q05
  /** dropDuplicates keep-FIRST-occurrence (reference DbUtilities
    * .dropDuplicates, SURVEY §2.5) — window row_number, not Spark's
    * order-unstable dropDuplicates.
    */
  def q05DropDuplicatesFirst(s: SparkSession, d: String): DataFrame =
    // (l_orderkey, l_linenumber) is NOT unique in the test data; the
    // keep-first order must be total or the survivor is nondeterministic.
    Dedup.dropDuplicatesKeepFirst(
        lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_extendedprice")),
        Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"))

  // ---------------------------------------------------------------- q06
  /** joinDuplicates: merge each duplicate group, later rows win; the
    * ignore-null variant keeps the last NON-null per column
    * (updateWithNullValues=false, reference README.md:87, SURVEY §2.5).
    */
  def q06JoinDuplicates(s: SparkSession, d: String): DataFrame = {
    val src = events(s, d).select(
      col("user_id"), col("event_id"),
      when(col("event_type") === "click", lit(null)).otherwise(col("value")).as("v"),
      col("props"))
    val inclNull = Dedup.joinDuplicates(
        src.select(col("user_id"), col("event_id"), col("v")),
        Seq("user_id"), col("event_id"), updateWithNull = true)
      .withColumnRenamed("v", "last_v_incl_null").drop("event_id")
    val nonNull = Dedup.joinDuplicates(
        src.select(col("user_id"), col("event_id"), col("v"), col("props")),
        Seq("user_id"), col("event_id"), updateWithNull = false)
      .withColumnRenamed("v", "last_v_non_null")
      .withColumnRenamed("props", "last_props").drop("event_id")
    inclNull.join(nonNull, Seq("user_id")).orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q07
  /** detectDuplicates: how many key groups occur more than once
    * (reference gate for UPDATE_FIRST modes, SURVEY §2.5).
    */
  def q07DetectDuplicates(s: SparkSession, d: String): DataFrame =
    Dedup.duplicateKeyGroups(lineitem(s, d), Seq("l_orderkey"))
      .agg(count(lit(1)).as("dup_keys"),
        coalesce(sum(col("dup_count")), lit(0L)).as("dup_rows"))

  // ---------------------------------------------------------------- q08
  /** updateAllExistingItems with updateWithNullValues=false: matched
    * target rows take staged values, but nulls never overwrite
    * (per-column coalesce; reference DbImportWorker.java:535).
    */
  def q08UpdateAllJoin(s: SparkSession, d: String): DataFrame = {
    val staged = orders(s, d).groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_totalprice")).as("mx"))
      .select(col("c_custkey"),
        when(col("mx") < 150000.0, lit(null)).otherwise(col("mx")).as("c_acctbal"))
    Merge.updateAll(customer(s, d), staged, Seq(Key("c_custkey")), updateWithNull = false)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q09
  /** updateFirstExistingItems: only the first occurrence (by target
    * order) of a duplicated target key is updated
    * (reference DbImportWorker.java:518-526).
    */
  def q09UpdateFirst(s: SparkSession, d: String): DataFrame = {
    val staged = orders(s, d).groupBy(col("o_orderkey").as("l_orderkey"))
      .agg(max(col("o_totalprice")).as("l_quantity"))
    // Total target order (see q05) so "first occurrence" is well-defined;
    // the final sort uses only update-invariant columns.
    Merge.updateFirst(
        lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_quantity")),
        staged, Seq(Key("l_orderkey")),
        targetOrder = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice")))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"))
  }

  // ---------------------------------------------------------------- q10
  /** Full UPSERT pipeline (mode matrix of reference
    * DbImportWorker.java:537-578 with default UPDATE_ALL_JOIN and
    * updateWithNullValues=false): stage → join-duplicates → update-join →
    * anti-join insert.
    */
  def q10UpsertPipeline(s: SparkSession, d: String): DataFrame = {
    val source = orders(s, d).select(
      when(col("o_orderkey") % 10 === 0, col("o_custkey") + 2000000)
        .otherwise(col("o_custkey")).as("c_custkey"),
      when(col("o_orderstatus") === "F", lit(null))
        .otherwise(concat(lit("cust_"), col("o_orderpriority"))).as("c_name"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderkey").as("ord"))
    Merge.importMerge(
        target = customer(s, d), source = source, keys = Seq(Key("c_custkey")),
        mode = ImportMode.Upsert, dupMode = DuplicateMode.UpdateAllJoin,
        updateWithNull = false,
        sourceOrder = col("ord"), targetOrder = Seq(col("c_custkey")))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------- q11
  /** INSERT mode with duplicate checks: in-source dedup keep-first, then
    * dropDuplicatesCrossTable (anti vs target), then append
    * (reference DbImportWorker.java:495-514).
    */
  def q11InsertPipeline(s: SparkSession, d: String): DataFrame = {
    val source = orders(s, d).select(
      (col("o_custkey") % 7000).as("c_custkey"),
      concat(lit("new_"), col("o_orderstatus")).as("c_name"),
      col("o_totalprice").as("c_acctbal"),
      col("o_orderkey").as("ord"))
    Merge.importMerge(
        target = customer(s, d), source = source, keys = Seq(Key("c_custkey")),
        mode = ImportMode.Insert, dupMode = DuplicateMode.UpdateFirstDrop,
        updateWithNull = true,
        sourceOrder = col("ord"), targetOrder = Seq(col("c_custkey")))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"), col("c_name"))
  }

  // ---------------------------------------------------------------- q12
  /** Arrival ordinal (import_item) — the reference's load-bearing
    * "first occurrence" device (DbUtilities.addIndexedIntegerColumn,
    * DbImportWorker.java:465,992-997) as an explicit-order ordinal.
    */
  def q12ArrivalOrdinal(s: SparkSession, d: String): DataFrame =
    Ordinals.withOrderedOrdinal(
        orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        Seq(col("o_orderkey")))
      .orderBy(col("o_orderkey"))

  // ------------------------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_agg" -> (q01ScanAgg _),
    "q02_join_dims" -> (q02JoinDims _),
    "q03_insert_not_existing_anti" -> (q03AntiJoin _),
    "q04_existence_probe_semi" -> (q04SemiJoin _),
    "q05_drop_duplicates_first" -> (q05DropDuplicatesFirst _),
    "q06_join_duplicates" -> (q06JoinDuplicates _),
    "q07_detect_duplicates" -> (q07DetectDuplicates _),
    "q08_update_all_join" -> (q08UpdateAllJoin _),
    "q09_update_first" -> (q09UpdateFirst _),
    "q10_upsert_pipeline" -> (q10UpsertPipeline _),
    "q11_insert_pipeline" -> (q11InsertPipeline _),
    "q12_arrival_ordinal" -> (q12ArrivalOrdinal _),
  )

  /** DuckDB-equivalent SQL per query (same tables, same aliases, same
    * ORDER BY).
    */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_dims" ->
      """SELECT n_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q03_insert_not_existing_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q04_existence_probe_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q05_drop_duplicates_first" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q06_join_duplicates" ->
      """WITH src AS (
        | SELECT user_id, event_id,
        |  CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v, props
        | FROM events)
        |SELECT user_id, last_v_incl_null, last_v_non_null, last_props FROM (
        | SELECT user_id,
        |  last_value(v) OVER w AS last_v_incl_null,
        |  last_value(v IGNORE NULLS) OVER w AS last_v_non_null,
        |  last_value(props IGNORE NULLS) OVER w AS last_props,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        | FROM src
        | WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q07_detect_duplicates" ->
      """SELECT count(*) AS dup_keys,
        | CAST(coalesce(sum(dup_count), 0) AS BIGINT) AS dup_rows
        |FROM (SELECT l_orderkey, count(*) AS dup_count FROM lineitem
        |      GROUP BY l_orderkey HAVING count(*) > 1)""".stripMargin,
    "q08_update_all_join" ->
      """WITH staged AS (
        | SELECT o_custkey AS c_custkey,
        |  CASE WHEN max(o_totalprice) < 150000.0 THEN NULL
        |       ELSE max(o_totalprice) END AS new_acctbal
        | FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey, c.c_name,
        | CASE WHEN s.c_custkey IS NOT NULL
        |      THEN coalesce(s.new_acctbal, c.c_acctbal) ELSE c.c_acctbal END AS c_acctbal,
        | c.c_mktsegment
        |FROM customer c LEFT JOIN staged s ON c.c_custkey = s.c_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q09_update_first" ->
      """WITH staged AS (
        | SELECT o_orderkey AS l_orderkey, max(o_totalprice) AS new_qty
        | FROM orders GROUP BY o_orderkey),
        |t AS (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
        | FROM lineitem)
        |SELECT t.l_orderkey, t.l_linenumber, t.l_partkey, t.l_suppkey, t.l_extendedprice,
        | CASE WHEN t.rn = 1 AND s.l_orderkey IS NOT NULL THEN s.new_qty
        |      ELSE t.l_quantity END AS l_quantity
        |FROM t LEFT JOIN staged s ON t.l_orderkey = s.l_orderkey
        |ORDER BY t.l_orderkey, t.l_linenumber, t.l_partkey, t.l_suppkey, t.l_extendedprice""".stripMargin,
    "q10_upsert_pipeline" ->
      """WITH src AS (
        | SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 2000000
        |             ELSE o_custkey END AS c_custkey,
        |  CASE WHEN o_orderstatus = 'F' THEN NULL
        |       ELSE 'cust_' || o_orderpriority END AS c_name,
        |  o_totalprice AS c_acctbal, o_orderkey AS ord
        | FROM orders),
        |staged AS (
        | SELECT c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_custkey,
        |   last_value(c_name IGNORE NULLS) OVER w AS c_name,
        |   last_value(c_acctbal IGNORE NULLS) OVER w AS c_acctbal,
        |   row_number() OVER (PARTITION BY c_custkey ORDER BY ord) AS rn
        |  FROM src
        |  WINDOW w AS (PARTITION BY c_custkey ORDER BY ord
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        | WHERE rn = 1),
        |updated AS (
        | SELECT c.c_custkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN coalesce(s.c_name, c.c_name)
        |       ELSE c.c_name END AS c_name,
        |  c.c_nationkey,
        |  CASE WHEN s.c_custkey IS NOT NULL THEN coalesce(s.c_acctbal, c.c_acctbal)
        |       ELSE c.c_acctbal END AS c_acctbal,
        |  c.c_mktsegment
        | FROM customer c LEFT JOIN staged s ON c.c_custkey = s.c_custkey),
        |inserted AS (
        | SELECT s.c_custkey, s.c_name, CAST(NULL AS INTEGER) AS c_nationkey,
        |  s.c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
        | FROM staged s
        | WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey))
        |SELECT * FROM updated UNION ALL SELECT * FROM inserted ORDER BY c_custkey""".stripMargin,
    "q11_insert_pipeline" ->
      """WITH src AS (
        | SELECT o_custkey % 7000 AS c_custkey, 'new_' || o_orderstatus AS c_name,
        |  o_totalprice AS c_acctbal, o_orderkey AS ord
        | FROM orders),
        |staged AS (
        | SELECT c_custkey, c_name, c_acctbal FROM (
        |  SELECT c_custkey, c_name, c_acctbal,
        |   row_number() OVER (PARTITION BY c_custkey ORDER BY ord) AS rn
        |  FROM src) WHERE rn = 1),
        |survivors AS (
        | SELECT s.c_custkey, s.c_name, s.c_acctbal FROM staged s
        | WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey))
        |SELECT c_custkey, c_name, c_acctbal FROM customer
        |UNION ALL SELECT c_custkey, c_name, c_acctbal FROM survivors
        |ORDER BY c_custkey, c_name""".stripMargin,
    "q12_arrival_ordinal" ->
      """SELECT o_orderkey, o_custkey,
        | row_number() OVER (ORDER BY o_orderkey) AS import_item
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
