package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, QueryPack, Tables}

/** Core relational operator inventory (SURVEY.md §2) re-expressed on the
  * driver testdata tables. Each entry maps a reference operator family to
  * its Spark-native form:
  *
  *  - P1/P2 projections, P4 equality filter, P5 null-safe theta filter
  *    (`spotify_eps.py:165,170,187` — the pandas NaN!=x trap, see SURVEY §2.2)
  *  - J1 left equi-join + J2 join-totality validation (`spotify_eps.py:185-189`)
  *  - W1 rank-by-position, W2 rank-move = lag() (`spotify_eps.py:75-80`)
  *  - U1/U2 union-all and schema-drift union-by-name (`spotify_eps_dag.py:54`)
  *  - F1-F7 scalar functions (prefix strip, date format, json access)
  *  - A1/A2 aggregation analogs (`spotify_eps.py:171,91`)
  *
  * Determinism rules for oracle parity (DuckDB vs Spark):
  *  - monetary/quantity sums go through DECIMAL so addition is exact and
  *    order-insensitive (double sums differ in low bits across engines);
  *  - per-row double arithmetic is fine (IEEE-identical in both engines);
  *  - every window orderBy carries a unique tie-break column;
  *  - every query output is totally ordered (EliminateSorts drops the sort
  *    under count-only benchmarks, so this costs nothing in Bench).
  */
object CoreQueries extends QueryPack {

  // ---------------------------------------------------------------- q01
  // A2-style full aggregation (hash agg with partial/map-side combine;
  // the shuffle moves only grouped partials — scales to 100 TB).
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // The SUM runs in DECIMAL (exact, order-insensitive addition) but
          // the FINAL output column is cast DOUBLE on both engines: the
          // driver's hash renders decimals float-style, so a DECIMAL output
          // column hash-mismatches even when values are bit-identical. A
          // decimal→double cast of the same exact decimal is bit-identical
          // in Spark and DuckDB, so DOUBLE is the render-stable output type.
          sum($"l_quantity".cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))

  // ---------------------------------------------------------------- q02
  // P1 projection + P4/P5-style predicate; filter + pruning reach the
  // parquet scan (PushedFilters). Per-row double arithmetic only.
  private val q02 = Q(
    "q02_filter_project",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter(
          $"l_shipdate" >= lit("2000-01-01").cast("timestamp") &&
          $"l_shipdate" <  lit("2001-01-01").cast("timestamp") &&
          $"l_discount" > 0.02 && $"l_quantity" < 25.0)
        .select(
          $"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        AND l_shipdate <  TIMESTAMP '2001-01-01'
        AND l_discount > 0.02 AND l_quantity < 25.0
      ORDER BY l_orderkey, l_linenumber
    """))

  // ---------------------------------------------------------------- q03
  // J1: the flagship left equi-join (chart ⟕ episode shape,
  // spotify_eps.py:185). customer is the small dim → broadcast hash
  // join, no shuffle of the fact side; at 100 TB the dim stays
  // broadcastable while orders scales out.
  private val q03 = Q(
    "q03_join_enrich",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "left")
        .select($"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """))

  // ---------------------------------------------------------------- q04
  // J2 + P5: join-totality validation with NULL-SAFE inequality.
  // pandas `NaN != x` is True, so unmatched left-join rows violate;
  // Spark's `=!=` returns null there (silently passing) — the faithful
  // translation is the negated null-safe equality `<=>`
  // (SURVEY §2.2 P5, spotify_eps.py:187-189).
  private val q04 = Q(
    "q04_join_validate",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"), "left")
        .filter(!($"o_custkey" <=> $"c_custkey"))
        .agg(count(lit(1)).as("violations"))
    },
    Some("""
      SELECT COUNT(*) AS violations
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      WHERE o_custkey IS DISTINCT FROM c_custkey
    """))

  // ---------------------------------------------------------------- q05
  // W1 + top-k: rank within group, keep k (the chart's "top-200 per
  // region", SURVEY §2.6). row_number over a unique tie-break.
  private val q05 = Q(
    "q05_topk_per_group",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type")
        .orderBy($"value".desc, $"event_id".asc)
      Tables.events(s, dir)
        .select($"event_type", $"event_id", $"value")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
        .orderBy($"event_type", $"rnk")
    },
    Some("""
      SELECT event_type, event_id, value, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id ASC) AS rnk
        FROM events)
      WHERE rnk <= 5
      ORDER BY event_type, rnk
    """))

  // ---------------------------------------------------------------- q06
  // W2: chartRankMove recomputation — lag() + CASE
  // (spotify_eps.py:80; SURVEY §2.5 W2).
  private val q06 = Q(
    "q06_rank_move",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      Tables.events(s, dir)
        .select($"user_id", $"event_id", $"ts", $"value")
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("move",
          when($"prev_value".isNull, "NEW")
            .when($"value" > $"prev_value", "UP")
            .when($"value" < $"prev_value", "DOWN")
            .otherwise("UNCHANGED"))
        .select($"user_id", $"event_id", $"move")
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT user_id, event_id,
             CASE WHEN prev_value IS NULL THEN 'NEW'
                  WHEN value > prev_value THEN 'UP'
                  WHEN value < prev_value THEN 'DOWN'
                  ELSE 'UNCHANGED' END AS move
      FROM (
        SELECT user_id, event_id, value,
               LAG(value) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS prev_value
        FROM events)
      ORDER BY user_id, event_id
    """))

  // ---------------------------------------------------------------- q07
  // U2: schema-drift-tolerant union by name with missing-column
  // null-fill (pandas concat alignment, spotify_eps_dag.py:54).
  private val q07 = Q(
    "q07_union_by_name",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val older = orders.filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_totalprice")
      val newer = orders.filter($"o_orderstatus" === "O")
        .select($"o_orderkey", $"o_totalprice", $"o_orderpriority")
      older.unionByName(newer, allowMissingColumns = true)
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL BY NAME
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_orderkey
    """))

  // ---------------------------------------------------------------- q08
  // DISTINCT (set op family, SURVEY §2.7) — map-side partial distinct
  // then shuffle on the group keys only.
  private val q08 = Q(
    "q08_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .select($"c_mktsegment", $"c_nationkey")
        .distinct()
        .orderBy($"c_mktsegment", $"c_nationkey")
    },
    Some("""
      SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      ORDER BY c_mktsegment, c_nationkey
    """))

  // ---------------------------------------------------------------- q09
  // F1-F4: scalar string/date functions — prefix strip via regexp
  // (spotify_eps.py:81-82), date→string format (F4), concat (F7).
  private val q09 = Q(
    "q09_scalar_funcs",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select(
          $"o_orderkey",
          regexp_replace($"o_orderpriority", "^[0-9]+-", "").as("prio_label"),
          date_format($"o_orderdate", "yyyy-MM-dd").as("od_str"),
          concat_ws("#", $"o_orderstatus",
            $"o_orderkey".cast("string")).as("status_key"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             REGEXP_REPLACE(o_orderpriority, '^[0-9]+-', '', 'g') AS prio_label,
             STRFTIME(o_orderdate, '%Y-%m-%d') AS od_str,
             CONCAT_WS('#', o_orderstatus, CAST(o_orderkey AS VARCHAR)) AS status_key
      FROM orders
      ORDER BY o_orderkey
    """))

  // ---------------------------------------------------------------- q10
  // F6: JSON field access (nested episode JSON flatten analog,
  // spotify_eps.py:131-156) + aggregation over the extracted value.
  private val q10 = Q(
    "q10_json_extract_agg",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("long").as("k_val"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k_val").cast("long").as("sum_k"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """))

  // ---------------------------------------------------------------- q11
  // Star join: fact ⋈ snowflaked dims with explicit broadcasts of the
  // tiny dims (region/nation); revenue rollup per region+nation.
  private val q11 = Q(
    "q11_star_join_agg",
    (s, dir) => {
      import s.implicits._
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      val nation = Tables(s, dir, "nation")
      val region = Tables(s, dir, "region")
      orders
        .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy($"r_name", $"n_name")
        .agg(
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("total_revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"r_name", $"n_name")
    },
    Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
             COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """))

  // ---------------------------------------------------------------- q12
  // Event-time tumbling window (batch form of the streaming op,
  // SURVEY §2.10): 1-hour buckets per event type.
  private val q12 = Q(
    "q12_time_bucket_agg",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          sum($"value".cast("decimal(14,2)"))
            .cast("double").as("sum_value"))
        .select($"w.start".as("bucket_start"), $"event_type", $"n", $"sum_value")
        .orderBy($"bucket_start", $"event_type")
    },
    Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket_start, event_type
    """))

  // ---------------------------------------------------------------- q13
  // Semi/anti joins (EXISTS / NOT EXISTS) — free from Catalyst but part
  // of the complete operator surface (SURVEY §2.3 note).
  private val q13 = Q(
    "q13_semi_anti",
    (s, dir) => {
      import s.implicits._
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders").filter($"o_totalprice" > 400000.0)
      val withBig = customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
        .select($"c_custkey").withColumn("has_big_order", lit(true))
      val withoutBig = customer
        .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
        .select($"c_custkey").withColumn("has_big_order", lit(false))
      withBig.unionByName(withoutBig).orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, TRUE AS has_big_order FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      UNION ALL
      SELECT c_custkey, FALSE AS has_big_order FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      ORDER BY c_custkey
    """))

  // ---------------------------------------------------------------- q31
  // Multi-level aggregation: ROLLUP with grouping indicators (SURVEY
  // §2.4 — absent from the reference, supplied by Catalyst). Note the
  // null-ordering trap: Spark sorts NULLS FIRST ascending by default,
  // DuckDB NULLS LAST — the oracle pins NULLS FIRST explicitly.
  private val q31 = Q(
    "q31_rollup_agg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("revenue"),
          grouping($"o_orderstatus").as("g_status"),
          grouping($"o_orderpriority").as("g_prio"))
        .orderBy($"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """))

  // ---------------------------------------------------------------- q42
  // CUBE: all four grouping sets over (segment, nation) in one pass —
  // completes the multi-level aggregation family next to q31's ROLLUP.
  // Output rows are unique across sets (no data nulls in the keys), so
  // the key ordering is total; SUM output + grouping flags pinned.
  private val q42 = Q(
    "q42_cube_agg",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .cube($"c_mktsegment", $"c_nationkey")
        .agg(
          count(lit(1)).as("n"),
          sum($"c_acctbal".cast("decimal(18,2)"))
            .cast("double").as("sum_bal"),
          grouping($"c_mktsegment").as("g_seg"),
          grouping($"c_nationkey").as("g_nat"))
        .orderBy($"c_mktsegment".asc_nulls_first, $"c_nationkey".asc_nulls_first)
    },
    Some("""
      SELECT c_mktsegment, c_nationkey,
             COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
             CAST(GROUPING(c_mktsegment) AS TINYINT) AS g_seg,
             CAST(GROUPING(c_nationkey) AS TINYINT) AS g_nat
      FROM customer
      GROUP BY CUBE(c_mktsegment, c_nationkey)
      ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST
    """))

  // ---------------------------------------------------------------- q43
  // Bucketed co-located join under the gate: both sides written
  // bucketed+sorted on the join key (shuffle paid once at write), then
  // joined with ZERO shuffle Exchange on the join itself (BucketingSpec
  // asserts the plan; this query proves result equivalence to the plain
  // join). The 100 TB pattern for recurring fact-to-fact joins where
  // neither side broadcasts.
  private val q43 = Q(
    "q43_bucketed_join",
    (s, dir) => {
      import s.implicits._
      val scratch =
        graft.util.Scratch.dir("graft_buckets").toString
      graft.operators.Bucketing.writeBucketed(
        Tables(s, dir, "orders"), "q43_orders_b", "o_custkey", 8,
        Some(s"$scratch/orders_b"))
      graft.operators.Bucketing.writeBucketed(
        Tables(s, dir, "customer"), "q43_customer_b", "c_custkey", 8,
        Some(s"$scratch/customer_b"))
      graft.operators.Bucketing.joinBucketed(s,
          "q43_orders_b", "q43_customer_b", "o_custkey", "c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("revenue"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """))

  // ---------------------------------------------------------------- q32
  // Salted two-phase aggregation: identical result to a plain GROUP BY
  // (the oracle IS the plain GROUP BY), different shuffle layout — the
  // hot l_returnflag keys spread over 8 reducers in phase 1. The skew
  // tool for when AQE's runtime splitting isn't available/enough.
  private val q32 = Q(
    "q32_salted_agg",
    (s, dir) => {
      import s.implicits._
      graft.operators.Salting.saltedAgg(
          Tables(s, dir, "lineitem")
            .withColumn("qty_dec", $"l_quantity".cast("decimal(18,2)")),
          keys = Seq("l_returnflag"),
          discriminator = $"l_orderkey",
          numSalts = 8,
          ("sum", "qty_dec", "sum_qty"),
          ("count", "", "n"),
          ("max", "l_extendedprice", "max_price"))
        // the two-phase re-sum widens the decimal internally; the final
        // output is DOUBLE on both sides (render-stable for the driver hash)
        .select($"l_returnflag",
          $"sum_qty".cast("double").as("sum_qty"),
          $"n", $"max_price")
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n,
             MAX(l_extendedprice) AS max_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """))

  // ---------------------------------------------------------------- q48
  // Salted skew-JOIN under the gate: the small side replicated per salt,
  // the big side salted deterministically — one hot customer key spreads
  // over 8 tasks. Result ≡ the plain left join (the oracle IS that
  // join); only the shuffle layout differs, same contract as q32.
  private val q48 = Q(
    "q48_salted_join",
    (s, dir) => {
      import s.implicits._
      graft.operators.Salting.saltedJoin(
          big = Tables(s, dir, "orders"),
          small = Tables(s, dir, "customer"),
          bigKey = "o_custkey", smallKey = "c_custkey",
          discriminator = $"o_orderkey", numSalts = 8,
          joinType = "left")
        .select($"o_orderkey", $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
      FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey
    """))

  // ---------------------------------------------------------------- q58
  // GLOBAL top-k: orderBy + limit plans TakeOrderedAndProject — each
  // partition keeps a k-heap and the driver merges k-sized results, so
  // the full sort never happens (O(n log k) per partition, not
  // O(n log n) + shuffle). The global complement of q05's per-group
  // top-k; unique tie-break keeps it deterministic.
  private val q58 = Q(
    "q58_global_topk",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
    },
    Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 100
    """))

  // ---------------------------------------------------------------- q35
  // Set operations (SURVEY §2.7: absent from the reference, Catalyst
  // built-ins): segments holding customers both with and without open
  // orders (INTERSECT), and nations present in customers but absent
  // from suppliers (EXCEPT).
  private val q35 = Q(
    "q35_set_ops",
    (s, dir) => {
      import s.implicits._
      val customer = Tables(s, dir, "customer")
      val supplier = Tables(s, dir, "supplier")
      val orders = Tables(s, dir, "orders")
      val withOpen = customer
        .join(orders.filter($"o_orderstatus" === "O"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_mktsegment")
      val withoutOpen = customer
        .join(orders.filter($"o_orderstatus" === "O"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_mktsegment")
      val bothKinds = withOpen.intersect(withoutOpen)
        .withColumn("kind", lit("segment_both"))
        .withColumnRenamed("c_mktsegment", "val")
      val custNations = customer.select($"c_nationkey".cast("string").as("val"))
      val suppNations = supplier.select($"s_nationkey".cast("string").as("val"))
      val custOnly = custNations.except(suppNations)
        .withColumn("kind", lit("nation_cust_only"))
      bothKinds.unionByName(custOnly).orderBy($"kind", $"val")
    },
    Some("""
      SELECT val, kind FROM (
        SELECT c_mktsegment AS val, 'segment_both' AS kind FROM (
          SELECT c_mktsegment FROM customer
          WHERE EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
          INTERSECT
          SELECT c_mktsegment FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_orderstatus = 'O'))
        UNION ALL
        SELECT val, 'nation_cust_only' AS kind FROM (
          SELECT CAST(c_nationkey AS VARCHAR) AS val FROM customer
          EXCEPT
          SELECT CAST(s_nationkey AS VARCHAR) FROM supplier))
      ORDER BY kind, val
    """))

  // ---------------------------------------------------------------- q52
  // UNPIVOT (melt): wide per-status order metrics back to long
  // (metric, value) rows — the inverse reshape of q50's pivot. The
  // oracle is the portable stacked-UNION form.
  private val q52 = Q(
    "q52_unpivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"))
        .unpivot(
          ids = Array(col("o_orderstatus")),
          values = Array(col("n_orders"), col("n_customers")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy($"o_orderstatus", $"metric")
    },
    Some("""
      SELECT o_orderstatus, 'n_orders' AS metric, COUNT(*) AS value
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, 'n_customers', COUNT(DISTINCT o_custkey)
      FROM orders GROUP BY o_orderstatus
      ORDER BY o_orderstatus, metric
    """))

  // ---------------------------------------------------------------- q53
  // Event-time RANGE window frame: per user, the running 1-hour sum of
  // event values — a true time-range frame (rangeBetween over
  // epoch-micros), not a row-count approximation. Decimal per-row cast
  // keeps the frame sum exact in both engines.
  private val q53 = Q(
    "q53_time_range_window",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts_us")
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          $"value".cast("decimal(14,2)").as("v"))
        .withColumn("hour_sum",
          sum($"v").over(w).cast("double"))
        .select($"user_id", $"event_id", $"hour_sum")
        .orderBy($"user_id", $"event_id")
    },
    Some("""
      SELECT user_id, event_id,
             CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS hour_sum
      FROM events
      ORDER BY user_id, event_id
    """))

  // ---------------------------------------------------------------- q71
  // Explicit GROUPING SETS — per-status and per-priority totals in ONE
  // aggregation pass (no self-union re-scan), completing the
  // multi-level family next to q31's ROLLUP and q42's CUBE. Keys that
  // are null "because not in this set" are disambiguated by the
  // grouping() flags, as in q31/q42.
  private val q71 = Q(
    "q71_grouping_sets",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupingSets(
          Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
          $"o_orderstatus", $"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)"))
            .cast("double").as("revenue"),
          grouping($"o_orderstatus").as("g_status"),
          grouping($"o_orderpriority").as("g_prio"))
        .orderBy($"o_orderstatus".asc_nulls_first,
          $"o_orderpriority".asc_nulls_first)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_prio
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """))

  // ---------------------------------------------------------------- q87
  // The spark.sql SURFACE: the same engine tables queried as ANSI SQL
  // over temp views (region→nation→customer→orders star, three joins,
  // grouped revenue). Catalyst plans SQL text and the DataFrame API
  // identically — this registers the textual path under the gate so a
  // SQL-first user of the library is covered, not just assumed.
  private val q87 = Q(
    "q87_sql_surface",
    (s, dir) => {
      Tables(s, dir, "region").createOrReplaceTempView("v_region")
      Tables(s, dir, "nation").createOrReplaceTempView("v_nation")
      Tables(s, dir, "customer").createOrReplaceTempView("v_customer")
      Tables(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT r.r_name, n.n_name, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        JOIN v_region r ON n.n_regionkey = r.r_regionkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY r.r_name, n.n_name
        ORDER BY r.r_name, n.n_name
      """)
    },
    Some("""
      SELECT r.r_name, n.n_name, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY r.r_name, n.n_name
      ORDER BY r.r_name, n.n_name
    """))

  // --------------------------------------------------------------- q100
  // Order-independent table checksum: per group, COUNT + BIT_XOR of a
  // 60-bit row hash — the anti-entropy fingerprint for comparing a
  // table across replicas/engines without sorting or moving rows (xor
  // partial-combines map-side; the exchange carries one long per
  // task·group). The timestamp hashes as epoch-millis INTEGER — string
  // renderings of timestamps are not engine-portable, integers are.
  private val q100 = Q(
    "q100_table_checksum",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderpriority",
          graft.operators.Sketch.hash60(concat_ws("|",
            $"o_orderkey", $"o_custkey", $"o_orderstatus",
            // cast: the parquet type is NTZ (no UTC flag); with the
            // session tz pinned UTC the cast reads naive-as-UTC, which
            // is exactly DuckDB's epoch_ms on a naive timestamp
            unix_millis($"o_orderdate".cast("timestamp")))).as("h"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("checksum"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_rows,
             BIT_XOR(('0x' || substr(md5(
               o_orderkey || '|' || o_custkey || '|' || o_orderstatus
                 || '|' || epoch_ms(o_orderdate)), 1, 15))::BIGINT)
               AS checksum
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """))

  def all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q31, q32, q35, q42, q43, q48, q52, q53, q58, q71, q87,
    q100)
}
