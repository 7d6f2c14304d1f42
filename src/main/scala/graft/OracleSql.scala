package graft

/** DuckDB-dialect ANSI SQL oracles, one per [[Queries.all]] entry
  * (driver runs these against the same parquet tables and hash-compares
  * with the Spark result — column names/types must match exactly; see
  * Queries scaladoc for the parity rules). */
object OracleSql {

  /** The 16 Morton shift/mask terms of `zorder_key` (bit b of bx →
    * position 2b, of by → 2b+1; disjoint bits, so + == OR) — generated
    * to match [[graft.ops.ZOrder.interleave]] term-for-term. */
  private val zkeySql: String =
    (0 until 8).map(b =>
      s"(((bx >> $b) & 1) << ${2 * b}) + (((by >> $b) & 1) << ${2 * b + 1})")
      .mkString(" + ")

  val all: Map[String, String] = Map(

    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q3_join_revenue" ->
      """SELECT c_mktsegment,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q14_promo_share" ->
      """WITH l AS (SELECT * FROM lineitem
        |   WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |     AND l_shipdate < TIMESTAMP '1996-04-01'),
        | a AS (SELECT
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS promo_cents,
        |    CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_cents
        |   FROM l JOIN part ON l_partkey = p_partkey)
        |SELECT promo_cents, total_cents,
        | round(100.0 * CAST(promo_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 6) AS promo_share_pct
        |FROM a""".stripMargin,

    "q17_small_qty" ->
      """WITH th AS (SELECT l_partkey,
        |    round(0.2 * CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*), 6) AS th
        |   FROM lineitem JOIN part ON l_partkey = p_partkey
        |   WHERE p_brand = 'Brand#13' GROUP BY l_partkey),
        | s AS (SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS small_qty_cents,
        |    count(*) AS n_lines
        |   FROM lineitem JOIN th ON lineitem.l_partkey = th.l_partkey
        |   WHERE l_quantity < th)
        |SELECT small_qty_cents, n_lines,
        | round(CAST(small_qty_cents AS DOUBLE) / 700.0, 6) AS avg_yearly
        |FROM s""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |   FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150)
        |SELECT c_name, c_custkey, o_orderkey, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q21_late_suppliers" ->
      """WITH lo AS (SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 365 DAY THEN 1 ELSE 0 END AS late
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   WHERE o_orderstatus = 'F'),
        | st AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late_supp
        |   FROM lo GROUP BY l_orderkey
        |   HAVING count(DISTINCT l_suppkey) > 1
        |     AND count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) = 1)
        |SELECT s_name, CAST(count(DISTINCT lo.l_orderkey) AS BIGINT) AS numwait
        |FROM lo JOIN st ON lo.l_orderkey = st.l_orderkey
        |JOIN supplier ON lo.l_suppkey = s_suppkey
        |WHERE lo.late = 1
        |GROUP BY s_name""".stripMargin,

    "q22_lapsed_customers" ->
      """WITH c AS (SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)),
        | th AS (SELECT round(CAST(sum(CAST(round(c_acctbal*1000000) AS BIGINT)) AS DOUBLE)
        |     / 1e6 / count(*), 6) AS th
        |   FROM c WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM c, th
        |WHERE c_acctbal > th
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        | count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND c_nationkey = s_nationkey
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT
        | CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS forecast_cents,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
        | CAST(c_nationkey AS BIGINT) AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE (s_nationkey = 1 AND c_nationkey = 2)
        |   OR (s_nationkey = 2 AND c_nationkey = 1)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q8_market_share" ->
      """WITH j AS (SELECT year(o_orderdate) AS o_year,
        |    CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT) AS cents,
        |    s_nationkey
        |   FROM lineitem
        |   JOIN part ON l_partkey = p_partkey
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        |   JOIN region ON n_regionkey = r_regionkey
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'),
        | a AS (SELECT CAST(o_year AS BIGINT) AS o_year,
        |    CAST(sum(CASE WHEN s_nationkey = 5 THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
        |    CAST(sum(cents) AS BIGINT) AS total_cents
        |   FROM j GROUP BY 1)
        |SELECT o_year, nation_cents, total_cents,
        | round(CAST(nation_cents AS DOUBLE) / CAST(total_cents AS DOUBLE), 6) AS mkt_share
        |FROM a""".stripMargin,

    "q10_returned_items" ->
      """WITH lost AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS lost_cents
        |   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |   WHERE l_returnflag = 'R'
        |     AND o_orderdate >= TIMESTAMP '1997-07-01'
        |     AND o_orderdate < TIMESTAMP '1997-10-01'
        |   GROUP BY o_custkey
        |   ORDER BY lost_cents DESC, o_custkey ASC LIMIT 20)
        |SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | lost_cents
        |FROM lost JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q9_product_profit" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
        | CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |   - sum(CAST(round(p_retailprice*0.6*l_quantity*100) AS BIGINT)) AS BIGINT) AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2""".stripMargin,

    "q11_important_parts" ->
      """WITH pp AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_cents
        |   FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |   WHERE s_nationkey = 3 GROUP BY l_partkey),
        | th AS (SELECT CAST(sum(value_cents) AS DOUBLE) / 1000 AS th FROM pp)
        |SELECT l_partkey, value_cents FROM pp, th
        |WHERE CAST(value_cents AS DOUBLE) > th""".stripMargin,

    "q12_ship_delay" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |   THEN 'SLOW' ELSE 'FAST' END AS delay_class,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q15_top_supplier" ->
      """WITH ps AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_cents
        |   FROM lineitem
        |   WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |     AND l_shipdate < TIMESTAMP '1997-04-01'
        |   GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM ps)""".stripMargin,

    "q16_supplier_counts" ->
      """WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM bridge
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#17'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2""".stripMargin,

    "q20_excess_suppliers" ->
      """WITH q AS (SELECT l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |   FROM lineitem JOIN part ON l_partkey = p_partkey
        |   WHERE p_name LIKE 'small%'
        |     AND l_shipdate >= TIMESTAMP '1997-01-01'
        |     AND l_shipdate < TIMESTAMP '1998-01-01'
        |   GROUP BY l_suppkey HAVING sum(CAST(l_quantity AS BIGINT)) > 400)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey < 10
        |  AND s_suppkey IN (SELECT l_suppkey FROM q)""".stripMargin,

    "zorder_key" ->
      ("""WITH b AS (SELECT doc_id,
        |   LEAST(255, GREATEST(0, CAST(floor((CAST(n_chars AS DOUBLE) - 40.0) * 256 / 520.0) AS BIGINT))) AS bx,
        |   CAST('0x' || substring(md5(lang), 1, 15) AS BIGINT) % 256 AS by
        |  FROM documents)
        |SELECT doc_id, bx, by, """.stripMargin + zkeySql + " AS zkey FROM b"),

    "zorder_prune" ->
      """SELECT CAST(8 AS BIGINT) AS n_files,
        | TRUE AS pruned_fewer, TRUE AS rows_match,
        | (SELECT count(*) FROM documents WHERE n_chars BETWEEN 100 AND 200) AS n_rows""".stripMargin,

    "zorder_compact" ->
      """SELECT (SELECT count(*) FROM documents) AS n_rows,
        | TRUE AS version_ok, TRUE AS disjoint,
        | TRUE AS pruned_fewer, TRUE AS rows_match""".stripMargin,

    "salted_join" ->
      """WITH d AS (SELECT event_type, count(*) AS type_total
        |   FROM events GROUP BY event_type)
        |SELECT e.event_type, max(d.type_total) AS type_total,
        | count(*) AS n_joined
        |FROM events e JOIN d USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    "join_size_estimate" ->
      """WITH a AS (SELECT CAST(l_partkey AS VARCHAR) AS k
        |   FROM lineitem WHERE l_orderkey % 2 = 0),
        | b AS (SELECT CAST(l_partkey AS VARCHAR) AS k
        |   FROM lineitem WHERE l_orderkey % 2 = 1),
        | ca AS (SELECT k, count(*) AS n FROM a GROUP BY k),
        | cb AS (SELECT k, count(*) AS n FROM b GROUP BY k)
        |SELECT (SELECT CAST(sum(ca.n * cb.n) AS BIGINT)
        |   FROM ca JOIN cb USING (k)) AS n_exact,
        | TRUE AS est_ge_exact, TRUE AS est_within_bound""".stripMargin,

    "iban_screen" ->
      """WITH e AS (SELECT doc_id,
        |    text || ' acct ' || CASE WHEN doc_id % 2 = 0
        |      THEN 'DE89370400440532013000' ELSE 'DE89370400440532013001' END
        |      || ' end' AS iban_text
        |   FROM documents),
        | c AS (SELECT doc_id, iban_text,
        |    regexp_extract_all(iban_text, '\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\b') AS ibans
        |   FROM e),
        | v AS (SELECT doc_id, iban_text, ibans,
        |    list_filter(ibans, x -> CAST(list_reduce(
        |      list_prepend('0', list_transform(generate_series(1, length(x)), i ->
        |        substring(substring(x, 5) || substring(x, 1, 4), i, 1))),
        |      (a, ch) -> CAST(CASE WHEN ch >= '0' AND ch <= '9'
        |          THEN (CAST(a AS INT) * 10 + CAST(ch AS INT)) % 97
        |          ELSE (CAST(a AS INT) * 100 + ascii(ch) - 55) % 97 END AS VARCHAR))
        |      AS INT) = 1) AS valid
        |   FROM c)
        |SELECT doc_id, CAST(len(ibans) AS BIGINT) AS n_iban_candidates,
        | CAST(len(valid) AS BIGINT) AS n_mod97_valid,
        | CASE WHEN len(valid) >= 1 THEN replace(iban_text, valid[1], '[IBAN]')
        |      ELSE iban_text END AS redacted
        |FROM v""".stripMargin,

    // Deequ-style profile: one row per column, micro-exact means.
    "schema_profile" ->
      """SELECT 'o_custkey' AS "column", count(*) AS n_rows,
        | CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
        | CAST(min(o_custkey) AS VARCHAR) AS min_value,
        | CAST(max(o_custkey) AS VARCHAR) AS max_value,
        | round(CAST(sum(CAST(round(o_custkey * 1000000) AS BIGINT)) AS DOUBLE) / 1e6
        |   / (count(*) - sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)), 6) AS mean
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*),
        | CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(count(DISTINCT o_totalprice) AS BIGINT),
        | CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR),
        | round(CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE) / 1e6
        |   / (count(*) - sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)), 6)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        | CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        | CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR),
        | NULL
        |FROM orders""".stripMargin,

    "table_checks" ->
      """SELECT 'not_null(o_orderkey)' AS "check",
        | CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        | (sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0) AS passed
        |FROM orders
        |UNION ALL
        |SELECT 'in_range(o_totalprice,0.0,700000.0)',
        | CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice >= 0
        |   AND o_totalprice <= 700000 THEN 0 ELSE 1 END) AS BIGINT),
        | (sum(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice >= 0
        |   AND o_totalprice <= 700000 THEN 0 ELSE 1 END) = 0)
        |FROM orders
        |UNION ALL
        |SELECT 'one_of(o_orderstatus)',
        | CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT),
        | (sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) = 0)
        |FROM orders
        |UNION ALL
        |SELECT 'unique(o_orderkey)',
        | CAST(coalesce(sum(n - 1), 0) AS BIGINT),
        | (coalesce(sum(n - 1), 0) = 0)
        |FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)""".stripMargin,

    "q4_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders
        | WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL) WHERE rn <= 3""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)""".stripMargin,

    "q6_events_window" ->
      """SELECT epoch_ns(ts) // 3600000000000 * 3600 AS hour_epoch, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, event_type""".stripMargin,

    "q7_event_props" ->
      """SELECT TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val,
        | count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,

    "q8_sessionize" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        | SELECT user_id,
        |  CASE WHEN prev_ts IS NULL OR (epoch_ns(ts) - epoch_ns(prev_ts)) > 1800000000000 THEN 1 ELSE 0 END AS new_sess
        | FROM (SELECT user_id, ts,
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |       FROM events)) GROUP BY user_id""".stripMargin,

    "q9_sliding_window" ->
      """SELECT (tss // 1800) * 1800 - k * 1800 AS window_start, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM (SELECT epoch_ns(ts) // 1000000000 AS tss, event_type, value FROM events),
        |     (VALUES (0), (1)) AS t(k)
        |GROUP BY 1, event_type""".stripMargin,

    "corpus_rollup" -> langIdSql(
      """SELECT coalesce(lang, '<all>') AS lang_pred, n_docs, total_chars FROM (
        | SELECT {CASE} AS lang, count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars
        | FROM scored GROUP BY ROLLUP({CASE}))""".stripMargin),

    "q10_percentiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | round(quantile_cont(value, 0.99), 6) AS p99,
        | count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "doc_hash" ->
      """SELECT doc_id, sha256(text) AS content_hash,
        | CAST(length(text) AS BIGINT) AS text_len FROM documents""".stripMargin,

    // trim uses the explicit ASCII whitespace set (matches the engine
    // chunker's String.strip semantics for ASCII text; DuckDB's bare
    // trim() strips spaces ONLY, which diverges on \n / \t boundaries)
    "chunk_fixed" ->
      """SELECT doc_id, i - 1 AS chunk_ordinal,
        | trim(substring(text, CAST((i-1)*200 + 1 AS INT), 200), E' \t\n\r\x0B\x0C') AS chunk_text
        |FROM (SELECT doc_id, text, unnest(generate_series(1, CAST(ceil(length(text)/200.0) AS BIGINT))) AS i FROM documents)
        |WHERE length(trim(substring(text, CAST((i-1)*200 + 1 AS INT), 200), E' \t\n\r\x0B\x0C')) > 0""".stripMargin,

    "chunk_sliding" ->
      """SELECT doc_id, i AS chunk_ordinal,
        | trim(substring(text, CAST(i*150 + 1 AS INT), 200), E' \t\n\r\x0B\x0C') AS chunk_text,
        | CAST(1 AS BIGINT) AS page_number
        |FROM (SELECT doc_id, text, unnest(generate_series(0, CAST(floor((length(text)-1)/150.0) AS BIGINT))) AS i FROM documents)
        |WHERE length(trim(substring(text, CAST(i*150 + 1 AS INT), 200), E' \t\n\r\x0B\x0C')) > 0""".stripMargin,

    "ascii_clean" ->
      """SELECT doc_id, regexp_replace(text, '[^\n\t\x20-\x7e]', '', 'g') AS clean_text
        |FROM documents""".stripMargin,

    "keyword_filter" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE position('spark' IN lower(text)) > 0""".stripMargin,

    "knn_topk" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | s AS (SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS c
        |        FROM embeddings, q)
        |SELECT vec_id, round(c, 6) AS cosine FROM s ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    "knn_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 5),
        | s AS (SELECT q.query_id, e.vec_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
        |       FROM embeddings e, q),
        | r AS (SELECT query_id, vec_id, c,
        |        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
        |       FROM s)
        |SELECT query_id, vec_id, rank, round(c, 6) AS cosine FROM r WHERE rank <= 5""".stripMargin,

    "knn_batch_agg" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |            FROM embeddings WHERE vec_id < 5),
        | s AS (SELECT q.query_id, e.vec_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
        |       FROM embeddings e, q),
        | r AS (SELECT query_id, vec_id, c,
        |        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
        |       FROM s)
        |SELECT query_id, vec_id, rank, round(c, 6) AS cosine FROM r WHERE rank <= 5""".stripMargin,

    // Leave-one-out 5-NN majority-vote label recovery, per-label
    // rollup; vote tie-break (count desc, label asc) replayed with
    // window ranks. Anchor panel vec_id < 2048 (vacuous at sf ≤ 0.1),
    // tightening to 512 past 20k vectors — the engine's tiers.
    "knn_label_accuracy" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
        | s AS (SELECT a.vec_id AS aid, a.label AS alabel, b.vec_id AS bid, b.label AS blabel,
        |        list_cosine_similarity(a.e, b.e) AS c
        |       FROM v a JOIN v b ON a.vec_id <> b.vec_id
        |       WHERE a.vec_id < (SELECT CASE WHEN count(*) <= 20000 THEN 2048 ELSE 512 END FROM embeddings)),
        | kn AS (SELECT aid, alabel, blabel FROM (
        |         SELECT aid, alabel, blabel,
        |          row_number() OVER (PARTITION BY aid ORDER BY c DESC, bid ASC) AS rn
        |         FROM s) WHERE rn <= 5),
        | vote AS (SELECT aid, alabel, blabel, count(*) AS n FROM kn GROUP BY 1, 2, 3),
        | pick AS (SELECT aid, alabel, blabel AS pred FROM (
        |           SELECT aid, alabel, blabel,
        |            row_number() OVER (PARTITION BY aid ORDER BY n DESC, blabel ASC) AS rn
        |           FROM vote) WHERE rn = 1)
        |SELECT alabel AS label, count(*) AS n_vectors,
        | CAST(sum(CASE WHEN pred = alabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM pick GROUP BY alabel""".stripMargin,

    // Sampled-anchor twin: anchors restricted to vec_id % 4 = 0 (the
    // deterministic portable sample), neighbors the full table — the
    // per-anchor pipeline is the exact eval's verbatim.
    "knn_label_accuracy_sampled" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings),
        | s AS (SELECT a.vec_id AS aid, a.label AS alabel, b.vec_id AS bid, b.label AS blabel,
        |        list_cosine_similarity(a.e, b.e) AS c
        |       FROM v a JOIN v b ON a.vec_id <> b.vec_id
        |       WHERE a.vec_id % 4 = 0 AND a.vec_id < 2000),
        | kn AS (SELECT aid, alabel, blabel FROM (
        |         SELECT aid, alabel, blabel,
        |          row_number() OVER (PARTITION BY aid ORDER BY c DESC, bid ASC) AS rn
        |         FROM s) WHERE rn <= 5),
        | vote AS (SELECT aid, alabel, blabel, count(*) AS n FROM kn GROUP BY 1, 2, 3),
        | pick AS (SELECT aid, alabel, blabel AS pred FROM (
        |           SELECT aid, alabel, blabel,
        |            row_number() OVER (PARTITION BY aid ORDER BY n DESC, blabel ASC) AS rn
        |           FROM vote) WHERE rn = 1)
        |SELECT alabel AS label, count(*) AS n_vectors,
        | CAST(sum(CASE WHEN pred = alabel THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM pick GROUP BY alabel""".stripMargin,

    "knn_threshold" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | d AS (SELECT vec_id AS id, 1 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS distance
        |       FROM embeddings, q ORDER BY distance, id LIMIT 20),
        | s AS (SELECT id, distance, least(greatest(1 - distance, 0), 1) AS similarity_score FROM d)
        |SELECT id, round(distance, 6) AS distance, round(similarity_score, 6) AS similarity_score
        |FROM s WHERE similarity_score >= 0.2""".stripMargin,

    "lsh_topk" -> lshTopkSql(dim = 64, numPlanes = 8, probeHamming = 1, k = 10),

    "ivf_topk" -> ivfTopkSql(dim = 64, numPlanes = 6, nProbe = 8, k = 10),

    "ivf_filtered" -> ivfFilteredSql(dim = 64, numPlanes = 6,
      nProbeInit = 4, k = 10, pred = "label = 2"),

    // The STORED layout must return the exact rows the in-memory
    // arithmetic (and this SQL replay of it) chooses — the sidecar only
    // changes WHERE the per-bucket counts come from, never the counts.
    "ivf_filtered_stored" -> ivfFilteredSql(dim = 64, numPlanes = 6,
      nProbeInit = 4, k = 10, pred = "label = 1"),

    // NB: top-k by dot product DESC — nearest = largest inner product
    "sim_inner_product" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | d AS (SELECT vec_id AS id, list_inner_product(CAST(embedding AS DOUBLE[]), qv) AS distance
        |       FROM embeddings, q ORDER BY distance DESC, id LIMIT 10),
        | m AS (SELECT max(distance) AS maxd, min(distance) AS mind FROM d)
        |SELECT id, round(distance, 6) AS distance,
        | round(CASE WHEN maxd > mind THEN (distance - mind) / (maxd - mind) ELSE 1.0 END, 6) AS similarity_score
        |FROM d, m""".stripMargin,

    "sim_unknown_metric" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | d AS (SELECT vec_id AS id, 1 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS distance
        |       FROM embeddings, q ORDER BY distance, id LIMIT 10)
        |SELECT id, round(distance, 6) AS distance,
        | round(least(greatest(1 - distance * distance / 2, 0), 1), 6) AS similarity_score
        |FROM d""".stripMargin,

    "search_chain" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | d AS (SELECT vec_id AS id, 1 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS distance
        |       FROM embeddings, q ORDER BY distance, id LIMIT 20),
        | s AS (SELECT id, distance, least(greatest(1 - distance, 0), 1) AS similarity_score FROM d)
        |SELECT id, round(distance, 6) AS distance, round(similarity_score, 6) AS similarity_score
        |FROM s JOIN documents ON id = doc_id
        |WHERE similarity_score >= 0.2
        |  AND position('data' IN lower(text)) > 0
        |  AND lang = 'en'""".stripMargin,

    "rag_prompt" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | h AS (SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS c
        |       FROM embeddings, q
        |       ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id LIMIT 6)
        |SELECT 'Answer based on the contexts below.' || chr(10) || chr(10) || '---' || chr(10) || chr(10) ||
        | string_agg(d.text, chr(10)||chr(10)||'---'||chr(10)||chr(10) ORDER BY h.c DESC, h.vec_id) ||
        | chr(10)||chr(10)||'-----'||chr(10)||chr(10)||'What is spark?' AS prompt
        |FROM h JOIN documents d ON h.vec_id = d.doc_id""".stripMargin,

    "chunk_counts" ->
      """SELECT doc_id, count(*) AS n_chunks FROM (
        | SELECT doc_id, i - 1 AS chunk_ordinal
        | FROM (SELECT doc_id, text, unnest(generate_series(1, CAST(ceil(length(text)/200.0) AS BIGINT))) AS i FROM documents)
        | WHERE length(trim(substring(text, CAST((i-1)*200 + 1 AS INT), 200), E' \t\n\r\x0B\x0C')) > 0
        |) GROUP BY doc_id""".stripMargin,

    // Gate-is-oracle: the real-weights pipeline's structural
    // invariants (corpus size, dim, unit norm, exact top-1
    // self-retrieval) — the vectors themselves are the checkpoint's
    // business, the CONTRACT is SQL-replayable.
    // Query panel bound (doc_id < 50000) replayed literally —
    // vacuous at sf <= 1, caps the self-search at 500 queries x N.
    "embed_real" ->
      """SELECT doc_id AS query_doc_id,
        | (SELECT count(*) FROM documents WHERE doc_id % 25 = 0) AS n_corpus,
        | TRUE AS dim_ok, TRUE AS unit_norm_ok,
        | 1.0 AS top1_sim, TRUE AS top1_exact
        |FROM documents WHERE doc_id % 100 = 0 AND doc_id < 50000""".stripMargin,

    "embed_chunks" ->
      """SELECT doc_id, i - 1 AS chunk_ordinal,
        | CAST(64 AS BIGINT) AS vec_dim, 1.0 AS vec_norm
        |FROM (SELECT doc_id, text, unnest(generate_series(1, CAST(ceil(length(text)/200.0) AS BIGINT))) AS i FROM documents)
        |WHERE length(trim(substring(text, CAST((i-1)*200 + 1 AS INT), 200), E' \t\n\r\x0B\x0C')) > 0""".stripMargin,

    // Independent WordPiece replay: greedy longest-match-first as a
    // recursive CTE — per DISTINCT word, one active row whose (rest,
    // ids) state advances by the longest matching vocab piece (arg_max
    // over prefix matches; first position excludes ##-continuations,
    // later positions require them); a step with NO match marks the
    // word dead = whole-word [UNK]. The VALUES vocab is generated from
    // the same Seq the Spark kernel uses, so the two cannot drift.
    "wordpiece_ids" -> {
      val values = graft.Queries.wpVocabLines.zipWithIndex
        .map { case (t, i) => s"('$t',$i)" }.mkString(",")
      val bodyLen = graft.Queries.wpMaxLen - 2
      s"""WITH RECURSIVE vocab(tok, id) AS (SELECT * FROM (VALUES $values) v(tok, id)),
         | docs AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
         |          FROM documents),
         | words AS (SELECT DISTINCT unnest(ws) AS w FROM docs),
         | wp(w, rest, ids, dead) AS (
         |   SELECT w, w, CAST([] AS BIGINT[]), FALSE FROM words
         |   UNION ALL
         |   SELECT s.w,
         |     CASE WHEN count(v.id) = 0 THEN '' ELSE substr(s.rest, 1 + max(CASE WHEN len(s.ids)=0 THEN len(v.tok) ELSE len(v.tok)-2 END)) END,
         |     CASE WHEN count(v.id) = 0 THEN s.ids
         |          ELSE list_append(s.ids, arg_max(CAST(v.id AS BIGINT), CASE WHEN len(s.ids)=0 THEN len(v.tok) ELSE len(v.tok)-2 END)) END,
         |     count(v.id) = 0
         |   FROM wp s LEFT JOIN vocab v
         |     ON (CASE WHEN len(s.ids) = 0
         |         THEN v.tok NOT LIKE '##%' AND v.tok NOT LIKE '[%' AND starts_with(s.rest, v.tok)
         |         ELSE v.tok LIKE '##%' AND starts_with(s.rest, substr(v.tok, 3)) END)
         |   WHERE s.rest <> '' AND NOT s.dead
         |   GROUP BY s.w, s.rest, s.ids, s.dead),
         | tok AS (SELECT w, CASE WHEN dead THEN [CAST(1 AS BIGINT)] ELSE ids END AS ids
         |         FROM wp WHERE rest = ''),
         | expl AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM docs),
         | perword AS (SELECT e.doc_id, e.i, t.ids FROM expl e JOIN tok t ON t.w = e.ws[e.i]),
         | flat AS (SELECT doc_id, flatten(list(ids ORDER BY i)) AS body FROM perword GROUP BY doc_id),
         | final AS (SELECT d.doc_id,
         |     list_concat(list_concat([CAST(2 AS BIGINT)], coalesce(f.body, [])[1:$bodyLen]), [CAST(3 AS BIGINT)]) AS ids
         |   FROM docs d LEFT JOIN flat f USING (doc_id))
         |SELECT doc_id, len(ids) AS n_tokens,
         | len(list_filter(ids, x -> x = 1)) AS n_unk,
         | array_to_string(ids, ' ') AS ids_str
         |FROM final""".stripMargin
    },

    "dedup_simhash" -> simhashSql(n = 8, maxHamming = 3),

    "token_bpe" ->
      s"""SELECT doc_id,
         | CASE WHEN length(regexp_replace(text, '^\\s+|\\s+$$', '', 'g')) = 0 THEN 0
         |      ELSE CAST(length(string_split_regex(regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+')) AS BIGINT) END AS n_ws_tokens,
         | CAST(len(regexp_extract_all(text, '${graft.functions.TextFunctions.BpeTokenPattern}')) AS BIGINT) AS n_bpe_tokens
         |FROM documents""".stripMargin,

    "normalize_ws" ->
      """SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   '\n[ \t]+\n', chr(10)||chr(10), 'g'),
        |   '^\s+|\s+$', '', 'g'),
        |   '\n\s*\n\s*\n*', chr(10)||chr(10), 'g') AS normalized,
        | CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN ' '
        |      ELSE regexp_replace(text, '^\s+|\s+$', '', 'g') END AS coerced
        |FROM documents""".stripMargin,

    "sim_l2_batchrel" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | d AS (SELECT vec_id AS id, list_distance(CAST(embedding AS DOUBLE[]), qv) AS distance
        |       FROM embeddings, q ORDER BY distance, id LIMIT 10),
        | m AS (SELECT max(distance) AS maxd FROM d)
        |SELECT id, round(distance, 6) AS distance,
        | round(least(greatest(CASE WHEN maxd > 0 THEN 1 - distance/maxd ELSE 1 END, 0), 1), 6) AS similarity_score
        |FROM d, m""".stripMargin,

    "citation_agg" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | h AS (SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS c
        |       FROM embeddings, q ORDER BY c DESC, vec_id LIMIT 50)
        |SELECT d.source, round(min(h.c), 6) AS min_score, round(max(h.c), 6) AS max_score,
        | count(*) AS n_hits
        |FROM h JOIN documents d ON h.vec_id = d.doc_id GROUP BY d.source""".stripMargin,

    "page_ranges" ->
      """WITH p AS (SELECT DISTINCT source, CAST(doc_id % 20 AS BIGINT) AS page FROM documents),
        | g AS (SELECT source, page,
        |        page - row_number() OVER (PARTITION BY source ORDER BY page) AS grp FROM p),
        | r AS (SELECT source, min(page) AS s, max(page) AS e FROM g GROUP BY source, grp)
        |SELECT source,
        | string_agg(CASE WHEN s = e THEN CAST(s AS VARCHAR)
        |             ELSE CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR) END, ', ' ORDER BY s) AS page_ranges
        |FROM r GROUP BY source""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id FROM (
        | SELECT doc_id, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        | FROM documents) WHERE rn = 1""".stripMargin,

    "dedup_jaccard" ->
      """WITH sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | v AS (SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |       FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |SELECT id_a, id_b, round(CAST(i AS DOUBLE) / (s_a + s_b - i), 6) AS jaccard
        |FROM v WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2""".stripMargin,

    // Same pair pipeline as dedup_jaccard, then connected components via
    // a recursive reachability closure: root(id) = min id reachable over
    // the undirected pair graph (UNION set-semantics terminates the
    // recursion; component sizes are small so the closure is tiny).
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | p AS (SELECT id_a, id_b FROM (
        |        SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |        FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2),
        | e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        | reach(id, root) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.id
        | )
        |SELECT id AS doc_id, min(root) AS cluster FROM reach GROUP BY id""".stripMargin,

    // Same pair pipeline, then the exact integer PageRank recurrence
    // of GraphOps.pageRankMicro unrolled: r0 = init, each r{k} one
    // chained CTE — floor division (`//`) at every step makes the
    // fixpoint bit-identical to the Spark loop.
    "dedup_pagerank" -> pageRankSql(iters = 5, seedPred = None),

    // The personalized variant: init/teleport mass restricted to the
    // seed nodes (id % 3 = 0), so rank = graph proximity to the seed
    // set — identical unrolled recurrence, seed-gated CASE terms.
    "ppr_expand" -> pageRankSql(iters = 5, seedPred = Some("id % 3 = 0")),

    // Components + ranks composed into the curation decision: per
    // near-dup cluster keep the max-rank member (ties to smaller id).
    "dedup_canonical" -> dedupCanonicalSql(iters = 5),

    // dedup_clusters' reachability closure rolled up to the size
    // histogram.
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | p AS (SELECT id_a, id_b FROM (
        |        SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |        FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2),
        | e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        | reach(id, root) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.id
        | ),
        | cl AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id)
        |SELECT sz AS cluster_size, count(*) AS n_clusters
        |FROM (SELECT cluster, count(*) AS sz FROM cl GROUP BY cluster)
        |GROUP BY sz""".stripMargin,

    // Int8 quantize→dequantize in the same double-precision operation
    // order as the engine, approximate top-50, exact float rerank.
    "quant_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
        | vi AS (SELECT vec_id, e, unnest(generate_series(1, 64)) AS i FROM v),
        | dims AS (SELECT i, min(e[i]) AS mn, max(e[i]) AS mx FROM vi GROUP BY i),
        | dq AS (SELECT vec_id, vi.i AS i,
        |         CASE WHEN mx = mn THEN mn
        |          ELSE mn + round((e[vi.i] - mn) * 255.0 / (mx - mn)) * (mx - mn) / 255.0
        |         END AS xh
        |        FROM vi JOIN dims ON vi.i = dims.i),
        | xl AS (SELECT vec_id, list(xh ORDER BY i) AS xhat FROM dq GROUP BY vec_id),
        | ap AS (SELECT vec_id, list_cosine_similarity(xhat, qv) AS ac
        |        FROM xl, q ORDER BY ac DESC, vec_id LIMIT 50),
        | re AS (SELECT ap.vec_id, list_cosine_similarity(v.e, q.qv) AS c, ap.ac
        |        FROM ap JOIN v ON ap.vec_id = v.vec_id, q)
        |SELECT vec_id, round(c, 6) AS cosine, round(ac, 6) AS approx_cosine
        |FROM re ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    // Product quantization replayed from raw inputs: codebooks seed
    // from the 16 lowest-id rows per 8-dim subspace, one micro-snapped
    // Lloyd mean update (codes argmin'd on 6dp-rounded distances, ties
    // to the lower code; empty codes keep their seed), reconstruction
    // cosine → top-50, exact float rerank → top-10.
    "pq_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
        | js AS (SELECT unnest(generate_series(0, 7)) AS j),
        | st AS (SELECT (count(*) + 32767) // 32768 AS stride FROM v),
        | tr AS (SELECT v.* FROM v, st WHERE vec_id % stride = 0),
        | seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, e
        |           FROM tr ORDER BY vec_id LIMIT 16),
        | cb0 AS (SELECT j, code, list_slice(e, j*8 + 1, j*8 + 8) AS w FROM seeds, js),
        | sub AS (SELECT vec_id, j, list_slice(e, j*8 + 1, j*8 + 8) AS sv FROM v, js),
        | subtr AS (SELECT vec_id, j, list_slice(e, j*8 + 1, j*8 + 8) AS sv FROM tr, js),
        | a0 AS (SELECT vec_id, j, code,
        |         row_number() OVER (PARTITION BY vec_id, j
        |           ORDER BY round(list_distance(sv, w), 6), code) AS rk
        |        FROM subtr JOIN cb0 USING (j)),
        | as0 AS (SELECT vec_id, j, code FROM a0 WHERE rk = 1),
        | mean1 AS (SELECT j, code, i,
        |            CAST(round(avg(sv[i]) * 1000000) AS BIGINT) / 1000000.0 AS c
        |           FROM as0 JOIN subtr USING (vec_id, j),
        |                (SELECT unnest(generate_series(1, 8)) AS i) ii
        |           GROUP BY j, code, i),
        | newcb AS (SELECT j, code, list(c ORDER BY i) AS w FROM mean1 GROUP BY j, code),
        | cb1 AS (SELECT cb0.j, cb0.code, coalesce(newcb.w, cb0.w) AS w
        |         FROM cb0 LEFT JOIN newcb ON cb0.j = newcb.j AND cb0.code = newcb.code),
        | a1 AS (SELECT vec_id, j, code,
        |         row_number() OVER (PARTITION BY vec_id, j
        |           ORDER BY round(list_distance(sv, w), 6), code) AS rk
        |        FROM sub JOIN cb1 USING (j)),
        | as1 AS (SELECT vec_id, j, code FROM a1 WHERE rk = 1),
        | xh AS (SELECT vec_id, flatten(list(w ORDER BY as1.j)) AS xhat
        |        FROM as1 JOIN cb1 ON as1.j = cb1.j AND as1.code = cb1.code
        |        GROUP BY vec_id),
        | ap AS (SELECT xh.vec_id, round(list_cosine_similarity(xhat, qv), 6) AS ac
        |        FROM xh, q ORDER BY ac DESC, vec_id LIMIT 50),
        | re AS (SELECT ap.vec_id, list_cosine_similarity(v.e, q.qv) AS c, ap.ac
        |        FROM ap JOIN v ON ap.vec_id = v.vec_id, q)
        |SELECT vec_id, round(c, 6) AS cosine, ac AS approx_cosine
        |FROM re ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    // Matryoshka truncated-dim search replayed from raw inputs:
    // prefix-16 cosine (self-normalizing) -> top-50 -> exact full-dim
    // rerank -> top-10.
    "mrl_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
        | ap AS (SELECT vec_id,
        |         round(list_cosine_similarity(list_slice(e, 1, 16), list_slice(qv, 1, 16)), 6) AS ac
        |        FROM v, q ORDER BY ac DESC, vec_id LIMIT 50),
        | re AS (SELECT ap.vec_id, list_cosine_similarity(v.e, q.qv) AS c, ap.ac
        |        FROM ap JOIN v USING (vec_id), q)
        |SELECT vec_id, round(c, 6) AS cosine, ac AS approx_cosine
        |FROM re ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    // IVF-PQ replayed from raw inputs: coarse codebook = the 8
    // lowest-id embeddings (cells 0..7, seed-only), assignment =
    // argmin 6dp-rounded euclidean ties-low; residual = x − cell
    // centroid; fine codebook = the 16 lowest-id rows' residual
    // subvectors per 8-dim subspace (seed-only); probe = top-2 cells
    // by 6dp-rounded centroid cosine ties-low; approx scan scores
    // centroid + decoded residual over probed cells only → top-50;
    // exact rerank → top-10.
    "ivfpq_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
        | cc AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, e AS cw
        |        FROM v ORDER BY vec_id LIMIT 8),
        | ca AS (SELECT vec_id, cell,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY round(list_distance(e, cw), 6), cell) AS rk
        |        FROM v, cc),
        | ab AS (SELECT vec_id, cell FROM ca WHERE rk = 1),
        | res AS (SELECT v.vec_id, ab.cell,
        |          list_transform(generate_series(1, 64), i -> e[i] - cw[i]) AS r
        |         FROM v JOIN ab USING (vec_id) JOIN cc USING (cell)),
        | js AS (SELECT unnest(generate_series(0, 7)) AS j),
        | fs AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, r
        |        FROM res ORDER BY vec_id LIMIT 16),
        | fcb AS (SELECT j, code, list_slice(r, j*8 + 1, j*8 + 8) AS w FROM fs, js),
        | sub AS (SELECT vec_id, j, list_slice(r, j*8 + 1, j*8 + 8) AS sv FROM res, js),
        | asg AS (SELECT vec_id, j, code,
        |          row_number() OVER (PARTITION BY vec_id, j
        |            ORDER BY round(list_distance(sv, w), 6), code) AS rk
        |         FROM sub JOIN fcb USING (j)),
        | a1 AS (SELECT vec_id, j, code FROM asg WHERE rk = 1),
        | xhr AS (SELECT vec_id, flatten(list(w ORDER BY a1.j)) AS rhat
        |         FROM a1 JOIN fcb ON a1.j = fcb.j AND a1.code = fcb.code
        |         GROUP BY vec_id),
        | pr AS (SELECT cell FROM (
        |          SELECT cell, round(list_cosine_similarity(cw, qv), 6) AS cs FROM cc, q)
        |        ORDER BY cs DESC, cell LIMIT 2),
        | ap AS (SELECT res.vec_id,
        |         round(list_cosine_similarity(
        |           list_transform(generate_series(1, 64), i -> cw[i] + rhat[i]), qv), 6) AS ac
        |        FROM res JOIN xhr USING (vec_id)
        |             JOIN cc USING (cell) JOIN pr USING (cell), q
        |        ORDER BY ac DESC, vec_id LIMIT 50),
        | re AS (SELECT ap.vec_id, list_cosine_similarity(v.e, q.qv) AS c, ap.ac
        |        FROM ap JOIN v USING (vec_id), q)
        |SELECT vec_id, round(c, 6) AS cosine, ac AS approx_cosine
        |FROM re ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    // DuckDB's native ASOF JOIN — an independent implementation of the
    // operator (not a replay of the engine's union+window plan).
    "q11_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        | v AS (SELECT user_id, ts, value FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        | coalesce(epoch_us(v.ts), -1) AS asof_ts_us,
        | coalesce(CAST(round(v.value * 100) AS BIGINT), -1) AS asof_value_cents
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin,

    // Naive range-predicate join — correct at sf, independent of the
    // engine's grain-bucketed plan.
    "q12_interval_join" ->
      """WITH p AS (SELECT event_id AS p_event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        | v AS (SELECT event_id AS v_event_id, user_id, ts FROM events WHERE event_type = 'view')
        |SELECT p.p_event_id, v.v_event_id, p.user_id,
        | epoch_us(p.ts) AS p_ts_us, epoch_us(v.ts) AS v_ts_us
        |FROM p JOIN v ON p.user_id = v.user_id
        | AND v.ts >= p.ts AND v.ts < p.ts + INTERVAL 30 MINUTE""".stripMargin,

    "stratified_sample" ->
      """SELECT lang, count(*) AS n_kept FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 <
        |  CAST((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'zh' THEN 0.25 ELSE 0.75 END) * 10000 AS BIGINT)
        |GROUP BY lang""".stripMargin,

    "stratified_quota" ->
      """SELECT lang, sample_rank, doc_id FROM (
        | SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |   ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT), doc_id) AS sample_rank
        | FROM documents) WHERE sample_rank <= 10""".stripMargin,

    // Same replace-length occurrence counting as lang_id; planted docs
    // (negative ids) exercise each rule. Booleans as 0/1 ints.
    "quality_filter" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (-1, 'tiny doc'),
        |    (-2, '#### $$$$ %%%% {{{{ }}}} <<<< >>>> #### $$$$ %%%%'),
        |    (-3, repeat('x y z w v u t s r q ', 40)),
        |    (-4, 'the cat sat on the mat and it is a fine day in the sun')) t(doc_id, text)),
        | s AS (SELECT doc_id, text,
        |   regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed,
        |   ' ' || lower(text) || ' ' AS padded FROM d),
        | u AS (SELECT doc_id, text, padded,
        |   CASE WHEN length(trimmed) = 0 THEN 0
        |        ELSE CAST(len(string_split_regex(trimmed, '\s+')) AS BIGINT) END AS n_words
        |   FROM s),
        | m AS (SELECT doc_id, n_words,
        |   CASE WHEN n_words = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / n_words END AS awl,
        |   CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' a ', ''))) / 3 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' of ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' and ', ''))) / 5 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' to ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' in ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' is ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' it ', ''))) / 4 AS BIGINT) AS n_stop,
        |   (length(text) - length(replace(text, '#', '')))
        |   + (length(text) - length(replace(text, '$', '')))
        |   + (length(text) - length(replace(text, '%', '')))
        |   + (length(text) - length(replace(text, '{', '')))
        |   + (length(text) - length(replace(text, '}', '')))
        |   + (length(text) - length(replace(text, '<', '')))
        |   + (length(text) - length(replace(text, '>', ''))) AS n_sym
        |   FROM u),
        | f AS (SELECT doc_id, n_words, awl,
        |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_words END AS stop_frac,
        |   CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_sym AS DOUBLE) / n_words END AS sym_ratio
        |   FROM m)
        |SELECT doc_id, n_words,
        | CAST(n_words >= 8 AND n_words <= 100000 AS INT) AS ok_word_count,
        | CAST(awl >= 2.0 AND awl <= 12.0 AS INT) AS ok_word_len,
        | CAST(sym_ratio <= 0.1 AS INT) AS ok_symbol,
        | CAST(stop_frac >= 0.02 AS INT) AS ok_stopword,
        | CAST(n_words >= 8 AND n_words <= 100000 AND awl >= 2.0 AND awl <= 12.0
        |   AND sym_ratio <= 0.1 AND stop_frac >= 0.02 AS INT) AS passes_quality,
        | round(awl, 6) AS avg_word_len,
        | round(stop_frac, 6) AS stopword_frac
        |FROM f""".stripMargin,

    // Chained min-per-user completions, strictly ordered (ts > prev).
    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        | c0 AS (SELECT user_id, min(ts) AS t0 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        | c1 AS (SELECT e.user_id, min(ts) AS t1 FROM e JOIN c0 USING (user_id)
        |        WHERE event_type = 'view' AND ts > t0 GROUP BY e.user_id),
        | c2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN c1 USING (user_id)
        |        WHERE event_type = 'purchase' AND ts > t1 GROUP BY e.user_id)
        |SELECT 0 AS step_idx, 'signup' AS step, (SELECT count(*) FROM c0) AS n_users
        |UNION ALL SELECT 1, 'view', (SELECT count(*) FROM c1)
        |UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM c2)""".stripMargin,

    // identical semantics via the single-shuffle FunnelTimes aggregate;
    // the k-join CTE chain IS the semantic spec for both paths
    "funnel_steps_agg" ->
      """WITH e AS (SELECT user_id, event_type, ts FROM events),
        | c0 AS (SELECT user_id, min(ts) AS t0 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        | c1 AS (SELECT e.user_id, min(ts) AS t1 FROM e JOIN c0 USING (user_id)
        |        WHERE event_type = 'view' AND ts > t0 GROUP BY e.user_id),
        | c2 AS (SELECT e.user_id, min(ts) AS t2 FROM e JOIN c1 USING (user_id)
        |        WHERE event_type = 'purchase' AND ts > t1 GROUP BY e.user_id)
        |SELECT 0 AS step_idx, 'signup' AS step, (SELECT count(*) FROM c0) AS n_users
        |UNION ALL SELECT 1, 'view', (SELECT count(*) FROM c1)
        |UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM c2)""".stripMargin,

    // exact integer delay stats (epoch-MICROsecond deltas — DuckDB's
    // timestamp precision; the engine truncates ns div 1000 to match)
    "funnel_timing" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tn FROM events),
        | c0 AS (SELECT user_id, min(tn) AS t0 FROM e WHERE event_type = 'signup' GROUP BY user_id),
        | c1 AS (SELECT e.user_id, min(tn) AS t1 FROM e JOIN c0 USING (user_id)
        |        WHERE event_type = 'view' AND tn > t0 GROUP BY e.user_id),
        | c2 AS (SELECT e.user_id, min(tn) AS t2 FROM e JOIN c1 USING (user_id)
        |        WHERE event_type = 'purchase' AND tn > t1 GROUP BY e.user_id)
        |SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_converted,
        |  CAST(sum(t1 - t0) AS BIGINT) AS sum_delta, min(t1 - t0) AS min_delta, max(t1 - t0) AS max_delta
        | FROM c1 JOIN c0 USING (user_id)
        |UNION ALL
        |SELECT 2, 'purchase', count(*),
        |  CAST(sum(t2 - t1) AS BIGINT), min(t2 - t1), max(t2 - t1)
        | FROM c2 JOIN c1 USING (user_id)""".stripMargin,

    "cohort_retention" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        | f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
        | a AS (SELECT DISTINCT d.user_id, f.cohort_day, d.day - f.cohort_day AS day_offset
        |       FROM d JOIN f USING (user_id))
        |SELECT cohort_day, day_offset, count(*) AS n_active_users
        |FROM a GROUP BY cohort_day, day_offset""".stripMargin,

    // Two Lloyd iterations replayed: init = 4 lowest-id vectors,
    // assignment = argmin in-order squared-diff sum (ties to the lower
    // cluster), centroid update snapped to exact micro-units — the
    // identical doubles the engine broadcasts.
    "kmeans_clusters" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e
        |        FROM v ORDER BY vec_id LIMIT 4),
        | d1 AS (SELECT v.vec_id, c.cl,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
        |        FROM v CROSS JOIN c0 c),
        | a1 AS (SELECT vec_id, cl FROM d1
        |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1),
        | m1 AS (SELECT cl, i, CAST(round(avg(e[i]) * 1000000) AS BIGINT) / 1000000.0 AS c
        |        FROM (SELECT a1.cl, v.e, unnest(generate_series(1, 64)) AS i
        |              FROM a1 JOIN v USING (vec_id))
        |        GROUP BY cl, i),
        | c1 AS (SELECT cl, list(c ORDER BY i) AS e FROM m1 GROUP BY cl),
        | d2 AS (SELECT v.vec_id, c.cl,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
        |        FROM v CROSS JOIN c1 c),
        | a2 AS (SELECT vec_id, cl, sqrt(d2) AS d FROM d2
        |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1)
        |SELECT cl AS cluster, count(*) AS n_members,
        | round(avg(d), 6) AS mean_dist, min(vec_id) AS min_member
        |FROM a2 GROUP BY cl""".stripMargin,

    // Same two-iteration k-means replay as kmeans_clusters, extended
    // with the centroid-silhouette: a = assignment (min) distance,
    // b = runner-up (rank by (d2, cl) — sqrt is monotonic so the
    // ordering matches the engine's (d, cl) struct sort), s rounded
    // per row BEFORE the cluster mean.
    "cluster_silhouette" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e
        |        FROM v ORDER BY vec_id LIMIT 4),
        | d1 AS (SELECT v.vec_id, c.cl,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
        |        FROM v CROSS JOIN c0 c),
        | a1 AS (SELECT vec_id, cl FROM d1
        |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1),
        | m1 AS (SELECT cl, i, CAST(round(avg(e[i]) * 1000000) AS BIGINT) / 1000000.0 AS c
        |        FROM (SELECT a1.cl, v.e, unnest(generate_series(1, 64)) AS i
        |              FROM a1 JOIN v USING (vec_id))
        |        GROUP BY cl, i),
        | c1 AS (SELECT cl, list(c ORDER BY i) AS e FROM m1 GROUP BY cl),
        | dd AS (SELECT v.vec_id, c.cl,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
        |        FROM v CROSS JOIN c1 c),
        | rk AS (SELECT vec_id, cl, sqrt(d2) AS d,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
        |        FROM dd),
        | ab AS (SELECT a.vec_id, a.cl AS cluster, a.d AS a_d, b.d AS b_d
        |        FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
        | s AS (SELECT cluster, vec_id,
        |        round(CASE WHEN greatest(a_d, b_d) = 0 THEN 0
        |              ELSE (b_d - a_d) / greatest(a_d, b_d) END, 6) AS sv
        |       FROM ab)
        |SELECT cluster, count(*) AS n_members,
        | round(avg(sv), 6) AS mean_silhouette, round(min(sv), 6) AS min_silhouette
        |FROM s GROUP BY cluster""".stripMargin,

    // Same operation order as the engine: Lucene idf, exact integer
    // avgdl, scores rounded to 6 dp BEFORE ranking, ties by id.
    "bm25_search" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed,
        |    string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS words
        |   FROM documents),
        | base AS (SELECT doc_id,
        |    CASE WHEN length(trimmed) = 0 THEN 0
        |         ELSE CAST(len(words) AS BIGINT) END AS dl_i,
        |    len(list_filter(words, x -> x = 'spark')) AS tf0,
        |    len(list_filter(words, x -> x = 'join')) AS tf1,
        |    len(list_filter(words, x -> x = 'window')) AS tf2
        |   FROM w),
        | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(dl_i) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |   FROM base),
        | sc AS (SELECT doc_id, round(
        |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |   FROM (SELECT doc_id, CAST(dl_i AS DOUBLE) AS dl,
        |          CAST(tf0 AS DOUBLE) AS tf0, CAST(tf1 AS DOUBLE) AS tf1, CAST(tf2 AS DOUBLE) AS tf2,
        |          n, avgdl, df0, df1, df2
        |         FROM base, stats))
        |SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    // the indexed path reproduces the scan path bit-for-bit: same oracle
    "bm25_indexed" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed,
        |    string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS words
        |   FROM documents),
        | base AS (SELECT doc_id,
        |    CASE WHEN length(trimmed) = 0 THEN 0
        |         ELSE CAST(len(words) AS BIGINT) END AS dl_i,
        |    len(list_filter(words, x -> x = 'spark')) AS tf0,
        |    len(list_filter(words, x -> x = 'join')) AS tf1,
        |    len(list_filter(words, x -> x = 'window')) AS tf2
        |   FROM w),
        | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(dl_i) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |   FROM base),
        | sc AS (SELECT doc_id, round(
        |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |   FROM (SELECT doc_id, CAST(dl_i AS DOUBLE) AS dl,
        |          CAST(tf0 AS DOUBLE) AS tf0, CAST(tf1 AS DOUBLE) AS tf1, CAST(tf2 AS DOUBLE) AS tf2,
        |          n, avgdl, df0, df1, df2
        |         FROM base, stats))
        |SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "latest_event" ->
      """SELECT user_id, epoch_us(ts) AS last_ts_us, event_type AS last_type,
        | CAST(round(value * 100) AS BIGINT) AS last_value_cents
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    // Same md5-prefix rolling-hash cut points, replayed with DuckDB
    // list ops; chunks are substrings between consecutive cuts.
    "chunk_cdc" ->
      """WITH c AS (SELECT doc_id, text,
        |    [1] || list_filter(
        |      CASE WHEN length(text) - 7 >= 2
        |           THEN range(2, length(text) - 7 + 1) ELSE [] END,
        |      i -> CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) % 64 = 0)
        |    || [length(text) + 1] AS cuts
        |   FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(j AS BIGINT) AS chunk_idx,
        | substring(text, CAST(cuts[j] AS INT), CAST(cuts[j + 1] - cuts[j] AS INT)) AS chunk_text
        |FROM (SELECT doc_id, text, cuts, unnest(generate_series(1, len(cuts) - 1)) AS j FROM c)""".stripMargin,

    // CDC dedup stability end-to-end: original + prefix-edited corpus,
    // same cut-point replay, then exact chunk-text dedup counters.
    "chunk_cdc_dedup" ->
      """WITH docs AS (
        |  SELECT 'o:' || CAST(doc_id AS VARCHAR) AS cid, text FROM documents
        |  UNION ALL
        |  SELECT 'e:' || CAST(doc_id AS VARCHAR) AS cid, 'prefix edit ' || text FROM documents),
        | c AS (SELECT cid, text,
        |    [1] || list_filter(
        |      CASE WHEN length(text) - 7 >= 2
        |           THEN range(2, length(text) - 7 + 1) ELSE [] END,
        |      i -> CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) % 64 = 0)
        |    || [length(text) + 1] AS cuts
        |   FROM docs WHERE length(text) > 0),
        | chunks AS (SELECT cid,
        |    substring(text, CAST(cuts[j] AS INT), CAST(cuts[j + 1] - cuts[j] AS INT)) AS chunk_text
        |   FROM (SELECT cid, text, cuts, unnest(generate_series(1, len(cuts) - 1)) AS j FROM c)),
        | tot AS (SELECT CAST(count(*) AS BIGINT) AS total_chunks,
        |    CAST(sum(CASE WHEN cid LIKE 'o:%' THEN 1 ELSE 0 END) AS BIGINT) AS orig_chunks,
        |    CAST(sum(CASE WHEN cid LIKE 'e:%' THEN 1 ELSE 0 END) AS BIGINT) AS edited_chunks
        |   FROM chunks),
        | surv AS (SELECT CAST(count(DISTINCT chunk_text) AS BIGINT) AS surviving_chunks FROM chunks),
        | re AS (SELECT CAST(count(*) AS BIGINT) AS reused_chunks
        |   FROM chunks WHERE cid LIKE 'e:%'
        |    AND chunk_text IN (SELECT chunk_text FROM chunks WHERE cid LIKE 'o:%'))
        |SELECT total_chunks, orig_chunks, edited_chunks, surviving_chunks, reused_chunks,
        | round(CAST(reused_chunks AS DOUBLE) / edited_chunks, 6) AS reuse_pct
        |FROM tot, surv, re""".stripMargin,

    "lm_score" ->
      """WITH ww AS (SELECT doc_id, w
        |   FROM (SELECT doc_id,
        |          unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
        |         FROM documents)
        |   WHERE length(w) > 0),
        | f AS (SELECT w, count(*) AS wc FROM ww GROUP BY w),
        | t AS (SELECT count(*) AS tc FROM ww)
        |SELECT doc_id, count(*) AS n_tokens,
        | round(sum(ln(CAST(wc AS DOUBLE) / CAST(tc AS DOUBLE))) / count(*), 6) AS mean_logprob
        |FROM ww JOIN f USING (w), t GROUP BY doc_id""".stripMargin,

    // RRF over the bm25 top-50 and cosine top-50: ranks assigned on
    // 6 dp-rounded scores (id ties) on both sides; each RRF term is
    // exact 1/(60+rank) rational arithmetic.
    "hybrid_search" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed,
        |    string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS words
        |   FROM documents),
        | base AS (SELECT doc_id,
        |    CASE WHEN length(trimmed) = 0 THEN 0
        |         ELSE CAST(len(words) AS BIGINT) END AS dl_i,
        |    len(list_filter(words, x -> x = 'spark')) AS tf0,
        |    len(list_filter(words, x -> x = 'join')) AS tf1,
        |    len(list_filter(words, x -> x = 'window')) AS tf2
        |   FROM w),
        | stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(dl_i) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2
        |   FROM base),
        | sc AS (SELECT doc_id, round(
        |      ln((n - df0 + 0.5) / (df0 + 0.5) + 1.0) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df1 + 0.5) / (df1 + 0.5) + 1.0) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln((n - df2 + 0.5) / (df2 + 0.5) + 1.0) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
        |   FROM (SELECT doc_id, CAST(dl_i AS DOUBLE) AS dl,
        |          CAST(tf0 AS DOUBLE) AS tf0, CAST(tf1 AS DOUBLE) AS tf1, CAST(tf2 AS DOUBLE) AS tf2,
        |          n, avgdl, df0, df1, df2
        |         FROM base, stats)),
        | bmtop AS (SELECT doc_id, bm25 FROM sc WHERE bm25 > 0
        |           ORDER BY bm25 DESC, doc_id LIMIT 50),
        | bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bmtop),
        | q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
        | ve AS (SELECT e.vec_id AS doc_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv) AS c
        |        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id, q),
        | vtop AS (SELECT doc_id, round(c, 6) AS cr FROM ve ORDER BY c DESC, doc_id LIMIT 50),
        | vr AS (SELECT doc_id, row_number() OVER (ORDER BY cr DESC, doc_id) AS rank FROM vtop),
        | u AS (SELECT doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS c FROM bmr
        |       UNION ALL SELECT doc_id, 1.0 / (60.0 + CAST(rank AS DOUBLE)) FROM vr)
        |SELECT doc_id, round(sum(c), 6) AS rrf, count(*) AS n_lists
        |FROM u GROUP BY doc_id ORDER BY sum(c) DESC, doc_id LIMIT 20""".stripMargin,

    // The dedup_clusters reachability closure plus arg-max survivor
    // selection: per cluster, the member with the most characters
    // (ties to the smaller doc id).
    "dedup_best_keep" ->
      """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | p AS (SELECT id_a, id_b FROM (
        |        SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |        FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2),
        | e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        | reach(id, root) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.id
        | ),
        | cl AS (SELECT id AS doc_id, min(root) AS cluster FROM reach GROUP BY id),
        | j AS (SELECT cl.cluster, cl.doc_id, d.n_chars FROM cl JOIN documents d USING (doc_id))
        |SELECT cluster, doc_id AS keep_id, n_chars AS keep_n_chars,
        | count(*) OVER (PARTITION BY cluster) AS n_members
        |FROM j QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id ASC) = 1""".stripMargin,

    // Per-group mean embedding, L2-normalized, emitted as integer
    // micro-units (','-joined) so float formatting can't skew the hash.
    "doc_centroids" ->
      """WITH e AS (SELECT vec_id % 25 AS group_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | ei AS (SELECT group_id, i, avg(v[i]) AS c
        |        FROM (SELECT group_id, v, unnest(generate_series(1, 64)) AS i FROM e)
        |        GROUP BY group_id, i),
        | ce AS (SELECT group_id, list(c ORDER BY i) AS raw FROM ei GROUP BY group_id),
        | nm AS (SELECT group_id, raw,
        |         sqrt(list_sum(list_transform(raw, y -> y * y))) AS nrm FROM ce)
        |SELECT group_id,
        | array_to_string(list_transform(raw,
        |   x -> CAST(CAST(round((CASE WHEN nrm = 0 THEN x ELSE x / nrm END) * 1000000.0) AS BIGINT) AS VARCHAR)), ',') AS centroid_u
        |FROM nm""".stripMargin,

    "top_ngrams" ->
      """WITH g AS (SELECT doc_id, array_to_string(words[i:i+2], ' ') AS gram
        |           FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
        |                 FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)
        |                 WHERE len(words) >= 3))
        |SELECT gram, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY gram ORDER BY n_occurrences DESC, gram LIMIT 50""".stripMargin,

    // tf·ln(N/df), scores rounded to 6dp BEFORE ranking on both sides
    // so a 1-ulp ln() difference cannot flip a rank; ties break on w.
    "tfidf_keywords" ->
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        | wnz AS (SELECT doc_id, w FROM w WHERE w <> ''),
        | tf AS (SELECT doc_id, w, count(*) AS tf FROM wnz GROUP BY doc_id, w),
        | dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        | nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
        | sc AS (SELECT doc_id, tf.w AS w,
        |         round(CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
        |        FROM tf JOIN dfq ON tf.w = dfq.w, nd),
        | rk AS (SELECT doc_id, w, tfidf,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w) AS rk FROM sc)
        |SELECT doc_id, w AS keyword, rk, tfidf FROM rk WHERE rk <= 3""".stripMargin,

    // Duplicated-substring spans: positions whose 5-word gram occurs in
    // >= 2 distinct docs, island-merged (pos - row_number() constant on
    // a consecutive run) into maximal spans. Self-contained raw-input
    // recompute of the engine's relational exact-substring pass.
    "dup_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        | g AS (SELECT doc_id, i AS pos,
        |        CAST('0x' || substring(md5(array_to_string(ws[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
        |             FROM w WHERE len(ws) >= 5)),
        | cap AS (SELECT CASE WHEN count(*) <= 50000 THEN 9223372036854775807
        |          ELSE greatest(CAST(floor(count(*) * 0.013) AS BIGINT), 6500) END AS c
        |         FROM documents),
        | d AS (SELECT gh FROM (SELECT DISTINCT doc_id, gh FROM g)
        |       GROUP BY gh HAVING count(*) >= 2
        |        AND count(*) <= (SELECT c FROM cap)),
        | p AS (SELECT DISTINCT doc_id, pos FROM g JOIN d USING (gh)),
        | i AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM p)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
        | max(pos) + 4 - min(pos) + 1 AS span_words
        |FROM i GROUP BY doc_id, grp""".stripMargin,

    // Duplicated-substring removal: each duplicated gram's keeper is
    // its min doc id; a word is dropped iff covered by a duplicated
    // gram kept by another doc. Rebuild joins kept words with single
    // spaces (both sides' convention); every doc row survives.
    "dedup_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        | g AS (SELECT doc_id, i AS pos,
        |        CAST('0x' || substring(md5(array_to_string(ws[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
        |             FROM w WHERE len(ws) >= 5)),
        | cap AS (SELECT CASE WHEN count(*) <= 50000 THEN 9223372036854775807
        |          ELSE greatest(CAST(floor(count(*) * 0.013) AS BIGINT), 6500) END AS c
        |         FROM documents),
        | k AS (SELECT gh, min(doc_id) AS keeper FROM (SELECT DISTINCT doc_id, gh FROM g)
        |       GROUP BY gh HAVING count(*) >= 2
        |        AND count(*) <= (SELECT c FROM cap)),
        | drops AS (SELECT DISTINCT doc_id, wpos FROM (
        |           SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS wpos
        |           FROM g JOIN k USING (gh) WHERE doc_id <> keeper)),
        | words AS (SELECT doc_id, i AS wpos, ws[i] AS word
        |           FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM w)),
        | kept AS (SELECT words.doc_id, wpos, word FROM words
        |          ANTI JOIN drops USING (doc_id, wpos)),
        | agg AS (SELECT doc_id, count(*) AS n_kept,
        |          array_to_string(list(word ORDER BY wpos), ' ') AS cleaned_text
        |         FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, coalesce(agg.cleaned_text, '') AS cleaned_text,
        | coalesce(agg.n_kept, 0) AS n_kept,
        | len(w.ws) - coalesce(agg.n_kept, 0) AS n_dropped
        |FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id""".stripMargin,

    // Word 5-gram overlap vs the doc_id%10==0 benchmark slice; grams
    // hashed with the portable md5-prefix family on both sides.
    "decontaminate" ->
      """WITH wdocs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        | grams AS (SELECT doc_id,
        |            CAST('0x' || substring(md5(array_to_string(words[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |           FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i
        |                 FROM wdocs WHERE len(words) >= 5)),
        | dg AS (SELECT DISTINCT doc_id, gh FROM grams),
        | bench AS (SELECT DISTINCT gh FROM dg WHERE doc_id % 10 = 0)
        |SELECT doc_id, count(*) AS n_contaminated_grams
        |FROM dg WHERE doc_id % 10 <> 0 AND gh IN (SELECT gh FROM bench)
        |GROUP BY doc_id""".stripMargin,

    // Word-level repetition: top-word fraction over non-empty words,
    // distinct ratio, duplicate 5-gram fraction (grams built from the
    // UNfiltered split array, mirroring the engine exactly).
    "repetition_stats" ->
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        | wnz AS (SELECT doc_id, w FROM w WHERE w <> ''),
        | wc AS (SELECT doc_id, w, count(*) AS c FROM wnz GROUP BY doc_id, w),
        | wa AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, max(c) AS top FROM wc GROUP BY doc_id),
        | g AS (SELECT doc_id, array_to_string(words[i:i+4], ' ') AS g
        |       FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i
        |             FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents)
        |             WHERE len(words) >= 5)),
        | ga AS (SELECT doc_id, count(*) AS n_grams, count(DISTINCT g) AS n_distinct_grams FROM g GROUP BY doc_id)
        |SELECT wa.doc_id,
        | round(CAST(top AS DOUBLE) / n_words, 6) AS top_word_frac,
        | round(CAST(n_distinct AS DOUBLE) / n_words, 6) AS distinct_word_ratio,
        | round(coalesce(1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams, 0.0), 6) AS dup_gram_frac
        |FROM wa LEFT JOIN ga ON wa.doc_id = ga.doc_id""".stripMargin,

    // PII enrich + sequential redaction; each count runs on the text
    // after the preceding categories were replaced, like the engine.
    "pii_redact" ->
      """WITH e AS (SELECT doc_id,
        |   text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1555010'
        |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |        || ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1' AS t0
        |   FROM documents),
        | s1 AS (SELECT doc_id, t0,
        |   CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |   regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |   FROM e),
        | s2 AS (SELECT doc_id, n_email,
        |   CAST(len(regexp_extract_all(t1, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4,
        |   regexp_replace(t1, '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS t2
        |   FROM s1)
        |SELECT doc_id, n_email, n_ipv4,
        | CAST(len(regexp_extract_all(t2, '\+?\d[\d().-]{7,}\d')) AS BIGINT) AS n_phone,
        | regexp_replace(t2, '\+?\d[\d().-]{7,}\d', '<PHONE>', 'g') AS redacted
        |FROM s2""".stripMargin,

    "dedup_minhash_lsh" -> minhashLshSql(numHashes = 16, rowsPerBand = 4,
      dfFraction = graft.Queries.MinhashDfFraction, dfFloor = graft.Queries.MinhashDfFloor),

    // Full ladder replay: exact dedup -> jaccard (corpus-fraction cap,
    // floor+16 floor both sides) on survivors -> drop higher-id pair ends.
    "dedup_corpus" ->
      """WITH ex AS (SELECT doc_id, text FROM (
        |   SELECT doc_id, text, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |   FROM documents) WHERE rn = 1),
        | cap AS (SELECT greatest(CAST(floor(count(*) * 0.013) AS BIGINT), 16) AS c FROM ex),
        | sh AS (SELECT DISTINCT doc_id AS sid,
        |         CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |         FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM ex)),
        | dfc AS (SELECT h, count(*) AS cnt FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h), cap WHERE cnt <= cap.c),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | v AS (SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |       FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b),
        | dropids AS (SELECT DISTINCT id_b FROM v WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.5)
        |SELECT doc_id FROM ex WHERE doc_id NOT IN (SELECT id_b FROM dropids)""".stripMargin,

    // Ladder + transitive collapse: the dedup_corpus pair pipeline,
    // closed under reachability; only each component's min id survives.
    "dedup_corpus_transitive" ->
      """WITH RECURSIVE ex AS (SELECT doc_id, text FROM (
        |   SELECT doc_id, text, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |   FROM documents) WHERE rn = 1),
        | cap AS (SELECT greatest(CAST(floor(count(*) * 0.013) AS BIGINT), 16) AS c FROM ex),
        | sh AS (SELECT DISTINCT doc_id AS sid,
        |         CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |         FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM ex)),
        | dfc AS (SELECT h, count(*) AS cnt FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h), cap WHERE cnt <= cap.c),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | p AS (SELECT id_a, id_b FROM (
        |        SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |        FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.5),
        | e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        | reach(id, root) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.id
        | ),
        | cl AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id)
        |SELECT doc_id FROM ex
        |WHERE doc_id NOT IN (SELECT id FROM cl WHERE id <> cluster)""".stripMargin,

    // Id slice vec_id < 2048 on both sides (vacuous at sf ≤ 0.1)
    // mirrors the engine's constant-cost bound on the exact twin.
    "dedup_embedding" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 2048 AND b.vec_id < 2048
        | AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4""".stripMargin,

    "dedup_embedding_bucketed" -> dedupEmbeddingBucketedSql(
      dim = 64, numPlanes = graft.Queries.EmbBucketPlanes,
      bandBits = graft.Queries.EmbBucketBandBits, threshold = 0.4),

    "text_stats" ->
      """WITH s AS (SELECT doc_id, text,
        |  regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed FROM documents),
        | u AS (SELECT doc_id, text,
        |  CASE WHEN length(trimmed) = 0 THEN 0
        |       ELSE CAST(length(string_split_regex(trimmed, '\s+')) AS BIGINT) END AS n_tokens
        |  FROM s)
        |SELECT doc_id, n_tokens,
        | round(CASE WHEN n_tokens = 0 THEN 0.0
        |   ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / CAST(n_tokens AS DOUBLE) END, 6) AS avg_token_len,
        | round(CASE WHEN length(text) = 0 THEN 0.0
        |   ELSE CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END, 6) AS punct_ratio,
        | round(CASE WHEN length(text) = 0 THEN 0.0
        |   ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END, 6) AS digit_ratio,
        | round(least(greatest(
        |   least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
        |   * (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END) * 4.0, 1.0) * 0.5)
        |   * (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END) * 4.0, 1.0) * 0.5)
        |  , 0.0), 1.0), 6) AS quality
        |FROM u""".stripMargin,

    "lang_id" -> langIdSql("SELECT doc_id, {CASE} AS lang_pred FROM scored"),

    "fingerprint" ->
      """WITH sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | r AS (SELECT sid, h FROM sh QUALIFY row_number() OVER (PARTITION BY sid ORDER BY h) <= 4)
        |SELECT sid AS doc_id, string_agg(CAST(h AS VARCHAR), ',' ORDER BY h) AS fingerprint FROM r GROUP BY sid""".stripMargin,

    "hash_split" ->
      """SELECT split, count(*) AS n_docs FROM (
        | SELECT CASE WHEN b < 10 THEN 'test' WHEN b < 20 THEN 'val' ELSE 'train' END AS split
        | FROM (SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
        |       FROM documents)) GROUP BY split""".stripMargin,

    "mix_corpus" ->
      """SELECT lang, count(*) AS n_docs FROM documents
        |WHERE lang = 'en'
        |   OR CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 2500
        |GROUP BY lang""".stripMargin,

    "token_packing" ->
      """WITH base AS (SELECT doc_id, doc_id % 8 AS shard,
        |  CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
        |       ELSE CAST(length(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) END AS n_tokens
        | FROM documents)
        |SELECT doc_id, shard, n_tokens,
        | CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
        | CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096 AS BIGINT) AS bin
        |FROM base""".stripMargin,

    // token-budget prefix cut replayed from raw inputs: portable-hash
    // priority order per language, inclusive running token total,
    // keep while <= 3000 (first crosser blocks the rest — the window
    // cumsum makes that automatic)
    "token_budget_sample" ->
      """WITH d AS (SELECT doc_id, lang,
        |  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |  CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
        |       ELSE CAST(length(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) END AS n_tokens
        | FROM documents),
        | c AS (SELECT lang, doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |       FROM d)
        |SELECT lang, doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 3000""".stripMargin,

    "corpus_stats" -> langIdSql(
      """SELECT {CASE} AS lang_pred, count(*) AS n_docs,
        | CAST(sum(CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
        |      ELSE CAST(length(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) END) AS BIGINT) AS total_tokens,
        | count(DISTINCT text) AS distinct_docs
        |FROM scored GROUP BY 1""".stripMargin),

    // linear probe replay: identical weight literals (Double.toString
    // round-trips exactly), same widened-double inner product, score
    // rounded BEFORE the keep threshold
    "quality_classifier" -> {
      val w = graft.Queries.ProbeWeights.map(_.toString).mkString("[", ", ", "]")
      s"""SELECT vec_id,
         | round(1.0 / (1.0 + exp(-(list_inner_product(CAST(embedding AS DOUBLE[]), $w) + -0.05))), 6) AS score,
         | (round(1.0 / (1.0 + exp(-(list_inner_product(CAST(embedding AS DOUBLE[]), $w) + -0.05))), 6) >= 0.5) AS keep
         |FROM embeddings""".stripMargin
    },

    // approx_ok is the MEASURED HLL error bound; the oracle's literal
    // TRUE makes the hash gate fail if the sketch drifts out of bound
    "corpus_distinct_approx" ->
      """SELECT lang, count(DISTINCT text) AS n_exact, TRUE AS approx_ok
        |FROM documents GROUP BY lang""".stripMargin,

    // HLL inclusion-exclusion overlap: exact side recomputed, gate
    // pinned TRUE (the estimate lives Spark-side; drift flips the
    // boolean and breaks the hash).
    "corpus_overlap_approx" ->
      """WITH t AS (SELECT DISTINCT doc_id % 2 AS side, tok
        |   FROM (SELECT doc_id, unnest(list_filter(
        |     string_split_regex(trim(text), '\s+'), w -> w <> '')) AS tok
        |    FROM documents))
        |SELECT CAST(count(*) AS BIGINT) AS n_exact_overlap, TRUE AS approx_ok
        |FROM (SELECT tok FROM t GROUP BY tok HAVING count(DISTINCT side) = 2)""".stripMargin,

    "mm_media_meta" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_size,
        | sha256(text) AS content_sha256 FROM documents""".stripMargin,

    // Real AVI mux -> demux round trip: the oracle replays only the
    // construction arithmetic (256-byte frame slicing of the text), so
    // the hash matches only if the container parser returns exactly
    // the muxed frames in order.
    "mm_frames" ->
      """WITH d AS (SELECT doc_id, strlen(text) AS bl FROM documents),
        | f AS (SELECT doc_id, bl, CAST(ceil(bl/256.0) AS BIGINT) AS nf FROM d WHERE bl > 0)
        |SELECT doc_id, i AS frame_index, CAST(least(256, bl - i*256) AS BIGINT) AS frame_len
        |FROM (SELECT doc_id, bl, unnest(generate_series(0, nf - 1, 2)) AS i FROM f)""".stripMargin,

    // SemDeDup: LSH-sharded kmeans assignment replay — shard bits b
    // derived from count(*) with exact INTEGER arithmetic (bit-length
    // of (n-1)//2048, no cross-engine log2 rounding), the +-1 sign
    // projections interpolated as literals from the SAME
    // Clustering.shardProjections the engine uses, then the fixed
    // k=4 x 2-iteration exact-snapped Lloyd trajectory PER SHARD +
    // within-cell min-id greedy survivor at cosine >= 0.4. b = 0 at
    // sf <= 0.1 (n <= 2048): shard = K % 1 = 0 and the replay
    // degenerates to the classic single-shard k=4 path.
    "semantic_dedup" -> {
      val dim = 64; val maxBits = 16
      val wLits = graft.ops.Clustering.shardProjections(maxBits, dim)
        .map(_.mkString("(CAST([", ", ", "] AS DOUBLE[]))"))
      val signTerms = (0 until maxBits).map { j =>
        s"(CASE WHEN list_sum(list_transform(generate_series(1, $dim), i -> e[i] * ${wLits(j)}[i])) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH v0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         | p AS (SELECT CASE WHEN count(*) <= 2048 THEN 0
         |         ELSE length(bin((count(*) - 1) // 2048)) END AS b FROM v0),
         | v AS (SELECT vec_id, e, ($signTerms) % (1 << b) AS shard FROM v0, p),
         | c0 AS (SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY vec_id) - 1 AS cl, e
         |        FROM v QUALIFY row_number() OVER (PARTITION BY shard ORDER BY vec_id) <= 4),
         | d1 AS (SELECT v.vec_id, v.shard, c.cl,
         |         list_sum(list_transform(generate_series(1, $dim),
         |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
         |        FROM v JOIN c0 c ON v.shard = c.shard),
         | a1 AS (SELECT vec_id, shard, cl FROM d1
         |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1),
         | m1 AS (SELECT shard, cl, i, CAST(round(avg(e[i]) * 1000000) AS BIGINT) / 1000000.0 AS c
         |        FROM (SELECT a1.shard, a1.cl, v.e, unnest(generate_series(1, $dim)) AS i
         |              FROM a1 JOIN v USING (vec_id))
         |        GROUP BY shard, cl, i),
         | c1 AS (SELECT shard, cl, list(c ORDER BY i) AS e FROM m1 GROUP BY shard, cl),
         | d2 AS (SELECT v.vec_id, v.shard, c.cl,
         |         list_sum(list_transform(generate_series(1, $dim),
         |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
         |        FROM v JOIN c1 c ON v.shard = c.shard),
         | a2 AS (SELECT vec_id, shard, cl FROM d2
         |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1),
         | dropped AS (SELECT DISTINCT b.vec_id
         |        FROM a2 a JOIN a2 b ON a.shard = b.shard AND a.cl = b.cl AND a.vec_id < b.vec_id
         |        JOIN v0 va ON va.vec_id = a.vec_id
         |        JOIN v0 vb ON vb.vec_id = b.vec_id
         |        WHERE round(list_cosine_similarity(va.e, vb.e), 6) >= 0.4)
         |SELECT a2.vec_id, a2.shard * 4 + a2.cl AS cluster,
         | a2.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
         |FROM a2""".stripMargin
    },

    "shard_assign" ->
      """SELECT doc_id, shard,
        | row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS pos
        |FROM (SELECT doc_id,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 8 AS shard
        |      FROM documents)""".stripMargin,

    // Same arithmetic order as the engine: ((frac * N) * (ng^(1/T) / Z)
    // / ng) * 10000, rounded ONCE to basis points.
    "mix_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS ng FROM documents GROUP BY lang),
        | tot AS (SELECT CAST(sum(ng) AS DOUBLE) AS n,
        |         sum(pow(CAST(ng AS DOUBLE), 0.5)) AS z FROM c),
        | r AS (SELECT lang, least(10000, CAST(round(
        |         0.5 * n * (pow(CAST(ng AS DOUBLE), 0.5) / z) / ng * 10000) AS BIGINT)) AS bp
        |       FROM c CROSS JOIN tot)
        |SELECT d.lang, count(*) AS n_kept
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < bp
        |GROUP BY d.lang""".stripMargin,

    "length_histogram" ->
      """WITH t AS (SELECT CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
        |        ELSE CAST(length(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) END AS nt
        |       FROM documents)
        |SELECT CASE WHEN nt = 0 THEN 0 ELSE CAST(length(bin(nt)) AS INTEGER) END AS bucket,
        | count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens,
        | min(nt) AS min_tokens, max(nt) AS max_tokens
        |FROM t GROUP BY 1""".stripMargin,

    "blocklist_filter" ->
      """WITH w AS (SELECT doc_id,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed,
        |    string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS words
        |   FROM documents),
        | b AS (SELECT doc_id,
        |    CASE WHEN length(trimmed) = 0 THEN 0
        |         ELSE CAST(length(words) AS BIGINT) END AS nt,
        |    CAST(length(list_filter(words, x -> x = 'slow'))
        |       + length(list_filter(words, x -> x = 'big'))
        |       + length(list_filter(words, x -> x = 'merge')) AS BIGINT) AS hits
        |   FROM w)
        |SELECT doc_id,
        | CASE WHEN nt = 0 THEN 0 ELSE hits END AS n_hits,
        | round(CASE WHEN nt = 0 THEN 0.0 ELSE CAST(hits AS DOUBLE) / nt END, 6) AS hit_ratio,
        | (round(CASE WHEN nt = 0 THEN 0.0 ELSE CAST(hits AS DOUBLE) / nt END, 6) > 0.05) AS flagged
        |FROM b""".stripMargin,

    // Aho–Corasick phrase blocklist: leftmost non-overlapping counts
    // == the replace()-length formula, recomputed from raw text.
    "blocklist_phrases" ->
      """WITH terms(term) AS (VALUES ('table table'), ('fast merge'),
        |    ('scan'), ('scan slow'), ('val'), ('a a')),
        | w AS (SELECT doc_id, text,
        |    regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed
        |   FROM documents),
        | tok AS (SELECT doc_id,
        |    CASE WHEN length(trimmed) = 0 THEN 0
        |         ELSE CAST(length(string_split_regex(trimmed, '\s+')) AS BIGINT) END AS nt
        |   FROM w),
        | h AS (SELECT d.doc_id,
        |    CAST(sum((length(d.text) - length(replace(d.text, t.term, ''))) // length(t.term)) AS BIGINT) AS hits
        |   FROM documents d CROSS JOIN terms t GROUP BY d.doc_id)
        |SELECT tok.doc_id, h.hits AS n_hits,
        | round(CASE WHEN nt = 0 THEN 0.0 ELSE CAST(h.hits AS DOUBLE) / nt END, 6) AS hit_ratio,
        | (round(CASE WHEN nt = 0 THEN 0.0 ELSE CAST(h.hits AS DOUBLE) / nt END, 6) > 0.05) AS flagged
        |FROM tok JOIN h ON tok.doc_id = h.doc_id""".stripMargin,

    // C4 line filter: replay the planting and the keep rule (terminal
    // punct + >= 3 words) with list ops; [.!?"]$ is RE2-safe.
    "c4_line_filter" ->
      """WITH m AS (SELECT doc_id,
        |    concat_ws(chr(10),
        |      substring(text, 1, 40),
        |      substring(text, 1, 40) || '!',
        |      substring(text, 41, 40) || '.',
        |      substring(text, 81, 40)) AS ml
        |   FROM documents),
        | l AS (SELECT doc_id,
        |    list_filter(list_transform(string_split(ml, chr(10)), x -> trim(x)),
        |      x -> x <> ''
        |        AND len(string_split_regex(x, '\s+')) >= 3
        |        AND regexp_matches(x, '[.!?"]$')) AS keep,
        |    list_filter(list_transform(string_split(ml, chr(10)), x -> trim(x)),
        |      x -> x <> '') AS nonempty
        |   FROM m)
        |SELECT doc_id,
        | array_to_string(keep, chr(10)) AS cleaned_text,
        | CAST(len(keep) AS BIGINT) AS n_lines_kept,
        | CAST(len(nonempty) - len(keep) AS BIGINT) AS n_lines_dropped,
        | (len(keep) >= 2) AS kept
        |FROM l""".stripMargin,

    // Paragraph dedup: winner per paragraph hash = min (doc, pos),
    // rebuild in position order, every doc row returns.
    "dedup_paragraphs" ->
      """WITH m AS (SELECT doc_id,
        |    concat_ws(chr(10) || chr(10),
        |      substring(text, 1, 60),
        |      'subscribe to our newsletter for updates',
        |      substring(text, 61, 60)) AS ml
        |   FROM documents),
        | p AS (SELECT doc_id, i - 1 AS pos, ps[i] AS para
        |   FROM (SELECT doc_id, ps, unnest(generate_series(1, len(ps))) AS i
        |         FROM (SELECT doc_id, string_split(ml, chr(10) || chr(10)) AS ps FROM m))
        |   WHERE trim(ps[i]) <> ''),
        | w AS (SELECT para, doc_id, pos,
        |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
        |   FROM p),
        | k AS (SELECT doc_id, count(*) AS n_kept,
        |    string_agg(para, chr(10) || chr(10) ORDER BY pos) AS cleaned
        |   FROM w WHERE rn = 1 GROUP BY doc_id),
        | t AS (SELECT doc_id, count(*) AS total FROM p GROUP BY doc_id)
        |SELECT t.doc_id,
        | coalesce(k.cleaned, '') AS cleaned_text,
        | CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_paras_kept,
        | CAST(t.total - coalesce(k.n_kept, 0) AS BIGINT) AS n_paras_dropped
        |FROM t LEFT JOIN k ON t.doc_id = k.doc_id""".stripMargin,

    // Grouped top-3 per language by token count, heap-agg tie rule
    // (score desc, id asc) replayed as a window rank.
    "grouped_topk" ->
      """WITH t AS (SELECT lang, doc_id,
        |    CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) END AS nt
        |   FROM documents),
        | r AS (SELECT lang, doc_id, nt,
        |    row_number() OVER (PARTITION BY lang ORDER BY nt DESC, doc_id) AS rank
        |   FROM t)
        |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, nt AS n_tokens
        |FROM r WHERE rank <= 3""".stripMargin,

    "weighted_reservoir" ->
      """WITH s AS (SELECT source, doc_id,
        |    round(pow(
        |      (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1.0)
        |        / pow(2.0, 60),
        |      1.0 / n_chars), 6) AS key
        |   FROM documents WHERE n_chars > 0),
        | r AS (SELECT source, doc_id, key,
        |    row_number() OVER (PARTITION BY source ORDER BY key DESC, doc_id ASC) AS rank
        |   FROM s)
        |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id AS id, key
        |FROM r WHERE rank <= 5""".stripMargin,

    "pca_project" ->
      """SELECT count(*) AS n_rows, TRUE AS ortho_ok, TRUE AS eigs_sorted_ok,
        | TRUE AS trace_ok, TRUE AS proj_var_ok, TRUE AS ratio_ok
        |FROM embeddings""".stripMargin,

    "pca_ann" ->
      """SELECT count(*) AS n_queries, TRUE AS isometry_ok, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    "bloom_file_prune" ->
      """SELECT CAST(8 AS BIGINT) AS n_files,
        | TRUE AS pruned_fewer, TRUE AS rows_match,
        | (SELECT count(*) FROM documents WHERE source = 'src7') AS n_rows""".stripMargin,

    "mahalanobis_outliers" ->
      """SELECT count(*) AS n_planted, TRUE AS all_recovered
        |FROM embeddings WHERE vec_id % 97 = 0""".stripMargin,

    "corr_matrix" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'l_discount',
        |    round(corr(l_quantity, l_discount), 6) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'l_tax',
        |    round(corr(l_quantity, l_tax), 6) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |    round(corr(l_extendedprice, l_discount), 6) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |    round(corr(l_extendedprice, l_tax), 6) FROM lineitem
        |  UNION ALL SELECT 'l_discount', 'l_tax',
        |    round(corr(l_discount, l_tax), 6) FROM lineitem)""".stripMargin,

    "activity_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 86400000000000 AS day FROM events),
        | isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |   FROM days),
        | runs AS (SELECT user_id, grp, count(*) AS len, min(day) AS start_day
        |   FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        | CAST(max(len) AS BIGINT) AS max_streak,
        | min(start_day) AS first_day
        |FROM runs GROUP BY user_id""".stripMargin,

    "cube_pricing" ->
      """SELECT coalesce(l_returnflag, '<all>') AS l_returnflag,
        | coalesce(l_linestatus, '<all>') AS l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "agg_view_cdc" ->
      """WITH final AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 7 <> 0 AND o_orderkey % 5 = 0
        |         THEN o_totalprice + 10 ELSE o_totalprice END AS v
        |  FROM orders
        |  WHERE NOT (o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0
        |             AND o_orderkey % 3 = 0))
        |SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(CAST(round(v*100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM final GROUP BY o_orderstatus""".stripMargin,

    "fuzzy_key_join" ->
      """WITH keyed AS (SELECT doc_id,
        |    substring(md5(CAST(doc_id // 4 AS VARCHAR)), 1, 8) AS k0
        |   FROM documents),
        | k AS (SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 1 THEN 'z' || substring(k0, 2, 7)
        |         WHEN doc_id % 4 = 2 THEN substring(k0, 1, 7)
        |         WHEN doc_id % 4 = 3 THEN k0 || 'q'
        |         ELSE k0 END AS key
        |   FROM keyed)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | a.key AS key_a, b.key AS key_b,
        | CAST(levenshtein(a.key, b.key) AS BIGINT) AS dist
        |FROM k a JOIN k b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.key, b.key) <= 1""".stripMargin,

    "ewma_smooth" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0 AS v
        |   FROM events GROUP BY 1, 2),
        | ser AS (SELECT event_type,
        |    list(v ORDER BY day) AS arr FROM daily GROUP BY 1),
        | ex AS (SELECT d.event_type, d.day, d.v,
        |    CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.day) AS INT) AS i
        |   FROM daily d)
        |SELECT ex.event_type, ex.day, ex.v,
        | (SELECT list_reduce(s.arr[1:ex.i],
        |    (acc, x) -> round(0.3 * x + 0.7 * acc, 6))
        |   FROM ser s WHERE s.event_type = ex.event_type) AS ewma,
        | round(ex.v - (SELECT list_reduce(s.arr[1:ex.i],
        |    (acc, x) -> round(0.3 * x + 0.7 * acc, 6))
        |   FROM ser s WHERE s.event_type = ex.event_type), 6) AS resid
        |FROM ex""".stripMargin,

    "kmv_overlap" ->
      """WITH m AS (SELECT CASE WHEN count(*) > 10000000 THEN 8 ELSE 1 END AS sm
        |   FROM lineitem),
        | a AS (SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS pk
        |   FROM lineitem WHERE l_orderkey % 2 = 0
        |     AND l_partkey % (SELECT sm FROM m) = 0),
        | b AS (SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS pk
        |   FROM lineitem WHERE l_orderkey % 2 = 1
        |     AND l_partkey % (SELECT sm FROM m) = 0)
        |SELECT (SELECT count(*) FROM a JOIN b USING (pk)) AS n_inter,
        | (SELECT count(*) FROM (SELECT pk FROM a UNION SELECT pk FROM b)) AS n_union,
        | TRUE AS inter_ok, TRUE AS jaccard_ok, TRUE AS distinct_ok""".stripMargin,

    "triangle_count" ->
      """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
        |   WHERE l_quantity >= 40),
        | e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |   FROM li a JOIN li b
        |     ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        | deg AS (SELECT x, count(*) AS d FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY x),
        | tri AS (SELECT count(*) AS t FROM e e1
        |   JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |   JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        | (SELECT count(*) FROM e) AS n_edges,
        | (SELECT CAST(sum(d*(d-1)//2) AS BIGINT) FROM deg) AS n_wedges,
        | (SELECT t FROM tri) AS n_triangles,
        | round(3.0 * (SELECT t FROM tri)
        |   / (SELECT sum(d*(d-1)//2) FROM deg), 6) AS clustering""".stripMargin,

    // Stupid Backoff: counts from the %10<>3 slice, scores on %10=3;
    // branch order and the Laplace unigram floor mirror
    // TextAnalytics.stupidBackoffScore exactly.
    "lm_stupid_backoff" ->
      """WITH cw AS (SELECT list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS ws
        |   FROM documents WHERE doc_id % 10 <> 3),
        | uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(ws) AS w FROM cw) GROUP BY w),
        | tot AS (SELECT CAST(sum(c1) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM uni),
        | bi AS (SELECT a, b, count(*) AS c2 FROM (
        |    SELECT ws[i] AS a, ws[i+1] AS b
        |    FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM cw WHERE len(ws) >= 2))
        |   GROUP BY a, b),
        | tric AS (SELECT a, b, c, count(*) AS c3 FROM (
        |    SELECT ws[i] AS a, ws[i+1] AS b, ws[i+2] AS c
        |    FROM (SELECT ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM cw WHERE len(ws) >= 3))
        |   GROUP BY a, b, c),
        | sw AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS ws
        |   FROM documents WHERE doc_id % 10 = 3),
        | tri AS (SELECT doc_id, ws[i] AS a, ws[i+1] AS b, ws[i+2] AS c
        |   FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM sw WHERE len(ws) >= 3)),
        | sc AS (SELECT t.doc_id,
        |    CASE WHEN tric.c3 IS NOT NULL THEN CAST(tric.c3 AS DOUBLE) / CAST(b_ab.c2 AS DOUBLE)
        |         WHEN b_bc.c2 IS NOT NULL THEN 0.4 * CAST(b_bc.c2 AS DOUBLE) / CAST(u_b.c1 AS DOUBLE)
        |         ELSE (0.4 * 0.4) * (CAST(coalesce(u_c.c1, 0) AS DOUBLE) + 1.0) / (tot.n + tot.v) END AS s
        |   FROM tri t
        |   LEFT JOIN tric ON t.a = tric.a AND t.b = tric.b AND t.c = tric.c
        |   LEFT JOIN bi b_ab ON t.a = b_ab.a AND t.b = b_ab.b
        |   LEFT JOIN bi b_bc ON t.b = b_bc.a AND t.c = b_bc.b
        |   LEFT JOIN uni u_b ON t.b = u_b.w
        |   LEFT JOIN uni u_c ON t.c = u_c.w
        |   CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_trigrams,
        | round(sum(ln(s)) / count(*), 6) AS mean_sb_logprob
        |FROM sc GROUP BY doc_id""".stripMargin,

    // Canary screen: the oracle re-derives the benchmark prefixes AND
    // the replace-count hits from raw text — fully independent replay.
    "canary_screen" ->
      """WITH pats AS (SELECT DISTINCT substring(text, 1, 30) AS p
        |   FROM documents WHERE doc_id % 10 = 0 AND length(substring(text, 1, 30)) = 30),
        | c AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        | h AS (SELECT c.doc_id,
        |    CAST(sum((length(c.text) - length(replace(c.text, pats.p, ''))) // length(pats.p)) AS BIGINT) AS n
        |   FROM c CROSS JOIN pats GROUP BY c.doc_id)
        |SELECT doc_id, n AS n_canary_hits, (n > 0) AS leaked FROM h""".stripMargin,

    // RFM quintiles: integer dimensions, exact linear-interpolation
    // quantiles (quantile_cont == Spark percentile), strict
    // boundary < value scoring — boundary ties land low on both sides.
    "rfm_segments" ->
      """WITH r AS (SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '1998-12-31') AS BIGINT) AS recency_days,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        |   FROM orders GROUP BY o_custkey),
        | b AS (SELECT
        |    round(quantile_cont(-recency_days, 0.2), 6) AS b1_r,
        |    round(quantile_cont(-recency_days, 0.4), 6) AS b2_r,
        |    round(quantile_cont(-recency_days, 0.6), 6) AS b3_r,
        |    round(quantile_cont(-recency_days, 0.8), 6) AS b4_r,
        |    round(quantile_cont(frequency, 0.2), 6) AS b1_f,
        |    round(quantile_cont(frequency, 0.4), 6) AS b2_f,
        |    round(quantile_cont(frequency, 0.6), 6) AS b3_f,
        |    round(quantile_cont(frequency, 0.8), 6) AS b4_f,
        |    round(quantile_cont(monetary_cents, 0.2), 6) AS b1_m,
        |    round(quantile_cont(monetary_cents, 0.4), 6) AS b2_m,
        |    round(quantile_cont(monetary_cents, 0.6), 6) AS b3_m,
        |    round(quantile_cont(monetary_cents, 0.8), 6) AS b4_m
        |   FROM r),
        | s AS (SELECT r.*,
        |    1 + (CASE WHEN b1_r < -recency_days THEN 1 ELSE 0 END)
        |      + (CASE WHEN b2_r < -recency_days THEN 1 ELSE 0 END)
        |      + (CASE WHEN b3_r < -recency_days THEN 1 ELSE 0 END)
        |      + (CASE WHEN b4_r < -recency_days THEN 1 ELSE 0 END) AS r_score,
        |    1 + (CASE WHEN b1_f < frequency THEN 1 ELSE 0 END)
        |      + (CASE WHEN b2_f < frequency THEN 1 ELSE 0 END)
        |      + (CASE WHEN b3_f < frequency THEN 1 ELSE 0 END)
        |      + (CASE WHEN b4_f < frequency THEN 1 ELSE 0 END) AS f_score,
        |    1 + (CASE WHEN b1_m < monetary_cents THEN 1 ELSE 0 END)
        |      + (CASE WHEN b2_m < monetary_cents THEN 1 ELSE 0 END)
        |      + (CASE WHEN b3_m < monetary_cents THEN 1 ELSE 0 END)
        |      + (CASE WHEN b4_m < monetary_cents THEN 1 ELSE 0 END) AS m_score
        |   FROM r CROSS JOIN b)
        |SELECT o_custkey, recency_days, frequency, monetary_cents,
        | r_score, f_score, m_score,
        | CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
        |      WHEN r_score >= 4 THEN 'recent'
        |      WHEN f_score >= 4 THEN 'loyal_at_risk'
        |      WHEN m_score >= 4 THEN 'big_spender_lapsed'
        |      ELSE 'standard' END AS segment
        |FROM s""".stripMargin,

    // NFC canonical dedup: the enrichment plants composed (chr(233))
    // vs decomposed (chr(769) combining acute) accent twins; the key
    // is nfc_normalize + lower + trim + whitespace collapse, mirroring
    // Dedup.normalizedKey exactly (nfc BEFORE lower on both sides).
    // Aggressive key: same twin planting as dedup_unicode, plus the
    // digit/punct strip (literal same RE2-safe classes, 'g' flag —
    // DuckDB regexp_replace is first-match-only by default).
    "dedup_aggressive" ->
      """WITH a AS (SELECT doc_id, text || ' post #123, 4 views!' AS text FROM documents),
        | b AS (SELECT doc_id + 10000000 AS did, text || ' POST #999: 9,881 views...' AS text FROM documents),
        | u AS (SELECT doc_id, text FROM a UNION ALL SELECT did AS doc_id, text FROM b),
        | k AS (SELECT doc_id,
        |    regexp_replace(trim(regexp_replace(lower(nfc_normalize(text)),
        |      '[0-9]|[!-/:-@\[-`{-~]', '', 'g')), '\s+', ' ', 'g') AS ak
        |   FROM u),
        | r AS (SELECT doc_id, row_number() OVER (PARTITION BY ak ORDER BY doc_id) AS rn FROM k)
        |SELECT doc_id FROM r WHERE rn = 1""".stripMargin,

    // Candidate-pair edit verification: same consecutive-pair rule,
    // classic Levenshtein DP both engines, exact integer distances.
    "dedup_edit_verify" ->
      """WITH p AS (SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b
        |           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |           WHERE a.doc_id % 7 = 0)
        |SELECT id_a, id_b,
        | CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist,
        | round(1.0 - levenshtein(ta.text, tb.text)::DOUBLE /
        |   greatest(length(ta.text), length(tb.text), 1), 6) AS edit_sim,
        | (round(1.0 - levenshtein(ta.text, tb.text)::DOUBLE /
        |   greatest(length(ta.text), length(tb.text), 1), 6) >= 0.3) AS verified
        |FROM p JOIN documents ta ON ta.doc_id = p.id_a
        |       JOIN documents tb ON tb.doc_id = p.id_b""".stripMargin,

    // Vocabulary coverage curve: rank words (count desc, word asc),
    // cumulative token mass at each candidate size.
    "vocab_coverage" ->
      """WITH w AS (SELECT wd, count(*) AS cnt FROM (
        |     SELECT unnest(string_split_regex(trim(text), '\s+')) AS wd FROM documents)
        |    WHERE wd <> '' GROUP BY wd),
        | t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, count(*) AS v FROM w),
        | r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, wd ASC) AS rn FROM w),
        | c AS (SELECT rn, CAST(sum(cnt) OVER (ORDER BY rn) AS BIGINT) AS cum FROM r),
        | ks AS (SELECT unnest([100, 1000, 5000]) AS k)
        |SELECT CAST(k AS BIGINT) AS vocab_size,
        | least(CAST(k AS BIGINT), v) AS n_types,
        | coalesce((SELECT cum FROM c WHERE rn = least(k, (SELECT count(*) FROM r))), 0) AS covered_tokens,
        | total AS total_tokens,
        | round(coalesce((SELECT cum FROM c WHERE rn = least(k, (SELECT count(*) FROM r))), 0)::DOUBLE
        |   / total, 6) AS coverage
        |FROM ks, t""".stripMargin,

    // Per-source OOV against the corpus top-500 vocab: same word
    // split, same (count desc, word asc) vocab rank.
    "source_oov" ->
      """WITH toks AS (SELECT source AS grp, wd AS w FROM (
        |     SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS wd FROM documents)
        |    WHERE wd <> ''),
        | vc AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
        | vocab AS (SELECT w, 1 AS inv FROM vc ORDER BY cnt DESC, w ASC LIMIT 500)
        |SELECT grp AS source, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN vocab.inv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        | round(sum(CASE WHEN vocab.inv IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS oov_rate
        |FROM toks LEFT JOIN vocab ON toks.w = vocab.w
        |GROUP BY grp""".stripMargin,

    "dedup_unicode" ->
      """WITH a AS (SELECT doc_id,
        |    text || ' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233) AS text
        |   FROM documents),
        | b AS (SELECT doc_id + 10000000 AS doc_id,
        |    upper(text) || '  cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769) || ' ' AS text
        |   FROM documents),
        | u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
        | k AS (SELECT doc_id,
        |    regexp_replace(trim(lower(nfc_normalize(text))), '\s+', ' ', 'g') AS nk
        |   FROM u),
        | r AS (SELECT doc_id, nk,
        |    row_number() OVER (PARTITION BY nk ORDER BY doc_id) AS rn FROM k)
        |SELECT doc_id, nk AS norm_text FROM r WHERE rn = 1""".stripMargin,

    "blocklist_term_stats" ->
      """WITH terms(term) AS (VALUES ('table table'), ('fast merge'),
        |    ('scan'), ('scan slow'), ('val'), ('a a')),
        | h AS (SELECT t.term,
        |    (length(d.text) - length(replace(d.text, t.term, ''))) // length(t.term) AS c
        |   FROM documents d CROSS JOIN terms t)
        |SELECT term, CAST(sum(c) AS BIGINT) AS n_occurrences,
        | CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS doc_freq
        |FROM h GROUP BY term""".stripMargin,

    // PMI in one fixed-association double expression, rounded 6 dp
    // BEFORE ranking; ties break on the word pair.
    "pmi_collocations" ->
      """WITH ws AS (SELECT list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS ws FROM documents),
        | uni AS (SELECT unnest(ws) AS w FROM ws),
        | cu AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
        | tw AS (SELECT CAST(sum(cw) AS DOUBLE) AS tw FROM cu),
        | bi AS (SELECT ws[i] AS a, ws[i+1] AS b
        |        FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM ws WHERE len(ws) >= 2)),
        | cb AS (SELECT a, b, count(*) AS cab FROM bi GROUP BY a, b),
        | tb AS (SELECT CAST(sum(cab) AS DOUBLE) AS tb FROM cb)
        |SELECT a, b, CAST(cab AS BIGINT) AS n_pairs,
        | round(ln((CAST(cab AS DOUBLE) * tw * tw) / (tb * CAST(ca.cw AS DOUBLE) * CAST(cbu.cw AS DOUBLE))), 6) AS pmi
        |FROM cb JOIN cu ca ON cb.a = ca.w JOIN cu cbu ON cb.b = cbu.w, tw, tb
        |WHERE cab >= 5
        |ORDER BY pmi DESC, a, b LIMIT 50""".stripMargin,

    // decontaminate's gram pipeline with a LEFT membership count:
    // zeros included, ratio = exact integer division rounded 6 dp.
    "decontaminate_overlap" ->
      """WITH wdocs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        | grams AS (SELECT doc_id,
        |            CAST('0x' || substring(md5(array_to_string(words[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |           FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i
        |                 FROM wdocs WHERE len(words) >= 5)),
        | dg AS (SELECT DISTINCT doc_id, gh FROM grams),
        | bench AS (SELECT DISTINCT gh FROM dg WHERE doc_id % 10 = 0),
        | c AS (SELECT doc_id, count(*) AS n_grams,
        |        CAST(sum(CASE WHEN gh IN (SELECT gh FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
        |       FROM dg WHERE doc_id % 10 <> 0 GROUP BY doc_id)
        |SELECT doc_id, n_grams, n_contaminated,
        | round(CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE), 6) AS overlap_frac
        |FROM c""".stripMargin,

    // dedup_jaccard's pair pipeline rolled up by unordered source pair.
    "dedup_cross_source" ->
      """WITH sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | v AS (SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |       FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b),
        | p AS (SELECT id_a, id_b, CAST(i AS DOUBLE) / (s_a + s_b - i) AS j FROM v
        |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2),
        | sp AS (SELECT least(da.source, db.source) AS source_a,
        |               greatest(da.source, db.source) AS source_b, j
        |        FROM p JOIN documents da ON p.id_a = da.doc_id
        |               JOIN documents db ON p.id_b = db.doc_id)
        |SELECT source_a, source_b, count(*) AS n_pairs, round(max(j), 6) AS max_jaccard
        |FROM sp GROUP BY source_a, source_b""".stripMargin,

    // Per-label centroid snapped to exact micro-units (the kmeans
    // convention), in-order squared-diff distance, 6 dp-rounded BEFORE
    // the per-label rank, ties to the lower vec_id.
    "embedding_outliers" ->
      """WITH v AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | m AS (SELECT label, i, CAST(round(avg(e[i]) * 1000000) AS BIGINT) / 1000000.0 AS c
        |       FROM (SELECT label, e, unnest(generate_series(1, 64)) AS i FROM v)
        |       GROUP BY label, i),
        | ce AS (SELECT label, list(c ORDER BY i) AS ce FROM m GROUP BY label),
        | d AS (SELECT v.label, v.vec_id,
        |        round(sqrt(list_sum(list_transform(generate_series(1, 64),
        |          i -> (v.e[i] - ce.ce[i]) * (v.e[i] - ce.ce[i])))), 6) AS dist
        |       FROM v JOIN ce USING (label))
        |SELECT label, vec_id, rk, dist FROM (
        | SELECT label, vec_id, dist,
        |  row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rk FROM d)
        |WHERE rk <= 3""".stripMargin,

    // First event per user ordered by (µs timestamp, event_id) — the
    // same µs truncation as funnel_timing/latest_event.
    "first_touch" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        | fu AS (SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS rk FROM ev),
        | ft AS (SELECT user_id, event_type AS first_touch FROM fu WHERE rk = 1),
        | cv AS (SELECT user_id,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nconv
        |        FROM ev GROUP BY user_id)
        |SELECT first_touch, count(*) AS n_users,
        | CAST(sum(CASE WHEN nconv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_users,
        | CAST(sum(nconv) AS BIGINT) AS n_conversions,
        | round(CAST(sum(CASE WHEN nconv > 0 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS conversion_rate
        |FROM ft JOIN cv USING (user_id) GROUP BY first_touch""".stripMargin,

    // cents · 2^-k terms are exact multiples of 2^-10 — sum order can
    // never move a ulp, so NO rounding on either side (halflife 7 days,
    // horizon 10 halvings, µs timestamps).
    "decayed_value" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        | mx AS (SELECT max(tus) AS tmax FROM ev)
        |SELECT user_id, count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents,
        | sum(CAST(cents AS DOUBLE) / pow(2.0, CAST(least((tmax - tus) // 604800000000, 10) AS DOUBLE))) AS decayed_cents
        |FROM ev, mx GROUP BY user_id""".stripMargin,

    "bpe_pairs" ->
      """WITH w AS (SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS w FROM documents),
        | p AS (SELECT substring(w, CAST(i AS INT), 2) AS pair
        |       FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i FROM w WHERE length(w) >= 2))
        |SELECT pair, count(*) AS n_occurrences FROM p GROUP BY pair
        |ORDER BY n_occurrences DESC, pair LIMIT 30""".stripMargin,

    "bpe_train" -> bpeTrainSql(Queries.BpeTrainMerges),

    "bpe_vocab" -> bpeVocabSql(Queries.BpeTrainMerges, 30),

    "bpe_encode" -> bpeEncodeSql(Queries.BpeTrainMerges),

    // approx_ok is the literal-TRUE gate (corpus_distinct_approx
    // pattern): the row hash-matches only if the engine's
    // approx_percentile rank error actually held.
    "length_prune_approx" ->
      """WITH d AS (SELECT lang,
        |        CASE WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0 THEN 0
        |             ELSE CAST(len(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS BIGINT) END AS nt
        |       FROM documents)
        |SELECT lang, count(*) AS n_docs, round(quantile_cont(nt, 0.9), 6) AS p90_exact,
        | TRUE AS approx_ok
        |FROM d GROUP BY lang""".stripMargin,

    "event_paths" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        | s AS (SELECT event_type,
        |        lead(event_type, 1) OVER w AS e1, lead(event_type, 2) OVER w AS e2
        |       FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        | p AS (SELECT event_type || '>' || e1 || '>' || e2 AS path FROM s WHERE e2 IS NOT NULL)
        |SELECT path, count(*) AS n_paths FROM p GROUP BY path
        |ORDER BY n_paths DESC, path LIMIT 20""".stripMargin,

    // dedup_jaccard's full-corpus pair pipeline, restricted to pairs
    // touching the "new batch" slice (doc_id % 10 = 3) — the exact
    // contract of the incremental index path.
    "dedup_incremental" ->
      """WITH sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | v AS (SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |       FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |SELECT id_a, id_b, round(CAST(i AS DOUBLE) / (s_a + s_b - i), 6) AS jaccard
        |FROM v WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2
        | AND (id_a % 10 = 3 OR id_b % 10 = 3)""".stripMargin,

    "corpus_diff" ->
      """WITH o AS (SELECT doc_id, sha256(text) AS h FROM documents),
        | n AS (SELECT doc_id,
        |        sha256(CASE WHEN doc_id % 7 = 0 THEN 'edited: ' || text ELSE text END) AS h
        |       FROM documents WHERE doc_id % 13 <> 0
        |       UNION ALL
        |       SELECT doc_id + 100000, sha256(text) FROM documents WHERE doc_id % 17 = 0),
        | d AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |        CASE WHEN o.h IS NULL THEN 'added'
        |             WHEN n.h IS NULL THEN 'removed'
        |             WHEN o.h <> n.h THEN 'changed' ELSE 'unchanged' END AS status
        |       FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT doc_id, status FROM d WHERE status <> 'unchanged'""".stripMargin,

    // Laplace bigram LM: p(b|a) = (c(ab)+1)/(c(a)+V); per-doc mean ln,
    // rounded 6 dp (ln summation order, same convention as lm_score).
    "bigram_lm" ->
      """WITH ws AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS ws FROM documents),
        | bi AS (SELECT doc_id, ws[i] AS a, ws[i+1] AS b
        |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM ws WHERE len(ws) >= 2)),
        | cu AS (SELECT w AS a, count(*) AS ca FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY w),
        | v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM cu),
        | cb AS (SELECT a, b, count(*) AS cab FROM bi GROUP BY a, b)
        |SELECT doc_id, count(*) AS n_bigrams,
        | round(sum(ln((CAST(cab AS DOUBLE) + 1.0) / (CAST(ca AS DOUBLE) + v))) / count(*), 6) AS mean_bigram_logprob
        |FROM bi JOIN cb USING (a, b) JOIN cu USING (a), v
        |GROUP BY doc_id""".stripMargin,

    "skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id),
        | t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS k FROM c)
        |SELECT user_id, n_rows,
        | round(CAST(n_rows AS DOUBLE) * k / n, 6) AS skew_factor
        |FROM c, t ORDER BY n_rows DESC, user_id LIMIT 5""".stripMargin,

    "daily_percentiles" ->
      """SELECT epoch_us(ts) // 86400000000 AS day, event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    // n_matches hash-checks the bloom path's no-false-negative
    // contract; the prune-effectiveness boolean is the literal-TRUE
    // gate (corpus_distinct_approx pattern).
    "bloom_prefilter" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_matches, TRUE AS bloom_prune_ok
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)""".stripMargin,

    // dedup_clusters' pair pipeline + reachability closure, then the
    // hash_split bucket CASE keyed by the cluster representative
    // (own id for singletons).
    "leakage_split" ->
      """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | p AS (SELECT id_a, id_b FROM (
        |        SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |        FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
        |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2),
        | e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p),
        | reach(id, root) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.id
        | ),
        | cl AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id),
        | k AS (SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS split_key
        |       FROM documents d LEFT JOIN cl ON d.doc_id = cl.id)
        |SELECT doc_id, split_key,
        | CASE WHEN CAST('0x' || substring(md5(CAST(split_key AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 10 THEN 'test'
        |      WHEN CAST('0x' || substring(md5(CAST(split_key AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 20 THEN 'val'
        |      ELSE 'train' END AS split
        |FROM k""".stripMargin,

    // kmeans_clusters' assignment replay (identical 2-iteration
    // trajectory) + per-cluster TF-IDF labeling, 6 dp-rounded pre-rank.
    "cluster_keywords" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e
        |        FROM v ORDER BY vec_id LIMIT 4),
        | d1 AS (SELECT v.vec_id, c.cl,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
        |        FROM v CROSS JOIN c0 c),
        | a1 AS (SELECT vec_id, cl FROM d1
        |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1),
        | m1 AS (SELECT cl, i, CAST(round(avg(e[i]) * 1000000) AS BIGINT) / 1000000.0 AS c
        |        FROM (SELECT a1.cl, v.e, unnest(generate_series(1, 64)) AS i
        |              FROM a1 JOIN v USING (vec_id))
        |        GROUP BY cl, i),
        | c1 AS (SELECT cl, list(c ORDER BY i) AS e FROM m1 GROUP BY cl),
        | d2 AS (SELECT v.vec_id, c.cl,
        |         list_sum(list_transform(generate_series(1, 64),
        |           i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))) AS d2
        |        FROM v CROSS JOIN c1 c),
        | a2 AS (SELECT vec_id, cl FROM d2
        |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) = 1),
        | wds AS (SELECT a2.cl AS cluster, unnest(string_split_regex(trim(d.text), '\s+')) AS w
        |         FROM a2 JOIN documents d ON a2.vec_id = d.doc_id),
        | wnz AS (SELECT cluster, w FROM wds WHERE w <> ''),
        | tf AS (SELECT cluster, w, count(*) AS tf FROM wnz GROUP BY cluster, w),
        | dfq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        | ncl AS (SELECT CAST(count(DISTINCT cluster) AS DOUBLE) AS ncl FROM tf),
        | sc AS (SELECT cluster, tf.w AS w,
        |         round(CAST(tf AS DOUBLE) * ln(ncl / CAST(df AS DOUBLE)), 6) AS tfidf
        |        FROM tf JOIN dfq ON tf.w = dfq.w, ncl),
        | rk AS (SELECT cluster, w, tfidf,
        |         row_number() OVER (PARTITION BY cluster ORDER BY tfidf DESC, w) AS rk FROM sc)
        |SELECT cluster, w AS keyword, rk, tfidf FROM rk WHERE rk <= 3""".stripMargin,

    "random_projection" -> randomProjectSql(dimIn = 64, dimOut = 16),

    "markov_transitions" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
        | s AS (SELECT event_type AS from_type,
        |        lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS to_type
        |       FROM ev),
        | t AS (SELECT from_type, to_type, count(*) AS n_transitions
        |       FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
        | tot AS (SELECT from_type, CAST(sum(n_transitions) AS DOUBLE) AS tt FROM t GROUP BY from_type)
        |SELECT from_type, to_type, n_transitions,
        | round(CAST(n_transitions AS DOUBLE) / tt, 6) AS prob
        |FROM t JOIN tot USING (from_type)""".stripMargin,

    "retention_rate" ->
      """WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        | f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
        | a AS (SELECT DISTINCT d.user_id, f.cohort_day, d.day - f.cohort_day AS day_offset
        |       FROM d JOIN f USING (user_id)),
        | r AS (SELECT cohort_day, day_offset, count(*) AS n_active_users FROM a GROUP BY 1, 2),
        | sz AS (SELECT cohort_day, n_active_users AS sz FROM r WHERE day_offset = 0)
        |SELECT cohort_day, day_offset, n_active_users,
        | round(CAST(n_active_users AS DOUBLE) / CAST(sz AS DOUBLE), 6) AS retention_rate
        |FROM r JOIN sz USING (cohort_day)""".stripMargin,

    // thresholds rounded 6 dp on BOTH sides before clipping, then
    // exact integer-cents sums — no order-dependent float aggregation.
    "winsorized_stats" ->
      """WITH th AS (SELECT event_type,
        |        round(quantile_cont(value, 0.05), 6) AS lo,
        |        round(quantile_cont(value, 0.95), 6) AS hi
        |       FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS raw_cents,
        | CAST(sum(CAST(round(least(greatest(value, lo), hi) * 100) AS BIGINT)) AS BIGINT) AS winsorized_cents,
        | round(min(lo), 6) AS p05, round(min(hi), 6) AS p95
        |FROM events e JOIN th USING (event_type)
        |GROUP BY e.event_type""".stripMargin,

    // DSIR (Xie et al. 2302.03169) replay: same md5-bucket word
    // features, Laplace-smoothed target/raw bucket models, per-bucket
    // log-ratio rounded to integer micro-units BEFORE the per-doc sum
    // (exact 64-bit arithmetic on both engines — no double-accumulation
    // drift), logw = micro/1e6 exactly.
    "dsir_score" ->
      """WITH wb AS (SELECT doc_id, lang,
        |        CAST('0x' || substring(md5(wd), 1, 15) AS BIGINT) % 1024 AS b
        |       FROM (SELECT doc_id, lang,
        |               unnest(string_split_regex(trim(lower(text)), '\s+')) AS wd
        |             FROM documents)
        |       WHERE wd <> ''),
        | tc AS (SELECT b, count(*) AS ct FROM wb WHERE lang = 'en' GROUP BY b),
        | rc AS (SELECT b, count(*) AS cr FROM wb GROUP BY b),
        | tt AS (SELECT count(*) AS t FROM wb WHERE lang = 'en'),
        | tr AS (SELECT count(*) AS t FROM wb),
        | ratio AS (SELECT rc.b,
        |    CAST(round((ln((COALESCE(tc.ct, 0) + 1.0) / (tt.t + 1024)) -
        |                ln((rc.cr + 1.0) / (tr.t + 1024))) * 1000000.0) AS BIGINT) AS lw
        |   FROM rc LEFT JOIN tc ON rc.b = tc.b, tt, tr)
        |SELECT doc_id, CAST(sum(lw) AS BIGINT) AS logw_micro,
        |       CAST(sum(lw) AS DOUBLE) / 1000000.0 AS logw
        |FROM wb JOIN ratio USING (b) GROUP BY doc_id""".stripMargin,

    // DSIR Gumbel-top-k resample replay: scores as above, Gumbel draw
    // from the portable id hash (u = (h mod 1e6 + 0.5)/1e6), key summed
    // in micro-units, deterministic (key, doc_id) top-200.
    "dsir_sample" ->
      """WITH wb AS (SELECT doc_id, lang,
        |        CAST('0x' || substring(md5(wd), 1, 15) AS BIGINT) % 1024 AS b
        |       FROM (SELECT doc_id, lang,
        |               unnest(string_split_regex(trim(lower(text)), '\s+')) AS wd
        |             FROM documents)
        |       WHERE wd <> ''),
        | tc AS (SELECT b, count(*) AS ct FROM wb WHERE lang = 'en' GROUP BY b),
        | rc AS (SELECT b, count(*) AS cr FROM wb GROUP BY b),
        | tt AS (SELECT count(*) AS t FROM wb WHERE lang = 'en'),
        | tr AS (SELECT count(*) AS t FROM wb),
        | ratio AS (SELECT rc.b,
        |    CAST(round((ln((COALESCE(tc.ct, 0) + 1.0) / (tt.t + 1024)) -
        |                ln((rc.cr + 1.0) / (tr.t + 1024))) * 1000000.0) AS BIGINT) AS lw
        |   FROM rc LEFT JOIN tc ON rc.b = tc.b, tt, tr),
        | sc AS (SELECT doc_id, sum(lw) AS lm
        |        FROM wb JOIN ratio USING (b) GROUP BY doc_id),
        | keyed AS (SELECT doc_id, lm, lm + CAST(round(-ln(-ln(
        |      (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 + 0.5)
        |        / 1000000.0)) * 1000000.0) AS BIGINT) AS km
        |   FROM sc)
        |SELECT doc_id, CAST(lm AS DOUBLE) / 1000000.0 AS logw,
        |       CAST(km AS DOUBLE) / 1000000.0 AS gumbel_key
        |FROM keyed ORDER BY km DESC, doc_id LIMIT 200""".stripMargin,

    // Misra-Gries gate: the oracle recomputes the EXACT heavy-hitter
    // set (count·30 > N for capacity 29) and asserts the sketch-side
    // booleans — a guaranteed item the sketch lost drops a row, a
    // violated deficit bound flips mg_ok (length_prune_approx pattern).
    "heavy_hitters" ->
      """WITH ww AS (SELECT wd FROM (SELECT
        |        unnest(string_split_regex(trim(lower(text)), '\s+')) AS wd
        |       FROM documents) WHERE wd <> ''),
        | tot AS (SELECT count(*) AS n FROM ww),
        | ex AS (SELECT wd, count(*) AS n_exact FROM ww GROUP BY wd)
        |SELECT wd AS word, n_exact, true AS mg_ok
        |FROM ex, tot WHERE n_exact * 30 > tot.n
        |ORDER BY n_exact DESC, word""".stripMargin,

    "decontaminate_fuzzy" -> minhashDecontaminateSql(numHashes = 16,
      rowsPerBand = 4, minMatches = 4),

    // Anchor panel bound (vec_id < 20000) replayed literally —
    // vacuous at sf <= 1, caps the mining at 200 anchors x N beyond.
    "hard_negatives" ->
      """WITH a AS (SELECT vec_id AS anchor_id, CAST(embedding AS DOUBLE[]) AS qv,
        |        label AS alabel
        |       FROM embeddings WHERE vec_id % 100 = 0 AND vec_id < 20000),
        | s AS (SELECT a.anchor_id, e.vec_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), a.qv) AS c
        |       FROM embeddings e, a WHERE e.label <> a.alabel),
        | r AS (SELECT anchor_id, vec_id, c,
        |        row_number() OVER (PARTITION BY anchor_id ORDER BY c DESC, vec_id) AS rank
        |       FROM s)
        |SELECT anchor_id, vec_id, rank, round(c, 6) AS cosine
        |FROM r WHERE rank <= 5""".stripMargin,

    // CCNet tercile buckets: lm_score's unigram model, per-lang exact
    // interpolated terciles over the 6dp-rounded doc scores, strict
    // inequalities both sides (boundary ties -> middle).
    "ppl_buckets" ->
      """WITH ww AS (SELECT doc_id, w
        |   FROM (SELECT doc_id,
        |          unnest(string_split_regex(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+')) AS w
        |         FROM documents)
        |   WHERE length(w) > 0),
        | f AS (SELECT w, count(*) AS wc FROM ww GROUP BY w),
        | t AS (SELECT count(*) AS tc FROM ww),
        | sc AS (SELECT doc_id, count(*) AS n_tokens,
        |         round(sum(ln(CAST(wc AS DOUBLE) / CAST(tc AS DOUBLE))) / count(*), 6) AS mean_logprob
        |        FROM ww JOIN f USING (w), t GROUP BY doc_id),
        | scl AS (SELECT sc.*, d.lang FROM sc JOIN documents d USING (doc_id)),
        | th AS (SELECT lang,
        |         round(quantile_cont(mean_logprob, 0.333333), 6) AS lo,
        |         round(quantile_cont(mean_logprob, 0.666667), 6) AS hi
        |        FROM scl GROUP BY lang)
        |SELECT doc_id, lang, n_tokens, mean_logprob,
        |       CASE WHEN mean_logprob > hi THEN 'head'
        |            WHEN mean_logprob < lo THEN 'tail'
        |            ELSE 'middle' END AS ppl_bucket
        |FROM scl JOIN th USING (lang)""".stripMargin,

    "mmr_rerank" -> mmrSql(poolSize = 50, k = 10, lambdaNum = 7),

    // Micro-snapped per-dimension means on each id-parity half; drift
    // is exact integer micro arithmetic.
    "embedding_drift" ->
      """WITH va AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id % 2 = 0),
        | vb AS (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id % 2 = 1),
        | ma AS (SELECT i - 1 AS d, CAST(round(avg(e[i]) * 1000000) AS BIGINT) AS mam,
        |         count(*) AS n_a
        |        FROM (SELECT e, unnest(generate_series(1, 64)) AS i FROM va) GROUP BY i),
        | mb AS (SELECT i - 1 AS d, CAST(round(avg(e[i]) * 1000000) AS BIGINT) AS mbm,
        |         count(*) AS n_b
        |        FROM (SELECT e, unnest(generate_series(1, 64)) AS i FROM vb) GROUP BY i)
        |SELECT d, n_a, n_b,
        | CAST(mam AS DOUBLE) / 1000000.0 AS mean_a,
        | CAST(mbm AS DOUBLE) / 1000000.0 AS mean_b,
        | CAST(abs(mam - mbm) AS DOUBLE) / 1000000.0 AS abs_drift
        |FROM ma JOIN mb USING (d)""".stripMargin,

    // CMS gate: exact top-20 words recomputed; the sketch-side bounds
    // are the booleans (length_prune_approx pattern).
    // Same line synthesis (slice 1 repeated, slice 2 + '.', slice 3),
    // same trimmed-non-empty-line convention, exact integer ratios.
    "line_stats" ->
      """WITH e AS (SELECT doc_id,
        |    substr(text, 1, 40) || chr(10) || substr(text, 1, 40) || chr(10) ||
        |    substr(text, 41, 40) || '.' || chr(10) || substr(text, 81, 40) AS ml
        |   FROM documents),
        | l AS (SELECT doc_id, trim(x) AS line
        |       FROM (SELECT doc_id, unnest(string_split(ml, chr(10))) AS x FROM e)
        |       WHERE trim(x) <> ''),
        | p AS (SELECT doc_id, line, count(*) AS c FROM l GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        | round((sum(c) - count(*))::DOUBLE / sum(c), 6) AS dup_line_frac,
        | round(sum((c - 1) * length(line))::DOUBLE / sum(c * length(line)), 6) AS dup_line_char_frac,
        | round(sum(CASE WHEN regexp_matches(line, '[.!?]$') THEN c ELSE 0 END)::DOUBLE / sum(c), 6) AS punct_line_frac
        |FROM p GROUP BY doc_id""".stripMargin,

    // Same per-lang planting; script classes via RE2 properties that
    // match java.util.regex's (\p{Latin}≡\p{IsLatin}, \p{Han}≡\p{IsHan});
    // whitespace as an explicit class (java \s and RE2 \s disagree on
    // vertical tab).
    "script_mix" ->
      """WITH e AS (SELECT doc_id, text || CASE lang
        |     WHEN 'zh' THEN ' ' || repeat('数据处理系统一二三十', 24)
        |     WHEN 'fr' THEN ' café déjà élève'
        |     WHEN 'es' THEN ' niño más año'
        |     WHEN 'de' THEN ' größe über straße'
        |     ELSE ' 1234567890' END AS st FROM documents),
        | c AS (SELECT doc_id, length(st) AS n_chars,
        |    length(st) - length(regexp_replace(st, '\p{Latin}', '', 'g')) AS n_latin,
        |    length(st) - length(regexp_replace(st, '\p{Han}', '', 'g')) AS n_han,
        |    length(st) - length(regexp_replace(st, '[0-9]', '', 'g')) AS n_digit,
        |    length(st) - length(regexp_replace(st, '[ \t\n\r\f]', '', 'g')) AS n_space
        |   FROM e WHERE length(st) > 0)
        |SELECT doc_id, n_chars,
        | round(n_latin::DOUBLE / n_chars, 6) AS latin_frac,
        | round(n_han::DOUBLE / n_chars, 6) AS han_frac,
        | round(n_digit::DOUBLE / n_chars, 6) AS digit_frac,
        | round((n_chars - n_latin - n_han - n_digit - n_space)::DOUBLE / n_chars, 6) AS other_frac,
        | CASE WHEN n_latin * 2 > n_chars THEN 'latin'
        |      WHEN n_han * 2 > n_chars THEN 'han'
        |      WHEN n_digit * 2 > n_chars THEN 'digit'
        |      ELSE 'mixed' END AS main_script
        |FROM c""".stripMargin,

    // Unigram-LM seed: same distinct-word weighting, same (2..4)-char
    // substring windows, same (count desc, token) top-40 cut.
    "unigram_seed" ->
      """WITH wc AS (SELECT w, count(*) AS cnt
        |            FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |                  FROM documents) WHERE w <> '' GROUP BY w),
        | subs AS (SELECT substring(w, CAST(i AS INT), CAST(l AS INT)) AS token, cnt
        |   FROM (SELECT w, cnt, unnest(generate_series(1, length(w) - 1)) AS i FROM wc),
        |        (SELECT unnest([2, 3, 4]) AS l) ls
        |   WHERE i + l - 1 <= length(w))
        |SELECT token, CAST(sum(cnt) AS BIGINT) AS n_occ
        |FROM subs GROUP BY token ORDER BY n_occ DESC, token LIMIT 40""".stripMargin,

    // Gate-is-oracle: the corpus alphabet, which EM must preserve.
    "unigram_vocab" ->
      """WITH wc AS (SELECT DISTINCT w
        |            FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |                  FROM documents) WHERE w <> ''),
        | ch AS (SELECT DISTINCT substring(w, CAST(i AS INT), 1) AS token
        |        FROM (SELECT w, unnest(generate_series(1, length(w))) AS i FROM wc))
        |SELECT token, true AS in_vocab FROM ch""".stripMargin,

    // Exact char conservation: Viterbi segmentations partition each
    // word's characters, so the vocab-side char mass equals this.
    "unigram_conservation" ->
      """SELECT CAST(sum(cnt * length(w)) AS BIGINT) AS token_chars
        |FROM (SELECT w, count(*) AS cnt
        |      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |            FROM documents) WHERE w <> '' GROUP BY w)""".stripMargin,

    // MaxSim: cosines rounded 6 dp BEFORE the per-doc max (so both
    // engines pick the same max), sum left-associated, rounded again.
    "maxsim_topk" ->
      """WITH c AS (SELECT vec_id % 100 AS doc_id,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS c0,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 1)), 6) AS c1,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 2)), 6) AS c2,
        |    round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |      (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 3)), 6) AS c3
        |   FROM embeddings),
        | m AS (SELECT doc_id, max(c0) AS m0, max(c1) AS m1, max(c2) AS m2, max(c3) AS m3
        |       FROM c GROUP BY doc_id)
        |SELECT doc_id, round(((m0 + m1) + m2) + m3, 6) AS maxsim
        |FROM m ORDER BY maxsim DESC, doc_id LIMIT 10""".stripMargin,

    // Exact batch top-10 replayed (knn_batch pattern), then the IR
    // metrics; ideal ordering re-ranks by (rel desc, rank) — the same
    // deterministic window as the Spark op.
    "retrieval_eval" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS qlab
        |            FROM embeddings WHERE vec_id < 5),
        | s AS (SELECT q.query_id, q.qlab, e.vec_id AS doc_id, e.label,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS c
        |       FROM embeddings e, q),
        | r AS (SELECT query_id, qlab, doc_id, label, c,
        |        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, doc_id) AS rnk
        |       FROM s),
        | t AS (SELECT query_id, rnk, CASE WHEN label = qlab THEN 1.0 ELSE 0.0 END AS rel
        |       FROM r WHERE rnk <= 10),
        | i AS (SELECT query_id, rnk, rel,
        |        row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, rnk) AS irank FROM t)
        |SELECT query_id, count(*) AS n_retrieved,
        | CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant,
        | round(coalesce(max(CASE WHEN rel > 0 THEN 1.0 / rnk END), 0.0), 6) AS mrr,
        | round(sum((pow(2.0, rel) - 1.0) / log2(rnk + 1.0)), 6) AS dcg,
        | round(CASE WHEN sum((pow(2.0, rel) - 1.0) / log2(irank + 1.0)) > 0
        |   THEN sum((pow(2.0, rel) - 1.0) / log2(rnk + 1.0))
        |      / sum((pow(2.0, rel) - 1.0) / log2(irank + 1.0))
        |   ELSE 0.0 END, 6) AS ndcg
        |FROM i GROUP BY query_id""".stripMargin,

    // Distinct-n per source: same whitespace split, same n-gram
    // windows (ngram_novelty's generate_series pattern per n).
    "ngram_diversity" ->
      """WITH wdocs AS (SELECT source, string_split_regex(trim(text), '\s+') AS words FROM documents),
        | g AS (SELECT source, n,
        |        unnest(list_transform(generate_series(1, len(words) - n + 1),
        |          i -> array_to_string(words[i:i+n-1], ' '))) AS g
        |       FROM wdocs, (SELECT unnest([1, 2, 3]) AS n) ns
        |       WHERE len(words) >= n)
        |SELECT source, CAST(n AS BIGINT) AS n, count(*) AS n_grams,
        | count(DISTINCT g) AS n_distinct,
        | round(count(DISTINCT g)::DOUBLE / count(*), 6) AS diversity
        |FROM g WHERE g <> '' GROUP BY source, n""".stripMargin,

    // HLL diversity gate: exact side replayed, approx_ok pinned TRUE
    // (the corpus_distinct_approx pattern — a drifting sketch flips
    // the boolean Spark-side and breaks the hash).
    "ngram_diversity_approx" ->
      """WITH wdocs AS (SELECT source, string_split_regex(trim(text), '\s+') AS words FROM documents),
        | g AS (SELECT source, n,
        |        unnest(list_transform(generate_series(1, len(words) - n + 1),
        |          i -> array_to_string(words[i:i+n-1], ' '))) AS g
        |       FROM wdocs, (SELECT unnest([1, 2, 3]) AS n) ns
        |       WHERE len(words) >= n)
        |SELECT source, CAST(n AS BIGINT) AS n, count(*) AS n_grams,
        | count(DISTINCT g) AS n_distinct, TRUE AS approx_ok
        |FROM g WHERE g <> '' GROUP BY source, n""".stripMargin,

    // PSL-backed registrable domains: planted hosts + the identical
    // regex chain, with the suffix IN lists GENERATED from the same
    // checked-in snapshot UrlOps loads — list drift breaks the hash.
    "url_registrable" -> urlRegistrableSql,

    // Full step-for-step replay of UrlOps.canonicalUrl: fragment/query
    // split, tracking filter + name sort, scheme+host lower, default
    // ports, trailing slash. DuckDB backrefs are \1 (Spark's $1).
    "url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |   'HTTPS://' || source || '.Example.COM' ||
        |   CASE WHEN doc_id % 5 = 0 THEN ':443'
        |        WHEN doc_id % 5 = 1 THEN ':8443' ELSE '' END ||
        |   '/Articles/' || CAST(doc_id AS VARCHAR) ||
        |   CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
        |   CASE WHEN doc_id % 2 = 0 THEN '?b=2&utm_source=mail&a=1&fbclid=XyZ'
        |        WHEN doc_id % 3 = 1 THEN '?utm_campaign=x' ELSE '' END ||
        |   CASE WHEN doc_id % 7 = 0 THEN '#sec-2' ELSE '' END AS url
        |  FROM documents),
        | s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        | s2 AS (SELECT doc_id, regexp_replace(nofrag, '\?.*$', '') AS base,
        |         regexp_extract(nofrag, '\?(.*)$', 1) AS q FROM s1),
        | s3 AS (SELECT doc_id, base,
        |         list_sort(list_filter(string_split(q, '&'), p -> p <> ''
        |           AND NOT regexp_matches(p,
        |             '^(utm_[^=]*|fbclid|gclid|dclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$')))
        |           AS kept
        |        FROM s2),
        | s4 AS (SELECT doc_id, kept, regexp_replace(
        |          regexp_replace(regexp_replace(
        |            lower(regexp_extract(base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)),
        |            '^(http://[^:/]*):80$', '\1'),
        |            '^(https://[^:/]*):443$', '\1')
        |          || regexp_extract(base, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$', 1),
        |          '(.)/$', '\1') AS joined
        |        FROM s3)
        |SELECT doc_id, CASE WHEN len(kept) > 0
        |  THEN joined || '?' || array_to_string(kept, '&')
        |  ELSE joined END AS url_canonical
        |FROM s4""".stripMargin,

    // The oracle computes the EXPECTED repaired text directly from the
    // plant (ground truth), not a replay of the repair — any bug in
    // the general single-pass fuser hash-mismatches.
    "fix_mojibake" ->
      """SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN text
        | ELSE replace(replace(replace(text, 'a', 'á'), 'e', 'é'), 'o', 'ö')
        |      || ' Ã1' END AS fixed
        |FROM documents""".stripMargin,

    // PSL-keyed per-domain quota: hash-priority rank replay, quota 3.
    "domain_quota" -> domainQuotaSql,

    // Binary quantization: the sign rule (e[d] > 0) and per-dim
    // hamming count replayed from raw embeddings — the packed-long
    // xor/bit_count path must agree exactly, then exact float rerank.
    "bq_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        | q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
        | hd AS (SELECT vec_id,
        |         CAST(list_sum(list_transform(generate_series(1, 64),
        |           d -> CASE WHEN (e[d] > 0) <> (qv[d] > 0) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |        FROM v, q),
        | ap AS (SELECT vec_id, hamming FROM hd ORDER BY hamming ASC, vec_id ASC LIMIT 50),
        | re AS (SELECT ap.vec_id, ap.hamming, list_cosine_similarity(v.e, q.qv) AS c
        |        FROM ap JOIN v ON ap.vec_id = v.vec_id, q)
        |SELECT vec_id, hamming, round(c, 6) AS cosine
        |FROM re ORDER BY c DESC, vec_id LIMIT 10""".stripMargin,

    // Same planted URLs; host/site/normalize replicated with the
    // LITERAL same RE2-safe regexes (DuckDB backrefs are \1, Spark's
    // $1 — same semantics). DuckDB regexp_replace is first-match-only
    // by default, which coincides with Spark's replace-all here
    // because every pattern is end-anchored or single-match.
    "url_domains" ->
      """WITH e AS (SELECT doc_id, text,
        |    'https://WWW.' || source || '.Example.COM:443/p/' || doc_id ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0 THEN '?utm=x' ELSE '#frag' END AS url
        |   FROM documents),
        | n AS (SELECT doc_id, text,
        |    regexp_replace(regexp_replace(lower(regexp_extract(url,
        |      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':[0-9]+$', ''),
        |      '^www\.', '') AS domain,
        |    regexp_replace(
        |      lower(regexp_extract(regexp_replace(url, '[?#].*$', ''),
        |        '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1)) ||
        |      regexp_extract(regexp_replace(url, '[?#].*$', ''),
        |        '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$', 1),
        |      '(.)/$', '\1') AS norm_url
        |   FROM e)
        |SELECT domain, count(*) AS n_docs,
        | count(DISTINCT norm_url) AS n_urls,
        | CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM n WHERE domain <> '' GROUP BY domain""".stripMargin,

    // Gate-is-oracle: the sketch side contributes only the boolean —
    // a broken compaction/merge/serialization flips qs_ok to false in
    // Spark and breaks the hash.
    "quantile_sketch" ->
      """SELECT d AS decile, (SELECT count(*) FROM lineitem) AS n, true AS qs_ok
        |FROM generate_series(1, 9) t(d) ORDER BY d""".stripMargin,

    // Gate-is-oracle: deflate is not engine-portable, so the oracle
    // replays only the portable columns (strlen = UTF-8 bytes, the
    // octet_length twin) and pins deflate_ok — the Spark side computes
    // it from RFC 1951 stream invariants (bounds + doubling law).
    "compression_ratio" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        | true AS deflate_ok
        |FROM documents""".stripMargin,

    "cms_check" ->
      """WITH m AS (SELECT CASE WHEN count(*) > 100000 THEN 8 ELSE 1 END AS sm
        |   FROM documents),
        | ww AS (SELECT wd FROM (SELECT
        |        unnest(string_split_regex(trim(lower(text)), '\s+')) AS wd
        |       FROM documents WHERE doc_id % (SELECT sm FROM m) = 0) WHERE wd <> '')
        |SELECT wd AS word, count(*) AS n_exact, true AS cms_ok
        |FROM ww GROUP BY wd
        |ORDER BY n_exact DESC, word LIMIT 20""".stripMargin,

    // Same digit-run regex (RE2 \b, no lookarounds) and Luhn fold; the
    // planting guarantees <= 1 valid card per doc, so redaction is a
    // single replace.
    "luhn_cards" ->
      """WITH e AS (SELECT doc_id,
        |    text || ' pay ' || CASE WHEN doc_id % 2 = 0
        |      THEN '4111111111111111' ELSE '4111111111111112' END || ' end' AS card_text
        |   FROM documents),
        | c AS (SELECT doc_id, card_text,
        |        regexp_extract_all(card_text, '\b[0-9]{13,19}\b') AS cards FROM e),
        | v AS (SELECT doc_id, card_text, cards,
        |        list_filter(cards, x -> (list_sum(list_transform(generate_series(1, length(x)), i ->
        |          CASE WHEN i % 2 = 0
        |            THEN CASE WHEN CAST(substring(reverse(x), i, 1) AS INT) * 2 > 9
        |              THEN CAST(substring(reverse(x), i, 1) AS INT) * 2 - 9
        |              ELSE CAST(substring(reverse(x), i, 1) AS INT) * 2 END
        |            ELSE CAST(substring(reverse(x), i, 1) AS INT) END)) % 10 = 0)) AS valid
        |       FROM c)
        |SELECT doc_id, CAST(len(cards) AS BIGINT) AS n_card_candidates,
        | CAST(len(valid) AS BIGINT) AS n_luhn_valid,
        | CASE WHEN len(valid) >= 1 THEN replace(card_text, valid[1], '[CARD]')
        |      ELSE card_text END AS redacted
        |FROM v""".stripMargin,

    // Per-language MG gate: exact per-lang heavy set recomputed, the
    // booleans assert the sketch bound (heavy_hitters pattern).
    "heavy_hitters_by_lang" ->
      """WITH ww AS (SELECT lang, wd FROM (SELECT lang,
        |        unnest(string_split_regex(trim(lower(text)), '\s+')) AS wd
        |       FROM documents) WHERE wd <> ''),
        | tot AS (SELECT lang, count(*) AS n FROM ww GROUP BY lang),
        | ex AS (SELECT lang, wd, count(*) AS n_exact FROM ww GROUP BY lang, wd)
        |SELECT ex.lang, wd AS word, n_exact, true AS mg_ok
        |FROM ex JOIN tot ON ex.lang = tot.lang WHERE n_exact * 30 > tot.n
        |ORDER BY ex.lang, n_exact DESC, word""".stripMargin,

    // dedup_jaccard's pair pipeline (positives) + per-anchor hard
    // negative: top-1 cosine over embeddings excluding the anchor and
    // its partners both ways. MATERIALIZED: sh/sets/p are referenced
    // multiple times.
    "contrastive_pairs" ->
      """WITH sh AS MATERIALIZED (SELECT DISTINCT doc_id AS sid,
        |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
        |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
        | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
        | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
        | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
        |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
        |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
        | sets AS MATERIALIZED (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
        | v AS (SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
        |       FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b),
        | p AS MATERIALIZED (SELECT id_a, id_b, round(CAST(i AS DOUBLE) / (s_a + s_b - i), 6) AS jaccard
        |      FROM v WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2
        |        AND id_a < (SELECT CASE WHEN count(*) <= 50000 THEN 1000 ELSE 250 END FROM documents)),
        | anch AS (SELECT DISTINCT id_a FROM p),
        | excl AS MATERIALIZED (SELECT id_a AS a, id_b AS x FROM p
        |         UNION SELECT id_b, id_a FROM p UNION SELECT id_a, id_a FROM p),
        | av AS (SELECT anch.id_a, CAST(e.embedding AS DOUBLE[]) AS qv
        |        FROM anch JOIN embeddings e ON e.vec_id = anch.id_a),
        | sc AS (SELECT av.id_a, e.vec_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), av.qv) AS c
        |        FROM embeddings e, av
        |        WHERE NOT EXISTS (SELECT 1 FROM excl
        |                          WHERE excl.a = av.id_a AND excl.x = e.vec_id)),
        | neg AS (SELECT id_a, vec_id AS negative_id, c FROM sc
        |         QUALIFY row_number() OVER (PARTITION BY id_a ORDER BY c DESC, vec_id) = 1)
        |SELECT p.id_a AS anchor_id, p.id_b AS positive_id, p.jaccard,
        |       neg.negative_id, round(neg.c, 6) AS neg_cosine
        |FROM p JOIN neg ON neg.id_a = p.id_a""".stripMargin,

    "value_drift" -> valueDriftSql(),

    // Distinct (user, item) pairs, per-user self-join, exact integer
    // lift ratio rounded 6 dp.
    "item_pairs" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |        TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS i
        |       FROM events),
        | ic AS (SELECT i, count(*) AS ni FROM ui GROUP BY i),
        | nu AS (SELECT count(DISTINCT u) AS n FROM ui),
        | p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_ab
        |       FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i
        |       GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab, ia.ni AS n_a, ib.ni AS n_b,
        | round(CAST(n_ab * nu.n AS DOUBLE) / CAST(ia.ni * ib.ni AS DOUBLE), 6) AS lift
        |FROM p JOIN ic ia ON ia.i = item_a JOIN ic ib ON ib.i = item_b, nu
        |ORDER BY n_ab DESC, item_a, item_b LIMIT 20""".stripMargin,

    // Same micro-credit convention: 1e6 div n per touch, remainder to
    // the earliest (ties by channel name), summed exactly.
    "linear_attribution" ->
      """WITH t AS (SELECT user_id, event_type, min(ts) AS ft
        |       FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2),
        | c AS (SELECT user_id, ts AS cts FROM events WHERE event_type = 'purchase'),
        | j AS (SELECT c.user_id, c.cts, t.event_type, t.ft
        |       FROM c JOIN t USING (user_id) WHERE t.ft <= c.cts),
        | r AS (SELECT *, count(*) OVER (PARTITION BY user_id, cts) AS n,
        |        row_number() OVER (PARTITION BY user_id, cts ORDER BY ft, event_type) AS rk
        |       FROM j),
        | cr AS (SELECT event_type,
        |        (1000000 // n) + CASE WHEN rk = 1 THEN 1000000 % n ELSE 0 END AS credit
        |       FROM r)
        |SELECT event_type AS channel, count(*) AS n_touchpoints,
        | CAST(sum(credit) AS BIGINT) AS credit_micro,
        | CAST(sum(credit) AS DOUBLE) / 1000000.0 AS credit
        |FROM cr GROUP BY 1""".stripMargin,

    // The parser is verified WITHOUT the oracle touching bytes: every
    // field of the planted square-wave WAV is an arithmetic function
    // of doc_id (RMS of a +/-A square wave is exactly A).
    "audio_meta" ->
      """SELECT doc_id,
        | CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
        | CAST(1 AS BIGINT) AS channels,
        | CAST(16 AS BIGINT) AS bits,
        | CAST(200 + doc_id % 100 AS BIGINT) AS n_samples,
        | CAST((200 + doc_id % 100) * 1000000 // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_us,
        | round(CAST(100 + doc_id % 900 AS DOUBLE), 6) AS rms,
        | 'pcm_s16le' AS audio_format
        |FROM documents""".stripMargin,

    // q8's session window logic, rolled up per (user, session).
    "session_stats" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tn FROM events),
        | x AS (SELECT *, lag(tn) OVER (PARTITION BY user_id ORDER BY tn, event_id) AS pv FROM e),
        | y AS (SELECT user_id, event_id, tn,
        |        CASE WHEN pv IS NULL OR tn - pv > 1800000000000 THEN 1 ELSE 0 END AS ns FROM x),
        | z AS (SELECT user_id, tn,
        |        CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY tn, event_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sidx FROM y)
        |SELECT user_id, sidx AS session_idx, count(*) AS n_events,
        | CAST(max(tn) - min(tn) AS BIGINT) AS duration,
        | CAST(min(tn) AS BIGINT) AS session_start
        |FROM z GROUP BY 1, 2""".stripMargin,

    // Exact integer moments -> identical double sqrt/z expression on
    // both engines; threshold on the 6dp-rounded z.
    "anomaly_days" ->
      """WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n
        |       FROM events GROUP BY 1, 2),
        | m AS (SELECT event_type, count(*) AS dd, CAST(sum(n) AS BIGINT) AS sx,
        |        CAST(sum(n * n) AS BIGINT) AS sxx
        |       FROM d GROUP BY event_type)
        |SELECT d.event_type, day, n,
        | round((CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(dd AS DOUBLE)) /
        |   sqrt(CAST(dd * sxx - sx * sx AS DOUBLE) / (CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE))), 6) AS z
        |FROM d JOIN m ON d.event_type = m.event_type
        |WHERE abs(round((CAST(n AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(dd AS DOUBLE)) /
        |   sqrt(CAST(dd * sxx - sx * sx AS DOUBLE) / (CAST(dd AS DOUBLE) * CAST(dd AS DOUBLE))), 6)) >= 2.0""".stripMargin,

    // The segmenter's output recomputed from the planted run lengths
    // alone: voiced n1, silent gap g >= 16 (always a break), voiced n2.
    "audio_segments" ->
      """WITH p AS (SELECT doc_id,
        |        8000 * (1 + doc_id % 3) AS rate,
        |        100 + doc_id % 900 AS amp,
        |        50 + doc_id % 20 AS n1,
        |        30 + doc_id % 10 AS g,
        |        40 + doc_id % 15 AS n2
        |       FROM documents)
        |SELECT doc_id, CAST(0 AS BIGINT) AS segment_idx,
        | CAST(0 AS BIGINT) AS start_sample, CAST(n1 AS BIGINT) AS end_sample,
        | CAST(0 AS BIGINT) AS start_us,
        | CAST(n1 * 1000000 // rate AS BIGINT) AS end_us,
        | CAST(amp AS BIGINT) AS peak
        |FROM p
        |UNION ALL
        |SELECT doc_id, CAST(1 AS BIGINT), CAST(n1 + g AS BIGINT),
        | CAST(n1 + g + n2 AS BIGINT),
        | CAST((n1 + g) * 1000000 // rate AS BIGINT),
        | CAST((n1 + g + n2) * 1000000 // rate AS BIGINT),
        | CAST(amp AS BIGINT)
        |FROM p""".stripMargin,

    // Full-chain replay: quality gate (quality_filter fragments over
    // the pool) -> sha min-id dedup -> exact 5-gram decontamination
    // vs the bench slice -> md5-bucket split. Any stage regression
    // breaks this hash too.
    "pipeline_corpus" ->
      """WITH pool AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        | s AS (SELECT doc_id, text,
        |   regexp_replace(text, '^\s+|\s+$', '', 'g') AS trimmed,
        |   ' ' || lower(text) || ' ' AS padded FROM pool),
        | u AS (SELECT doc_id, text, padded,
        |   CASE WHEN length(trimmed) = 0 THEN 0
        |        ELSE CAST(len(string_split_regex(trimmed, '\s+')) AS BIGINT) END AS n_words
        |   FROM s),
        | m AS (SELECT doc_id, text, n_words,
        |   CASE WHEN n_words = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / n_words END AS awl,
        |   CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' a ', ''))) / 3 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' of ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' and ', ''))) / 5 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' to ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' in ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' is ', ''))) / 4 AS BIGINT)
        |   + CAST((length(padded) - length(replace(padded, ' it ', ''))) / 4 AS BIGINT) AS n_stop,
        |   (length(text) - length(replace(text, '#', '')))
        |   + (length(text) - length(replace(text, '$', '')))
        |   + (length(text) - length(replace(text, '%', '')))
        |   + (length(text) - length(replace(text, '{', '')))
        |   + (length(text) - length(replace(text, '}', '')))
        |   + (length(text) - length(replace(text, '<', '')))
        |   + (length(text) - length(replace(text, '>', ''))) AS n_sym
        |   FROM u),
        | q AS (SELECT doc_id, text FROM m
        |   WHERE n_words >= 8 AND n_words <= 100000
        |     AND awl >= 2.0 AND awl <= 12.0
        |     AND (CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_sym AS DOUBLE) / n_words END) <= 0.1
        |     AND (CASE WHEN n_words = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_words END) >= 0.02),
        | ex AS (SELECT doc_id, text FROM (
        |   SELECT doc_id, text, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |   FROM q) WHERE rn = 1),
        | bg AS (SELECT DISTINCT CAST('0x' || substring(md5(array_to_string(words[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |        FROM (SELECT words, unnest(generate_series(1, len(words) - 4)) AS i
        |              FROM (SELECT string_split_regex(trim(text), '\s+') AS words
        |                    FROM documents WHERE doc_id % 10 = 0) WHERE len(words) >= 5)),
        | cg AS (SELECT DISTINCT doc_id,
        |         CAST('0x' || substring(md5(array_to_string(words[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |        FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i
        |              FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM ex)
        |              WHERE len(words) >= 5)),
        | flagged AS (SELECT DISTINCT doc_id FROM cg WHERE gh IN (SELECT gh FROM bg)),
        | clean AS (SELECT doc_id FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM flagged))
        |SELECT doc_id, CASE WHEN b < 10 THEN 'test' WHEN b < 20 THEN 'val' ELSE 'train' END AS split
        |FROM (SELECT doc_id,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS b
        |      FROM clean)""".stripMargin,

    // Distinct word 5-gram hashes (decontaminate's gram convention),
    // df = 1 means the gram exists in exactly this document.
    "ngram_novelty" ->
      """WITH wdocs AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS words FROM documents),
        | dg AS (SELECT DISTINCT doc_id,
        |         CAST('0x' || substring(md5(array_to_string(words[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |        FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 4)) AS i
        |              FROM wdocs WHERE len(words) >= 5)),
        | dfq AS (SELECT gh, count(*) AS df FROM dg GROUP BY gh)
        |SELECT doc_id, count(*) AS n_grams,
        | CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        | CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
        |FROM dg JOIN dfq USING (gh) GROUP BY doc_id""".stripMargin,

    "value_deciles" -> valueDecilesSql(),

    // dup_spans' positional-gram island merge, with the dup-gram
    // filter swapped for benchmark membership.
    "decontaminate_spans" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
        | g AS (SELECT doc_id, i AS pos,
        |        CAST('0x' || substring(md5(array_to_string(ws[i:i+4], ' ')), 1, 15) AS BIGINT) AS gh
        |       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i
        |             FROM w WHERE len(ws) >= 5)),
        | bg AS (SELECT DISTINCT gh FROM g WHERE doc_id % 10 = 0),
        | p AS (SELECT DISTINCT doc_id, pos FROM g
        |       WHERE doc_id % 10 <> 0 AND gh IN (SELECT gh FROM bg)),
        | i AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM p)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
        | max(pos) + 4 - min(pos) + 1 AS span_words
        |FROM i GROUP BY doc_id, grp""".stripMargin)

  /** LSH top-k oracle: replays the deterministic random-hyperplane
    * bucket of [[graft.ops.SimilaritySearch.lshBucketColumn]] — the
    * plane matrix is regenerated from the same splitmix-style
    * `planeComponent(plane, d)` constants, emitted as double literals
    * (Double.toString round-trips exactly) — then prunes to buckets
    * within `probeHamming` bit flips of the query's own bucket and
    * ranks by exact cosine. */
  /** Bucketed embedding near-dup oracle: replays
    * [[graft.ops.Dedup.embeddingNearDupsBucketed]] — identical
    * deterministic plane matrix (emitted as double literals), band keys
    * = bandBits-wide slices of the sign bucket, candidate pairs from the
    * (band, key) equi-join, exact cosine verification on candidates. */
  /** Corpus-scaled band width: the SQL derives bandBits from count(*)
    * with the SAME tiers as Queries.dedupEmbeddingBucketed (n ≤ 4096 →
    * `bandBits`, ≤ 65536 → 8, else 16), so the oracle stays valid at
    * every corpus size instead of silently hash-mismatching above the
    * first tier (r9 ADVICE finding). */
  private def dedupEmbeddingBucketedSql(dim: Int, numPlanes: Int,
      bandBits: Int, threshold: Double): String = {
    val bucketExpr = (0 until numPlanes).map { p =>
      val comps = (0 until dim)
        .map(d => graft.ops.SimilaritySearch.planeComponent(p, d).toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), $comps) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH p AS (SELECT CASE WHEN count(*) <= 4096 THEN $bandBits
       |        WHEN count(*) <= 65536 THEN 8 ELSE 16 END AS bb
       |       FROM embeddings),
       | b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        ($bucketExpr) AS bits
       |       FROM embeddings),
       | bk AS (SELECT vec_id, band, (bits >> (band * p.bb)) & ((1 << p.bb) - 1) AS key
       |        FROM (SELECT vec_id, bits, unnest(generate_series(0, CAST($numPlanes / p.bb AS INT) - 1)) AS band
       |              FROM b, p), p),
       | cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |          FROM bk x JOIN bk y ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, round(list_cosine_similarity(va.v, vb.v), 6) AS cosine
       |FROM cand JOIN b va ON va.vec_id = id_a JOIN b vb ON vb.vec_id = id_b
       |WHERE list_cosine_similarity(va.v, vb.v) >= $threshold""".stripMargin
  }

  /** Shared CTE prefix for the PSL query family — generated from the
    * SAME snapshot UrlOps loads: the planted hosts, the hostOf/siteOf
    * regex chain, and the longest-suffix CASE with the snapshot's
    * 2-/3-level IN lists inlined (list drift breaks the hash). Yields
    * CTE `r` with (doc_id, host, registrable_domain). */
  private def pslRegistrableCtes: String = {
    val in2 = graft.ops.UrlOps.pslSuffixes2.map(s => s"'$s'").mkString(", ")
    val in3 = graft.ops.UrlOps.pslSuffixes3.map(s => s"'$s'").mkString(", ")
    val l2 = """regexp_extract(site, '([^.]+\.[^.]+)$', 1)"""
    val l3 = """regexp_extract(site, '([^.]+\.[^.]+\.[^.]+)$', 1)"""
    val l4 = """regexp_extract(site, '([^.]+\.[^.]+\.[^.]+\.[^.]+)$', 1)"""
    s"""WITH e AS (SELECT doc_id,
       |    'https://' || CASE doc_id % 5
       |      WHEN 0 THEN 'a' || doc_id % 7 || '.shop' || doc_id % 3 || '.example.co.uk'
       |      WHEN 1 THEN 'news' || doc_id % 7 || '.site' || doc_id % 3 || '.com.au'
       |      WHEN 2 THEN 'u' || doc_id % 7 || '.github.io'
       |      WHEN 3 THEN 'www.portal' || doc_id % 3 || '.k12.ca.us'
       |      ELSE 'CDN' || doc_id % 3 || '.Example.COM:8080' END
       |      || '/p/' || doc_id AS url
       |   FROM documents),
       | h AS (SELECT doc_id,
       |    regexp_replace(lower(regexp_extract(url,
       |      '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)), ':[0-9]+$$', '') AS host
       |   FROM e),
       | s AS (SELECT doc_id, host,
       |        regexp_replace(host, '^www\\.', '') AS site FROM h),
       | r AS (SELECT doc_id, host,
       |    CASE WHEN $l3 IN ($in3) AND $l4 <> '' THEN $l4
       |         WHEN $l2 IN ($in2) AND $l3 <> '' THEN $l3
       |         ELSE $l2 END AS registrable_domain
       |   FROM s)""".stripMargin
  }

  // NB: the prefix is concatenated, NOT interpolated into a second
  // stripMargin — `|| '/p/'` continuation lines would be re-stripped.
  private def urlRegistrableSql: String =
    pslRegistrableCtes + "\n" +
      """SELECT registrable_domain, count(*) AS n_docs,
        | count(DISTINCT host) AS n_hosts
        |FROM r GROUP BY registrable_domain""".stripMargin

  /** Per-domain quota: the stratified_quota hash-rank replay keyed by
    * the PSL registrable domain. */
  private def domainQuotaSql: String =
    pslRegistrableCtes + "\n" +
      """SELECT doc_id, registrable_domain, sample_rank FROM (
        | SELECT doc_id, registrable_domain, row_number() OVER (
        |   PARTITION BY registrable_domain
        |   ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
        |     doc_id) AS sample_rank
        | FROM r) WHERE sample_rank <= 3""".stripMargin

  private def lshTopkSql(dim: Int, numPlanes: Int, probeHamming: Int, k: Int): String = {
    val bucketExpr = (0 until numPlanes).map { p =>
      val comps = (0 until dim)
        .map(d => graft.ops.SimilaritySearch.planeComponent(p, d).toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), $comps) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       | b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        ($bucketExpr) AS bucket
       |       FROM embeddings),
       | qb AS (SELECT bucket AS qbucket FROM b WHERE vec_id = 0)
       |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine
       |FROM b, q, qb
       |WHERE bit_count(xor(bucket, qbucket)) <= $probeHamming
       |ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT $k""".stripMargin
  }

  /** IVF top-k oracle: replays [[graft.ops.SimilaritySearch.ivfTopK]] —
    * same deterministic plane matrix for the bucket, per-bucket mean
    * centroids, probe = nProbe buckets by 6-dp-rounded centroid cosine
    * (bucket tiebreak — rounding absorbs summation-order ulps between
    * engines), exact cosine rank inside the probed buckets. */
  /** Replays [[graft.ops.SimilaritySearch.ivfTopKFiltered]] exactly:
    * same plane buckets, same 6 dp-rounded centroid ranking (ties to
    * the lower bucket), same probe-prefix rule (smallest
    * nProbeInit·2^j whose cumulative FILTERED count reaches k, whole
    * index if none), same exact top-k over the filtered probed rows. */
  private def ivfFilteredSql(dim: Int, numPlanes: Int, nProbeInit: Int,
      k: Int, pred: String): String = {
    val bucketExpr = (0 until numPlanes).map { p =>
      val comps = (0 until dim)
        .map(d => graft.ops.SimilaritySearch.planeComponent(p, d).toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), $comps) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val centroid = (1 to dim).map(d => s"avg(v[$d])").mkString("[", ", ", "]")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       | b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |        ($bucketExpr) AS bucket
       |       FROM embeddings),
       | cent AS (SELECT bucket, $centroid AS c FROM b GROUP BY bucket),
       | rk AS (SELECT bucket, row_number() OVER (
       |          ORDER BY round(list_cosine_similarity(c, qv), 6) DESC, bucket) AS rnk
       |        FROM cent, q),
       | fcnt AS (SELECT bucket, count(*) AS n FROM b WHERE $pred GROUP BY bucket),
       | cum AS (SELECT rnk, bucket, sum(coalesce(n, 0)) OVER (ORDER BY rnk) AS cumn
       |         FROM rk LEFT JOIN fcnt USING (bucket)),
       | need AS (SELECT coalesce(min(rnk), (SELECT count(*) FROM cent)) AS minrnk
       |          FROM cum WHERE cumn >= $k),
       | psel AS (SELECT least((SELECT count(*) FROM cent),
       |    (SELECT min($nProbeInit * CAST(pow(2, j) AS BIGINT))
       |     FROM generate_series(0, 24) t(j)
       |     WHERE $nProbeInit * CAST(pow(2, j) AS BIGINT) >= (SELECT minrnk FROM need))) AS p),
       | probe AS (SELECT bucket FROM cum, psel WHERE rnk <= p)
       |SELECT vec_id, CAST(label AS BIGINT) AS label,
       | round(list_cosine_similarity(v, qv), 6) AS cosine
       |FROM b JOIN probe USING (bucket), q
       |WHERE $pred
       |ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT $k""".stripMargin
  }

  private def ivfTopkSql(dim: Int, numPlanes: Int, nProbe: Int, k: Int): String = {
    val bucketExpr = (0 until numPlanes).map { p =>
      val comps = (0 until dim)
        .map(d => graft.ops.SimilaritySearch.planeComponent(p, d).toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), $comps) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")
    val centroid = (1 to dim).map(d => s"avg(v[$d])").mkString("[", ", ", "]")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       | b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        ($bucketExpr) AS bucket
       |       FROM embeddings),
       | cent AS (SELECT bucket, $centroid AS c FROM b GROUP BY bucket),
       | probe AS (SELECT bucket FROM cent, q
       |           ORDER BY round(list_cosine_similarity(c, qv), 6) DESC, bucket LIMIT $nProbe)
       |SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine
       |FROM b JOIN probe USING (bucket), q
       |ORDER BY list_cosine_similarity(v, qv) DESC, vec_id LIMIT $k""".stripMargin
  }

  /** SimHash oracle: replays [[graft.ops.Dedup.simhash]] — 60 bit-vote
    * sums over the portable md5-prefix hash, fingerprint from positive
    * votes, 4×15-bit chunk blocking, hamming ≤ maxHamming. */
  private def simhashSql(n: Int, maxHamming: Int): String = {
    val votes = (0 until 60)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n |  ")
    val fp = (0 until 60)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sh AS (SELECT DISTINCT doc_id AS sid,
       |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), $n)), 1, 15) AS BIGINT) AS h
       |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - ${n - 1}, 1))) AS i FROM documents)),
       | votes AS (SELECT sid,
       |  $votes
       | FROM sh GROUP BY sid),
       | fp AS (SELECT sid, ($fp) AS f FROM votes),
       | ch AS (SELECT sid, f, ci, (f >> (ci * 15)) & 32767 AS chunk
       |        FROM fp, generate_series(0, 3) AS g(ci)),
       | cand AS (SELECT DISTINCT a.sid AS id_a, b.sid AS id_b, a.f AS fa, b.f AS fb
       |          FROM ch a JOIN ch b ON a.ci = b.ci AND a.chunk = b.chunk AND a.sid < b.sid)
       |SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= $maxHamming""".stripMargin
  }

  /** MinHash+LSH oracle: replays [[graft.ops.Dedup.minhashSignatures]]'s
    * hash family verbatim — H = int of first 7 md5 hex chars, per-seed
    * h_i = (a_i·H + b_i) mod p with the coefficients from
    * [[graft.ops.Dedup.minhashSeeds]] — then compares band-key equality
    * pairwise (equivalent to the engine's (band, band_key) equi-join
    * buckets; the oracle runs at sf0.01 where all-pairs is cheap). */
  /** Decile-drift oracle: quantile_cont deciles per (event_type, half),
    * 6 dp-rounded, gap over the rounded values — the
    * daily_percentiles convention extended to a decile vector. */
  private def valueDriftSql(): String = {
    def side(tag: String, parity: Int): String = {
      val cols = (1 to 9).map(i =>
        s"round(quantile_cont(value, 0.$i), 6) AS p${i}0_$tag").mkString(", ")
      s"""d$tag AS (SELECT event_type, $cols, count(*) AS n_$tag
         |       FROM events WHERE event_id % 2 = $parity GROUP BY event_type)""".stripMargin
    }
    val gap = (1 to 9).map(i => s"abs(p${i}0_a - p${i}0_b)")
      .reduce((x, y) => s"greatest($x, $y)")
    val outCols = (1 to 9).flatMap(i => Seq(s"p${i}0_a", s"p${i}0_b")).mkString(", ")
    s"""WITH ${side("a", 0)},
       | ${side("b", 1)}
       |SELECT da.event_type, n_a, n_b, $outCols, round($gap, 6) AS max_decile_gap
       |FROM da JOIN db USING (event_type)""".stripMargin
  }

  /** Decile-bucketing oracle: per-type rounded decile thresholds,
    * bucket = 1 + #(thresholds strictly below), exact integer cents. */
  private def valueDecilesSql(): String = {
    val ths = (1 to 9).map(i =>
      s"round(quantile_cont(value, 0.$i), 6) AS t$i").mkString(", ")
    val bucket = (1 to 9).map(i =>
      s"(CASE WHEN value > t$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH th AS (SELECT event_type, $ths FROM events GROUP BY event_type)
       |SELECT e.event_type, CAST(1 + $bucket AS BIGINT) AS decile,
       | count(*) AS n,
       | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
       |FROM events e JOIN th USING (event_type)
       |GROUP BY 1, 2""".stripMargin
  }

  /** MMR rerank oracle: replays [[graft.ops.SimilaritySearch.mmrRerank]]
    * as an UNROLLED greedy — one CTE per selection step. Pool = exact
    * cosine top-`poolSize` (raw-double ordering, id ties), relevance
    * and pairwise sims in integer micro-units (round parity), each
    * step's objective `lambdaNum·rel_µ − (10−lambdaNum)·maxSim_µ`
    * exact integer arithmetic with id tie-breaks — so the SQL picks
    * the identical sequence the driver loop picks. */
  private def mmrSql(poolSize: Int, k: Int, lambdaNum: Int): String = {
    val lamC = 10 - lambdaNum
    def picked(s: Int): String =
      (1 until s).map(i => s"SELECT id FROM sel$i").mkString(" UNION ALL ")
    val sel1 =
      s"""sel1 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS rank, id, rel_m, CAST($lambdaNum * rel_m AS BIGINT) AS s_m
         | FROM pool ORDER BY rel_m DESC, id LIMIT 1)""".stripMargin
    val steps = (2 to k).map { s =>
      s"""sel$s AS MATERIALIZED (SELECT CAST($s AS BIGINT) AS rank, p.id, p.rel_m,
         |   $lambdaNum * p.rel_m - $lamC * (SELECT max(pp.sim_m) FROM pairs pp
         |      WHERE pp.a = p.id AND pp.b IN (${picked(s)})) AS s_m
         | FROM pool p WHERE p.id NOT IN (${picked(s)})
         | ORDER BY s_m DESC, p.id LIMIT 1)""".stripMargin
    }
    val unionAll = (1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       | scored AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
       |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv) AS c
       |   FROM embeddings, q),
       | pool AS MATERIALIZED (SELECT id, v, CAST(round(c * 1000000.0) AS BIGINT) AS rel_m
       |          FROM scored ORDER BY c DESC, id LIMIT $poolSize),
       | pairs AS MATERIALIZED (SELECT a.id AS a, b.id AS b,
       |    CAST(round(list_cosine_similarity(a.v, b.v) * 1000000.0) AS BIGINT) AS sim_m
       |   FROM pool a, pool b),
       | $sel1,
       | ${steps.mkString(",\n ")}
       |SELECT rank, id AS vec_id, CAST(rel_m AS DOUBLE) / 1000000.0 AS relevance,
       |       CAST(s_m AS DOUBLE) / 10000000.0 AS mmr_score
       |FROM ($unionAll)""".stripMargin
  }

  /** Fuzzy-decontamination oracle: replays
    * [[graft.ops.Dedup.minhashDecontaminate]] — identical MinHash seed
    * family over char-8-gram shingles on both the corpus (doc_id % 10
    * != 0) and benchmark (doc_id % 10 == 0) sides, LSH-band candidate
    * pairs across the two, signature-match-fraction estimate
    * (minMatches/numHashes threshold; x/16 is dyadic → exact). */
  private def minhashDecontaminateSql(numHashes: Int, rowsPerBand: Int,
      minMatches: Int): String = {
    val seeds = graft.ops.Dedup.minhashSeeds(numHashes)
    val p = graft.ops.Dedup.MinhashP
    val minExprs = seeds.zipWithIndex.map { case ((a, b), i) =>
      s"min((CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) * $a + $b) % $p) AS mh$i"
    }.mkString(",\n |  ")
    val bandEq = (0 until numHashes / rowsPerBand).map { bn =>
      (bn * rowsPerBand until (bn + 1) * rowsPerBand)
        .map(i => s"c.mh$i = b.mh$i").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    val matchSum = (0 until numHashes)
      .map(i => s"(CASE WHEN c.mh$i = b.mh$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH shc AS (SELECT DISTINCT doc_id AS sid, substring(text, CAST(i AS INT), 8) AS shingle
       |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
       |                   FROM documents WHERE doc_id % 10 <> 0)),
       | shb AS (SELECT DISTINCT doc_id AS sid, substring(text, CAST(i AS INT), 8) AS shingle
       |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
       |                   FROM documents WHERE doc_id % 10 = 0)),
       | sigc AS (SELECT sid,
       |  $minExprs
       | FROM shc GROUP BY sid),
       | sigb AS (SELECT sid,
       |  $minExprs
       | FROM shb GROUP BY sid)
       |SELECT c.sid AS doc_id, b.sid AS bench_id,
       |       ($matchSum) / ${numHashes}.0 AS minhash_est
       |FROM sigc c JOIN sigb b ON ($bandEq)
       |WHERE ($matchSum) >= $minMatches""".stripMargin
  }

  private def minhashLshSql(numHashes: Int, rowsPerBand: Int,
      dfFraction: Double, dfFloor: Int): String = {
    val seeds = graft.ops.Dedup.minhashSeeds(numHashes)
    val p = graft.ops.Dedup.MinhashP
    val minExprs = seeds.zipWithIndex.map { case ((a, b), i) =>
      s"min((CAST('0x' || substring(md5(shingle), 1, 7) AS BIGINT) * $a + $b) % $p) AS mh$i"
    }.mkString(",\n |  ")
    val bandEq = (0 until numHashes / rowsPerBand).map { bn =>
      (bn * rowsPerBand until (bn + 1) * rowsPerBand)
        .map(i => s"a.mh$i = b.mh$i").mkString("(", " AND ", ")")
    }.mkString(" OR ")
    // rare = hot-shingle cap: signatures are built from shingles in
    // <= greatest(floor(n_docs * dfFraction), dfFloor) docs, mirroring
    // Queries.dedupMinhashLsh / Dedup.minhashLshCandidates(maxDocFreq)
    s"""WITH sh AS (SELECT DISTINCT doc_id AS sid, substring(text, CAST(i AS INT), 8) AS shingle
       |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
       | cap AS (SELECT greatest(CAST(floor(count(*) * $dfFraction) AS BIGINT), $dfFloor) AS c FROM documents),
       | dfc AS (SELECT shingle, count(*) AS cnt FROM sh GROUP BY shingle),
       | ranked AS (SELECT sid, sh.shingle, cnt,
       |    min(cnt) OVER (PARTITION BY sid) AS mindf,
       |    row_number() OVER (PARTITION BY sid ORDER BY cnt,
       |      CAST('0x' || substring(md5(sh.shingle), 1, 15) AS BIGINT)) AS rk
       |   FROM sh JOIN dfc USING (shingle)),
       | rare AS (SELECT sid, shingle FROM ranked, cap
       |          WHERE cnt <= cap.c OR (mindf > cap.c AND rk <= $numHashes)),
       | sig AS (SELECT sid,
       |  $minExprs
       | FROM rare GROUP BY sid)
       |SELECT a.sid AS id_a, b.sid AS id_b FROM sig a JOIN sig b
       | ON a.sid < b.sid AND ($bandEq)""".stripMargin
  }

  /** JL random-projection oracle: regenerates the identical plane
    * matrix from [[graft.ops.SimilaritySearch.planeComponent]] as
    * double literals (Double.toString round-trips exactly) and folds
    * each component with `list_inner_product` in index order —
    * micro-unit rounding absorbs the last-ulp fold difference, the
    * same discipline as doc_centroids. */
  private def randomProjectSql(dimIn: Int, dimOut: Int): String = {
    val comps = (0 until dimOut).map { j =>
      val lits = (0 until dimIn)
        .map(d => graft.ops.SimilaritySearch.planeComponent(j, d).toString)
        .mkString("[", ", ", "]")
      s"CAST(CAST(round(list_inner_product(v, $lits) * 1000000.0) AS BIGINT) AS VARCHAR)"
    }.mkString(" || ',' || ")
    s"""SELECT vec_id, $comps AS proj_u
       |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""".stripMargin
  }

  /** Shared language-ID scoring CTE: occurrence counts of per-language
    * marker words via length/replace arithmetic (mirrors
    * TextAnalytics.langIdColumn exactly, including en-first tiebreak). */
  private def langIdSql(outer: String): String = {
    val markers = graft.ops.TextAnalytics.langMarkers
    val scoreExprs = markers.map { case (lang, ms) =>
      ms.map { m =>
        val esc = m.replace("'", "''")
        s"(length(p) - length(replace(p, '$esc', ''))) // ${m.length}"
      }.mkString(" + ") + s" AS s_$lang"
    }.mkString(",\n  ")
    val langs = markers.map(_._1)
    val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
    val caseExpr =
      s"CASE WHEN $best = 0 THEN 'und' " +
        langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ") +
        " ELSE 'und' END"
    s"""WITH t AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p FROM documents),
       | scored AS (SELECT doc_id, text,
       |  $scoreExprs
       | FROM t)
       |${outer.replace("{CASE}", caseExpr)}""".stripMargin
  }

  /** bpe_train: the merge loop of TextAnalytics.bpeTrain unrolled into
    * `merges` SQL stages — same U+0001 sentinel packing, same
    * leftmost-non-overlapping `replace` merge application, same
    * (count desc, lhs asc, rhs asc) top-pair rule. Each w{r} CTE is the
    * vocab after merge r; m{r} is the merge it learned. */
  private def bpeStages(merges: Int): String = {
    val s = graft.ops.TextAnalytics.BpeSentinel
    val head =
      s"""WITH w0 AS (
         |  SELECT regexp_replace(w, '(.)', '$s\\1', 'g') AS tok, cnt FROM (
         |    SELECT w, count(*) AS cnt FROM (
         |      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents) u
         |    WHERE w <> '' AND NOT contains(w, '$s') GROUP BY w) g)""".stripMargin
    val stages = (1 to merges).map { r =>
      val p = r - 1
      s""" pr$r AS (
         |  SELECT z[1] AS lhs, z[2] AS rhs, sum(cnt) AS cnt FROM (
         |    SELECT unnest(list_zip(tl, tl[2:])) AS z, cnt FROM (
         |      SELECT list_filter(string_split(tok, '$s'), x -> x <> '') AS tl, cnt FROM w$p) i1) i2
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         | m$r AS (SELECT lhs, rhs, cnt FROM pr$r ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
         | w$r AS (SELECT replace(w$p.tok, '$s' || m$r.lhs || '$s' || m$r.rhs,
         |                        '$s' || m$r.lhs || m$r.rhs) AS tok, w$p.cnt AS cnt
         |         FROM w$p, m$r)""".stripMargin
    }
    (head +: stages).mkString(",\n")
  }

  private def bpeTrainSql(merges: Int): String = {
    val union = (1 to merges).map(r =>
      s"SELECT $r AS merge_rank, lhs, rhs, CAST(cnt AS BIGINT) AS pair_count FROM m$r")
      .mkString("\nUNION ALL ")
    bpeStages(merges) + s"\nSELECT * FROM (\n$union) ORDER BY merge_rank"
  }

  // PageRank over the near-dup pair graph (dedup_clusters' pair
  // pipeline) — GraphOps.pageRankMicro's exact integer recurrence
  // unrolled as chained CTEs. seedPred = None is the global form
  // (every node gets init/teleport mass); Some(pred) restricts both
  // to the seed nodes (personalized PageRank).
  // The shared near-dup pair pipeline up to the arc list `e` (WITH
  // RECURSIVE so callers may append a reachability closure).
  // (def, not val: the query map above is built at object init, before
  // a later-declared val would be assigned)
  private def pairGraphCtes: String =
    """WITH RECURSIVE sh AS (SELECT DISTINCT doc_id AS sid,
      |             CAST('0x' || substring(md5(substring(text, CAST(i AS INT), 8)), 1, 15) AS BIGINT) AS h
      |             FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)),
      | dfc AS (SELECT h, count(*) AS c FROM sh GROUP BY h),
      | rare AS (SELECT sid, sh.h FROM sh JOIN dfc USING (h) WHERE c <= (SELECT greatest(64, CAST(floor(count(*) * 0.0128) AS BIGINT)) FROM documents)),
      | cand AS (SELECT a.sid AS id_a, b.sid AS id_b
      |          FROM rare a JOIN rare b ON a.h = b.h AND a.sid < b.sid
      |          GROUP BY a.sid, b.sid HAVING count(*) >= 2),
      | sets AS (SELECT sid, list(h) AS ls, count(*) AS s FROM sh GROUP BY sid),
      | p AS (SELECT id_a, id_b FROM (
      |        SELECT id_a, id_b, len(list_intersect(sa.ls, sb.ls)) AS i, sa.s AS s_a, sb.s AS s_b
      |        FROM cand JOIN sets sa ON sa.sid = id_a JOIN sets sb ON sb.sid = id_b)
      |       WHERE CAST(i AS DOUBLE) / (s_a + s_b - i) >= 0.2),
      | e AS (SELECT id_a AS a, id_b AS b FROM p UNION ALL SELECT id_b, id_a FROM p)""".stripMargin

  // nodes/degree/mass CTEs + r0..r{iters} — the unrolled PageRank
  // recurrence over the `e` arc list.
  private def pageRankCtes(iters: Int, seedPred: Option[String]): String = {
    val massSrc = seedPred.fold("nodes")(p => s"(SELECT id FROM nodes WHERE $p)")
    val gate = seedPred.fold("TRUE")(identity)
    val head =
      s""", nodes AS (SELECT DISTINCT a AS id FROM e),
         | deg AS (SELECT a, count(*) AS d FROM e GROUP BY a),
         | t AS (SELECT CAST(1000000 // count(*) AS BIGINT) AS ini,
         |              CAST(150000 // count(*) AS BIGINT) AS tele FROM $massSrc),
         | r0 AS (SELECT id, CASE WHEN $gate THEN (SELECT ini FROM t) ELSE 0 END AS r FROM nodes)""".stripMargin
    val iter = (1 to iters).map { k =>
      s""", c$k AS (SELECT e.b AS id, sum(r${k - 1}.r // deg.d) AS m
         |        FROM e JOIN r${k - 1} ON r${k - 1}.id = e.a JOIN deg ON deg.a = e.a GROUP BY e.b),
         | r$k AS (SELECT nodes.id,
         |          CASE WHEN $gate THEN (SELECT tele FROM t) ELSE 0 END +
         |          (17 * coalesce(c$k.m, 0)) // 20 AS r
         |        FROM nodes LEFT JOIN c$k USING (id))""".stripMargin
    }.mkString
    head + iter
  }

  private def pageRankSql(iters: Int, seedPred: Option[String]): String =
    pairGraphCtes + pageRankCtes(iters, seedPred) +
      s"\nSELECT id AS doc_id, CAST(r AS BIGINT) AS rank_micro FROM r$iters"

  // Canonical-doc pick: connected components (reachability closure)
  // joined with the unrolled ranks; per cluster keep the max-rank doc,
  // ties to the smaller id — the deterministic curation decision.
  private def dedupCanonicalSql(iters: Int): String =
    pairGraphCtes +
      """,
        | reach(id, root) AS (
        |   SELECT DISTINCT a, a FROM e
        |   UNION
        |   SELECT e.b, reach.root FROM reach JOIN e ON e.a = reach.id
        | ),
        | cl AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id)""".stripMargin +
      pageRankCtes(iters, None) +
      s"""
         |SELECT cluster, id AS keep_doc_id, CAST(r AS BIGINT) AS keep_rank_micro,
         | n_members
         |FROM (
         |  SELECT cl.cluster, cl.id, r$iters.r,
         |    count(*) OVER (PARTITION BY cl.cluster) AS n_members,
         |    row_number() OVER (PARTITION BY cl.cluster ORDER BY r$iters.r DESC, cl.id ASC) AS rn
         |  FROM cl JOIN r$iters ON r$iters.id = cl.id)
         |WHERE rn = 1""".stripMargin

  // Encode every document with the trained merge table: each distinct
  // word's segmentation is its FINAL packed state in the last training
  // CTE (the word itself = that state with sentinels removed), so the
  // apply side is one word→segmentation map join back onto the
  // exploded documents — no re-running of merges per document.
  private def bpeEncodeSql(merges: Int): String = {
    val s = graft.ops.TextAnalytics.BpeSentinel
    bpeStages(merges) +
      s""",
         | wmap AS (SELECT replace(tok, '$s', '') AS w,
         |            array_to_string(list_filter(string_split(tok, '$s'), x -> x <> ''), ' ') AS segd
         |          FROM w$merges),
         | dws AS (SELECT doc_id,
         |           list_filter(string_split_regex(trim(text), '\\s+'),
         |                       x -> x <> '' AND NOT contains(x, '$s')) AS ws
         |         FROM documents),
         | expl AS (SELECT doc_id, i, ws[i] AS w
         |          FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM dws)),
         | j AS (SELECT e.doc_id,
         |         sum(len(string_split(m.segd, ' '))) AS n_tokens,
         |         string_agg(m.segd, ' | ' ORDER BY e.i) AS seg_str
         |       FROM expl e JOIN wmap m ON m.w = e.w GROUP BY e.doc_id)
         |SELECT d.doc_id, CAST(len(d.ws) AS INT) AS n_words,
         | CAST(coalesce(j.n_tokens, 0) AS INT) AS n_tokens,
         | coalesce(j.seg_str, '') AS seg_str
         |FROM dws d LEFT JOIN j USING (doc_id)""".stripMargin
  }

  private def bpeVocabSql(merges: Int, k: Int): String = {
    val s = graft.ops.TextAnalytics.BpeSentinel
    bpeStages(merges) +
      s"""
         |SELECT token, CAST(sum(cnt) AS BIGINT) AS n_occurrences FROM (
         |  SELECT unnest(list_filter(string_split(tok, '$s'), x -> x <> '')) AS token, cnt
         |  FROM w$merges) v
         |GROUP BY token ORDER BY n_occurrences DESC, token ASC LIMIT $k""".stripMargin
  }
}
