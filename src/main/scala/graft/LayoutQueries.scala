package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.KG
import graft.operators.DataLayout

/** Physical-data-layout + snapshot-CDC query rows (operators/DataLayout):
  * Z-order clustering vs linear clustering under statistics pruning,
  * shuffle-free bucketed joins, Hive-style partition pruning, and
  * snapshot diff / change replay. Each entry: (name, query fn, DuckDB
  * oracle SQL). */
object LayoutQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    KG.table(s, dir, name)

  // CDC fixture: two deterministic snapshots of the documents corpus.
  // base (the "yesterday" snapshot) is missing every doc_id % 10 == 0 row
  // and carries a stale payload (text + ' [v1]') for doc_id % 7 == 0;
  // cur (the "today" snapshot) is missing every doc_id % 13 == 5 row.
  // So: added = %10=0 ∧ %13≠5, removed = %13=5 ∧ %10≠0,
  // changed = in both ∧ %7=0.
  private def cdcBase(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") % 10 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [v1]")))
          .otherwise(col("text")))
  private def cdcCur(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("doc_id") % 13 =!= 5)

  val entries: Seq[(String, QFn, Option[String])] = Seq(

    // Z-order vs linear clustering under min/max-statistics pruning for a
    // 2-D box predicate over (l_orderkey, l_partkey). Same matching rows,
    // very different I/O: the linear layout's partkey stats are useless,
    // the Morton layout's are tight on both dimensions.
    ("layout_zorder_prune",
      (s, dir) => DataLayout.zorderCompare(
        t(s, dir, "lineitem"), "l_orderkey", "l_partkey"),
      Some("""WITH st AS (
             |  SELECT MIN(l_orderkey) AS mnx, MAX(l_orderkey) AS mxx,
             |         MIN(l_partkey) AS mny, MAX(l_partkey) AS mxy
             |  FROM lineitem),
             |r AS (
             |  SELECT (l_orderkey - mnx) * 256 // (mxx - mnx + 1) AS rx,
             |         (l_partkey - mny) * 256 // (mxy - mny + 1) AS ry
             |  FROM lineitem, st),
             |z AS (
             |  SELECT rx, ry,
             |    list_sum(list_transform(generate_series(0, 7), i ->
             |      (((rx >> i) & 1) << (2 * i)) +
             |      (((ry >> i) & 1) << (2 * i + 1)))) AS zv
             |  FROM r),
             |b AS (
             |  SELECT rx, ry, zv >> 10 AS zb, rx >> 2 AS lb,
             |    CASE WHEN rx BETWEEN 64 AND 127 AND ry BETWEEN 128 AND 191
             |         THEN 1 ELSE 0 END AS m
             |  FROM z),
             |lin AS (SELECT lb AS bkt, MIN(rx) AS mnrx, MAX(rx) AS mxrx,
             |               MIN(ry) AS mnry, MAX(ry) AS mxry,
             |               COUNT(*) AS cnt, SUM(m) AS mm
             |        FROM b GROUP BY 1),
             |zo AS (SELECT zb AS bkt, MIN(rx) AS mnrx, MAX(rx) AS mxrx,
             |              MIN(ry) AS mnry, MAX(ry) AS mxry,
             |              COUNT(*) AS cnt, SUM(m) AS mm
             |       FROM b GROUP BY 1)
             |SELECT 'linear' AS layout, COUNT(*) AS n_buckets,
             |  CAST(SUM(CASE WHEN NOT (mxrx < 64 OR mnrx > 127 OR
             |                          mxry < 128 OR mnry > 191)
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_scanned,
             |  CAST(SUM(CASE WHEN NOT (mxrx < 64 OR mnrx > 127 OR
             |                          mxry < 128 OR mnry > 191)
             |           THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned,
             |  CAST(SUM(mm) AS BIGINT) AS rows_matched
             |FROM lin
             |UNION ALL
             |SELECT 'zorder', COUNT(*),
             |  CAST(SUM(CASE WHEN NOT (mxrx < 64 OR mnrx > 127 OR
             |                          mxry < 128 OR mnry > 191)
             |           THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(SUM(CASE WHEN NOT (mxrx < 64 OR mnrx > 127 OR
             |                          mxry < 128 OR mnry > 191)
             |           THEN cnt ELSE 0 END) AS BIGINT),
             |  CAST(SUM(mm) AS BIGINT)
             |FROM zo""".stripMargin)),

    // Revenue per market segment through hash-bucketed persistent tables:
    // the join stage plans zero shuffle exchanges (LayoutQuerySpec /
    // BucketedJoinSpec assert the plan), the layout cost was paid once at
    // write time. The oracle only cares that results are unchanged.
    ("layout_bucketed_join",
      (s, dir) => DataLayout.bucketedRevenueBySegment(s, dir),
      Some("SELECT c_mktsegment, COUNT(*) AS n_orders, " +
           "ROUND(SUM(o_totalprice), 2) AS revenue " +
           "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1")),

    // Daily rollup over a date-partitioned event log: the day filter
    // prunes partitions at plan time (7 of ~30 day directories read).
    ("layout_partition_prune",
      (s, dir) => DataLayout.eventsWeekRollup(s, dir),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
             |  COUNT(DISTINCT user_id) AS n_users,
             |  ROUND(SUM(value), 6) AS sum_value
             |FROM events
             |WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-08' AND '2024-01-14'
             |GROUP BY 1""".stripMargin)),

    // Snapshot CDC diff: one row per doc whose state changed between the
    // two snapshots, classified added/removed/changed by text fingerprint.
    ("cdc_snapshot_diff",
      (s, dir) => DataLayout.snapshotDiff(
        cdcBase(s, dir), cdcCur(s, dir), "doc_id", md5(col("text"))),
      Some("""WITH b AS (
             |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
             |                          THEN text || ' [v1]' ELSE text END) AS fp
             |  FROM documents WHERE doc_id % 10 <> 0),
             |c AS (SELECT doc_id, md5(text) AS fp
             |      FROM documents WHERE doc_id % 13 <> 5)
             |SELECT COALESCE(b.doc_id, c.doc_id) AS id,
             |  CASE WHEN b.doc_id IS NULL THEN 'added'
             |       WHEN c.doc_id IS NULL THEN 'removed'
             |       ELSE 'changed' END AS status
             |FROM b FULL OUTER JOIN c ON b.doc_id = c.doc_id
             |WHERE b.doc_id IS NULL OR c.doc_id IS NULL OR b.fp <> c.fp"""
             .stripMargin)),

    // Daily time-series resampling with gap fill + LOCF (the series-
    // regularization operator): per-user calendar spine between first and
    // last event, missing days carried forward from the day's closing
    // value (lexicographically-last (ts, event_id) event — deterministic).
    ("ts_resample_locf",
      (s, dir) => graft.streaming.EventStreams.resampleDailyLocf(
        graft.model.KG.eventsNs(s, dir)),
      Some("""WITH ev AS (SELECT user_id, event_id, value, ts,
             |              CAST(ts AS DATE) AS day FROM events),
             |daily AS (
             |  SELECT user_id, day, COUNT(*) AS n_events,
             |    MAX(struct_pack(a := ts, b := event_id, c := value)).c
             |      AS day_value
             |  FROM ev GROUP BY 1, 2),
             |spine AS (
             |  SELECT user_id,
             |    CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
             |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
             |        FROM daily GROUP BY 1)),
             |j AS (SELECT s.user_id, s.day, d.n_events, d.day_value
             |      FROM spine s LEFT JOIN daily d
             |        ON d.user_id = s.user_id AND d.day = s.day)
             |SELECT user_id, CAST(day AS VARCHAR) AS day,
             |  CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
             |  ROUND(LAST_VALUE(day_value IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             |    AS locf_value,
             |  CAST(CASE WHEN n_events IS NULL THEN 1 ELSE 0 END AS BIGINT)
             |    AS gap
             |FROM j""".stripMargin)),

    // Declarative data-quality audit (Deequ/dbt-test operator class):
    // null/range/regex/uniqueness/referential-integrity constraints over
    // the star schema, one counted-violations row per check — violations
    // are never collected, FK checks broadcast the parent key set.
    ("dq_report",
      (s, dir) => graft.operators.DataQuality.testdataReport(s, dir),
      Some("""SELECT 'documents_text_not_null' AS check_name,
             |  CAST(COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations,
             |  COUNT(*) AS n_checked FROM documents
             |UNION ALL
             |SELECT 'lineitem_quantity_1_45',
             |  CAST(COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 45 THEN 1 ELSE 0 END), 0) AS BIGINT),
             |  COUNT(*) FROM lineitem
             |UNION ALL
             |SELECT 'customer_acctbal_range',
             |  CAST(COALESCE(SUM(CASE WHEN c_acctbal < -500 OR c_acctbal > 9000 THEN 1 ELSE 0 END), 0) AS BIGINT),
             |  COUNT(*) FROM customer
             |UNION ALL
             |SELECT 'orders_status_domain',
             |  CAST(COALESCE(SUM(CASE WHEN NOT regexp_matches(o_orderstatus, '^[OFP]$') THEN 1 ELSE 0 END), 0) AS BIGINT),
             |  COUNT(*) FROM orders
             |UNION ALL
             |SELECT 'customer_key_unique',
             |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
             |   FROM (SELECT COUNT(*) AS n FROM customer GROUP BY c_custkey)),
             |  (SELECT COUNT(*) FROM customer)
             |UNION ALL
             |SELECT 'lineitem_line_unique',
             |  (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
             |   FROM (SELECT COUNT(*) AS n FROM lineitem
             |         GROUP BY l_orderkey, l_linenumber)),
             |  (SELECT COUNT(*) FROM lineitem)
             |UNION ALL
             |SELECT 'orders_custkey_fk',
             |  (SELECT COUNT(*) FROM orders o
             |   WHERE NOT EXISTS (SELECT 1 FROM customer c
             |                     WHERE c.c_custkey = o.o_custkey)),
             |  (SELECT COUNT(*) FROM orders)
             |UNION ALL
             |SELECT 'lineitem_orderkey_fk',
             |  (SELECT COUNT(*) FROM lineitem l
             |   WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                     WHERE o.o_orderkey = l.l_orderkey)),
             |  (SELECT COUNT(*) FROM lineitem)""".stripMargin)),

    // Per-column data profile (the profiler op that feeds constraint
    // suggestions): long-form rows, one aggregate pass per column.
    ("dq_profile",
      (s, dir) => graft.operators.DataQuality.profile(
        KG.table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_suppkey")),
      Some(Seq("l_quantity", "l_extendedprice", "l_discount", "l_suppkey")
        .map { c =>
          s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
             |  CAST(COALESCE(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_null,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  ROUND(CAST(MIN($c) AS DOUBLE), 6) AS min_val,
             |  ROUND(CAST(MAX($c) AS DOUBLE), 6) AS max_val,
             |  ROUND(CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE)
             |        / COUNT($c), 6) AS mean_val
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n"))),

    // SCD-2 history build from the two snapshots: validity-interval rows
    // per document version (open rows carry valid_to = -1).
    ("cdc_scd2",
      (s, dir) => DataLayout.scd2(
        cdcBase(s, dir), cdcCur(s, dir), "doc_id", md5(col("text"))),
      Some("""WITH b AS (
             |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
             |                          THEN text || ' [v1]' ELSE text END) AS fp
             |  FROM documents WHERE doc_id % 10 <> 0),
             |c AS (SELECT doc_id, md5(text) AS fp
             |      FROM documents WHERE doc_id % 13 <> 5)
             |SELECT b.doc_id AS id, b.fp,
             |  CAST(0 AS BIGINT) AS valid_from,
             |  CAST(CASE WHEN c.doc_id IS NULL OR b.fp <> c.fp
             |            THEN 1 ELSE -1 END AS BIGINT) AS valid_to
             |FROM b LEFT JOIN c ON b.doc_id = c.doc_id
             |UNION ALL
             |SELECT c.doc_id, c.fp, CAST(1 AS BIGINT), CAST(-1 AS BIGINT)
             |FROM c LEFT JOIN b ON b.doc_id = c.doc_id
             |WHERE b.doc_id IS NULL OR b.fp <> c.fp""".stripMargin)),

    // Replay the change set onto the base snapshot (delete removed/stale,
    // append new payloads) and prove the merged corpus equals the current
    // snapshot — the oracle computes the same per-bucket profile straight
    // from the current snapshot's definition, never seeing the merge.
    ("cdc_apply_changes",
      (s, dir) => {
        val base = cdcBase(s, dir); val cur = cdcCur(s, dir)
        val diff = DataLayout.snapshotDiff(base, cur, "doc_id",
                                           md5(col("text")))
        DataLayout.applyChanges(base, diff, cur, "doc_id")
          .groupBy((col("doc_id") % 16).as("bucket"))
          .agg(count(lit(1)).as("n_docs"),
               sum("n_chars").as("sum_chars"),
               sum(length(col("text"))).as("sum_len"))
      },
      Some("""SELECT doc_id % 16 AS bucket, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_len
             |FROM documents WHERE doc_id % 13 <> 5
             |GROUP BY 1""".stripMargin)),

    // Source/sink fidelity through the non-parquet formats Spark ships:
    // part -> write ORC / CSV / JSON -> read back -> aggregate; the
    // oracle aggregates the original parquet directly, so any value,
    // type, or row lost in the round trip mismatches. Like the pruned
    // IVF probe, the sink write runs EAGERLY at query construction
    // (documented surprise); the path is md5-keyed on the data dir so
    // concurrent runs against different dirs never collide.
    ("source_orc_roundtrip",
      (s, dir) => sourceRoundtrip(s, dir, "orc"),
      Some(srcRtOracle)),
    ("source_csv_roundtrip",
      (s, dir) => sourceRoundtrip(s, dir, "csv"),
      Some(srcRtOracle)),
    ("source_json_roundtrip",
      (s, dir) => sourceRoundtrip(s, dir, "json"),
      Some(srcRtOracle)),

    // CSV fidelity under hostile content: embedded delimiters, quotes,
    // newlines (multiLine read), tabs, leading/trailing spaces, and
    // non-ASCII — written and read back with Spark's quoting; the
    // oracle regenerates the strings from the same closed form, so a
    // field split or mangled by quoting mismatches.
    ("source_csv_quoting",
      (s, dir) => {
        import s.implicits._
        val df = (0 until 30).map { i =>
          (i.toLong, csvNasty(i % 10) + "-" + i, (i.toLong * 37) % 100)
        }.toDF("id", "s", "v")
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val path = s"/tmp/graft_srcrt_csvq_$key"
        df.write.mode("overwrite").option("header", "true")
          // the CSV WRITER trims field whitespace by default — disable
          // both so the leading/trailing-space fixtures survive
          .option("ignoreLeadingWhiteSpace", "false")
          .option("ignoreTrailingWhiteSpace", "false")
          .csv(path)
        s.read.schema(df.schema).option("header", "true")
          .option("multiLine", "true").csv(path)
      },
      Some("""SELECT CAST(r AS BIGINT) AS id,
            |  (CASE r%10 WHEN 0 THEN 'plain' WHEN 1 THEN 'comma,inside'
            |    WHEN 2 THEN 'quote"inside' WHEN 3 THEN 'both","x'
            |    WHEN 4 THEN 'newline' || chr(10) || 'inside'
            |    WHEN 5 THEN 'tab' || chr(9) || 'inside'
            |    WHEN 6 THEN 'trailing space ' WHEN 7 THEN ' leading'
            |    WHEN 8 THEN 'unicode-é-ß' ELSE 'empty-next' END)
            |    || '-' || r AS s,
            |  CAST((r*37) % 100 AS BIGINT) AS v
            |FROM range(30) t(r)""".stripMargin)),

    ("source_csv_gzip_roundtrip",
      (s, dir) => csvGzipRoundtrip(s, dir),
      Some(srcRtOracle)),

    ("source_json_corrupt",
      (s, dir) => jsonCorrupt(s, dir),
      Some("""SELECT CAST(50 AS BIGINT) AS n_lines,
            |  CAST(10 AS BIGINT) AS n_corrupt,
            |  CAST((SELECT SUM((r*37) % 100) FROM range(50) t(r)
            |        WHERE r % 5 <> 4) AS BIGINT) AS sum_good_v""".stripMargin)),

    // Parquet internal compression codecs (the choice that matters at
    // corpus scale): the same table written with each codec Spark ships
    // jars for, read back, identically aggregated — one result row per
    // codec, all four identical to the parquet original.
    ("source_parquet_codecs",
      (s, dir) => {
        val src = t(s, dir, "part")
          .select("p_partkey", "p_brand", "p_size")
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        Seq("zstd", "snappy", "gzip", "lz4").map { codec =>
          val path = s"/tmp/graft_srcrt_pq_${codec}_$key"
          src.write.mode("overwrite").option("compression", codec)
            .parquet(path)
          s.read.parquet(path).agg(
            count(lit(1)).as("n"),
            sum("p_partkey").as("sum_key"),
            sum("p_size").as("sum_size"),
            countDistinct("p_brand").as("n_brands"))
            .withColumn("codec", lit(codec))
        }.reduce(_.unionByName(_))
      },
      Some("""SELECT codec, COUNT(*) AS n,
            |  CAST(SUM(p_partkey) AS BIGINT) AS sum_key,
            |  CAST(SUM(p_size) AS BIGINT) AS sum_size,
            |  CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands
            |FROM part, (SELECT UNNEST(['zstd','snappy','gzip','lz4']) AS codec)
            |GROUP BY codec""".stripMargin)),

    ("q_null_semantics",
      (s, dir) => {
        t(s, dir, "part").createOrReplaceTempView("part_ns")
        s.sql(nullSemSql("part_ns"))
      },
      Some(nullSemSql("part"))),

    // XML extraction with the built-in from_xml (XML moved into Spark
    // core in 4.x): element fields, an attribute (_id), and a repeated
    // element collected as an array — the remaining text-corpus markup
    // format next to JSON/HTML/sitemaps.
    ("source_xml_extract",
      (s, dir) => {
        import s.implicits._
        (0 until 40).map { i =>
          val tags = (0 to i % 3).map(k => s"<tag>t${(i + k) % 7}</tag>")
            .mkString
          (i.toLong,
           s"""<rec id="$i"><name>n-$i</name><v>${(i * 37) % 100}</v>$tags</rec>""")
        }.toDF("row_id", "xml")
          .selectExpr("row_id",
            "from_xml(xml, 'struct<_id:bigint,name:string,v:bigint,tag:array<string>>') AS r")
          .select(col("row_id"), col("r._id").as("id"),
            col("r.name").as("name"), col("r.v").as("v"),
            size(col("r.tag")).cast("long").as("n_tags"),
            element_at(col("r.tag"), 1).as("first_tag"))
      },
      Some("""SELECT r AS row_id, CAST(r AS BIGINT) AS id,
            |  'n-' || r AS name, CAST((r*37) % 100 AS BIGINT) AS v,
            |  CAST(r % 3 + 1 AS BIGINT) AS n_tags,
            |  't' || (r % 7) AS first_tag
            |FROM range(40) t(r)""".stripMargin)),

    // Daily resampling with LINEAR interpolation across gaps — the
    // other standard regularization fill next to LOCF: interior gap
    // days get the distance-weighted blend of the surrounding observed
    // day-values over the per-user calendar spine.
    ("ts_interpolate",
      (s, dir) => graft.streaming.EventStreams.resampleDailyInterp(
        graft.model.KG.eventsNs(s, dir)),
      Some("""WITH ev AS (SELECT user_id, event_id, value, ts,
             |              CAST(ts AS DATE) AS day FROM events),
             |daily AS (
             |  SELECT user_id, day, COUNT(*) AS n_events,
             |    MAX(struct_pack(a := ts, b := event_id, c := value)).c
             |      AS day_value
             |  FROM ev GROUP BY 1, 2),
             |spine AS (
             |  SELECT user_id,
             |    CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
             |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
             |        FROM daily GROUP BY 1)),
             |j AS (SELECT s.user_id, s.day, d.n_events, d.day_value
             |      FROM spine s LEFT JOIN daily d
             |        ON d.user_id = s.user_id AND d.day = s.day),
             |k AS (SELECT user_id, day, n_events, day_value,
             |    LAST_VALUE(day_value IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    LAST_VALUE(CASE WHEN day_value IS NOT NULL THEN day END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             |    FIRST_VALUE(day_value IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    FIRST_VALUE(CASE WHEN day_value IS NOT NULL THEN day END
             |      IGNORE NULLS) OVER (
             |      PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
             |  FROM j)
             |SELECT user_id, CAST(day AS VARCHAR) AS day,
             |  CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
             |  ROUND(CASE WHEN day_value IS NOT NULL THEN day_value
             |    ELSE pv + (nv - pv) * (day - pd) * 1.0 / (nd - pd) END, 6)
             |    AS interp_value,
             |  CAST(CASE WHEN day_value IS NULL THEN 1 ELSE 0 END AS BIGINT)
             |    AS gap
             |FROM k""".stripMargin))
  )

  /** ANSI three-valued-logic conformance, identical SQL on both engines:
    * NOT IN against a NULL-bearing set never matches, UNKNOWN predicates,
    * COUNT/COUNT(col)/COUNT(DISTINCT) null treatment, IS NOT DISTINCT
    * FROM. Any engine that "fixes" NULL semantics mismatches. */
  private def nullSemSql(tbl: String): String =
    s"""WITH x AS (SELECT p_partkey AS k,
       |  CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_size END AS v
       |  FROM $tbl)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(v) AS BIGINT) AS n_nonnull,
       |  CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       |  CAST(SUM(CASE WHEN v IN (5, 10) THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
       |  CAST(SUM(CASE WHEN v NOT IN (5, 10) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_not_in,
       |  CAST(SUM(CASE WHEN (v = 5) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unknown,
       |  CAST(SUM(CASE WHEN v IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_ndist_null,
       |  CAST((SELECT COUNT(*) FROM x x2
       |        WHERE x2.k NOT IN (SELECT v FROM x)) AS BIGINT)
       |    AS n_notin_nullset
       |FROM x""".stripMargin

  // Compressed text-source round trip: gzip is the JDK-backed codec
  // (the hadoop-native zstd/lz4 text codecs need libhadoop, absent
  // here; parquet-internal zstd is separate and already exercised).
  private def csvGzipRoundtrip(s: SparkSession, dir: String) = {
    val src = t(s, dir, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val path = s"/tmp/graft_srcrt_csvgz_$key"
    src.write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(path)
    s.read.schema(src.schema).option("header", "true").csv(path)
      .groupBy("p_brand").agg(
        count(lit(1)).as("n"),
        sum("p_partkey").as("sum_key"),
        sum("p_size").as("sum_size"),
        min("p_type").as("min_type"),
        max("p_type").as("max_type"),
        round(sum("p_retailprice"), 2).as("sum_price"))
  }

  // PERMISSIVE JSON ingest with corrupt-record accounting: every fifth
  // line is malformed; the reader must capture it in the corrupt column
  // without dropping or mis-parsing the good lines. (Cached before
  // aggregation — Spark refuses raw-file queries that reference only
  // the corrupt column.)
  private def jsonCorrupt(s: SparkSession, dir: String) = {
    import s.implicits._
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val path = s"/tmp/graft_srcrt_jsonc_$key"
    (0 until 50).map { i =>
      if (i % 5 == 4) s"""{"id":$i,"v":"""
      else s"""{"id":$i,"v":${(i * 37) % 100}}"""
    }.toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_bad",
        org.apache.spark.sql.types.StringType)))
    val df = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(path).cache()
    df.agg(
      count(lit(1)).as("n_lines"),
      count(col("_bad")).as("n_corrupt"),
      sum(when(col("_bad").isNull, col("v"))).as("sum_good_v"))
  }

  private def csvNasty(k: Int): String = k match {
    case 0 => "plain"
    case 1 => "comma,inside"
    case 2 => "quote\"inside"
    case 3 => "both\",\"x"
    case 4 => "newline\ninside"
    case 5 => "tab\tinside"
    case 6 => "trailing space "
    case 7 => " leading"
    case 8 => "unicode-é-ß"
    case _ => "empty-next"
  }

  // def, not val: referenced from `entries` above, which initializes
  // first in declaration order — a val here would be captured as null.
  private def srcRtOracle =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(p_partkey) AS BIGINT) AS sum_key,
      |  CAST(SUM(p_size) AS BIGINT) AS sum_size,
      |  MIN(p_type) AS min_type, MAX(p_type) AS max_type,
      |  ROUND(SUM(p_retailprice), 2) AS sum_price
      |FROM part GROUP BY p_brand""".stripMargin

  /** part → sink `fmt` → source `fmt` → aggregate. CSV/JSON read back
    * with the WRITER's schema (inference would widen int32 and reorder
    * nothing — the explicit schema keeps the round trip honest). */
  private def sourceRoundtrip(s: SparkSession, dir: String,
                              fmt: String): DataFrame = {
    val src = t(s, dir, "part")
      .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val path = s"/tmp/graft_srcrt_${fmt}_$key"
    val w = src.write.mode("overwrite")
    fmt match {
      case "csv" => w.option("header", "true").csv(path)
      case _     => w.format(fmt).save(path)
    }
    val back = fmt match {
      case "csv" =>
        s.read.schema(src.schema).option("header", "true").csv(path)
      case "json" => s.read.schema(src.schema).json(path)
      case _      => s.read.format(fmt).load(path)
    }
    back.groupBy("p_brand").agg(
      count(lit(1)).as("n"),
      sum("p_partkey").as("sum_key"),
      sum("p_size").as("sum_size"),
      min("p_type").as("min_type"),
      max("p_type").as("max_type"),
      round(sum("p_retailprice"), 2).as("sum_price"))
  }
}
