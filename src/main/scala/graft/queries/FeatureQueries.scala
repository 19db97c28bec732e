package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{QueryDef, Tables}
import graft.operators.FeatureEng

/** ML feature-engineering coverage (operators/FeatureEng.scala): the
  * tabular-feature-prep family a training pipeline runs downstream of the
  * ingestion engine's typed tables. All four queries follow the board's
  * exactness conventions — integer sufficient statistics with at most one
  * trailing IEEE op — so every oracle is hash-exact.
  */
object FeatureQueries {

  val defs: Seq[QueryDef] = Seq(

    // Equi-depth quantile binning (QuantileDiscretizer analogue) with the
    // engine-exact HistSketch contract: decile cut points at exact
    // ceil(n·k/10) ranks over log-bin indices, bin_id = #{boundaries ≤ bin}.
    // Scale shape: one sketch-sized histogram agg + bounded driver collect
    // of 9 boundaries + pure map assignment — no row-grain shuffle at all.
    QueryDef("q166_quantile_binning",
      """WITH vi AS (SELECT doc_id, n_chars,
        |                   GREATEST(CAST(n_chars AS BIGINT), 1) AS v
        |            FROM documents),
        |bnd AS (SELECT doc_id, n_chars, v, LENGTH(BIN(v)) - 1 AS e FROM vi),
        |b AS (SELECT doc_id, n_chars,
        |             CASE WHEN e <= 4 THEN v
        |                  ELSE CAST(e - 4 AS BIGINT) * 16 + (v >> (e - 4)) END AS bin
        |      FROM bnd),
        |h AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY 1),
        |c AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum,
        |             SUM(cnt) OVER () AS n
        |      FROM h),
        |bound AS (SELECT k, MIN(CASE WHEN cum * 10 >= n * k THEN bin END) AS bk
        |          FROM c, (SELECT unnest(range(1, 10)) AS k) ks GROUP BY k)
        |SELECT b.doc_id, b.n_chars,
        |       CAST(SUM(CASE WHEN b.bin >= bound.bk THEN 1 ELSE 0 END) AS INT) AS bin_id
        |FROM b, bound GROUP BY b.doc_id, b.n_chars
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      FeatureEng.quantileBins(
        Tables.documents(s, dir).select("doc_id", "n_chars"),
        col("n_chars").cast(LongType), nBins = 10)
        .orderBy("doc_id")
    },

    // Smoothed target encoding of `source` against the lang='en' label:
    // enc = (pos + m·prior)/(cnt + m) emitted as the exact rational
    // (pos·gcnt + m·gpos)/((cnt+m)·gcnt) with one IEEE division. One
    // category-keyed agg + a 2-long driver scalar; output is the encoder
    // dim a pipeline broadcasts back onto the corpus.
    QueryDef("q167_target_encoding",
      """WITH l AS (SELECT source AS category,
        |                  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |           FROM documents),
        |g AS (SELECT CAST(SUM(y) AS BIGINT) AS gpos,
        |             CAST(COUNT(*) AS BIGINT) AS gcnt FROM l),
        |c AS (SELECT category, CAST(COUNT(*) AS BIGINT) AS cnt,
        |             CAST(SUM(y) AS BIGINT) AS pos
        |      FROM l GROUP BY category)
        |SELECT category, cnt, pos,
        |       CAST(pos * gcnt + 10 * gpos AS DOUBLE) /
        |       CAST((cnt + 10) * gcnt AS DOUBLE) AS enc
        |FROM c, g ORDER BY category""".stripMargin) { (s, dir) =>
      FeatureEng.targetEncode(Tables.documents(s, dir),
        col("source"), when(col("lang") === "en", 1L).otherwise(0L), m = 10L)
        .orderBy("category")
    },

    // Pearson correlation matrix per returnflag over three quantized
    // lineitem metrics, all sufficient stats from ONE scan/agg; each pair
    // row is the exact rational (num, den_x, den_y) + one
    // multiply/sqrt/divide in double domain — identical op order both
    // engines. Round 10: group-level products run in Decimal(38)/HUGEINT
    // (the 100x audit corpus overflowed the old all-Long form at 60M
    // rows) and num/den surface as DOUBLE — one exact integer rounded
    // once to IEEE, identical in both engines at any scale.
    QueryDef("q168_correlation",
      """WITH m AS (SELECT l_returnflag,
        |                  CAST(l_quantity AS BIGINT) AS qty,
        |                  CAST(round_even(l_discount * 100, 0) AS BIGINT) AS disc,
        |                  CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS price
        |           FROM lineitem),
        |s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(qty) AS BIGINT) AS s_qty,
        |             CAST(SUM(disc) AS BIGINT) AS s_disc,
        |             CAST(SUM(price) AS BIGINT) AS s_price,
        |             CAST(SUM(qty * qty) AS BIGINT) AS ss_qty,
        |             CAST(SUM(disc * disc) AS BIGINT) AS ss_disc,
        |             CAST(SUM(price * price) AS BIGINT) AS ss_price,
        |             CAST(SUM(qty * disc) AS BIGINT) AS sp_qty_disc,
        |             CAST(SUM(qty * price) AS BIGINT) AS sp_qty_price,
        |             CAST(SUM(disc * price) AS BIGINT) AS sp_disc_price
        |      FROM m GROUP BY l_returnflag),
        |p AS (
        |  SELECT l_returnflag, 'qty_disc' AS pair, n,
        |         CAST(n AS HUGEINT) * sp_qty_disc
        |           - CAST(s_qty AS HUGEINT) * s_disc AS num,
        |         CAST(n AS HUGEINT) * ss_qty
        |           - CAST(s_qty AS HUGEINT) * s_qty AS den_x,
        |         CAST(n AS HUGEINT) * ss_disc
        |           - CAST(s_disc AS HUGEINT) * s_disc AS den_y FROM s
        |  UNION ALL
        |  SELECT l_returnflag, 'qty_price', n,
        |         CAST(n AS HUGEINT) * sp_qty_price
        |           - CAST(s_qty AS HUGEINT) * s_price,
        |         CAST(n AS HUGEINT) * ss_qty
        |           - CAST(s_qty AS HUGEINT) * s_qty,
        |         CAST(n AS HUGEINT) * ss_price
        |           - CAST(s_price AS HUGEINT) * s_price FROM s
        |  UNION ALL
        |  SELECT l_returnflag, 'disc_price', n,
        |         CAST(n AS HUGEINT) * sp_disc_price
        |           - CAST(s_disc AS HUGEINT) * s_price,
        |         CAST(n AS HUGEINT) * ss_disc
        |           - CAST(s_disc AS HUGEINT) * s_disc,
        |         CAST(n AS HUGEINT) * ss_price
        |           - CAST(s_price AS HUGEINT) * s_price FROM s)
        |SELECT l_returnflag, pair, n,
        |       CAST(num AS DOUBLE) AS num,
        |       CAST(den_x AS DOUBLE) AS den_x,
        |       CAST(den_y AS DOUBLE) AS den_y,
        |       CASE WHEN den_x > 0 AND den_y > 0
        |            THEN CAST(num AS DOUBLE) /
        |                 sqrt(CAST(den_x AS DOUBLE) * CAST(den_y AS DOUBLE))
        |       END AS corr
        |FROM p ORDER BY l_returnflag, pair""".stripMargin) { (s, dir) =>
      FeatureEng.corrPairs(Tables.lineitem(s, dir), Seq("l_returnflag"),
        Seq("qty" -> col("l_quantity").cast(LongType),
          "disc" -> bround(col("l_discount") * 100, 0).cast(LongType),
          "price" -> floor(col("l_extendedprice") / 100).cast(LongType)),
        maxAbs = 1100L, expectedMaxRows = 100000000L)
        .orderBy("l_returnflag", "pair")
    },

    // Snapshot reconciliation over the event log: last-value state of the
    // first fortnight vs the trailing window, diffed added/removed/
    // changed/unchanged in ONE key-grain groupBy (conditional argmax per
    // window) — no second scan, no full outer join. The data-versioning
    // audit a pipeline runs between ingest snapshots.
    QueryDef("q169_snapshot_diff",
      """WITH a AS (SELECT user_id, event_type, value FROM (
        |             SELECT user_id, event_type, value,
        |                    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                                       ORDER BY ts DESC, event_id DESC) AS rn
        |             FROM events WHERE ts < TIMESTAMP '2024-01-16')
        |           WHERE rn = 1),
        |b AS (SELECT user_id, event_type, value FROM (
        |             SELECT user_id, event_type, value,
        |                    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |                                       ORDER BY ts DESC, event_id DESC) AS rn
        |             FROM events WHERE ts >= TIMESTAMP '2024-01-08')
        |           WHERE rn = 1)
        |SELECT COALESCE(a.user_id, b.user_id) AS user_id,
        |       COALESCE(a.event_type, b.event_type) AS event_type,
        |       a.value AS old_value, b.value AS new_value,
        |       CASE WHEN a.user_id IS NULL THEN 'added'
        |            WHEN b.user_id IS NULL THEN 'removed'
        |            WHEN a.value <> b.value THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM a FULL JOIN b
        |  ON a.user_id = b.user_id AND a.event_type = b.event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      FeatureEng.snapshotDiff(Tables.events(s, dir),
        Seq("user_id", "event_type"), col("ts"), col("event_id"), col("value"),
        oldWindow = col("ts") < lit("2024-01-16").cast("timestamp"),
        newWindow = col("ts") >= lit("2024-01-08").cast("timestamp"))
        .orderBy("user_id", "event_type")
    },

    // One-pass column profiler (the Deequ-style table summary): every
    // column pre-stringified with DETERMINISTIC formatting, unpivoted to
    // (column, value) grain, aggregated twice — the table scans ONCE and
    // the only row-grain exchange is the value-count agg. disc_band is
    // deliberately nullable so the null accounting is exercised.
    QueryDef("q174_data_profile",
      """WITH u AS (
        |  SELECT 'returnflag' AS col_name, l_returnflag AS value FROM lineitem
        |  UNION ALL SELECT 'linestatus', l_linestatus FROM lineitem
        |  UNION ALL SELECT 'quantity',
        |            CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'ship_month', strftime(l_shipdate, '%Y-%m') FROM lineitem
        |  UNION ALL SELECT 'disc_band',
        |            CASE WHEN l_discount > 0.05 THEN 'high'
        |                 WHEN l_discount > 0 THEN 'low' END FROM lineitem),
        |c AS (SELECT col_name, value, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY col_name
        |               ORDER BY (value IS NULL), cnt DESC, value) AS rk FROM c)
        |SELECT col_name,
        |       CAST(SUM(cnt) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN value IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_null,
        |       CAST(SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_distinct,
        |       MIN(value) AS min_value, MAX(value) AS max_value,
        |       MAX(CASE WHEN rk = 1 AND value IS NOT NULL THEN value END) AS top_value,
        |       CAST(MAX(CASE WHEN rk = 1 AND value IS NOT NULL THEN cnt END) AS BIGINT) AS top_count
        |FROM r GROUP BY col_name ORDER BY col_name""".stripMargin) { (s, dir) =>
      graft.operators.DataQuality.profile(Tables.lineitem(s, dir), Seq(
        "returnflag" -> col("l_returnflag"),
        "linestatus" -> col("l_linestatus"),
        "quantity" -> col("l_quantity").cast(LongType),
        "ship_month" -> date_format(col("l_shipdate"), "yyyy-MM"),
        "disc_band" -> when(col("l_discount") > 0.05, "high")
          .when(col("l_discount") > 0, "low")))
        .orderBy("col_name")
    },

    // Declarative constraint checks (the expectations gate a pipeline
    // runs before training consumption): uniqueness, referential
    // integrity, range, non-null, accepted values — each ONE bounded
    // agg, the report rule-dim-sized. The discount range and accepted
    // flags are deliberately tight so the fixture shows real failures.
    QueryDef("q175_quality_checks",
      """WITH rules AS (
        |  SELECT 'orders_pk_unique' AS rule, CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_violations
        |  FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'lineitem_orders_fk', CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |  UNION ALL
        |  SELECT 'discount_range',
        |         CAST(SUM(CASE WHEN l_discount IS NULL OR l_discount < 0
        |                       OR l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'custname_notnull',
        |         CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'returnflag_accepted',
        |         CAST(SUM(CASE WHEN l_returnflag IN ('N', 'R') THEN 0 ELSE 1 END) AS BIGINT)
        |  FROM lineitem)
        |SELECT rule, n_violations, n_violations = 0 AS pass
        |FROM rules ORDER BY rule""".stripMargin) { (s, dir) =>
      import graft.operators.DataQuality._
      val li = Tables.lineitem(s, dir)
      report(Seq(
        uniqueness("orders_pk_unique", Tables.orders(s, dir), Seq("o_orderkey")),
        referential("lineitem_orders_fk", li, col("l_orderkey"),
          Tables.orders(s, dir), col("o_orderkey")),
        inRange("discount_range", li, col("l_discount"), 0.0, 0.05),
        notNull("custname_notnull", Tables.customer(s, dir), col("c_name")),
        acceptedValues("returnflag_accepted", li, col("l_returnflag"), Seq("N", "R"))))
        .orderBy("rule")
    },

    // Record linkage (entity resolution) between two "systems": system B
    // carries an adjacent-digit-swap corruption of each customer's key
    // digits. Blocking on (nation, SORTED-DIGIT-MULTISET of the key) is
    // corruption-INVARIANT (a swap permutes digits, never changes their
    // multiset), so every true pair shares a block — and unlike the
    // round-9 (nation, digit-sum) key, whose 25×82 key space made block
    // width LINEAR in corpus (the r9 scaling audit's q178 residual,
    // 6.9× at 10× zipf), the multiset space grows with the corpus's
    // significant-digit range (C(18,9) = 48,620 multisets × nations),
    // keeping blocks narrow at any scale. The signature is computed
    // engine-portably as repeat(c, count of c in d) concatenated over
    // c = 0..9 — no char-split/sort needed. Accuracy adjudication at
    // sf0.1: 128 of 14,825 links changed vs the digit-sum key, 123 onto
    // the construction's ground truth (a_id = b_id) from a previously
    // WRONG cross-entity tie — 98.16% → 99.00%; the other 5 are
    // digit-anagram ties wrong under both keys. Score = exact
    // bigram-set overlap; survivorship argmax ties to the smallest
    // a_id; overlap < 4 drops. RecordLinkage.link(maxBlockWidth) stays
    // the backstop for adversarial key collisions.
    QueryDef("q178_record_linkage",
      """WITH c AS (SELECT c_custkey AS id, c_nationkey AS nk,
        |                  substr(c_name, 10, 9) AS d FROM customer),
        |s AS (SELECT id, nk, d,
        |             repeat('0', 9 - length(replace(d,'0',''))) ||
        |             repeat('1', 9 - length(replace(d,'1',''))) ||
        |             repeat('2', 9 - length(replace(d,'2',''))) ||
        |             repeat('3', 9 - length(replace(d,'3',''))) ||
        |             repeat('4', 9 - length(replace(d,'4',''))) ||
        |             repeat('5', 9 - length(replace(d,'5',''))) ||
        |             repeat('6', 9 - length(replace(d,'6',''))) ||
        |             repeat('7', 9 - length(replace(d,'7',''))) ||
        |             repeat('8', 9 - length(replace(d,'8',''))) ||
        |             repeat('9', 9 - length(replace(d,'9',''))) AS sig FROM c),
        |a AS (SELECT id, CAST(nk AS VARCHAR) || ':' || sig AS block,
        |             d AS key FROM s),
        |b AS (SELECT id, CAST(nk AS VARCHAR) || ':' || sig AS block,
        |             substr(d,1,3) || substr(d,5,1) || substr(d,4,1) || substr(d,6,4) AS key
        |      FROM s),
        |ag AS (SELECT id AS a_id, block,
        |              unnest(list_distinct(list_transform(range(1, length(key)),
        |                     i -> substr(key, CAST(i AS INT), 2)))) AS bigram FROM a),
        |bg AS (SELECT id AS b_id, block,
        |              unnest(list_distinct(list_transform(range(1, length(key)),
        |                     i -> substr(key, CAST(i AS INT), 2)))) AS bigram FROM b),
        |p AS (SELECT b_id, a_id, CAST(COUNT(*) AS INT) AS score
        |      FROM ag JOIN bg USING (block, bigram) GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY b_id
        |               ORDER BY score DESC, a_id) AS rk FROM p)
        |SELECT b_id, a_id, score FROM r WHERE rk = 1 AND score >= 4
        |ORDER BY b_id""".stripMargin) { (s, dir) =>
      import graft.operators.RecordLinkage
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("id"), col("c_nationkey").as("nk"),
          substring(col("c_name"), 10, 9).as("d"))
      // sorted-digit-multiset signature: repeat(c, #occurrences of c in d)
      // over c = 0..9 — identical string algebra in both engines
      val sig = concat((0 to 9).map(c =>
        expr(s"repeat('$c', 9 - length(replace(d, '$c', '')))")): _*)
      val block = concat(col("nk").cast("string"), lit(":"), sig)
      val a = cust.select(col("id"), block.as("block"), col("d").as("key"))
      val b = cust.select(col("id"), block.as("block"),
        concat(substring(col("d"), 1, 3), substring(col("d"), 5, 1),
          substring(col("d"), 4, 1), substring(col("d"), 6, 4)).as("key"))
      // calibrate: opt-IN since r15 (the library default no longer arms
      // the adversarial-skew cap silently); the cap still never binds on
      // the honest corpora, so results are unchanged at every SF
      RecordLinkage.link(a, b, minOverlap = 4, calibrate = true).orderBy("b_id")
    },

    // Per-group feature scaling: percentile rank (RANK semantics — a
    // pure function of the value, no tiebreak needed) and min-max, both
    // exact-integer rationals with one IEEE division, from ONE keyed
    // window pass; degenerate groups (singleton, constant) yield null.
    QueryDef("q179_feature_scaling",
      """SELECT doc_id, lang, n_chars,
        |       CAST(rnk AS BIGINT) AS rnk,
        |       CASE WHEN cnt > 1
        |            THEN CAST(rnk - 1 AS DOUBLE) / CAST(cnt - 1 AS DOUBLE)
        |       END AS pct_rank,
        |       CASE WHEN vmax > vmin
        |            THEN CAST(n_chars - vmin AS DOUBLE) / CAST(vmax - vmin AS DOUBLE)
        |       END AS minmax
        |FROM (SELECT doc_id, lang, n_chars,
        |             RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS rnk,
        |             COUNT(*) OVER (PARTITION BY lang) AS cnt,
        |             MIN(n_chars) OVER (PARTITION BY lang) AS vmin,
        |             MAX(n_chars) OVER (PARTITION BY lang) AS vmax
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      FeatureEng.scaleFeatures(
        Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
        Seq("lang"), col("n_chars"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("rnk").cast("long").as("rnk"), col("pct_rank"), col("minmax"))
        .orderBy("doc_id")
    },

    // Winsorized clipping (FeatureEng.winsorize): per-language clamp of
    // n_chars to the exact [p10, p90] band — percentile ranks are
    // ceil(n·p/100) over integers (the q166 exact-rank convention, no
    // interpolation), so boundaries AND clipped values hash-match. The
    // robust-preprocessing step between q179's scaling (no outlier
    // handling) and dropping heavy-tail rows outright.
    QueryDef("q199_winsorize",
      """WITH r AS (SELECT doc_id, lang, n_chars,
        |       CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n,
        |       CAST(row_number() OVER (PARTITION BY lang
        |            ORDER BY n_chars, doc_id) AS BIGINT) AS rn
        |       FROM documents),
        |b AS (SELECT *,
        |       MAX(CASE WHEN rn = (n * 10 + 99) // 100 THEN n_chars END)
        |         OVER (PARTITION BY lang) AS lo,
        |       MAX(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END)
        |         OVER (PARTITION BY lang) AS hi
        |      FROM r)
        |SELECT doc_id, lang, n_chars AS v, lo, hi,
        |       LEAST(GREATEST(n_chars, lo), hi) AS clipped
        |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
      FeatureEng.winsorize(
        Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
        Seq("lang"), col("n_chars"), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("v"), col("lo"), col("hi"),
          col("clipped"))
        .orderBy("doc_id")
    },

    // k-anonymity audit (DataQuality.kAnonymity): every (lang, source,
    // length-bucket) quasi-identifier combination must cover ≥ 10 docs
    // or its rows are re-identifiable and flagged for suppression — the
    // release gate for shared corpora. One grouped aggregation at the
    // quasi grain.
    QueryDef("q211_k_anonymity",
      """SELECT lang, source, n_chars // 100 AS len_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       COUNT(*) < 10 AS suppress
        |FROM documents
        |GROUP BY lang, source, len_bucket
        |ORDER BY lang, source, len_bucket""".stripMargin) { (s, dir) =>
      graft.operators.DataQuality.kAnonymity(
        Tables.documents(s, dir)
          .select(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket")),
        Seq("lang", "source", "len_bucket"), k = 10L)
        .orderBy("lang", "source", "len_bucket")
    }
  )
}
