package graft

import graft.ingest.Salting
import graft.operators.{AsOfJoin, ConnectedComponents, HistogramQuantiles, RangeJoin}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.{CMS, CountMinSketch}

/** Scale-pattern query catalog: the join/sketch machinery a 100 TB
  * pipeline leans on — as-of enrichment (q62), fixed-memory frequency
  * sketching (q63), bucketed shuffle-free joins (q64), and explicit
  * skew salting (q65). Each is oracle-checked like every other
  * declared query; the plan-shape properties (single shuffle, no
  * exchange, salt-spread keys) are pinned in PlanSpec/ScaleSpec.
  */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(s, dir, name)

  /** As-of enrichment: every click event sees the user's most recent
    * purchase at-or-before it (the point-in-time attribution join).
    * One hash shuffle on user_id — see [[graft.operators.AsOfJoin]].
    * Gap emitted in exact epoch-microseconds so both engines hash
    * identically. */
  def q62AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Queries.eventsTable(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"),
        col("value"))
    AsOfJoin.asofJoin(clicks, purchases, "user_id", "ts", "p_event_id")
      .select(col("event_id"),
        col("asof").getField("p_event_id").as("p_event_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof").getField("ts")))
          .as("gap_us"),
        round(col("asof").getField("value") * 100).cast("long").as("p_value_c"))
      .orderBy("event_id")
  }

  /** DuckDB's native ASOF LEFT JOIN is the independent oracle (the
    * engine's union+window plan is never replayed — semantics are
    * checked against a different algorithm). Deterministic here:
    * the events table has no duplicate (user_id, ts). */
  val q62Sql: String =
    """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
       r AS (SELECT event_id AS p_event_id, user_id, ts, value
             FROM events WHERE event_type = 'purchase')
       SELECT l.event_id, r.p_event_id,
         CAST(epoch_us(l.ts) - epoch_us(r.ts) AS BIGINT) AS gap_us,
         CAST(ROUND(r.value * 100) AS BIGINT) AS p_value_c
       FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
       ORDER BY l.event_id"""

  /** Window attribution via the bucketed range join: every error
    * event within 12 hours AFTER a click by the same user (the
    * "which errors followed this interaction" query). The naive
    * theta-join multiplies full per-user histories; the operator
    * meets pairs inside (user, time-bucket) cells — see
    * [[graft.operators.RangeJoin]]. Delta emitted in exact
    * epoch-microseconds. */
  val rangeWindowMicros: Long = 12L * 3600 * 1000000

  def q66RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Queries.eventsTable(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_event_id"), col("user_id"),
        col("ts").as("e_ts"))
    RangeJoin.rangeJoin(clicks, errors, "user_id", "ts", "e_ts", rangeWindowMicros)
      .select(col("event_id"), col("e_event_id"),
        (unix_micros(col("e_ts")) - unix_micros(col("ts"))).as("delta_us"))
      .orderBy("event_id", "e_event_id")
  }

  val q66Sql: String =
    """SELECT l.event_id AS event_id, r.event_id AS e_event_id,
         CAST(epoch_us(r.ts) - epoch_us(l.ts) AS BIGINT) AS delta_us
       FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
       JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') r
         ON l.user_id = r.user_id
        AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 12 HOUR
       ORDER BY event_id, e_event_id"""

  // ---------- count–min sketch ----------

  val cmsWidth = 8192
  val cmsDepth = 4

  /** Candidate heavy-hitter terms: the stopword list plus the BM25
    * bench terms — a fixed probe set, the way a production pipeline
    * checks known-hot keys against the sketch. (Literal copy of
    * Queries.bm25Terms, not a reference: catalog objects must not
    * touch Queries during their own init or the cyclic-init order
    * NPEs, cf. the q-catalog layering rule.) */
  val cmsCandidates: Seq[String] =
    (graft.text.TextAnalysis.stopwords ++ Seq("spark", "hash", "join")).distinct.sorted

  /** Count–min sketch over the corpus token stream (weighted by the
    * memoized postings' tf, which is the same multiset), then point
    * estimates for the candidate terms next to their exact counts.
    * The sketch aggregate ships O(width·depth) longs per partition —
    * vocabulary- and corpus-size-independent — and the estimate is a
    * deterministic overestimate (est ≥ exact), replayed exactly by
    * the oracle. */
  def q63CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val post = Queries.bm25Postings(s, dir)
    val grid = post.agg(CountMinSketch.sketch(
      CountMinSketch.hash32(col("term")), col("tf").cast("long"),
      cmsWidth, cmsDepth).as("grid"))
    val exact = post.filter(col("term").isin(cmsCandidates: _*))
      .groupBy("term").agg(sum(col("tf")).cast("long").as("exact"))
    grid.select(explode(array(cmsCandidates.map(lit): _*)).as("term"), col("grid"))
      .join(exact, Seq("term"), "left")
      .select(col("term"),
        CountMinSketch.estimate(col("grid"),
          CountMinSketch.hash32(col("term")), cmsWidth, cmsDepth).as("est"),
        coalesce(col("exact"), lit(0L)).as("exact"))
      .orderBy("term")
  }

  /** SQL replay of the sketch arithmetic: same md5-prefix hash, same
    * per-row affine bucket functions, same min-over-rows estimate. */
  val q63Sql: String = {
    val aCase = CMS.A.take(cmsDepth).zipWithIndex
      .map { case (a, j) => s"WHEN $j THEN $a" }.mkString("CASE j ", " ", " END")
    val bCase = CMS.B.take(cmsDepth).zipWithIndex
      .map { case (b, j) => s"WHEN $j THEN $b" }.mkString("CASE j ", " ", " END")
    val cand = cmsCandidates.map(c => s"'$c'").mkString(", ")
    s"""WITH post AS (SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS tf
         FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
               FROM documents) GROUP BY t),
       hashed AS (SELECT term, ('0x' || substr(md5(term), 1, 8))::BIGINT AS h, tf FROM post),
       depths AS (SELECT unnest(generate_series(0, ${cmsDepth - 1})) AS j),
       cells AS (SELECT j, ((($aCase) * h + ($bCase)) % ${CMS.P}) % $cmsWidth AS b,
                        CAST(SUM(tf) AS BIGINT) AS c
                 FROM hashed, depths GROUP BY j, b),
       cand AS (SELECT unnest([$cand]) AS term),
       ch AS (SELECT term, ('0x' || substr(md5(term), 1, 8))::BIGINT AS h FROM cand),
       cb AS (SELECT term, j, ((($aCase) * h + ($bCase)) % ${CMS.P}) % $cmsWidth AS b
              FROM ch, depths),
       est AS (SELECT term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
               FROM cb LEFT JOIN cells USING (j, b) GROUP BY term),
       ex AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS exact FROM post
              WHERE term IN ($cand) GROUP BY term)
       SELECT term, est, COALESCE(exact, 0) AS exact
       FROM est LEFT JOIN ex USING (term) ORDER BY term"""
  }

  // ---------- bucketed co-located join ----------

  /** Write both join sides bucketed by the join key (one file per
    * bucket via the pre-repartition), then join the bucketed reads.
    * The build is memoized per (session, dir-content): the first call
    * pays the partitioned write, repeat calls in the same session
    * exercise only the read-side zero-exchange join — the
    * pay-the-shuffle-once contract the layout exists for. */
  private[graft] def bucketedTables(s: SparkSession, dir: String): (String, String) =
    Memo.cachedValue(s, dir, "q64tables")(buildBucketedTables(s, dir))

  private def buildBucketedTables(s: SparkSession, dir: String): (String, String) = {
    val tag = PipelineQueries.sanitizeTag(dir)
    val base = PipelineQueries.roundtripPath(dir, "q64")
    def write(df: DataFrame, name: String, key: String): String = {
      val tbl = s"q64_${name}_$tag"
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      df.repartition(8, col(key))
        .write.mode("overwrite")
        .option("path", s"$base/$name")
        .bucketBy(8, key).sortBy(key)
        .saveAsTable(tbl)
      tbl
    }
    (write(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
       "orders", "o_orderkey"),
     write(t(s, dir, "lineitem")
         .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
       "lineitem", "l_orderkey"))
  }

  /** The co-located join + aggregate over the bucketed tables. Both
    * sides are bucketed 8-ways on the join key, so the sort-merge
    * join (forced over broadcast with the merge hint — the point is
    * the co-location) reads bucket i against bucket i with NO
    * exchange and NO sort (one sorted file per bucket); the
    * downstream per-key aggregate reuses the same partitioning.
    * PlanSpec pins the exchange-free shape. At 100 TB this is the
    * standard layout for a fact table joined repeatedly on its key:
    * pay the partitioned write once, skip the shuffle every query. */
  private[graft] def bucketedJoinCore(s: SparkSession, ordersTbl: String,
                                      lineitemTbl: String): DataFrame =
    s.table(lineitemTbl).hint("merge")
      .join(s.table(ordersTbl), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey") < 200)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("long")).as("rev_c4"))
      .select(col("l_orderkey").as("o_orderkey"), col("n_items"), col("rev_c4"))

  def q64BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedTables(s, dir)
    bucketedJoinCore(s, ot, lt).orderBy("o_orderkey")
  }

  val q64Sql: String =
    """SELECT o_orderkey, COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_c4
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_custkey < 200
       GROUP BY o_orderkey ORDER BY o_orderkey"""

  // ---------- dedup clustering (connected components) ----------

  /** Near-duplicate CLUSTERS: the transitive closure of the verified
    * pair graph via [[graft.operators.ConnectedComponents]] min-label
    * propagation. Pairwise policies (q47 drops the higher id of each
    * pair) under-merge chains a~b~c; the component id (= min doc id
    * reachable) is the canonical cluster key a dedup pipeline keeps
    * one representative per. Oracle: DuckDB WITH RECURSIVE reachability
    * over the same pair CTE — a different algorithm computing the same
    * fixpoint. */
  def q68DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val edges = CurationQueries.nearDupPairs(s, dir)
      .filter(col("jaccard") >= CurationQueries.nearDupTau)
    val comp = ConnectedComponents.components(edges, "id1", "id2")
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
    // component count ~ cluster count can approach node count — join
    // strategy stays AQE's call, no forced broadcast
    comp.join(sizes, "component")
      .select(col("v").as("doc_id"), col("component").as("comp"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  val q68Sql: String =
    s"""WITH RECURSIVE ${CurationQueries.pairsCteSql},
       e AS (SELECT id1 AS a, id2 AS b FROM pairs WHERE jaccard >= ${CurationQueries.nearDupTau}
             UNION ALL
             SELECT id2 AS a, id1 AS b FROM pairs WHERE jaccard >= ${CurationQueries.nearDupTau}),
       nodes AS (SELECT DISTINCT a AS v FROM e),
       r AS (SELECT v, v AS l FROM nodes
             UNION
             SELECT e.b AS v, r.l AS l FROM r JOIN e ON e.a = r.v),
       comps AS (SELECT v AS doc_id, CAST(MIN(l) AS BIGINT) AS comp FROM r GROUP BY v),
       sizes AS (SELECT comp, COUNT(*) AS n FROM comps GROUP BY comp)
       SELECT c.doc_id, c.comp, CAST(s.n AS BIGINT) AS cluster_size
       FROM comps c JOIN sizes s ON s.comp = c.comp
       ORDER BY c.doc_id"""

  // ---------- histogram quantiles ----------

  /** Per-language quality-score quantile thresholds (p50/p90) and the
    * count of docs at-or-above each — the "keep the top decile per
    * stratum" curation move, via [[graft.operators.HistogramQuantiles]]:
    * the shuffle carries one row per (lang, distinct 4-decimal score),
    * never the corpus, and the quantile rule is pure integer
    * arithmetic (100·cum ≥ p·N), so it replays exactly in SQL. */
  def q67QualityQuantiles(s: SparkSession, dir: String): DataFrame = {
    // scored feeds TWO consumers (histogram + threshold-count join);
    // materialize the tokenize+score pass once — it is the dominant
    // cost of the query
    val scored = t(s, dir, "documents").select(col("lang"),
      // qualityScore rounds to 4 decimals; ×10^4 makes it an exact
      // integral bucket id
      round(graft.text.TextAnalysis.qualityScore(col("text")) * 10000)
        .cast("long").as("qs4"))
      .localCheckpoint()
    // thresholds is keys × percents rows — ALWAYS the broadcast side;
    // without the hint Spark's size estimate at test scale broadcasts
    // the corpus scan instead
    scored.join(
        broadcast(HistogramQuantiles.thresholds(scored, "lang", "qs4", Seq(50, 90))),
        "lang")
      .groupBy(col("lang"), col("percent"), col("threshold"))
      .agg(count(when(col("qs4") >= col("threshold"), lit(1))).as("n_ge"))
      .orderBy("lang", "percent")
  }

  val q67Sql: String = {
    val stopList = graft.text.TextAnalysis.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS toks
         FROM documents),
       q AS (SELECT lang,
           least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) AS ls,
           CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS dr,
           1.0 - abs(CAST(len(list_filter(toks, x -> list_contains([$stopList], x))) AS DOUBLE)
                     / greatest(len(toks), 1) - 0.4) AS ss
         FROM t),
       s AS (SELECT lang,
           CAST(ROUND(ROUND(((ls + dr) + ss) / 3.0, 4) * 10000) AS BIGINT) AS qs4 FROM q),
       hist AS (SELECT lang, qs4, COUNT(*) AS n FROM s GROUP BY lang, qs4),
       cum AS (SELECT lang, qs4,
           SUM(n) OVER (PARTITION BY lang ORDER BY qs4 ROWS UNBOUNDED PRECEDING) AS cumn,
           SUM(n) OVER (PARTITION BY lang) AS nn FROM hist),
       p AS (SELECT unnest([50, 90]) AS percent),
       th AS (SELECT lang, percent, CAST(MIN(qs4) AS BIGINT) AS threshold
              FROM cum, p WHERE cumn * 100 >= percent * nn GROUP BY lang, percent)
       SELECT th.lang, th.percent, th.threshold,
         CAST(COUNT(CASE WHEN s.qs4 >= th.threshold THEN 1 END) AS BIGINT) AS n_ge
       FROM th JOIN s ON s.lang = th.lang
       GROUP BY th.lang, th.percent, th.threshold
       ORDER BY th.lang, th.percent"""
  }

  // ---------- salted skew join ----------

  /** Declared path for the skew-salting tool: events (the fact side,
    * user_id-keyed — at 100 TB a celebrity key would overwhelm one
    * task) joined to the customer dimension through
    * [[graft.ingest.Salting.saltedJoin]], which spreads each key over
    * 8 salt lanes and confines row multiplication to the SMALL side.
    * Results are identical to the plain equi-join, which is exactly
    * what the oracle checks. */
  def q65SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Queries.eventsTable(s, dir)
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("vc"))
    val dim = t(s, dir, "customer").filter(col("c_custkey") < 150)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Salting.saltedJoin(ev, col("event_id"), dim, "user_id", 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("sum_value_c"))
      .orderBy("c_mktsegment")
  }

  val q65Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
       FROM events JOIN customer ON user_id = c_custkey
       WHERE c_custkey < 150
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Shared-artifact builds (see RetrievalQueries.builds). */
  val builds: Map[String, (SparkSession, String) => Unit] = Map(
    "_build_bucketed_tables" -> ((s, dir) => { bucketedTables(s, dir); () }))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_asof_join" -> (q62AsofJoin _),
    "q63_cms_heavy_hitters" -> (q63CmsHeavyHitters _),
    "q64_bucketed_join" -> (q64BucketedJoin _),
    "q65_salted_join" -> (q65SaltedJoin _),
    "q66_range_join" -> (q66RangeJoin _),
    "q67_quality_quantiles" -> (q67QualityQuantiles _),
    "q68_dedup_clusters" -> (q68DedupClusters _))

  val oracle: Map[String, String] = Map(
    "q62_asof_join" -> q62Sql,
    "q63_cms_heavy_hitters" -> q63Sql,
    "q64_bucketed_join" -> q64Sql,
    "q65_salted_join" -> q65Sql,
    "q66_range_join" -> q66Sql,
    "q67_quality_quantiles" -> q67Sql,
    "q68_dedup_clusters" -> q68Sql)
}
