package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.D) over the `documents` table —
  * the LLM-training-pipeline surface the north star adds on top of
  * the reference's own analytics.
  *
  * Scale design: every near-dup path is candidate-generation
  * (inverted-index / LSH band join) + verification on candidates
  * only — never an O(n²) cross join. Shingles with document
  * frequency above `DfCap` are dropped IDENTICALLY in engine and
  * oracle (ubiquitous shingles create quadratic hot keys at 100 TB;
  * the cap bounds the join fan-out while keeping parity).
  */
object Dedup {

  private val DfCap = 1000

  /** Near-dup Jaccard threshold, shared by q41/q42/q65 and their
    * oracle SQL so engine and oracle can never drift apart. */
  private val JaccThr = "0.6"

  /** Whitespace tokens, empties removed (exact parity with DuckDB's
    * list_filter(string_split(...))). */
  val tokensExpr = "filter(split(text, ' '), x -> x != '')"

  /** Distinct word 3-gram shingles per document. */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("tk", expr(tokensExpr))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(tk) >= 3
           THEN array_distinct(transform(sequence(1, size(tk)-2),
                i -> concat_ws(' ', element_at(tk,i), element_at(tk,i+1), element_at(tk,i+2))))
           ELSE array() END""")).as("s"))

  /** Shingles surviving the document-frequency cap, applied as an
    * anti join against the over-cap ("hot") set. The hot set is
    * usually tiny (ubiquitous n-grams are few) and AQE then picks a
    * broadcast anti join, sparing the shingle stream a shuffle — but
    * it is NOT broadcast-hinted: a boilerplate-heavy corpus can push
    * millions of shingles over the cap, and the hint would force an
    * over-limit broadcast where a shuffle anti join is the safe plan.
    */
  private def cappedShingles(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val hot = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > DfCap).select("s")
    sh.join(hot, Seq("s"), "left_anti")
  }

  private val shingleCte =
    s"""t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x<>'') AS tk FROM documents),
       sh0 AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
               FROM t, UNNEST(range(1, len(tk)-1)) AS r(i)),
       keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $DfCap),
       sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep ON sh0.s = keep.s)"""

  /** Exact dedup: md5 groups with canonical (min doc_id) member. */
  def q40(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("group_hash")
    Tables(s, dir, "documents")
      .withColumn("group_hash", md5(col("text").cast("binary")))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("group_hash"), col("canonical_id"),
        col("group_size"), (col("doc_id") =!= col("canonical_id")).as("is_duplicate"))
      .orderBy("doc_id")
  }

  private val q40Sql =
    """SELECT doc_id, md5(text) AS group_hash,
       min(doc_id) OVER w AS canonical_id,
       count(*) OVER w AS group_size,
       doc_id <> min(doc_id) OVER w AS is_duplicate
       FROM documents WINDOW w AS (PARTITION BY md5(text))
       ORDER BY doc_id"""

  /** Pair Jaccard over the capped shingle inverted index. */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = cappedShingles(s, dir)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
      .join(sz.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sz.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .select(col("d1"), col("d2"),
        (col("c") * lit(1.0) / (col("n1") + col("n2") - col("c"))).as("jacc_raw"))
  }

  /** n-gram Jaccard near-dup pairs (inverted-index join, no O(n²)). */
  def q41(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir)
      .filter(col("jacc_raw") >= JaccThr.toDouble)
      .select(col("d1"), col("d2"), ops.r6(col("jacc_raw")).as("jaccard"))
      .orderBy("d1", "d2")

  private val q41Sql =
    s"""WITH $shingleCte,
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       pairs AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
                 FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1,2)
       SELECT d1, d2, ${ops.R6("c*1.0/(n1.n + n2.n - c)")} AS jaccard
       FROM pairs JOIN sz n1 ON d1=n1.doc_id JOIN sz n2 ON d2=n2.doc_id
       WHERE c*1.0/(n1.n + n2.n - c) >= $JaccThr
       ORDER BY d1, d2"""

  /** MinHash(128) + LSH banding (32 bands × 4 rows) with exact
    * Jaccard verification on the candidate pairs only. Hash-seeded
    * permutations aren't SQL-expressible in DuckDB → rows-only;
    * DedupSpec asserts recall vs q41.
    *
    * Perf shape: each shingle is string-hashed ONCE; the 128
    * permutation hashes re-hash that fixed-width long with the
    * permutation index as seed (vs 128 string concat+hash per
    * shingle), all inside one codegen'd 128-column min-agg; and
    * verification intersects the shingle sets of CANDIDATE pairs
    * only — never the full inverted-index self-join, which is the
    * whole point of LSH at 100 TB. */
  def q42(s: SparkSession, dir: String): DataFrame = {
    val sh = cappedShingles(s, dir)
    val perms = 128
    val hashed = sh.select(col("doc_id"), xxhash64(col("s")).as("h1"))
    val aggs = (0 until perms).map(p =>
      min(xxhash64(lit(p), col("h1"))).as(s"h$p"))
    val sig = hashed.groupBy("doc_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until perms).map(p => col(s"h$p")): _*).as("sig"))
    val bands = sig.select(col("doc_id"), explode(expr(
      "transform(sequence(0, 31), b -> struct(b AS band, hash(slice(sig, b*4+1, 4)) AS bkey))")).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bkey"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
    val sets = sh.groupBy("doc_id").agg(collect_set("s").as("ss"), count(lit(1)).as("n"))
    cands
      .join(sets.select(col("doc_id").as("d1"), col("ss").as("ss1"), col("n").as("n1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("ss").as("ss2"), col("n").as("n2")), "d2")
      .withColumn("c", size(array_intersect(col("ss1"), col("ss2"))))
      .withColumn("jacc_raw", col("c") * lit(1.0) / (col("n1") + col("n2") - col("c")))
      .filter(col("jacc_raw") >= JaccThr.toDouble)
      .select(col("d1"), col("d2"), ops.r6(col("jacc_raw")).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** SimHash(64-bit over unigrams) + 16-bit band join, hamming ≤ 8. */
  def q43(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(expr(s"array_distinct($tokensExpr)")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitAggs = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val sims = toks.groupBy("doc_id")
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"b$b") >= 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
    val bands = sims.select(col("doc_id"), col("simhash"), explode(expr(
      "transform(sequence(0, 3), i -> struct(i AS band, shiftright(simhash, i*16) & 65535 AS bkey))")).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band"), col("bk.bkey"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("d1", "d2")
  }

  /** Embedding cosine near-dup pairs. Threshold calibrated to the
    * synthetic data (max pair cosine ≈ 0.51). Exact-by-contract →
    * pairwise with id-ordering; the approximate scale path is
    * Similarity.q51's LSH bucketing. The per-pair dot product is the
    * codegen'd [[graft.functions.VectorOps.dotp]] — the HOF form put
    * two interpreted lambdas in the O(n²) hot loop. */
  def q44(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.{dotp, l2norm}
    val e = Tables(s, dir, "embeddings")
      .withColumn("nrm", l2norm(col("embedding")))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", dotp(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.45)
      .select(col("id1"), col("id2"), ops.r4(col("cos")).as("cosine"))
      .orderBy("id1", "id2")
  }

  private val q44Sql =
    s"""SELECT a.vec_id AS id1, b.vec_id AS id2,
       ${ops.R4("list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])")} AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
       ORDER BY id1, id2"""

  /** Near-dup CLUSTERS: connected components over the q41 pair graph
    * (HashMin label propagation — each round every doc takes the min
    * cluster id among itself and its neighbors, O(diameter) rounds,
    * driver-checked convergence so the fixpoint is exact at any SF).
    * Labels are localCheckpointed per round to truncate the iterative
    * lineage; the driver-side loop moves only one count per round.
    * This is the step a dedup pipeline actually keys on: keep
    * min(doc_id) per cluster, drop the rest.
    *
    * Only edge-connected docs ride through the iteration — at scale
    * isolated docs vastly outnumber near-dup nodes, and they get
    * their identity label in one final left join. */
  def q65(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select(col("doc_id"))
    val pairs = jaccardPairs(s, dir).filter(col("jacc_raw") >= JaccThr.toDouble)
      .select(col("d1"), col("d2"))
    val sym = pairs.union(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
      .localCheckpoint(false)
    // `ckpt` is the checkpointed frame itself (unpersist must target
    // it, not a derived projection); `labels` is its working view.
    var ckpt = sym.select(col("d1").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(false)
    var labels = ckpt
    var changed = 1L
    var rounds = 0
    val maxRounds = 64
    while (changed > 0 && rounds < maxRounds) {
      val nbrMin = sym.join(labels, sym("d2") === labels("doc_id"))
        .groupBy(sym("d1").as("nd")).agg(min("cluster_id").as("nbr_min"))
      // carry the previous label as a column: convergence is one scan
      // of the (checkpointed) frame, not a second full join per round
      val updated = labels
        .join(nbrMin, labels("doc_id") === nbrMin("nd"), "left")
        .select(col("doc_id"), col("cluster_id").as("_prev"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .localCheckpoint(false)
      changed = updated.filter(col("cluster_id") =!= col("_prev")).count()
      ckpt.unpersist() // superseded round's checkpoint blocks
      ckpt = updated
      labels = updated.drop("_prev")
      rounds += 1
    }
    require(changed == 0,
      s"q65 label propagation did not converge in $maxRounds rounds " +
        "(component diameter exceeds the cap); raise maxRounds")
    docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .orderBy("doc_id")
  }

  private val q65Sql =
    s"""WITH RECURSIVE $shingleCte,
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       pairs0 AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
                  FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1,2),
       p AS (SELECT d1, d2 FROM pairs0 JOIN sz n1 ON d1=n1.doc_id JOIN sz n2 ON d2=n2.doc_id
             WHERE c*1.0/(n1.n + n2.n - c) >= $JaccThr),
       sym AS (SELECT d1 a, d2 b FROM p UNION ALL SELECT d2, d1 FROM p),
       reach(a, b) AS (
         SELECT a, b FROM sym
         UNION
         SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a
       )
       SELECT d.doc_id, least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
       FROM documents d LEFT JOIN reach r ON d.doc_id = r.a
       GROUP BY d.doc_id ORDER BY doc_id"""

  val qs: Seq[Q] = Seq(
    Q("q40_exact_dedup", q40, Some(q40Sql)),
    Q("q41_ngram_jaccard", q41, Some(q41Sql)),
    Q("q42_minhash_lsh", q42, None),
    Q("q43_simhash", q43, None),
    Q("q44_embedding_neardup", q44, Some(q44Sql)),
    Q("q65_neardup_clusters", q65, Some(q65Sql)))
}
