package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY §2.E).
  *
  * q50 is the exact brute-force baseline: the (small) query set is
  * broadcast against the candidate corpus — at 100 TB the corpus
  * side stays partitioned and never shuffles; per-partition top-k
  * then a k×partitions driver merge (TakeOrderedAndProject shape).
  * q51 is the scale path: random-hyperplane LSH signatures bucket
  * the corpus so each query only scores its colliding buckets.
  */
object Similarity {

  import graft.functions.VectorOps.{dotp, l2norm}

  /** embedding (float[]) plus L2 norm; dot/norm via the codegen'd
    * [[graft.functions.DotProduct]] (same IEEE result as the HOF
    * form — float widened per element, sequential double sum). */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("ed", col("embedding"))
      .withColumn("nrm", l2norm(col("embedding")))

  private def dot(a: String, b: String): Column = dotp(col(a), col(b))

  /** Brute-force cosine top-5 per query vector (query set: id < 20). */
  def q50(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables(s, dir, "embeddings"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("ed").as("qe"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("ed").as("ce"), col("nrm").as("cn"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", ops.r6(dot("qe", "ce") / (col("qn") * col("cn"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  private val q50Sql =
    s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < 20),
       p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ${ops.R6("list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])")} AS cosine
             FROM q JOIN embeddings c ON c.vec_id <> q.vec_id)
       SELECT query_id, neighbor_id, rank, cosine FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, neighbor_id) AS rank FROM p)
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Deterministic random hyperplanes (seed 42), 16 bits → 4 bands. */
  private val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
  }

  /** LSH-bucketed approximate top-5: candidates = vectors sharing at
    * least one 4-bit signature band with the query. rows-only —
    * SimilaritySpec asserts recall against q50. */
  def q51(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables(s, dir, "embeddings"))
    val sig = planes.zipWithIndex.map { case (p, i) =>
      val planeDot = dotp(col("ed"), array(p.map(v => lit(v)): _*))
      when(planeDot >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val signed = e.withColumn("sig", sig)
    val bands = signed.select(col("vec_id"), col("ed"), col("nrm"), explode(expr(
      "transform(sequence(0, 3), i -> struct(i AS band, shiftright(sig, i*4) & 15 AS bkey))")).as("bk"))
      .select(col("vec_id"), col("ed"), col("nrm"), col("bk.band"), col("bk.bkey"))
    val qb = bands.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("ed").as("qe"), col("nrm").as("qn"),
        col("band"), col("bkey"))
    val cands = bands.as("c").join(qb.as("q"),
        col("c.band") === col("q.band") && col("c.bkey") === col("q.bkey") &&
        col("c.vec_id") =!= col("q.query_id"))
      .select(col("q.query_id"), col("c.vec_id").as("neighbor_id"),
        col("q.qe"), col("q.qn"), col("c.ed").as("ce"), col("c.nrm").as("cn"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cands.withColumn("cosine", ops.r6(dot("qe", "ce") / (col("qn") * col("cn"))))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path:
    * k-means cells over the corpus, queries probe only the `nprobe`
    * nearest cells. At 100 TB the cell index is written bucketed by
    * cell id so a probe reads only matching buckets; here the
    * cell join is an ordinary shuffle join on cid.
    *
    * Lloyd iterations are DataFrame aggregations; only the k
    * centroids (k × dim doubles) ever reach the driver — the
    * MLlib KMeans pattern, bounded by k not data size. Centroids are
    * rounded to 1e-9 after each iteration so FP accumulation order
    * can't make runs diverge. Deterministic init: the k lowest
    * vec_ids. rows-only; SimilaritySpec asserts recall vs q50. */
  def q52(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 16
    val iters = 3
    val nprobe = 4
    val e = withNorm(Tables(s, dir, "embeddings")).select(col("vec_id"), col("ed"), col("nrm"))

    // Cell-assignment ranking key: for a fixed vector, argmin over
    // centroids of ||v-c||² ignores the constant ||v||² term, so it
    // is never computed — one dot per (vector, centroid), not three.
    def d2(vec: Column, cvec: Column): Column =
      dotp(cvec, cvec) - lit(2.0) * dotp(vec, cvec)

    // deterministic init: the k lowest vec_ids (whatever their values)
    var cents: Seq[(Int, Seq[Double])] = e.orderBy("vec_id").limit(k)
      .select(col("vec_id").cast("int"), col("ed")).as[(Int, Seq[Float])]
      .collect().toSeq.zipWithIndex
      .map { case ((_, v), i) => (i, v.map(_.toDouble)) }

    for (_ <- 1 to iters) {
      val centDf = broadcast(cents.toDF("cid", "cvec"))
      cents = e.crossJoin(centDf)
        .groupBy("vec_id")
        .agg(min(struct(d2(col("ed"), col("cvec")).as("d2"), col("cid"), col("ed"))).as("m"))
        .select(col("m.cid").as("cid"), posexplode(col("m.ed")))
        .groupBy("cid", "pos").agg(avg(col("col").cast("double")).as("v"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, v))), x -> x.v)").as("cvec"))
        .as[(Int, Seq[Double])].collect().toSeq
        .map { case (c, v) => (c, v.map(x => math.rint(x * 1e9) / 1e9)) }
    }

    val centDf = broadcast(cents.toDF("cid", "cvec"))
    val cells = e.crossJoin(centDf)
      .groupBy("vec_id")
      .agg(min(struct(d2(col("ed"), col("cvec")).as("d2"), col("cid"), col("ed"), col("nrm"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.ed").as("ed"), col("m.nrm").as("nrm"))
    val probes = e.filter(col("vec_id") < 20).crossJoin(centDf)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(d2(col("ed"), col("cvec")), col("cid"))))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("ed").as("qe"), col("nrm").as("qn"), col("cid"))
    val scored = probes.join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", ops.r6(dotp(col("qe"), col("ed")) / (col("qn") * col("nrm"))))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id", "rank", "cosine")
      .orderBy("query_id", "rank")
  }

  val qs: Seq[Q] = Seq(
    Q("q50_knn_brute", q50, Some(q50Sql)),
    Q("q51_knn_lsh", q51, None),
    Q("q52_knn_ivf", q52, None))
}
