package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: register the raw tables and any subset of the
  * operator catalog as temp views, so the entire engine is
  * `spark.sql`-queryable — `SELECT * FROM q20_hourly_revenue`, joins
  * across operator outputs, ad-hoc filters over them — exactly how
  * the reference's stored collections are consumed by its API layer.
  *
  * Query views hold the operator's LOGICAL plan: nothing
  * materializes at registration and Catalyst optimizes the composed
  * query (a filter written over a view pushes into the operator's
  * plan). Exception, documented: the iterative operators
  * (q65/q68/q75/q89/q91/q92/q96) run their driver-side loops during
  * plan CONSTRUCTION, so registering one executes its iteration jobs
  * eagerly — register those only when needed.
  */
object Views {

  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Operators whose fn runs driver-side jobs at plan construction
    * (iterative loops, collected histograms/signatures, sketch
    * builds, ML fits). */
  val eagerOperators: Set[String] = Set("q65_neardup_clusters", "q68_corpus_keep",
    "q75_assemble", "q89_bpe_train", "q91_graph_centrality", "q92_bpe_encode",
    "q96_lm_score", "q30_rfm_segments", "q33_kmeans_rfm", "q34_als_recs",
    "q35_kmeans_anomaly", "q45_semantic_dedup", "q52_knn_ivf", "q53_knn_pq",
    "q54_knn_graph", "q94_triplet_mining", "q98_diversity_sample",
    "q51_knn_lsh", "q72_mix_budget", "q74_pack_sequences",
    "q77_bloom_decontaminate", "q102_pack_efficiency", "q105_text_classifier")

  /** Register the raw tables and the named operators (default: every
    * LAZY operator) as temp views on this session. */
  def register(spark: SparkSession, dir: String,
      operators: Seq[String] = SparkEntry.all.map(_.name).filterNot(eagerOperators)): Unit = {
    tableNames.foreach(t => Tables(spark, dir, t).createOrReplaceTempView(t))
    val catalog = SparkEntry.queries
    operators.foreach { name =>
      catalog(name)(spark, dir).createOrReplaceTempView(name)
    }
  }
}
