package graft

import org.apache.spark.sql.functions._

/** Scale harness for the LEXICAL serving faces (the AdmitBench mold,
  * SURVEY §4.1/§4.2): builds the persisted BM25 index from 90% of a
  * corpus, then measures BOTH online paths —
  *
  *  - INGEST: the remaining 10% streamed through
  *    [[graft.streaming.LexIngestStream]] in `chunks` file triggers
  *    (coverage gate per trigger, delta append, decision log);
  *  - RETRIEVE: `qtrig` triggers of [[QPerTrigger]] bounded queries
  *    each (the serving contract) through
  *    [[graft.streaming.RetrieveStream]] — lexical probe against the
  *    persisted postings + dense probe against a corpus-fitted
  *    [[graft.sources.AnnIndex]], RRF-fused per trigger.
  *
  * Prints one JSON line: build seconds, ingest rows/s + triggers +
  * gate tally, retrieve queries/s + per-trigger seconds. The claim
  * under measurement is the §2.H one: per-trigger cost is a PRUNED
  * probe of at-rest state (postings/cells), so ingest throughput
  * rises with trigger size and retrieve latency is flat in corpus
  * size (the bucket/cell slice, not the corpus, is the unit of work).
  *
  * usage: runMain graft.LexBench [docsDir] [chunks] [qtrig]
  */
object LexBench {

  val QPerTrigger = 20

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/stress_x10")
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val qtrig = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession.local(cpus)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (chunks + qtrig + 8).toString)
    val root = java.nio.file.Files.createTempDirectory("graft_lex").toString
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val isNew = pmod(col("doc_id"), lit(10)) === 7

    // base index from the 90% residents
    val basePath = s"$root/lex"
    val t0 = System.nanoTime()
    val stats = sources.LexIndex.writeFrom(spark, docs.filter(!isNew), basePath)
    val buildSecs = (System.nanoTime() - t0) / 1e9

    // INGEST face: stream the 10% through the coverage-gated sink
    val spool = s"$root/spool"
    docs.filter(isNew).repartition(chunks).write.parquet(spool)
    val ingest = streaming.LexIngestStream.ingestSink(
      spark.readStream.schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(spool),
      basePath, s"$root/delta", s"$root/quar", s"$root/ilog", stats, s"$root/ickpt")
    val t1 = System.nanoTime()
    ingest.processAllAvailable()
    val ingestSecs = (System.nanoTime() - t1) / 1e9
    val iRows = ingest.recentProgress.map(_.numInputRows).sum
    val iBatches = ingest.recentProgress.count(_.numInputRows > 0)
    ingest.stop()
    val gate = spark.read.parquet(s"$root/ilog")
      .agg(sum("n_docs_admitted").as("a"), max("rebuild").as("r")).collect()(0)

    // RETRIEVE face: bounded query triggers against postings + cells
    val annPath = s"$root/ann"
    val t2 = System.nanoTime()
    val cents = sources.AnnIndex.write(spark, dir, annPath)
    val annSecs = (System.nanoTime() - t2) / 1e9
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val queries = docs.join(emb, "doc_id")
      .filter(col("doc_id") < qtrig.toLong * QPerTrigger)
      .select(col("doc_id").as("query_id"), col("text"), col("embedding"))
    val qspool = s"$root/qspool"
    queries.repartition(qtrig).write.parquet(qspool)
    val retrieve = streaming.RetrieveStream.retrieveSink(
      spark.readStream
        .schema("query_id BIGINT, text STRING, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(qspool),
      basePath, stats, annPath, cents, nprobe = 4,
      s"$root/results", s"$root/rckpt")
    val t3 = System.nanoTime()
    retrieve.processAllAvailable()
    val retSecs = (System.nanoTime() - t3) / 1e9
    val qRows = retrieve.recentProgress.map(_.numInputRows).sum
    val qBatches = retrieve.recentProgress.count(_.numInputRows > 0)
    retrieve.stop()

    println(
      f"""{"pipeline":"lex","build_secs":$buildSecs%.1f,"ann_build_secs":$annSecs%.1f,""" +
        f""""ingest_rows":$iRows,"ingest_secs":$ingestSecs%.1f,""" +
        f""""ingest_rows_per_sec":${iRows / math.max(ingestSecs, 1e-9)}%.0f,""" +
        s""""ingest_batches":$iBatches,"admitted":${gate.getLong(0)},""" +
        s""""rebuild_tripped":${gate.getBoolean(1)},""" +
        f""""queries":$qRows,"retrieve_secs":$retSecs%.1f,""" +
        f""""retrieve_per_trigger_secs":${retSecs / math.max(qBatches, 1)}%.2f,""" +
        s""""retrieve_batches":$qBatches}""")
    spark.stop()
  }
}
