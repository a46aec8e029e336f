package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The composed corpus-build job's contract: every artifact it ships
  * is ROW-IDENTICAL to the operator chain applied stepwise against an
  * independently staged copy of the same corpus — composition adds
  * plumbing, never semantics.
  */
class BuildCorpusSpec extends AnyFunSuite {
  import TestSpark.{spark, sf, withTmpDir}

  private def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame,
      what: String): Unit = {
    val cols = a.columns.toSeq.sorted.map(col)
    val (x, y) = (a.select(cols: _*), b.select(cols: _*))
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty, s"$what differs")
  }

  test("composed artifact equals the operator chain applied stepwise") {
    withTmpDir("buildcorpus") { root =>
      val out = s"$root/out"; val mine = s"$root/mine"
      val log = BuildCorpus.run(spark, sf, out).collect()
        .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap

      // ---- stepwise staging (the q85 normalize step, by hand) ----
      val norm = operators.TextOps.q85(spark, sf)
      Tables(spark, sf, "documents").select("doc_id", "lang", "source")
        .join(norm.select(col("doc_id"), col("text_norm").as("text")), "doc_id")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$mine/documents.parquet")
      Tables(spark, sf, "embeddings").write.parquet(s"$mine/embeddings.parquet")
      eq(spark.read.parquet(s"$out/staged/documents.parquet"),
        spark.read.parquet(s"$mine/documents.parquet"), "staged corpus")

      // ---- stepwise chain over MY staging dir ----
      val drop = operators.Sampling.q69(spark, mine)
        .filter(col("contaminated")).select("doc_id")
        .unionByName(operators.Sampling.q86(spark, mine)
          .filter(col("contaminated")).select("doc_id"))
        .distinct()
      val packed = operators.Sampling.assembleWith(spark, mine, drop)
        .localCheckpoint(false)
      val myDocs = spark.read.parquet(s"$mine/documents.parquet")
      val shippedRef = myDocs.join(packed, "doc_id")
        .withColumn("shard", expr(operators.Sampling.ShardExpr).cast("long"))
        .localCheckpoint(false)

      // shards: the shipped training set
      val shards = spark.read.parquet(s"$out/shards")
        .withColumn("shard", col("shard").cast("long"))
      eq(shards.select("shard", "doc_id", "text", "lang", "source",
          "n_tokens", "bin_id", "bin_offset"),
        shippedRef.select("shard", "doc_id", "text", "lang", "source",
          "n_tokens", "bin_id", "bin_offset"), "shards")

      // manifest: q170's aggregation over exactly the shipped rows
      eq(spark.read.parquet(s"$out/manifest.parquet"),
        operators.Sampling.manifestOf(shippedRef.select(col("shard"),
          col("n_tokens"), octet_length(col("text")).cast("long").as("n_bytes"))),
        "manifest")

      // card: q79 over a corpus dir built from MY shipped docs
      shippedRef.select(col("doc_id"), col("text"), col("lang"), col("source"),
          length(col("text")).cast("long").as("n_chars"))
        .write.parquet(s"$root/mycorpus/documents.parquet")
      eq(spark.read.parquet(s"$out/card.parquet"),
        operators.TextOps.q79(spark, s"$root/mycorpus"), "data card")

      // decision log: counts agree with the stepwise stages
      val nDocs = Tables(spark, sf, "documents").count()
      assert(log("intake")._1 == nDocs)
      val gateTrain = operators.Sampling.q68(spark, mine)
        .filter(col("split") === "train").select("doc_id")
      assert(log("gate_keep")._2 == gateTrain.count(), "gate_keep count drifted")
      val nDropped = gateTrain.join(drop, Seq("doc_id"), "left_semi").count()
      assert(log("decontaminate") == ((gateTrain.count(), gateTrain.count() - nDropped)),
        "decontaminate counts drifted")
      assert(nDropped > 0, "no contaminated gate-kept docs: the decon stage is vacuous here")
      assert(log("mix_pack")._2 == packed.count(), "packed count drifted")
      assert(log("mix_pack")._2 < log("decontaminate")._2,
        "mixture admitted everything: the budget stage is vacuous here")
    }
  }
}
